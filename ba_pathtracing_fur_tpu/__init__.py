"""ba_pathtracing_fur_tpu — a TPU-native differentiable fur path tracer.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the KIRK
fur-path-tracing reference (lucashilbig/BA_Pathtracing_Fur): a wavefront path
tracer over triangle + fur-fiber-cone scenes with Marschner / d'Eon hair
scattering, next-event estimation, LBVH acceleration, progressive
accumulation, Yxy tonemapping, and multi-device sharding — with the full
light path differentiable so pixel gradients flow to material, fur, and
emitter parameters.

Layout (TPU-first redesign of the reference's layer map, SURVEY.md §1):
  core/      vector math, sampling, counter-based RNG, thin-lens camera
  scene/     host scene graph, meshes + fur growth, flattened device scene
  models/    BSDFs (incl. hair lobes), wavefront path tracer, Whitted tracer
  ops/       intersection kernels, LBVH, tonemapper, Pallas kernels
  parallel/  device-mesh sharding, psum reductions, multi-host helpers
  diff/      differentiable rendering + parameter pytrees
  utils/     config, logging, film/accumulation, checkpointing
"""

__version__ = "0.1.0"
