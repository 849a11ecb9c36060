"""A/B the shadow any-hit pass cost on the fused hair-ball config.

Runs the bench hair_ball config twice: stock, and with traverse.any_hit
stubbed to all-unblocked (wrong image, same everything else). The wall
difference is the shadow streaming pass + its wrapper.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                             on_device=True)
hint = dict(builtins.LAST_HAIRBALL_GEN)
sc = to_device(traverse.attach_bvh(sc, method="median",
                                   cone_split_hint=hint))
cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024, compact=False,
                   fused_shading=True)
rays = res * res * spp * 4


def timed(label, fn):
    img = fn(sc, jax.random.key(0))
    jax.block_until_ready(img)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        img = fn(sc, jax.random.key(0))
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s} {best*1e3:8.1f} ms   {rays/best/1e6:.2f}M rays/s")
    return best


full = timed("stock", jax.jit(lambda s, k: render_image(s, cam, k, cfg)))

orig = traverse.any_hit
traverse.any_hit = lambda o, d, scene, t_max, **kw: jnp.zeros(
    o.shape[0], bool)
jax.clear_caches()  # render_image's inner trace would otherwise be reused
try:
    nosh = timed("no-shadow", jax.jit(lambda s, k: render_image(s, cam, k, cfg)))
finally:
    traverse.any_hit = orig
print(f"shadow pass cost: {(full-nosh)*1e3:.1f} ms "
      f"({100*(full-nosh)/full:.1f}% of wall)")
