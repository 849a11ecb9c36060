"""Whitted raytracer: smoke + semantics (the reference's validation-quality
path, SimpleCPURaytracer)."""

import jax
import jax.numpy as jnp
import numpy as np

from ba_pathtracing_fur_tpu.models import whitted
from ba_pathtracing_fur_tpu.scene.builtins import cornell_box, fur_patch


def test_whitted_cornell_smoke():
    scene, camera = cornell_box(resolution=(32, 32))
    cfg = whitted.WhittedConfig(depth=2, ray_chunk=4096)
    img = whitted.render_whitted(scene, camera, cfg)
    a = np.asarray(img)
    assert a.shape == (32, 32, 3)
    assert np.all(np.isfinite(a))
    assert a.max() > 0.01
    assert a.std() > 1e-3  # not a flat image


def test_whitted_deterministic():
    scene, camera = cornell_box(resolution=(16, 16))
    cfg = whitted.WhittedConfig(depth=2, ray_chunk=1024)
    a = np.asarray(whitted.render_whitted(scene, camera, cfg))
    b = np.asarray(whitted.render_whitted(scene, camera, cfg))
    np.testing.assert_array_equal(a, b)


def test_whitted_shadows_darken():
    scene, camera = cornell_box(resolution=(16, 16))
    lit = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=0, shadows=False, ray_chunk=1024)))
    shad = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=0, shadows=True, ray_chunk=1024)))
    assert shad.mean() <= lit.mean() + 1e-6


def test_whitted_fur_lobes():
    scene, camera = fur_patch(resolution=(24, 24), fibers_per_face=6,
                              fiber_verts=5, fiber_radius=0.02)
    r_only = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=1, hair_lobes="r", ray_chunk=1024)))
    all_lobes = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=1, hair_lobes="all", ray_chunk=1024)))
    assert np.all(np.isfinite(r_only)) and np.all(np.isfinite(all_lobes))
    # TT+TRT only ever add energy
    assert all_lobes.sum() >= r_only.sum() - 1e-4


def test_whitted_supersampling_smooths():
    scene, camera = cornell_box(resolution=(16, 16))
    a = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=1, supersamples=1, ray_chunk=1024)))
    b = np.asarray(whitted.render_whitted(
        scene, camera, whitted.WhittedConfig(depth=1, supersamples=2, ray_chunk=1024)))
    assert np.all(np.isfinite(b))
    assert abs(a.mean() - b.mean()) < 0.2  # same scene, similar exposure


def test_record_hair_paths():
    scene, camera = fur_patch(resolution=(8, 8), fibers_per_face=8,
                              fiber_verts=5, fiber_radius=0.03)
    from ba_pathtracing_fur_tpu.core import camera as cam_mod
    px, py = cam_mod.pixel_grid(camera.resolution)
    jit = jnp.full((px.shape[0], 2), 0.5)
    o, d = cam_mod.rays_from_pixels(camera, px, py, jit)
    rec = whitted.record_hair_paths(scene, o, d)
    assert bool(rec.valid.any())
    v = np.asarray(rec.valid)
    for seg in (rec.in_ray, rec.normal0, rec.out_r, rec.out_tt, rec.out_trt):
        assert np.all(np.isfinite(np.asarray(seg)[v]))
