"""Dev harness 3: decompose closest_hit wrapper overhead at flagship scale."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, reps=3):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])[:1] if jax.tree.leaves(out) else None
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(res, res),
                                       n_fibers=fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    bvh = scene.cone_bvh
    r = res * res
    px, py = pixel_grid((res, res))
    jitter = jax.random.uniform(jax.random.key(0), (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((r,), 3.4e38)

    @jax.jit
    def perms(b, o, d, tm):
        return traverse._entry_morton_perms(o, d, tm, b)

    dt = timeit(perms, bvh, o, d, t_max)
    print(f"entry_morton_perms (2 argsorts): {dt*1e3:.1f} ms")

    @jax.jit
    def full(sc, o, d):
        h = traverse.closest_hit(o, d, sc, chunk=1024)
        return h.t
    print(f"closest_hit full: {timeit(full, scene, o, d)*1e3:.1f} ms")

    # pre-sorted rays, no sort inside
    p, _ = jax.block_until_ready(perms(bvh, o, d, t_max))
    o_s, d_s = o[p], d[p]

    @jax.jit
    def nosort(sc, o, d):
        h = traverse.closest_hit(o, d, sc, chunk=1024, sort_rays=False)
        return h.t
    print(f"closest_hit sort_rays=False (presorted): "
          f"{timeit(nosort, scene, o_s, d_s)*1e3:.1f} ms")

    # stream kernel only (cached layouts), presorted
    @jax.jit
    def kern(b, o, d, tm):
        return traverse._kernel_traverse_stream(b, o, d, tm, "cone")
    print(f"kernel only: {timeit(kern, bvh, o_s, d_s, t_max)*1e3:.1f} ms")

    # winner recompute + assemble on top of kernel
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod

    @jax.jit
    def kern_recompute(sc, o, d, tm):
        b = sc.cone_bvh
        _, row, found = traverse._kernel_traverse_stream(b, o, d, tm, "cone")
        row = jnp.maximum(row, 0)
        t_re = bvh_mod.cone_leaf_rows(sc.cones)(o, d, row[:, None], 1e-4,
                                                tm)[:, 0]
        return jnp.where(found, t_re, 3.4e38)
    print(f"kernel+recompute: {timeit(kern_recompute, scene, o_s, d_s, t_max)*1e3:.1f} ms")

    # tri dense grid share (1536 tris, no BVH)
    from ba_pathtracing_fur_tpu.ops import intersect as isect

    @jax.jit
    def trigrid(sc, o, d, tm):
        tg, _, _, _ = isect.triangle_hit_grid(o, d, sc.tris, 1e-4,
                                              tm[:, None])
        row = jnp.argmin(tg, axis=-1).astype(jnp.int32)
        return jnp.take_along_axis(tg, row[:, None], axis=-1)[:, 0]
    print(f"tri dense grid ({int(scene.tris.count)} tris): "
          f"{timeit(trigrid, scene, o_s, d_s, t_max)*1e3:.1f} ms")


if __name__ == "__main__" and not os.environ.get("DEV_EXTRA"):
    main()


def extra():
    """Isolated pieces: recompute alone, assemble alone."""
    import argparse
    fibers, res = 1_000_000, 1024
    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(res, res), n_fibers=fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    r = res * res
    px, py = pixel_grid((res, res))
    jitter = jax.random.uniform(jax.random.key(0), (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((r,), 3.4e38)
    rows = jax.random.randint(jax.random.key(1), (r,), 0,
                              scene.cones.count).astype(jnp.int32)

    @jax.jit
    def recompute(sc, o, d, rows, tm):
        return bvh_mod.cone_leaf_rows(sc.cones)(o, d, rows[:, None], 1e-4,
                                                tm)[:, 0]
    print(f"recompute alone (random rows): "
          f"{timeit(recompute, scene, o, d, rows, t_max)*1e3:.1f} ms")

    @jax.jit
    def assemble(sc, o, d, t_tri, tri_row, t_cone, cone_row, tm):
        return traverse._assemble_hit(o, d, sc, t_tri, tri_row, t_cone,
                                      cone_row, tm).t
    t_tri = jnp.full((r,), 3.4e38)
    tri_row = jnp.zeros((r,), jnp.int32)
    t_cone = jnp.full((r,), 1.0)
    print(f"assemble alone: "
          f"{timeit(assemble, scene, o, d, t_tri, tri_row, t_cone, rows, t_max)*1e3:.1f} ms")


if __name__ == "__main__" and os.environ.get("DEV_EXTRA"):
    extra()
