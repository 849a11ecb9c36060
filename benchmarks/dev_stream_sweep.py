"""Dev harness 2: one-process sweep of streaming-kernel configs, including
realistic bounce-ray wavefronts (origins on the fur surface, random
directions) under different sort keys."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.ops.bvh import morton_codes
    from ba_pathtracing_fur_tpu.ops.pallas import stream
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(args.res, args.res),
                                       n_fibers=args.fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    bvh = scene.cone_bvh
    print(f"cones={scene.cones.count} C={bvh.n_leaves} k={bvh.leaf_size} "
          f"f={bvh.fanout}")

    r = args.res * args.res
    px, py = pixel_grid((args.res, args.res))
    bx = px.astype(jnp.int32) // 16
    by = py.astype(jnp.int32) // 16
    key_order = ((by * (args.res // 16) + bx) * 256
                 + (py.astype(jnp.int32) % 16) * 16
                 + px.astype(jnp.int32) % 16)
    ordr = jnp.argsort(key_order)
    px, py = px[ordr], py[ordr]
    jitter = jax.random.uniform(jax.random.key(0), (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((r,), 3.4e38)

    sb = stream.pack_super_boxes(bvh)
    cb = stream.pack_child_boxes(bvh)
    prim, _ = stream.pack_prim_hbm(bvh, "cone")

    def run(o_, d_, tm_, tile):
        out = stream.traverse_stream(o_, d_, sb, cb, prim, tm_, kind="cone",
                                     fanout=bvh.fanout, leaf_k=bvh.leaf_size,
                                     ray_tile=tile)
        np.asarray(out[0])[:1]
        return out

    # --- primary rays (block16 order), tile sweep ---
    for tile in (64, 128, 256):
        dt = timeit(lambda: run(o, d, t_max, tile))
        print(f"primary block16 tile={tile}: {dt*1e3:.1f} ms "
              f"= {r/dt/1e6:.2f}M rays/s")

    # --- unified entry-point morton key on SHUFFLED primaries ---
    lo_r = bvh.bmin[0] - 1e-3
    hi_r = bvh.bmax[0] + 1e-3

    def entry_key(o_, d_):
        inv = 1.0 / jnp.where(jnp.abs(d_) < 1e-20, 1e-20, d_)
        t0 = (lo_r[None] - o_) * inv
        t1 = (hi_r[None] - o_) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)
        p = o_ + jnp.maximum(tn, 0.0)[:, None] * d_
        p = jnp.clip(p, lo_r[None], hi_r[None])
        return morton_codes(p, lo_r, hi_r).astype(jnp.int32)

    pshuf = jax.random.permutation(jax.random.key(11), r)
    o_ps, d_ps = o[pshuf], d[pshuf]
    ek = entry_key(o_ps, d_ps)
    sperm = jnp.argsort(ek)
    o_pe, d_pe = o_ps[sperm], d_ps[sperm]
    jax.block_until_ready(o_pe)
    for tile in (128, 256):
        dt = timeit(lambda: run(o_pe, d_pe, t_max, tile))
        print(f"primary entry-morton tile={tile}: {dt*1e3:.1f} ms "
              f"= {r/dt/1e6:.2f}M rays/s")

    # --- realistic bounce wavefront: origins at primary hit points,
    #     random cosine-ish directions ---
    h = traverse.closest_hit(o, d, scene, chunk=1024)
    pos = np.asarray(h.position)
    valid = np.asarray(h.valid)
    kd = jax.random.key(3)
    dirs = jax.random.normal(kd, (r, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    o_b = jnp.asarray(pos)
    d_b = jnp.asarray(dirs)
    tm_b = jnp.where(jnp.asarray(valid), 3.4e38, 0.0)  # dead where no hit
    # shuffle to destroy the image-order coherence (worst case wavefront)
    perm = jax.random.permutation(jax.random.key(9), r)
    o_s, d_s, tm_s = o_b[perm], d_b[perm], tm_b[perm]

    lo = jnp.min(bvh.bmin[0]) * jnp.ones((3,))
    hi = jnp.max(bvh.bmax[0]) * jnp.ones((3,))
    lo3 = bvh.bmin[0] - 1e-3
    hi3 = bvh.bmax[0] + 1e-3

    def sort_and_run(keyfn, name, tile):
        key = keyfn(o_s, d_s)
        key = jnp.where(tm_s <= 0.0, jnp.iinfo(jnp.int32).max, key)
        sperm = jnp.argsort(key)
        o2, d2, tm2 = o_s[sperm], d_s[sperm], tm_s[sperm]
        jax.block_until_ready(o2)
        dt = timeit(lambda: run(o2, d2, tm2, tile))
        print(f"bounce {name} tile={tile}: {dt*1e3:.1f} ms "
              f"= {r/dt/1e6:.2f}M rays/s")

    def k_octant(o_, d_):
        return ((d_[:, 0] < 0).astype(jnp.int32) * 4
                + (d_[:, 1] < 0).astype(jnp.int32) * 2
                + (d_[:, 2] < 0).astype(jnp.int32))

    def k_morton(o_, d_):
        return morton_codes(o_, lo3, hi3).astype(jnp.int32)

    def k_morton_oct(o_, d_):
        return (morton_codes(o_, lo3, hi3).astype(jnp.int32) // 8) * 8 \
            + k_octant(o_, d_)

    def k_oct_morton(o_, d_):
        return k_octant(o_, d_) * (1 << 27) \
            + (morton_codes(o_, lo3, hi3) >> 3).astype(jnp.int32)

    for name, kf in [("morton", k_morton)]:
        for tile in (128,):
            sort_and_run(kf, name, tile)

    # XLA baseline on the same bounce wavefront (its own octant sort)
    def run_xla():
        out = bvh_mod.traverse(bvh, o_s, d_s, bvh_mod.cone_leaf_packed(bvh),
                               1e-4, tm_s, chunk=1024)
        np.asarray(out[0])[:1]
    dt = timeit(run_xla)
    print(f"bounce XLA chunk=1024 (unsorted): {dt*1e3:.1f} ms "
          f"= {r/dt/1e6:.2f}M rays/s")


if __name__ == "__main__":
    main()
