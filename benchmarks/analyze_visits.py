"""Visit-count analysis for the streaming-kernel design (round 4).

For a sample of ray tiles, counts how many super-clusters and leaf clusters
a min-extraction traversal would visit per RAY and per TILE (the union —
what a shared-schedule Pallas kernel pays). Decides DMA bytes / compute
waste for the two-level streaming kernel.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--tiles", type=int, default=24)
    ap.add_argument("--order", default="scan", choices=["scan", "block16"])
    args = ap.parse_args()

    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(args.res, args.res),
                                       n_fibers=args.fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    bvh = scene.cone_bvh
    C, k, f = bvh.n_leaves, bvh.leaf_size, bvh.fanout
    S = C // f
    print(f"C={C} k={k} f={f} S={S}")

    r = args.res * args.res
    px, py = pixel_grid((args.res, args.res))
    if args.order == "block16":
        # 16x16 pixel blocks, block-major (what a tiled ray generator
        # would emit): reorder pixels so consecutive rays are a square
        bx = (px.astype(jnp.int32) // 16)
        by = (py.astype(jnp.int32) // 16)
        key_order = ((by * (args.res // 16) + bx) * 256
                     + (py.astype(jnp.int32) % 16) * 16
                     + px.astype(jnp.int32) % 16)
        order = jnp.argsort(key_order)
        px, py = px[order], py[order]
    jitter = jax.random.uniform(jax.random.key(0), (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # ground-truth t_best per ray (XLA traversal)
    h = traverse.closest_hit(o, d, scene, chunk=1024)
    t_best = jnp.where(h.valid, h.t, 3.4e38)

    leaf_base = C - 1
    sup_base = S - 1
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    def slab(o, inv, bmin, bmax, cap):
        tn = jnp.full((o.shape[0], bmin.shape[0]), -3.4e38)
        tf = jnp.full((o.shape[0], bmin.shape[0]), 3.4e38)
        for a in range(3):
            t0 = (bmin[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]
            t1 = (bmax[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return (tn <= tf) & (tf >= 0.0) & (tn < cap[:, None])

    # sample tiles spread over the image
    T = args.tile
    n_tiles = args.tiles
    step = max(r // T // n_tiles, 1)
    sup_bmin = bvh.bmin[sup_base:sup_base + S]
    sup_bmax = bvh.bmax[sup_base:sup_base + S]
    leaf_bmin = bvh.bmin[leaf_base:leaf_base + C]
    leaf_bmax = bvh.bmax[leaf_base:leaf_base + C]

    per_ray_s, per_tile_s, per_ray_c, per_tile_c = [], [], [], []
    for ti in range(n_tiles):
        s0 = (ti * step) * T
        sl = slice(s0, s0 + T)
        ov, iv, cap = o[sl], inv[sl], t_best[sl]
        vs = slab(ov, iv, sup_bmin, sup_bmax, cap)     # [T, S] visited supers
        vc = slab(ov, iv, leaf_bmin, leaf_bmax, cap)   # [T, C] visited leaves
        # a leaf is only visited if its super is visited by that ray
        vc = vc & jnp.repeat(vs, f, axis=1)
        per_ray_s.append(np.asarray(vs.sum(1)))
        per_tile_s.append(int(vs.any(0).sum()))
        per_ray_c.append(np.asarray(vc.sum(1)))
        per_tile_c.append(int(vc.any(0).sum()))

    prs = np.concatenate(per_ray_s)
    prc = np.concatenate(per_ray_c)
    print(f"order={args.order} tile={T}")
    print(f"per-ray supers: mean {prs.mean():.1f} p50 {np.percentile(prs,50):.0f} p95 {np.percentile(prs,95):.0f} max {prs.max()}")
    print(f"per-ray leaves: mean {prc.mean():.1f} p50 {np.percentile(prc,50):.0f} p95 {np.percentile(prc,95):.0f} max {prc.max()}")
    print(f"per-tile union supers: mean {np.mean(per_tile_s):.1f} max {max(per_tile_s)} (of {S})")
    print(f"per-tile union leaves: mean {np.mean(per_tile_c):.1f} max {max(per_tile_c)} (of {C})")


if __name__ == "__main__":
    main()
