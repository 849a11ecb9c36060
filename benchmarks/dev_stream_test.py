"""Dev harness: correctness + speed of the streaming kernel vs XLA traversal."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=20_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--order", default="scan",
                    choices=["scan", "block16", "shuffle"])
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--mxu", action="store_true")
    args = ap.parse_args()

    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.ops.pallas import stream
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(args.res, args.res),
                                       n_fibers=args.fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    bvh = scene.cone_bvh
    print(f"cones={scene.cones.count} C={bvh.n_leaves} k={bvh.leaf_size} "
          f"f={bvh.fanout} eligible={stream.stream_eligible(bvh)}")

    r = args.res * args.res
    px, py = pixel_grid((args.res, args.res))
    if args.order == "block16":
        bx = px.astype(jnp.int32) // 16
        by = py.astype(jnp.int32) // 16
        key_order = ((by * (args.res // 16) + bx) * 256
                     + (py.astype(jnp.int32) % 16) * 16
                     + px.astype(jnp.int32) % 16)
        ordr = jnp.argsort(key_order)
        px, py = px[ordr], py[ordr]
    elif args.order == "shuffle":
        ordr = jax.random.permutation(jax.random.key(7), r)
        px, py = px[ordr], py[ordr]
    jitter = jax.random.uniform(jax.random.key(0), (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((r,), 3.4e38)

    if bvh.prim_hbm is not None:
        sb, cb, prim = bvh.sboxes, bvh.cboxes_sf, bvh.prim_hbm
    else:
        sb = stream.pack_super_boxes(bvh)
        cb = stream.pack_child_boxes(bvh)
        prim, _ = stream.pack_prim_hbm(bvh, "cone")
    print(f"sboxes {sb.shape} cboxes {cb.shape} prim {prim.shape}")

    t0 = time.perf_counter()
    ts, row_s, found_s = jax.block_until_ready(stream.traverse_stream(
        o, d, sb, cb, prim, t_max, kind="cone", fanout=bvh.fanout,
        leaf_k=bvh.leaf_size, ray_tile=args.tile, mxu=args.mxu))
    print(f"stream compile+run {time.perf_counter()-t0:.1f}s")

    # XLA reference needs packed (dropped on TPU; rebuild from prim_hbm)
    bvh_x = bvh if bvh.packed is not None else bvh.replace(
        packed=prim[:, :, :bvh.leaf_size])
    if not args.skip_check:
        tx, row_x, found_x = bvh_mod.traverse(
            bvh_x, o, d, bvh_mod.cone_leaf_packed(bvh_x), 1e-4, t_max,
            chunk=16384)
        found_s, found_x = np.asarray(found_s), np.asarray(found_x)
        row_s, row_x = np.asarray(row_s), np.asarray(row_x)
        ts, tx = np.asarray(ts), np.asarray(tx)
        print(f"found match: {(found_s == found_x).mean():.6f} "
              f"(stream {found_s.mean():.3f} xla {found_x.mean():.3f})")
        both = found_s & found_x
        print(f"row match on both-found: "
              f"{(row_s[both] == row_x[both]).mean():.6f}")
        bad = both & (row_s != row_x)
        if bad.any():
            i = np.where(bad)[0][:5]
            print("mismatch rows:",
                  list(zip(i, row_s[i], row_x[i], ts[i], tx[i])))
            dt = np.abs(ts[both] - tx[both])
            print(f"t max diff on both: {dt.max():.3e}")

    # timing
    def run_stream():
        out = stream.traverse_stream(o, d, sb, cb, prim, t_max, kind="cone",
                                     fanout=bvh.fanout, leaf_k=bvh.leaf_size,
                                     ray_tile=args.tile, mxu=args.mxu)
        np.asarray(out[0])[:1]

    def run_xla():
        out = bvh_mod.traverse(bvh_x, o, d, bvh_mod.cone_leaf_packed(bvh_x),
                               1e-4, t_max, chunk=1024)
        np.asarray(out[0])[:1]

    run_xla()
    for name, fn in [("stream", run_stream), ("xla", run_xla)]:
        best = min(_time(fn) for _ in range(args.reps))
        print(f"{name}: {best*1e3:.1f} ms = {r/best/1e6:.2f}M rays/s")


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
