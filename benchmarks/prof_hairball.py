"""Micro-bench for hair-ball traversal — the round-4 iteration harness.

Times closest_hit / any_hit on the hair-ball cone BVH in isolation
(coherent primary rays and incoherent scrambled rays), so kernel work can
be A/B'd in seconds instead of full 37 s bench renders. Scale is set by
--fibers (200k fibers = 1.8M cones ~ 115 MB packed: exceeds the 8 MB VMEM
budget, so it exercises the same XLA hierarchical path as the 1M-fiber
flagship).

Usage: python benchmarks/prof_hairball.py [--fibers 200000] [--res 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile
    # materializing sync (tunneled runtimes return early from block_until_ready)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--mode", default="auto",
                    help="auto|xla|stream — traversal policy override")
    args = ap.parse_args()

    from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(args.res, args.res),
                                       n_fibers=args.fibers)
    t0 = time.perf_counter()
    scene = traverse.attach_bvh(scene, method="median")
    jax.block_until_ready(scene.cone_bvh.prim_hbm if scene.cone_bvh.packed is None else scene.cone_bvh.packed)
    build_s = time.perf_counter() - t0
    scene = to_device(scene)
    bvh = scene.cone_bvh
    print(f"cones={scene.cones.count} n_leaves={bvh.n_leaves} "
          f"leaf={bvh.leaf_size} fanout={bvh.fanout} "
          f"packed={np.prod((bvh.prim_hbm if bvh.packed is None else bvh.packed).shape) * 4 / 1e6:.0f}MB "
          f"build={build_s:.1f}s")

    r = args.res * args.res
    key = jax.random.key(0)
    px, py = pixel_grid((args.res, args.res))
    jitter = jax.random.uniform(key, (r, 2))
    o, d = rays_from_pixels(camera, px, py, jitter)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # incoherent set: scramble ray order + random directions from hit points
    kp, kd = jax.random.split(key)
    perm = jax.random.permutation(kp, r)
    d_inc = jax.random.normal(kd, (r, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    o_inc = o[perm]

    chunk = args.chunk

    # scene must be an ARGUMENT, not a closure: closed-over packs embed as
    # HLO constants and a 604 MB constant exceeds the tunnel's compile-RPC
    # size limit (HTTP 413)
    @jax.jit
    def closest(sc, o, d):
        h = traverse.closest_hit(o, d, sc, chunk=chunk)
        return h.t, h.valid

    @jax.jit
    def anyh(sc, o, d):
        return traverse.any_hit(o, d, sc, t_max=jnp.full((r,), 2.0),
                                chunk=chunk)

    res = {"cones": int(scene.cones.count), "build_s": round(build_s, 2),
           "chunk": chunk, "rays": r}
    for name, fn, aa in [("closest_coherent", closest, (scene, o, d)),
                         ("closest_incoherent", closest, (scene, o_inc, d_inc)),
                         ("any_hit_coherent", anyh, (scene, o, d))]:
        dt, out = measure(fn, *aa)
        hits = (np.asarray(out[1]).mean() if name.startswith("closest")
                else np.asarray(out).mean())
        res[name] = {"s": round(dt, 4), "rays_per_s": round(r / dt),
                     "hit_frac": round(float(hits), 3)}
        print(f"{name}: {dt*1e3:.1f} ms = {r/dt/1e6:.2f}M rays/s "
              f"(hit {hits:.2f})")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
