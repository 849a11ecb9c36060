"""A/B intersection benchmark: jnp brute force vs Pallas streaming vs LBVH.

Decides the reference's accel-swap question (Demo/main.cpp:94-127) with
data on this hardware (VERDICT r1 weak #3): for each scene size, time
`closest_hit` through the three backends on the same ray batch and report
rays/s. Writes out/AB_INTERSECT.json and prints one JSON line; the result
feeds the HTML report and the keep/delete decision on the Pallas
brute-force switch (ops/traverse.py).

Usage:  python benchmarks/ab_intersect.py [--rays 65536] [--repeats 3]
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


def _scenes():
    from ba_pathtracing_fur_tpu.scene.builtins import (
        cornell_box, hair_ball, tri_terrain)
    yield "cornell_36tri", cornell_box(resolution=(64, 64))
    yield "terrain_100k_tri", tri_terrain(resolution=(64, 64), n_tris=100_000)
    yield "hair_64k_cone", hair_ball(resolution=(64, 64), n_fibers=8_000)


def _rays(scene, camera, n):
    from ba_pathtracing_fur_tpu.core import camera as cam
    key = jax.random.key(7)
    w, h = camera.resolution
    ids = jax.random.randint(key, (n,), 0, w * h)
    px = (ids % w).astype(jnp.float32)
    py = (ids // w).astype(jnp.float32)
    jitter = jax.random.uniform(jax.random.key(3), (n, 2))
    o, d = cam.rays_from_pixels(camera, px, py, jitter)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _time(fn, repeats):
    out = jax.block_until_ready(fn())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=65536)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.ops import bruteforce

    rows = []
    for name, (scene, camera) in _scenes():
        o, d = _rays(scene, camera, args.rays)
        entry = {"scene": name,
                 "tris": int(scene.tris.count), "cones": int(scene.cones.count),
                 "rays": args.rays}

        wall, ref = _time(jax.jit(
            lambda o=o, d=d, s=scene: bruteforce.closest_hit(o, d, s).t),
            args.repeats)
        entry["bruteforce_rays_per_s"] = round(args.rays / wall, 1)

        wall, tp = _time(jax.jit(
            lambda o=o, d=d, s=scene: traverse.closest_hit_pallas(o, d, s).t),
            args.repeats)
        entry["pallas_rays_per_s"] = round(args.rays / wall, 1)
        entry["pallas_matches"] = bool(
            jnp.allclose(jnp.where(jnp.isfinite(ref), ref, 0.0),
                         jnp.where(jnp.isfinite(tp), tp, 0.0),
                         rtol=1e-4, atol=1e-4))

        bscene = traverse.attach_bvh(scene, min_prims=1)
        wall, tb = _time(jax.jit(
            lambda o=o, d=d, s=bscene: traverse.closest_hit_bvh(o, d, s).t),
            args.repeats)
        entry["bvh_rays_per_s"] = round(args.rays / wall, 1)
        entry["bvh_matches"] = bool(
            jnp.allclose(jnp.where(jnp.isfinite(ref), ref, 0.0),
                         jnp.where(jnp.isfinite(tb), tb, 0.0),
                         rtol=1e-4, atol=1e-4))

        winner = max(("bruteforce", "pallas", "bvh"),
                     key=lambda k: entry[f"{k}_rays_per_s"])
        entry["winner"] = winner
        rows.append(entry)
        print(f"# {name}: bf={entry['bruteforce_rays_per_s']/1e6:.2f}M "
              f"pallas={entry['pallas_rays_per_s']/1e6:.2f}M "
              f"bvh={entry['bvh_rays_per_s']/1e6:.2f}M -> {winner}",
              file=sys.stderr)

    # Accel-method cost table ("four clusterings, one traversal",
    # ops/traverse.py registry): build + traverse each ACCEL_BUILDERS method
    # on the 100k-tri scene, with debug_info structure stats.
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod
    methods = []
    scene, camera = dict(_scenes())["terrain_100k_tri"]
    o, d = _rays(scene, camera, args.rays)
    for method in traverse.ACCEL_BUILDERS:
        t0 = time.perf_counter()
        ms = traverse.attach_bvh(scene, method=method, min_prims=1)
        build_s = time.perf_counter() - t0
        wall, tm = _time(jax.jit(
            lambda o=o, d=d, s=ms: traverse.closest_hit_bvh(o, d, s).t),
            args.repeats)
        info = {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in bvh_mod.debug_info(ms.tri_bvh).items()}
        methods.append({"method": method, "build_s": round(build_s, 3),
                        "rays_per_s": round(args.rays / wall, 1), **info})
        print(f"# accel {method}: build={build_s:.2f}s "
              f"{args.rays / wall / 1e6:.2f}M rays/s", file=sys.stderr)

    result = {"metric": "ab_intersect", "device": jax.devices()[0].device_kind,
              "rows": rows, "accel_methods": methods}
    os.makedirs("out", exist_ok=True)
    with open("out/AB_INTERSECT.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
