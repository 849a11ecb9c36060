"""Headline benchmark: rays/s on BASELINE.json config 1 (Cornell 256^2,
64 spp, 4 bounces).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): its README defers to a
dead wiki. `vs_baseline` is therefore measured against a nominal
KIRK-class CPU path tracer throughput of 5e6 rays/s (single node,
thread-pooled, BVH — the workload class of Demo/main.cpp defaults), which
is the figure this project's self-generated baseline replaces.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_CPU_RAYS_PER_S = 5.0e6


def main() -> None:
    import jax

    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.scene.builtins import cornell_box

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    res = (64, 64) if smoke else (256, 256)
    spp = 4 if smoke else 64
    depth = 4

    scene, camera = cornell_box(resolution=res)
    cfg = RenderConfig(depth=depth, spp=spp, ray_chunk=res[0] * res[1])
    key = jax.random.key(0)

    # compile + warm-up
    img = render_image(scene, camera, key, cfg)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    img = render_image(scene, camera, key, cfg)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    # path segments traced: one scene-intersection per pixel per sample per
    # bounce (shadow rays excluded — conservative).
    rays = res[0] * res[1] * spp * depth
    rays_per_s = rays / dt

    print(json.dumps({
        "metric": "cornell_256_64spp_rays_per_s" if not smoke else "cornell_smoke_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_CPU_RAYS_PER_S, 3),
    }))
    print(f"# wall={dt:.3f}s device={jax.devices()[0].platform} "
          f"res={res} spp={spp} depth={depth}", file=sys.stderr)


if __name__ == "__main__":
    main()
