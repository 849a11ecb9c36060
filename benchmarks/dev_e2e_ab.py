"""A/B of end-to-end hair-ball render configs (compact x spp_batch)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spp = 4

    from ba_pathtracing_fur_tpu.models.pathtracer import (RenderConfig,
                                                          render_image)
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    scene, camera = builtins.hair_ball(resolution=(res, res),
                                       n_fibers=fibers)
    scene = traverse.attach_bvh(scene, method="median")
    scene = to_device(scene)
    rays = res * res * spp * 4

    for compact in (True, False):
        for batch in (1, 2, 4):
            cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024,
                               compact=compact, spp_batch=batch)
            fn = jax.jit(lambda s, k, c=cfg: render_image(s, camera, k, c))
            key = jax.random.key(0)
            try:
                img = fn(scene, key)
                np.asarray(img)[:1]
                t0 = time.perf_counter()
                img = fn(scene, key)
                np.asarray(img)[:1]
                dt = time.perf_counter() - t0
                print(f"compact={compact} batch={batch}: {dt:.2f}s "
                      f"= {rays/dt/1e6:.2f}M rays/s", flush=True)
            except Exception as e:
                print(f"compact={compact} batch={batch}: FAILED "
                      f"{type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
