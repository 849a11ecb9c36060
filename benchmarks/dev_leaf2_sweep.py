"""Second-stage sweep at leaf 288: fanout x ray-tile for the streaming
kernel (follow-up to dev_leaf_sweep.py)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.ops.pallas import stream as pstream
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2

rays = res * res * spp * 4
cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024, compact=False,
                   fused_shading=True)
orig_stream = pstream.traverse_stream

for leaf, fan, tile in ((288, 64, 256), (288, 128, 128), (288, 32, 128)):
    sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                                 on_device=True)
    hint = dict(builtins.LAST_HAIRBALL_GEN)
    t0 = time.perf_counter()
    sc = to_device(traverse.attach_bvh(sc, method="median",
                                       cone_split_hint=hint,
                                       leaf_size=leaf, fanout=fan))
    b = sc.cone_bvh
    jax.block_until_ready(b.prim_hbm if b.packed is None else b.packed)
    build = time.perf_counter() - t0
    pstream.traverse_stream = functools.partial(orig_stream, ray_tile=tile)
    try:
        fn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
        img = fn(sc, jax.random.key(0))
        jax.block_until_ready(img)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            img = fn(sc, jax.random.key(0))
            jax.block_until_ready(img)
            best = min(best, time.perf_counter() - t0)
    finally:
        pstream.traverse_stream = orig_stream
    jax.clear_caches()
    print(f"leaf={leaf} fanout={fan:4d} tile={tile:4d} build={build:5.1f}s  "
          f"{best*1e3:8.1f} ms  {rays/best/1e6:.2f}M rays/s  "
          f"finite={bool(np.isfinite(np.asarray(img)).all())}", flush=True)
