"""A/B the _SORT_OCTANT traversal sort-key variants on the bench hair-ball
config (fused, non-joint)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                             on_device=True)
hint = dict(builtins.LAST_HAIRBALL_GEN)
sc = to_device(traverse.attach_bvh(sc, method="median",
                                   cone_split_hint=hint))
rays = res * res * spp * 4
cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024, compact=False,
                   fused_shading=True)
ref = None
for mode in (None, "high", "low"):
    traverse._SORT_OCTANT = mode
    jax.clear_caches()  # the knob is read at trace time
    fn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
    img = fn(sc, jax.random.key(0))
    jax.block_until_ready(img)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        img = fn(sc, jax.random.key(0))
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)
    img = np.asarray(img)
    if ref is None:
        ref = img
    d = np.abs(ref - img).mean()
    print(f"octant={mode!s:5}  {best*1e3:8.1f} ms   "
          f"{rays/best/1e6:.2f}M rays/s   mean diff vs None {d:.2e}",
          flush=True)
traverse._SORT_OCTANT = None
