"""Leaf-size sweep for the DMA-streaming kernel at hair-ball scale.

CONE_LEAF_TARGET=128 came from the r3 XLA-gather sweep (cost ~ gathered
bytes -> small leaves win). The streaming kernel's block test is a
vectorized [T, K_pad] pass per visited child, so its economics differ:
K_pad rounds up to 128 lanes (k=72 today -> 44% inert columns) and bigger
leaves mean FEWER children (fewer schedule rounds + DMAs) at near-equal
per-column cost. Sweep k over exact divisors of the 9.4M-cone pack.

Usage: python benchmarks/dev_leaf_sweep.py [fibers] [res] [spp]
"""
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
leaves = ([int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4
          else [None, 144, 288, 576])

rays = res * res * spp * 4
cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024, compact=False,
                   fused_shading=True)
ref = None
for ls in leaves:
    sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                                 on_device=True)
    hint = dict(builtins.LAST_HAIRBALL_GEN)
    t0 = time.perf_counter()
    sc = to_device(traverse.attach_bvh(sc, method="median",
                                       cone_split_hint=hint,
                                       leaf_size=ls))
    b = sc.cone_bvh
    jax.block_until_ready(b.prim_hbm if b.packed is None else b.packed)
    build = time.perf_counter() - t0
    c, w, kp = b.prim_hbm.shape
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
    print(f"leaf={ls!s:5} k={b.leaf_size:4d} kpad={kp:4d} children={c:6d} "
          f"fanout={b.fanout:4d} build={build:5.1f}s  {best*1e3:8.1f} ms  "
          f"{rays/best/1e6:.2f}M rays/s  mdiff={d:.2e}", flush=True)
