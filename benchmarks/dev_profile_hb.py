"""Capture a jax.profiler trace of one hair-ball render and print the op table."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device
from ba_pathtracing_fur_tpu.utils import profiling

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 512

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers)
sc = to_device(traverse.attach_bvh(sc, method="median"))
cfg = RenderConfig(depth=4, spp=1, ray_chunk=1024, compact=True)
pfn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
summary = profiling.profile_call(pfn, sc, jax.random.key(0),
                                 logdir="/tmp/hb_profile")
rows = [r for r in summary["top_ops_by_total_us"]
        if not r["op"].startswith("$")][:25]
for r in rows:
    print(f"{r['total_us']/1e3:10.1f} ms  x{r['count']:<5} {r['pct_of_traced']:5.1f}%  {r['op'][:90]}")
print(json.dumps({"wall_s": summary["wall_s"]}))
