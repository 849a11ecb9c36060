"""Phase-attributed trace of the FUSED hair-ball bench config.

Usage: python benchmarks/dev_profile_fused.py [fibers] [res] [spp]
Matches bench.py's hair_ball row (fused_shading=True, compact=False,
chunk=1024, on-device generation) and attributes device time to:
closest-hit streaming traversal, shadow any-hit, the fused shade kernel,
material gather, RNG, and the residue.
"""
from __future__ import annotations

import collections
import glob
import gzip
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

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from ba_pathtracing_fur_tpu.models import bsdf as bsdf_mod
from ba_pathtracing_fur_tpu.core import rng
from ba_pathtracing_fur_tpu.ops.pallas import shade as pshade


def scoped(mod, name, scope):
    fn = getattr(mod, name)
    setattr(mod, name, jax.named_scope(scope)(fn))


scoped(traverse, "closest_hit", "PH_closest")
scoped(traverse, "any_hit", "PH_anyhit")
scoped(bsdf_mod, "gather_materials", "PH_materials")
scoped(rng, "bounce_uniform", "PH_rng")
scoped(pshade, "shade_bounce", "PH_shadekernel")

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                             on_device=True)
hint = dict(builtins.LAST_HAIRBALL_GEN)
sc = to_device(traverse.attach_bvh(sc, method="median",
                                   cone_split_hint=hint))
cfg = RenderConfig(depth=4, spp=spp, ray_chunk=1024, compact=False,
                   fused_shading=True)
pfn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
summary = profiling.profile_call(pfn, sc, jax.random.key(0),
                                 logdir="/tmp/hb_profile_fused")

f = sorted(glob.glob(
    "/tmp/hb_profile_fused/plugins/profile/*/*.trace.json.gz"))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
pidname = {e.get("pid"): e.get("args", {}).get("name", "")
           for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
phase = collections.Counter()
opname = collections.Counter()
total = 0
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        if "TPU" not in pidname.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith(("jit", "while")):
            continue
        long = e.get("args", {}).get("long_name", "") or name
        total += e["dur"]
        key = "other"
        for tag in ("stream_closest", "stream_any", "PH_shadekernel",
                    "PH_closest", "PH_anyhit",
                    "PH_materials", "PH_rng"):
            if tag in long or tag in name:
                key = tag
                break
        if key == "other" and ("traverse_stream" in long
                               or "traverse_stream" in name):
            key = "stream_unattr"
        phase[key] += e["dur"]
        if key == "other":
            opname[name] += e["dur"]
for k, v in phase.most_common():
    print(f"{v/1e3:10.1f} ms  {100*v/max(total,1):5.1f}%  {k}")
print("-- top unattributed ops --")
longs = {}
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        nm = e["name"]
        if nm not in longs:
            ln = e.get("args", {}).get("long_name", "")
            if ln:
                longs[nm] = ln
for k, v in opname.most_common(15):
    print(f"{v/1e3:10.1f} ms  {k[:60]}  || {longs.get(k, '')[:200]}")
rays = res * res * spp * 4
print(json.dumps({"wall_s": summary["wall_s"],
                  "rays_per_s": round(rays / summary["wall_s"])}))
