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

# attribute device time to pipeline phases: wrap the hot entry points in
# named scopes so fusion names in the trace carry the phase prefix
from ba_pathtracing_fur_tpu.models import bsdf as bsdf_mod, fur, shading
from ba_pathtracing_fur_tpu.core import rng
from ba_pathtracing_fur_tpu.ops import compact as compact_mod


def scoped(mod, name, scope):
    fn = getattr(mod, name)
    setattr(mod, name, jax.named_scope(scope)(fn))


scoped(traverse, "closest_hit", "PH_closest")
scoped(traverse, "any_hit", "PH_anyhit")
scoped(shading, "calc_direct_light_mis", "PH_nee")
scoped(shading, "calc_direct_light", "PH_nee")
scoped(bsdf_mod, "sample_surface", "PH_bsdf_surface")
scoped(bsdf_mod, "gather_materials", "PH_materials")
scoped(fur, "sample_hair", "PH_bsdf_hair")
scoped(rng, "bounce_uniform", "PH_rng")
scoped(compact_mod, "compaction_permutation", "PH_compact")
scoped(compact_mod, "gather_pytree", "PH_compact_gather")

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers)
sc = to_device(traverse.attach_bvh(sc, method="median"))
cfg = RenderConfig(depth=4, spp=1, ray_chunk=1024, compact=True)
pfn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
summary = profiling.profile_call(pfn, sc, jax.random.key(0),
                                 logdir="/tmp/hb_profile")
import collections
import glob
import gzip

f = sorted(glob.glob("/tmp/hb_profile/plugins/profile/*/*.trace.json.gz"))[-1]
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
        if name.startswith(("jit", "while")):  # containers, not leaves
            continue
        long = e.get("args", {}).get("long_name", "") or name
        total += e["dur"]
        key = "other"
        for tag in ("PH_closest", "PH_anyhit", "PH_nee", "PH_bsdf_surface",
                    "PH_bsdf_hair", "PH_materials", "PH_rng", "PH_compact",
                    "PH_compact_gather", "traverse_stream"):
            if tag in long or tag in name:
                key = tag
                break
        phase[key] += e["dur"]
        if key == "other":
            opname[name] += e["dur"]
for k, v in phase.most_common():
    print(f"{v/1e3:10.1f} ms  {100*v/max(total,1):5.1f}%  {k}")
print("-- top unattributed ops --")
for k, v in opname.most_common(12):
    print(f"{v/1e3:10.1f} ms  {k[:80]}")
print(json.dumps({"wall_s": summary["wall_s"]}))
