"""Pallas TPU kernel: culled-cluster BVH traversal with VMEM-resident scene.

The XLA traversal (ops/bvh.py `traverse`) is HBM-bound: every lock-step
round gathers [R, W*K] leaf geometry from HBM (~15-38 MB/round). For scenes
whose PACKED leaf geometry fits in VMEM (~8 MB: 100k-triangle or
50k-cone class — the BASELINE config-3/4 workloads), this kernel keeps the
entire scene + the per-tile entry grid on chip and traverses with ZERO HBM
traffic after the initial tile load:

  * grid = ray tiles of T rays; each program loads o/d [T,3] and has the
    whole cluster-box table [6, C] and packed geometry [W, C*K] resident
    (broadcast to every program — loaded into VMEM once per program).
  * phase 1: dense slab entry grid tn [T, C] (VPU broadcast math).
  * rounds (lax.while_loop): the tile takes the SHARED nearest useful
    cluster j = argmin over per-cluster min of the t_best-masked entry
    grid (the packet/broadcast schedule — on-chip, the [T, C] masking
    passes that sank the XLA prototype cost ~µs here), dynamic-slices its
    [W, K] geometry block from VMEM, intersects all T rays against it, and
    masks column j. Terminates when no ray's remaining entry beats its
    best hit (identical pruning rule to the XLA path ⇒ identical results;
    only the visit schedule differs, and mins are order-invariant).

Same Hit contract as ops/bvh.traverse: (t_best, row_best, found). The
any-hit variant zeroes a ray's t_best on first acceptance so it stops
participating (shadow semantics).

Kernels run with interpret=True off-TPU so tests validate them anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38
TRI_EPS = 1.1920929e-7

RAY_TILE = 256  # sweep winner: 4.08M rays/s vs 2.97M at 512 (isolated, 100k tris)
#: Max bytes of packed leaf geometry the kernel will hold in VMEM.
VMEM_PACKED_BUDGET = 8 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_boxes_cm(bvh) -> jnp.ndarray:
    """[6, C] component-major leaf-cluster boxes (bmin xyz, bmax xyz)."""
    leaf_base = bvh.n_leaves - 1
    bmin = bvh.bmin[leaf_base:leaf_base + bvh.n_leaves]
    bmax = bvh.bmax[leaf_base:leaf_base + bvh.n_leaves]
    return jnp.concatenate([bmin.T, bmax.T], axis=0).astype(jnp.float32)


def pack_leaf_cm(bvh, kind: str):
    """([W, C*K_pad] component-major packed geometry, K_pad) from
    bvh.packed [C, W, K]. K is padded to a multiple of 128 so the kernel's
    dynamic block slice starts on a lane boundary (Mosaic requires
    statically-provable 128 alignment in the lane dimension). Padding
    columns are inert: zero triangles have det==0; padded cones get an
    empty axis slab (min_d=1 > max_d=-1)."""
    packed = jnp.asarray(bvh.packed)
    c, w, k = packed.shape
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, k_pad - k)))
        if kind == "cone":
            packed = packed.at[:, 14, k:].set(1.0)   # min_d
            packed = packed.at[:, 15, k:].set(-1.0)  # max_d
    return jnp.transpose(packed, (1, 0, 2)).reshape(w, c * k_pad), k_pad


def _tri_block(o, d, blk, t_min):
    """[T, K] candidate ts for one [9, K] triangle block (Möller-Trumbore,
    same math as ops.bvh._tri_core)."""
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    v0x, v0y, v0z = blk[0:1, :], blk[1:2, :], blk[2:3, :]
    e1x, e1y, e1z = blk[3:4, :], blk[4:5, :], blk[5:6, :]
    e2x, e2y, e2z = blk[6:7, :], blk[7:8, :], blk[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    near_zero = jnp.abs(det) < TRI_EPS
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((~near_zero) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > t_min))
    return jnp.where(ok, t, _INF)


def _cone_block(o, d, blk, t_min):
    """[T, K] candidate ts for one [16, K] cone block (KIRK quadratic,
    same math as ops.bvh._cone_core)."""
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    ddx, ddy, ddz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    bx, by, bz = blk[0:1, :], blk[1:2, :], blk[2:3, :]
    ux, uy, uz = blk[3:4, :], blk[4:5, :], blk[5:6, :]
    vx, vy, vz = blk[6:7, :], blk[7:8, :], blk[8:9, :]
    wx, wy, wz = blk[9:10, :], blk[10:11, :], blk[11:12, :]
    slope, r_base = blk[12:13, :], blk[13:14, :]
    min_d, max_d = blk[14:15, :], blk[15:16, :]

    rx, ry, rz = ox - bx, oy - by, oz - bz
    px = rx * ux + ry * uy + rz * uz
    py = rx * vx + ry * vy + rz * vz
    pz = rx * wx + ry * wy + rz * wz
    dx = ddx * ux + ddy * uy + ddz * uz
    dy = ddx * vx + ddy * vy + ddz * vz
    dz = ddx * wx + ddy * wy + ddz * wz

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
    ov = ox * vx + oy * vy + oz * vz

    def axis_ok(t):
        dax = ov + t * dy
        return (dax >= min_d) & (dax <= max_d)

    t1_ok = (t1 >= 1e-4) & (t1 > t_min) & axis_ok(t1)
    t2_ok = (t2 >= 1e-4) & (t2 > t_min) & axis_ok(t2)
    take1 = has_roots & t1_ok
    take2 = has_roots & (~t1_ok) & t2_ok
    return jnp.where(take1, t1, jnp.where(take2, t2, _INF))


def _make_kernel(block_fn, width, n_clusters, leaf_k, k_pad, t_min,
                 any_hit):
    t_cols = n_clusters  # entry-grid width
    BIGI = 2 ** 30  # python literal: kernels must not capture traced constants

    # rays arrive component-major [8, T] (o xyz, d xyz, t_max, pad) and
    # results leave as [1, T] rows — [R, 3]/[R, 1] Pallas operands get
    # row-major layouts physically padded to 128 lanes (42-128x HBM
    # bloat; see ops/pallas/stream.py).
    def kernel(rays_ref, boxes_ref, prim_ref, t_ref, idx_ref):
        t_best0 = jnp.transpose(rays_ref[6:7, :])  # [T, 1]
        # defaults first; whole-dead tiles (compacted wavefronts put dead
        # rays, t_max=0, in the tail) skip phase 1 + the round loop
        t_ref[:] = jnp.transpose(t_best0)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

        @pl.when(jnp.max(t_best0) > 0.0)
        def _():
            _traverse_tile(rays_ref, boxes_ref, prim_ref, t_best0,
                           t_ref, idx_ref)

    def _traverse_tile(rays_ref, boxes_ref, prim_ref, t_best0,
                       t_ref, idx_ref):
        o = jnp.transpose(rays_ref[0:3, :])  # [T, 3]
        d = jnp.transpose(rays_ref[3:6, :])
        t_rows = o.shape[0]
        eps = 1e-20
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d < 0, -eps, eps), d)
        col_c = jax.lax.broadcasted_iota(jnp.int32, (1, t_cols), 1)
        col_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

        # phase 1: dense entry grid [T, C]
        tnear = jnp.full((t_rows, t_cols), -_INF, jnp.float32)
        tfar = jnp.full((t_rows, t_cols), _INF, jnp.float32)
        for a in range(3):
            t0 = (boxes_ref[a:a + 1, :] - o[:, a:a + 1]) * inv[:, a:a + 1]
            t1 = (boxes_ref[a + 3:a + 4, :] - o[:, a:a + 1]) * inv[:, a:a + 1]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear < t_best0)
        # clamp origin-inside entries to 0 so blocked any-hit lanes
        # (t_best == 0) stop pulling their enclosing boxes into the
        # schedule — see stream._slab6 for the full rationale
        tn = jnp.where(hit, jnp.maximum(tnear, 0.0), _INF)

        # NOTE: no value-level dynamic_slice / argmin in the round body —
        # Mosaic lacks those lowerings; everything is mask+reduce instead
        # (all on-chip [T,C]/[T,K] passes, ~µs at these shapes).
        def useful_min(tn, t_best):
            # [1, C]: per-cluster min over rays of entries that can improve
            return jnp.min(jnp.where(tn < t_best, tn, _INF), axis=0,
                           keepdims=True)

        def cond(carry):
            rnd, tn, t_best, best, m = carry
            return (rnd < t_cols) & (jnp.min(m) < _INF)

        def body(carry):
            rnd, tn, t_best, best, m = carry
            # shared nearest useful cluster: lowest index at the min entry
            v = jnp.min(m)
            j = jnp.min(jnp.where(m == v, col_c, BIGI))  # scalar int32
            onehot = col_c == j  # [1, C]
            start = pl.multiple_of(j * k_pad, 128)
            blk = prim_ref[:, pl.ds(start, k_pad)]  # [W, K_pad] from VMEM
            ej = jnp.max(jnp.where(onehot, tn, -_INF), axis=1,
                         keepdims=True)  # [T,1] = tn[:, j]
            want = ej < t_best
            t_cand = block_fn(o, d, blk, t_min)  # [T, K]
            t_cand = jnp.where(want, t_cand, _INF)
            rb = jnp.min(t_cand, axis=1, keepdims=True)  # [T,1]
            col = jnp.min(jnp.where(t_cand == rb, col_k, BIGI), axis=1,
                          keepdims=True)  # [T,1] argmin, lowest-index ties
            better = rb < t_best
            if any_hit:
                # first accepted hit ends the ray: nothing can beat 0
                t_best = jnp.where(better, 0.0, t_best)
            else:
                t_best = jnp.where(better, rb, t_best)
            best = jnp.where(better, j * leaf_k + col, best)
            tn = jnp.where(onehot, _INF, tn)  # mark visited
            m = useful_min(tn, t_best)
            return rnd + 1, tn, t_best, best, m

        init = (jnp.int32(0), tn, t_best0,
                jnp.full((t_rows, 1), -1, jnp.int32),
                useful_min(tn, t_best0))
        _, _, t_best, best, _ = jax.lax.while_loop(cond, body, init)
        t_ref[:] = jnp.transpose(t_best)    # [T,1] -> [1,T]
        idx_ref[:] = jnp.transpose(best)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kind", "n_clusters", "leaf_k", "t_min", "any_hit",
                     "ray_tile"))
def traverse_vmem(o, d, boxes_cm, prim_cm, t_max, *, kind: str,
                  n_clusters: int, leaf_k: int, t_min: float = 1e-4,
                  any_hit: bool = False, ray_tile: int = RAY_TILE):
    """VMEM-resident culled-cluster traversal.

    o/d [R,3]; boxes_cm [6,C]; prim_cm [W, C*K_pad] (pack_leaf_cm); t_max
    [R] per-ray cap. leaf_k is the LOGICAL leaf size — returned rows index
    the reordered pack as cluster*leaf_k + within, regardless of the
    128-aligned physical padding. Returns (t [R] — t_max where miss (0.0
    for accepted any-hit rays), row [R] int32 (-1 miss), found [R] bool).
    """
    block_fn = {"tri": _tri_block, "cone": _cone_block}[kind]
    width = prim_cm.shape[0]
    k_pad = prim_cm.shape[1] // n_clusters
    r = o.shape[0]
    pad = (-r) % ray_tile
    r_pad = r + pad
    rays_cm = jnp.concatenate([
        jnp.pad(o, ((0, pad), (0, 0))).T,
        jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0).T,
        jnp.pad(jnp.asarray(t_max, jnp.float32), (0, pad))[None, :],
        jnp.zeros((1, r_pad), jnp.float32),
    ], axis=0)  # [8, R] — see _make_kernel layout note
    kernel = _make_kernel(block_fn, width, n_clusters, leaf_k, k_pad,
                          t_min, any_hit)

    t, idx = pl.pallas_call(
        kernel,
        grid=(r_pad // ray_tile,),
        in_specs=[
            pl.BlockSpec((8, ray_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, n_clusters), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, n_clusters * k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
        interpret=_interpret(),
    )(rays_cm, boxes_cm, prim_cm)
    t, idx = t[0, :r], idx[0, :r]
    return t, idx, idx >= 0


def vmem_eligible(bvh) -> bool:
    """True when the packed geometry (with 128-aligned leaf padding) fits
    the kernel's VMEM budget, the BVH is flat-consumable (leaf clusters
    used directly), and the cluster count fills TPU lanes (>=128)."""
    if bvh is None or bvh.packed is None:
        return False
    c, w, k = bvh.packed.shape
    if c < 128:
        return False
    k_pad = -(-k // 128) * 128
    bytes_needed = c * w * k_pad * 4 + 6 * c * 4
    return bytes_needed <= VMEM_PACKED_BUDGET
