"""Brute-force O(N) scene intersection — the `NoDataStructure` analog.

Parity target: KIRK::CPU::NoDataStructure (CPU_NoDataStructure.h:9-24) which
the reference uses as the accel-structure oracle (SURVEY §4.3). On TPU the
all-pairs ray×primitive grid is dense vector compute, so for small scenes
this *is* the fast path; for large scenes it is the correctness oracle for
the LBVH (ops/bvh.py) and the Pallas kernels (ops/pallas/).

Rays are processed in static chunks so the [chunk, N_prims] grids stay
within HBM/VMEM budget — the TPU equivalent of the reference's
BufferSegmentation memory capping (BufferSegmentation.h:34-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import vecmath as vm
from ..scene.types import ConePack, DeviceScene, TrianglePack
from . import intersect as isect

INF = isect.INF

PRIM_NONE = -1
PRIM_TRI = 0
PRIM_CONE = 1


@struct.dataclass
class Hit:
    """SoA hit record — the wavefront analog of KIRK::Intersection
    (Intersection.h:11-48)."""

    t: jnp.ndarray  # [R]
    valid: jnp.ndarray  # [R] bool (scene geometry hit)
    prim_type: jnp.ndarray  # [R] int32: -1 none, 0 triangle, 1 cone
    prim_id: jnp.ndarray  # [R] int32
    mat_id: jnp.ndarray  # [R] int32
    position: jnp.ndarray  # [R,3]
    normal: jnp.ndarray  # [R,3]
    uv: jnp.ndarray  # [R,2]
    enter: jnp.ndarray  # [R] bool (cone enter flag)
    # fiber frame at the hit (cones: their own frame; triangles: stamped
    # fiber frame for fur-as-triangles mode, Object.h:33-38)
    fiber_u: jnp.ndarray  # [R,3]
    fiber_v: jnp.ndarray
    fiber_w: jnp.ndarray


def _nearest_over_grid(t_grid):
    """argmin over prim axis -> (t_best [R], id [R])."""
    idx = jnp.argmin(t_grid, axis=-1)
    t = jnp.take_along_axis(t_grid, idx[:, None], axis=-1)[:, 0]
    return t, idx.astype(jnp.int32)


def _closest_chunk(o, d, scene: DeviceScene, t_min, t_max):
    tris, cones = scene.tris, scene.cones
    r = o.shape[0]
    # per-ray t_max support (dead-lane capping): grids compare [R, P] < cap
    t_max = jnp.asarray(t_max, jnp.float32)
    cap = t_max[:, None] if t_max.ndim == 1 else t_max

    t_tri = jnp.full((r,), INF)
    tri_id = jnp.zeros((r,), jnp.int32)
    if tris.count:
        tg, _, _, _ = isect.triangle_hit_grid(o, d, tris, t_min, cap)
        t_tri, tri_id = _nearest_over_grid(tg)

    t_cone = jnp.full((r,), INF)
    cone_id = jnp.zeros((r,), jnp.int32)
    enter_all = jnp.zeros((r,), bool)
    if cones.count:
        cg, enter_g, _ = isect.cone_hit_grid(o, d, cones, t_min, cap)
        t_cone, cone_id = _nearest_over_grid(cg)
        enter_all = jnp.take_along_axis(enter_g, cone_id[:, None], axis=-1)[:, 0]

    cone_wins = t_cone < t_tri
    t = jnp.where(cone_wins, t_cone, t_tri)
    valid = t < t_max
    prim_type = jnp.where(~valid, PRIM_NONE, jnp.where(cone_wins, PRIM_CONE, PRIM_TRI)).astype(jnp.int32)
    prim_id = jnp.where(cone_wins, cone_id, tri_id)
    position = o + t[:, None] * d

    # normals / uvs / material for the winner only
    n = jnp.zeros_like(o)
    uv = jnp.zeros((r, 2), jnp.float32)
    mat_id = jnp.zeros((r,), jnp.int32)
    fu = jnp.zeros_like(o)
    fv = jnp.zeros_like(o)
    fw = jnp.zeros_like(o)
    if tris.count:
        tn, tuv, _ = isect.triangle_interpolate(tris, tri_id, position, o, d)
        is_tri = prim_type == PRIM_TRI
        n = jnp.where(is_tri[:, None], tn, n)
        uv = jnp.where(is_tri[:, None], tuv, uv)
        mat_id = jnp.where(is_tri, tris.mat_id[tri_id], mat_id)
        fu = jnp.where(is_tri[:, None], tris.fiber_u[tri_id], fu)
        fv = jnp.where(is_tri[:, None], tris.fiber_v[tri_id], fv)
        fw = jnp.where(is_tri[:, None], tris.fiber_w[tri_id], fw)
    if cones.count:
        cn = isect.cone_normal(cones, cone_id, position)
        cuv = isect.cone_texcoord(cones, cone_id, position)
        is_cone = prim_type == PRIM_CONE
        n = jnp.where(is_cone[:, None], cn, n)
        uv = jnp.where(is_cone[:, None], cuv, uv)
        mat_id = jnp.where(is_cone, cones.mat_id[cone_id], mat_id)
        fu = jnp.where(is_cone[:, None], cones.u[cone_id], fu)
        fv = jnp.where(is_cone[:, None], cones.v[cone_id], fv)
        fw = jnp.where(is_cone[:, None], cones.w[cone_id], fw)

    return Hit(
        t=jnp.where(valid, t, INF), valid=valid, prim_type=prim_type,
        prim_id=prim_id, mat_id=mat_id, position=position, normal=n, uv=uv,
        enter=enter_all & (prim_type == PRIM_CONE), fiber_u=fu, fiber_v=fv,
        fiber_w=fw,
    )


def _empty_hit(r: int) -> Hit:
    z3 = jnp.zeros((r, 3), jnp.float32)
    return Hit(t=jnp.full((r,), INF), valid=jnp.zeros((r,), bool),
               prim_type=jnp.full((r,), PRIM_NONE, jnp.int32),
               prim_id=jnp.zeros((r,), jnp.int32),
               mat_id=jnp.zeros((r,), jnp.int32), position=z3, normal=z3,
               uv=jnp.zeros((r, 2), jnp.float32),
               enter=jnp.zeros((r,), bool), fiber_u=z3, fiber_v=z3,
               fiber_w=z3)


def closest_hit(o, d, scene: DeviceScene, t_min=1e-4, t_max=INF,
                chunk: int = 8192, n_alive=None) -> Hit:
    """Nearest scene hit for each ray. o, d: [R,3]; R is padded internally
    to a multiple of `chunk` and processed with lax.map to bound the live
    [chunk, N_prims] grids. t_max may be per-ray [R].

    `n_alive` (traced scalar): with a compacted wavefront (live rays first —
    ops.compact), chunks entirely past n_alive skip the intersection grid
    via lax.cond — the pt_sortHits payoff (pt_sortHits.compute:17-39)."""
    from ..scene.types import ensure_device
    scene = ensure_device(scene)
    r = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if r <= chunk:
        return _closest_chunk(o, d, scene, t_min, t_max_arr)
    pad = (-r) % chunk
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t_p = jnp.pad(t_max_arr, (0, pad))
    o_c = o_p.reshape(-1, chunk, 3)
    d_c = d_p.reshape(-1, chunk, 3)
    t_c = t_p.reshape(-1, chunk)
    starts = jnp.arange(o_c.shape[0], dtype=jnp.int32) * chunk

    def one(args):
        oo, dd, tt, start = args
        if n_alive is None:
            return _closest_chunk(oo, dd, scene, t_min, tt)
        return jax.lax.cond(
            start < n_alive,
            lambda: _closest_chunk(oo, dd, scene, t_min, tt),
            lambda: _empty_hit(chunk))

    hits = jax.lax.map(one, (o_c, d_c, t_c, starts))
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:r], hits)
    return flat


def _any_chunk(o, d, scene: DeviceScene, t_min, t_max):
    tris, cones = scene.tris, scene.cones
    blocked = jnp.zeros((o.shape[0],), bool)
    if tris.count:
        tg, _, _, valid = isect.triangle_hit_grid(o, d, tris, t_min, t_max[:, None])
        blocked |= jnp.any(valid, axis=-1)
    if cones.count:
        _, _, valid = isect.cone_hit_grid(o, d, cones, t_min, t_max[:, None])
        blocked |= jnp.any(valid, axis=-1)
    return blocked


def any_hit(o, d, scene: DeviceScene, t_max, t_min=1e-4, chunk: int = 8192,
            n_alive=None):
    """Shadow-ray occlusion: does any geometry lie within (t_min, t_max)?
    t_max: [R] per-ray. The accel-structure `isIntersection` analog
    (CPU_DataStructure.h:14-30). `n_alive` as in closest_hit."""
    from ..scene.types import ensure_device
    scene = ensure_device(scene)
    r = o.shape[0]
    if r <= chunk:
        return _any_chunk(o, d, scene, t_min, t_max)
    pad = (-r) % chunk
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t_p = jnp.pad(t_max, (0, pad))
    starts = jnp.arange(-(-r // chunk), dtype=jnp.int32) * chunk

    def one(odt):
        oo, dd, tt, start = odt
        if n_alive is None:
            return _any_chunk(oo, dd, scene, t_min, tt)
        return jax.lax.cond(
            start < n_alive,
            lambda: _any_chunk(oo, dd, scene, t_min, tt),
            lambda: jnp.zeros((chunk,), bool))

    res = jax.lax.map(
        one,
        (o_p.reshape(-1, chunk, 3), d_p.reshape(-1, chunk, 3),
         t_p.reshape(-1, chunk), starts),
    )
    return res.reshape(-1)[:r]
