"""Pallas TPU kernels: fused streaming ray-primitive intersection.

The jnp brute-force path (ops/bruteforce.py) materializes [R, P] candidate
grids in HBM — correct, but bandwidth-bound. These kernels stream
component-major primitive tiles through VMEM while rays stay resident,
reducing the nearest hit on the fly: HBM traffic drops from O(R·P) to
O(R + P·grid_rows), and every op is a lane-full [TR, TP] 2D tile on the VPU.

Layout: primitives are packed component-major as [W, P] f32 (W=9 triangles:
v0,e1,e2 per component; W=16 cones: base,u,v,w,slope,r_base,min_d,max_d) so
a prim tile loads as W rows of [1, TP] that broadcast against ray columns
[TR, 1].

Grid: (ray_tiles, prim_tiles); the prim axis is a sequential reduction
dimension — the output block (indexed by ray tile only) is revisited and
accumulated across prim steps (guide: "Grid and Block Specifications").

Kernels run with interpret=True off-TPU so tests validate them anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import ConePack, TrianglePack

INF = np.float32(3.4e38)  # numpy: no backend init at import (see ops.intersect)
_INF = 3.4e38  # python literal: kernels must not capture traced constants
TRI_EPS = 1.1920929e-7

RAY_TILE = 256
PRIM_TILE = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

def pack_tris_cm(tris: TrianglePack, prim_tile: int = PRIM_TILE):
    """[9, P_pad] component-major triangle pack (v0, e1, e2)."""
    v0 = tris.v0
    e1 = tris.v1 - v0
    e2 = tris.v2 - v0
    rows = jnp.stack([v0[:, 0], v0[:, 1], v0[:, 2],
                      e1[:, 0], e1[:, 1], e1[:, 2],
                      e2[:, 0], e2[:, 1], e2[:, 2]], axis=0)
    p = rows.shape[1]
    pad = (-p) % prim_tile
    return jnp.pad(rows, ((0, 0), (0, pad))), p


def pack_cones_cm(cones: ConePack, prim_tile: int = PRIM_TILE):
    """[16, P_pad] component-major cone pack; padding slots get an empty
    axis slab (min_d=1 > max_d=-1) so they never hit."""
    rows = jnp.stack([cones.base[:, 0], cones.base[:, 1], cones.base[:, 2],
                      cones.u[:, 0], cones.u[:, 1], cones.u[:, 2],
                      cones.v[:, 0], cones.v[:, 1], cones.v[:, 2],
                      cones.w[:, 0], cones.w[:, 1], cones.w[:, 2],
                      cones.slope, cones.r_base, cones.min_d, cones.max_d], axis=0)
    p = rows.shape[1]
    pad = (-p) % prim_tile
    rows = jnp.pad(rows, ((0, 0), (0, pad)))
    if pad:
        rows = rows.at[14, p:].set(1.0)   # min_d
        rows = rows.at[15, p:].set(-1.0)  # max_d
    return rows, p


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _tri_kernel(rays_ref, prim_ref, tmin_ref, t_ref, idx_ref):
    """One (ray_tile, prim_tile) step of the Möller-Trumbore min-reduction.

    Rays arrive component-major [8, T] (o xyz, d xyz, 2 pad rows) and
    results leave as [1, T] rows — [R, 3]/[R, 1] Pallas operands get
    row-major layouts physically padded to 128 lanes (42-128x HBM bloat;
    see ops/pallas/stream.py)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _INF)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    ox = jnp.transpose(rays_ref[0:1, :])  # [T, 1]
    oy = jnp.transpose(rays_ref[1:2, :])
    oz = jnp.transpose(rays_ref[2:3, :])
    dx = jnp.transpose(rays_ref[3:4, :])
    dy = jnp.transpose(rays_ref[4:5, :])
    dz = jnp.transpose(rays_ref[5:6, :])

    v0x = prim_ref[0:1, :]
    v0y = prim_ref[1:2, :]
    v0z = prim_ref[2:3, :]
    e1x = prim_ref[3:4, :]
    e1y = prim_ref[4:5, :]
    e1z = prim_ref[5:6, :]
    e2x = prim_ref[6:7, :]
    e2y = prim_ref[7:8, :]
    e2z = prim_ref[8:9, :]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    near_zero = jnp.abs(det) < TRI_EPS
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    tmin = tmin_ref[0, 0]
    ok = ((~near_zero) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > tmin))
    t = jnp.where(ok, t, _INF)

    tile_best = jnp.min(t, axis=1)
    tile_arg = jnp.argmin(t, axis=1).astype(jnp.int32) + j * t.shape[1]
    better = tile_best < t_ref[0, :]
    t_ref[0, :] = jnp.where(better, tile_best, t_ref[0, :])
    idx_ref[0, :] = jnp.where(better, tile_arg, idx_ref[0, :])


def _cone_kernel(rays_ref, prim_ref, tmin_ref, t_ref, idx_ref):
    """One (ray_tile, prim_tile) step of the KIRK cone min-reduction.
    Ray/result layouts as in _tri_kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _INF)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    ox = jnp.transpose(rays_ref[0:1, :])  # [T, 1]
    oy = jnp.transpose(rays_ref[1:2, :])
    oz = jnp.transpose(rays_ref[2:3, :])
    ddx = jnp.transpose(rays_ref[3:4, :])
    ddy = jnp.transpose(rays_ref[4:5, :])
    ddz = jnp.transpose(rays_ref[5:6, :])

    bx, by, bz = prim_ref[0:1, :], prim_ref[1:2, :], prim_ref[2:3, :]
    ux, uy, uz = prim_ref[3:4, :], prim_ref[4:5, :], prim_ref[5:6, :]
    vx, vy, vz = prim_ref[6:7, :], prim_ref[7:8, :], prim_ref[8:9, :]
    wx, wy, wz = prim_ref[9:10, :], prim_ref[10:11, :], prim_ref[11:12, :]
    slope = prim_ref[12:13, :]
    r_base = prim_ref[13:14, :]
    min_d = prim_ref[14:15, :]
    max_d = prim_ref[15:16, :]

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
    tmin = tmin_ref[0, 0]

    def axis_ok(t):
        dax = ov + t * dy
        return (dax >= min_d) & (dax <= max_d)

    t1_ok = (t1 >= 1e-4) & (t1 > tmin) & axis_ok(t1)
    t2_ok = (t2 >= 1e-4) & (t2 > tmin) & axis_ok(t2)
    take1 = has_roots & t1_ok
    take2 = has_roots & (~t1_ok) & t2_ok
    t = jnp.where(take1, t1, jnp.where(take2, t2, _INF))

    tile_best = jnp.min(t, axis=1)
    tile_arg = jnp.argmin(t, axis=1).astype(jnp.int32) + j * t.shape[1]
    better = tile_best < t_ref[0, :]
    t_ref[0, :] = jnp.where(better, tile_best, t_ref[0, :])
    idx_ref[0, :] = jnp.where(better, tile_arg, idx_ref[0, :])


def _closest(kernel, width, o, d, packed, t_min, ray_tile, prim_tile):
    r = o.shape[0]
    p_pad = packed.shape[1]
    pad_r = (-r) % ray_tile
    r_pad = r + pad_r
    rays_cm = jnp.concatenate([
        jnp.pad(o, ((0, pad_r), (0, 0))).T,
        jnp.pad(d, ((0, pad_r), (0, 0)), constant_values=1.0).T,
        jnp.zeros((2, r_pad), jnp.float32),
    ], axis=0)  # [8, R] — see _tri_kernel layout note
    grid = (r_pad // ray_tile, p_pad // prim_tile)
    tmin_arr = jnp.full((1, 1), t_min, jnp.float32)

    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, prim_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        interpret=_interpret(),
    )(rays_cm, packed, tmin_arr)
    return t[0, :r], idx[0, :r]


def tri_closest(o, d, packed_cm, t_min=1e-4, ray_tile=RAY_TILE,
                prim_tile=PRIM_TILE):
    """Nearest triangle per ray. packed_cm: [9, P_pad] from pack_tris_cm.
    Returns (t [R] — INF on miss, idx [R] — row into the pack)."""
    return _closest(_tri_kernel, 9, o, d, packed_cm, t_min, ray_tile, prim_tile)


def cone_closest(o, d, packed_cm, t_min=1e-4, ray_tile=RAY_TILE,
                 prim_tile=PRIM_TILE):
    """Nearest cone per ray. packed_cm: [16, P_pad] from pack_cones_cm."""
    return _closest(_cone_kernel, 16, o, d, packed_cm, t_min, ray_tile, prim_tile)
