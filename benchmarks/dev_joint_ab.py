"""A/B: separate closest+any streaming passes vs ONE mixed joint pass.

Builds realistic bounce-1 ray pairs from actual primary hits on the hair
ball (scatter ray + shadow ray toward the light, sharing an origin), then
times:
  A) closest(R bounce rays, entry-morton sorted)
     + any(R shadow rays, entry-morton sorted)       -- today's pipeline
  B) mixed(2R interleaved pairs, pair-sorted by the shared origin)

Usage: python benchmarks/dev_joint_ab.py [fibers] [res]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.ops.pallas import stream as pstream
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device
from ba_pathtracing_fur_tpu.core import vecmath as vm

fibers = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

sc, cam = builtins.hair_ball(resolution=(res, res), n_fibers=fibers,
                             on_device=True)
hint = dict(builtins.LAST_HAIRBALL_GEN)
sc = to_device(traverse.attach_bvh(sc, method="median",
                                   cone_split_hint=hint))
bvh = sc.cone_bvh
r = res * res

px, py = pixel_grid((res, res))
jitter = jax.random.uniform(jax.random.key(0), (r, 2))
o0, d0 = rays_from_pixels(cam, px, py, jitter)
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)


@jax.jit
def primaries(scene, o, d):
    return traverse.closest_hit(o, d, scene, chunk=1024)


hit = primaries(sc, o0, d0)
jax.block_until_ready(hit.t)
valid = hit.valid
print(f"primary hit fraction: {float(valid.mean()):.3f}")

# bounce scatter rays (cosine hemisphere about the normal)
key = jax.random.key(7)
u = jax.random.uniform(key, (r, 2))
n = jnp.where(valid[:, None], hit.normal, jnp.array([0.0, 1.0, 0.0]))
t1, t2 = vm.orthonormal_basis(n)
phi = 2 * jnp.pi * u[:, 0]
ct = jnp.sqrt(1 - u[:, 1])
st = jnp.sqrt(u[:, 1])
wo = (t1 * (st * jnp.cos(phi))[:, None] + t2 * (st * jnp.sin(phi))[:, None]
      + n * ct[:, None])
pos = jnp.where(valid[:, None], hit.position, 0.0)
o_b = pos + 1e-4 * wo
d_b = wo
tcap_b = jnp.where(valid, 3.4e38, 0.0)

# shadow rays toward the light
lp = sc.lights.position[0]
to_l = lp[None, :] - pos
dist = jnp.linalg.norm(to_l, axis=-1)
d_s = to_l / jnp.maximum(dist, 1e-9)[:, None]
o_s = pos + 1e-4 * d_s
tmax_s = jnp.where(valid, dist - 2e-4, 0.0)

sb, cb, prim = bvh.sboxes, bvh.cboxes_sf, bvh.prim_hbm
fan, lk = bvh.fanout, bvh.leaf_size


def timed(label, fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:8.1f} ms")
    return best, out


@functools.partial(jax.jit, static_argnums=(6, 7))
def pass_closest(o, d, tm, sb, cb, prim, fan, lk, bvh):
    p, inv = traverse._entry_morton_perms(o, d, tm, bvh)
    pk = jnp.concatenate([o, d, tm[:, None]], axis=1)[p]
    t, row, f = pstream.traverse_stream(
        pk[:, 0:3], pk[:, 3:6], sb, cb, prim, pk[:, 6], kind="cone",
        fanout=fan, leaf_k=lk)
    return t[inv], row[inv], f[inv]


@functools.partial(jax.jit, static_argnums=(6, 7))
def pass_any(o, d, tm, sb, cb, prim, fan, lk, bvh):
    p, inv = traverse._entry_morton_perms(o, d, tm, bvh)
    pk = jnp.concatenate([o, d, tm[:, None]], axis=1)[p]
    _, _, f = pstream.traverse_stream(
        pk[:, 0:3], pk[:, 3:6], sb, cb, prim, pk[:, 6], kind="cone",
        fanout=fan, leaf_k=lk, any_hit=True)
    return f[inv]


@functools.partial(jax.jit, static_argnums=(9, 10))
def pass_mixed(o_b, d_b, tcap_b, o_s, d_s, tmax_s, sb, cb, prim, fan, lk,
               bvh):
    # pair sort: entry-morton of the bounce ray keys BOTH (shared origin)
    tm_pair = jnp.maximum(tcap_b, tmax_s)
    p, inv = traverse._entry_morton_perms(o_b, d_b, tm_pair, bvh)
    pk = jnp.concatenate([o_b, d_b, tcap_b[:, None],
                          o_s, d_s, tmax_s[:, None]], axis=1)[p]
    o2 = jnp.stack([pk[:, 0:3], pk[:, 7:10]], axis=1).reshape(-1, 3)
    d2 = jnp.stack([pk[:, 3:6], pk[:, 10:13]], axis=1).reshape(-1, 3)
    tm2 = jnp.stack([pk[:, 6], pk[:, 13]], axis=1).reshape(-1)
    is_any = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), pk.shape[0])
    t, row, f = pstream.traverse_stream(
        o2, d2, sb, cb, prim, tm2, kind="cone",
        fanout=fan, leaf_k=lk, is_any=is_any)
    t2 = t.reshape(-1, 2)
    row2 = row.reshape(-1, 2)
    f2 = f.reshape(-1, 2)
    return (t2[:, 0][inv], row2[:, 0][inv], f2[:, 0][inv]), f2[:, 1][inv]


ta, (tc, rowc, fc) = timed("A1: closest (bounce rays)", pass_closest,
                           o_b, d_b, tcap_b, sb, cb, prim, fan, lk, bvh)
tb_, blk_a = timed("A2: any (shadow rays)", pass_any, o_s, d_s, tmax_s,
                   sb, cb, prim, fan, lk, bvh)
tm_, ((tmx, rowm, fm), blk_m) = timed(
    "B : mixed joint pass", pass_mixed, o_b, d_b, tcap_b, o_s, d_s, tmax_s,
    sb, cb, prim, fan, lk, bvh)

print(f"\nA total {1e3*(ta+tb_):.1f} ms  vs  B {1e3*tm_:.1f} ms  "
      f"({100*(1-tm_/(ta+tb_)):.1f}% saved)")

# correctness: closest winners + blocked flags must agree
rowc, fc = np.asarray(rowc), np.asarray(fc)
rowm, fm = np.asarray(rowm), np.asarray(fm)
blk_a, blk_m = np.asarray(blk_a), np.asarray(blk_m)
print(f"closest found agree: {(fc == fm).mean():.6f}  "
      f"rows agree (where found): "
      f"{(rowc[fc & fm] == rowm[fc & fm]).mean() if (fc & fm).any() else 1:.6f}")
print(f"blocked agree: {(blk_a == blk_m).mean():.6f}  "
      f"blocked frac: {blk_a.mean():.3f}")
