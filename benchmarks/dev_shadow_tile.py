"""Shadow-pass ray-tile sweep at leaf-288 hair-ball scale (the r4 tile
sweep covered closest/bounce wavefronts only)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ba_pathtracing_fur_tpu.core.camera import pixel_grid, rays_from_pixels
from ba_pathtracing_fur_tpu.ops import traverse
from ba_pathtracing_fur_tpu.ops.pallas import stream as pstream
from ba_pathtracing_fur_tpu.scene import builtins
from ba_pathtracing_fur_tpu.scene.types import to_device

fibers, res = 1_000_000, 1024
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
hit = jax.jit(lambda s, o, d: traverse.closest_hit(o, d, s, chunk=1024))(
    sc, o0, d0)
jax.block_until_ready(hit.t)
valid = hit.valid
pos = jnp.where(valid[:, None], hit.position, 0.0)
lp = sc.lights.position[0]
to_l = lp[None, :] - pos
dist = jnp.linalg.norm(to_l, axis=-1)
d_s = to_l / jnp.maximum(dist, 1e-9)[:, None]
o_s = pos + 1e-4 * d_s
tmax_s = jnp.where(valid, dist - 2e-4, 0.0)

sb, cb, prim = bvh.sboxes, bvh.cboxes_sf, bvh.prim_hbm
fan, lk = bvh.fanout, bvh.leaf_size


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def pass_any(o, d, tm, sb, cb, prim, fan, lk, tile, bvh):
    p, inv = traverse._entry_morton_perms(o, d, tm, bvh)
    pk = jnp.concatenate([o, d, tm[:, None]], axis=1)[p]
    _, _, f = pstream.traverse_stream(
        pk[:, 0:3], pk[:, 3:6], sb, cb, prim, pk[:, 6], kind="cone",
        fanout=fan, leaf_k=lk, any_hit=True, ray_tile=tile)
    return f[inv]


ref = None
for tile in (128, 256, 512):
    out = pass_any(o_s, d_s, tmax_s, sb, cb, prim, fan, lk, tile, bvh)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = pass_any(o_s, d_s, tmax_s, sb, cb, prim, fan, lk, tile, bvh)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    out = np.asarray(out)
    if ref is None:
        ref = out
    print(f"any tile={tile:4d}  {best*1e3:8.1f} ms  agree={np.mean(out==ref):.6f}",
          flush=True)
