"""Pallas TPU kernel: the fused per-bounce shading pass.

Runs models/shade_core.shade_bounce_core — the ENTIRE post-traversal
bounce stage (analytic light hits, env/light termination, NEE sampling,
the 9-BSDF cascade, the Marschner/d'Eon hair automaton, throughput/flag
updates) — as ONE Pallas program over ray tiles, replacing the ~200-op
XLA chain whose per-op HBM latency floor bounded every bench config
(out/CORNELL_ROOFLINE.md; VERDICT r4 task 1). Reference model: the GPU
pipeline's single shade kernel, pt_shade.compute:99-287.

Layout: rays ride the 128-lane axis. Per-ray float/int channels are packed
component-major as [C, R/128, 128] so each channel is a full-VPU [S, 128]
slab inside the kernel (a [R, 3] operand would use 3 of 128 lanes). Light
parameters and the env ambient are scalars in SMEM, consumed by
shade_core's static per-light loop — no gathers anywhere, which is what
lets the SAME core lower under Mosaic.

The kernel runs with interpret=True off-TPU so tests validate it anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import shade_core as sc
from ...models.shade_core import CoreCfg, CoreLight, CoreMat, V3

RAY_TILE = 1024  # rays per program: [8, 128] slabs per channel
#: columns of the SMEM light table:
#: kind(1) color(3) pos(3) dir(3) radius(1) const/lin/quad(3) verts(12)
#: inner(1) outer(1) area(1) = 29
_LIGHT_FIELDS = 29


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_lights_smem(lights) -> jnp.ndarray:
    """LightPack -> [L, 27] f32 scalar table (+ area precomputed for MIS)."""
    import numpy as np
    v = jnp.asarray(lights.verts, jnp.float32)  # [L,4,3]
    a1 = 0.5 * jnp.linalg.norm(
        jnp.cross(v[:, 1] - v[:, 0], v[:, 3] - v[:, 0]), axis=-1)
    a2 = 0.5 * jnp.linalg.norm(
        jnp.cross(v[:, 1] - v[:, 2], v[:, 3] - v[:, 2]), axis=-1)
    area = jnp.maximum(a1 + a2, 1e-12)
    cols = [jnp.asarray(lights.kind, jnp.float32)[:, None],
            jnp.asarray(lights.color, jnp.float32),
            jnp.asarray(lights.position, jnp.float32),
            jnp.asarray(lights.direction, jnp.float32),
            jnp.asarray(lights.radius, jnp.float32)[:, None],
            jnp.asarray(lights.const_att, jnp.float32)[:, None],
            jnp.asarray(lights.lin_att, jnp.float32)[:, None],
            jnp.asarray(lights.quad_att, jnp.float32)[:, None],
            v.reshape(v.shape[0], 12),
            jnp.asarray(lights.inner_angle, jnp.float32)[:, None],
            jnp.asarray(lights.outer_angle, jnp.float32)[:, None],
            area[:, None]]
    return jnp.concatenate(cols, axis=1)


def core_light(table, l) -> CoreLight:
    """CoreLight of 0-d scalars from row `l` of the 29-column table."""
    o = {"kind": 0, "color": 1, "position": 4, "direction": 7, "radius": 10,
         "const_att": 11, "lin_att": 12, "quad_att": 13, "verts": 14,
         "inner": 26, "outer": 27, "area": 28}

    def g(c):
        return table[l, c]
    def vec(c):
        return V3(g(c), g(c + 1), g(c + 2))
    return CoreLight(
        kind=g(o["kind"]).astype(jnp.int32), color=vec(o["color"]),
        position=vec(o["position"]), direction=vec(o["direction"]),
        radius=g(o["radius"]), const_att=g(o["const_att"]),
        lin_att=g(o["lin_att"]), quad_att=g(o["quad_att"]),
        v0=vec(o["verts"]), v1=vec(o["verts"] + 3), v2=vec(o["verts"] + 6),
        v3=vec(o["verts"] + 9), inner_angle=g(o["inner"]),
        outer_angle=g(o["outer"]), area=g(o["area"]))


def _v3cols(v):
    return [v[:, 0], v[:, 1], v[:, 2]]


def shade_bounce(*, origin, direction, radiance, color, flags, theta_i,
                 prev_pdf, hit_t, hit_valid, hit_pos, hit_normal,
                 fib_u, fib_v, fib_w, mp_fields: dict, env_color,
                 env_ambient, lights_table, n_lights: int,
                 u_bsdf, u_pick, u_light, u_hairp, u_rr, rr_gate,
                 cfg: CoreCfg, mode: str = "kernel"):
    """Run the fused bounce shade. All array args are [R]-row / [R,3]
    conventional wavefront arrays; returns the CoreOut fields back in that
    convention. mode="xla" runs shade_core directly (the testable twin);
    "kernel" packs component-major and runs the Pallas program.
    """
    r = origin.shape[0]

    if mode == "xla":
        def V(a):
            return V3(a[:, 0], a[:, 1], a[:, 2])
        lights = [core_light(lights_table, l) for l in range(n_lights)]
        mp = CoreMat(
            diffuse=V(mp_fields["diffuse"]), specular=V(mp_fields["specular"]),
            volume=V(mp_fields["volume"]), emission=V(mp_fields["emission"]),
            ior=mp_fields["ior"], transparency=mp_fields["transparency"],
            reflectivity=mp_fields["reflectivity"],
            roughness=mp_fields["roughness"], bsdf_id=mp_fields["bsdf_id"],
            shader_id=mp_fields["shader_id"],
            hair_alpha=mp_fields["hair_alpha"],
            hair_beta=mp_fields["hair_beta"])
        out = sc.shade_bounce_core(
            origin=V(origin), direction=V(direction), radiance=V(radiance),
            color=V(color), flags=flags, theta_i=theta_i, prev_pdf=prev_pdf,
            hit_t=hit_t, hit_valid=hit_valid, hit_pos=V(hit_pos),
            hit_normal=V(hit_normal), fib_u=V(fib_u), fib_v=V(fib_v),
            fib_w=V(fib_w), mp=mp, env_color=V(env_color),
            env_ambient=V3(env_ambient[0], env_ambient[1], env_ambient[2]),
            lights=lights, u_bsdf1=u_bsdf[:, 0], u_bsdf2=u_bsdf[:, 1],
            u_pick=u_pick, u_light1=u_light[:, 0], u_light2=u_light[:, 1],
            u_hairp=u_hairp, u_rr=u_rr, rr_gate=rr_gate, cfg=cfg)
        return _core_out_to_rows(out)

    # ---- kernel mode: pack [C, R/128, 128] ------------------------------
    f_rows = (
        _v3cols(origin) + _v3cols(direction) + _v3cols(radiance)
        + _v3cols(color) + [theta_i, prev_pdf, hit_t]
        + _v3cols(hit_pos) + _v3cols(hit_normal)
        + _v3cols(fib_u) + _v3cols(fib_v) + _v3cols(fib_w)
        + _v3cols(mp_fields["diffuse"]) + _v3cols(mp_fields["specular"])
        + _v3cols(mp_fields["volume"]) + _v3cols(mp_fields["emission"])
        + [mp_fields["ior"], mp_fields["transparency"],
           mp_fields["reflectivity"], mp_fields["roughness"],
           mp_fields["hair_alpha"], mp_fields["hair_beta"]]
        + _v3cols(env_color)
        + [u_bsdf[:, 0], u_bsdf[:, 1], u_pick, u_light[:, 0], u_light[:, 1],
           u_hairp, u_rr, rr_gate]
    )
    i_rows = [flags, mp_fields["bsdf_id"], mp_fields["shader_id"],
              hit_valid.astype(jnp.int32)]
    cf = len(f_rows)
    ci = len(i_rows)
    pad = (-r) % RAY_TILE
    r_pad = r + pad
    s = RAY_TILE // 128

    fin = jnp.stack([jnp.pad(jnp.asarray(x, jnp.float32), (0, pad))
                     for x in f_rows]).reshape(cf, r_pad // 128, 128)
    iin = jnp.stack([jnp.pad(jnp.asarray(x, jnp.int32), (0, pad))
                     for x in i_rows]).reshape(ci, r_pad // 128, 128)
    env_amb = jnp.asarray(env_ambient, jnp.float32).reshape(3)
    params = jnp.concatenate([env_amb, jnp.zeros(1, jnp.float32)])
    ltab = jnp.asarray(lights_table, jnp.float32)
    if n_lights == 0:
        ltab = jnp.zeros((1, _LIGHT_FIELDS), jnp.float32)

    # origin3 dir3 rad3 color3 theta prev_pdf shadow_o3 shadow_d3 tmax direct3
    co = 24
    kernel = functools.partial(_shade_kernel, n_lights=n_lights, cfg=cfg,
                               s=s)
    fout, iout = pl.pallas_call(
        kernel,
        grid=(r_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights table
            pl.BlockSpec((cf, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((co, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((co, r_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad // 128, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(params, ltab, fin, iin)

    fo = fout.reshape(co, r_pad)[:, :r]
    io = iout.reshape(1, r_pad)[0, :r]

    def vec(i):
        return jnp.stack([fo[i], fo[i + 1], fo[i + 2]], axis=-1)

    return dict(
        origin=vec(0), direction=vec(3), radiance=vec(6), color=vec(9),
        theta_i=fo[12], prev_pdf=fo[13], shadow_o=vec(14), shadow_d=vec(17),
        shadow_tmax=fo[20], direct_rgb=vec(21), flags=io,
    )


def _core_out_to_rows(out: sc.CoreOut) -> dict:
    def m(v):
        return jnp.stack([v.x, v.y, v.z], axis=-1)
    return dict(origin=m(out.origin), direction=m(out.direction),
                radiance=m(out.radiance), color=m(out.color),
                flags=out.flags, theta_i=out.theta_i,
                prev_pdf=out.prev_pdf, shadow_o=m(out.shadow_o),
                shadow_d=m(out.shadow_d), shadow_tmax=out.shadow_tmax,
                direct_rgb=m(out.direct_rgb))


# ---------------------------------------------------------------------------
# Level-2 full-bounce kernel: brute-force scenes (Cornell class)
# ---------------------------------------------------------------------------
# For small untextured triangle scenes (the NoDataStructure path — BASELINE
# configs 0/1/2), the ENTIRE bounce fuses: the Möller–Trumbore closest-hit
# over a static SMEM triangle table, barycentric normal interpolation, the
# material one-hot, the whole shade stage, AND the NEE shadow any-hit all
# run in ONE Pallas program. Per bounce the only XLA ops left are the RNG
# draws and the state pack/unpack. This is the full pt_shade+pt_trace
# fusion the GPU reference implies (pt_trace.compute + pt_shade.compute
# back-to-back over SSBOs).

MAX_FULL_FUSE_TRIS = 512  # SMEM triangle-table cap
_T_MIN = 1e-4  # bruteforce.closest_hit/any_hit default t_min


def pack_tris_smem(tris) -> jnp.ndarray:
    """TrianglePack -> [T, 19] f32 (v0, e1, e2, n0, n1, n2, mat_id)."""
    v0 = jnp.asarray(tris.v0, jnp.float32)
    e1 = jnp.asarray(tris.v1, jnp.float32) - v0
    e2 = jnp.asarray(tris.v2, jnp.float32) - v0
    return jnp.concatenate([
        v0, e1, e2, jnp.asarray(tris.n0, jnp.float32),
        jnp.asarray(tris.n1, jnp.float32), jnp.asarray(tris.n2, jnp.float32),
        jnp.asarray(tris.mat_id, jnp.float32)[:, None]], axis=1)


def pack_mats_smem(materials) -> jnp.ndarray:
    """MaterialTable -> [M, 20] f32 (diffuse3 specular3 volume3 emission3
    ior transparency reflectivity roughness bsdf_id shader_id alpha beta)."""
    m = materials
    f = lambda x: jnp.asarray(x, jnp.float32)
    return jnp.concatenate([
        f(m.diffuse), f(m.specular), f(m.volume), f(m.emission),
        f(m.ior)[:, None], f(m.transparency)[:, None],
        f(m.reflectivity)[:, None], f(m.roughness)[:, None],
        f(m.bsdf_id)[:, None], f(m.shader_id)[:, None],
        f(m.hair_alpha)[:, None], f(m.hair_beta)[:, None]], axis=1)


def full_fuse_eligible(scene) -> bool:
    """Static scene test for the level-2 path."""
    from ...scene.types import ENV_COLOR
    return (scene.tri_bvh is None and scene.cone_bvh is None
            and int(scene.cones.count) == 0
            and 0 < int(scene.tris.count) <= MAX_FULL_FUSE_TRIS
            and scene.textures is None
            and (scene.env.kind == ENV_COLOR or scene.env.texture is None)
            and not scene.has_hair)


def _tri_scalar_t(o, d, v0, e1, e2, t_min, t_max):
    """[S,128] candidate t for ONE triangle given scalar corners (exact
    isect.triangle_hit_grid arithmetic). Returns (t, valid, u, v)."""
    px = d.y * e2[2] - d.z * e2[1]
    py = d.z * e2[0] - d.x * e2[2]
    pz = d.x * e2[1] - d.y * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    near_zero = jnp.abs(det) < 1.1920929e-7
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    tx, ty, tz = o.x - v0[0], o.y - v0[1], o.z - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d.x * qx + d.y * qy + d.z * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    valid = ((~near_zero) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > t_min) & (t < t_max))
    return t, valid, u, v


def shade_bounce_full(*, origin, direction, radiance, color, flags, theta_i,
                      prev_pdf, mats_table, tris_table, lights_table,
                      env_color3, env_ambient, n_lights: int, n_tris: int,
                      n_mats: int, u_bsdf, u_pick, u_light, u_hairp, u_rr,
                      rr_gate, cfg: CoreCfg):
    """Level-2 fused bounce for brute-force triangle scenes. Wavefront
    [R]-row I/O like shade_bounce, but no traversal/hit inputs — the
    kernel intersects the SMEM triangle table itself and applies the NEE
    shadow occlusion in-program. Returns the new RayState fields."""
    r = origin.shape[0]
    f_rows = (
        _v3cols(origin) + _v3cols(direction) + _v3cols(radiance)
        + _v3cols(color) + [theta_i, prev_pdf]
        + [u_bsdf[:, 0], u_bsdf[:, 1], u_pick, u_light[:, 0], u_light[:, 1],
           u_hairp, u_rr, rr_gate]
    )
    i_rows = [flags]
    cf = len(f_rows)  # 22
    pad = (-r) % RAY_TILE
    r_pad = r + pad
    s = RAY_TILE // 128

    fin = jnp.stack([jnp.pad(jnp.asarray(x, jnp.float32), (0, pad))
                     for x in f_rows]).reshape(cf, r_pad // 128, 128)
    iin = jnp.stack([jnp.pad(jnp.asarray(x, jnp.int32), (0, pad))
                     for x in i_rows]).reshape(1, r_pad // 128, 128)
    params = jnp.concatenate([
        jnp.asarray(env_ambient, jnp.float32).reshape(3),
        jnp.asarray(env_color3, jnp.float32).reshape(3)])
    ltab = jnp.asarray(lights_table, jnp.float32)
    if n_lights == 0:
        ltab = jnp.zeros((1, _LIGHT_FIELDS), jnp.float32)

    co = 14  # origin3 dir3 radiance3 color3 theta prev_pdf
    kernel = functools.partial(_full_bounce_kernel, n_lights=n_lights,
                               n_tris=n_tris, n_mats=n_mats, cfg=cfg, s=s)
    fout, iout = pl.pallas_call(
        kernel,
        grid=(r_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tris
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mats
            pl.BlockSpec((cf, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((co, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((co, r_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad // 128, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(params, ltab, tris_table, mats_table, fin, iin)

    fo = fout.reshape(co, r_pad)[:, :r]
    io = iout.reshape(1, r_pad)[0, :r]

    def vec(i):
        return jnp.stack([fo[i], fo[i + 1], fo[i + 2]], axis=-1)

    return dict(origin=vec(0), direction=vec(3), radiance=vec(6),
                color=vec(9), theta_i=fo[12], prev_pdf=fo[13], flags=io)


def _full_bounce_kernel(params_ref, lights_ref, tris_ref, mats_ref,
                        fin_ref, iin_ref, fout_ref, iout_ref, *,
                        n_lights: int, n_tris: int, n_mats: int,
                        cfg: CoreCfg, s: int):
    def row(c):
        return fin_ref[c]

    def vec(c):
        return V3(row(c), row(c + 1), row(c + 2))

    origin = vec(0)
    direction = vec(3)
    radiance = vec(6)
    color = vec(9)
    theta_i = row(12)
    prev_pdf = row(13)
    u_bsdf1, u_bsdf2, u_pick = row(14), row(15), row(16)
    u_light1, u_light2 = row(17), row(18)
    u_hairp, u_rr, rr_gate = row(19), row(20), row(21)
    flags = iin_ref[0]
    shape = origin.x.shape

    env_ambient = V3(params_ref[0], params_ref[1], params_ref[2])
    env_color = V3(jnp.full(shape, params_ref[3]),
                   jnp.full(shape, params_ref[4]),
                   jnp.full(shape, params_ref[5]))
    lights = [core_light(lights_ref, l) for l in range(n_lights)]

    # --- in-program closest hit (bruteforce._closest_chunk semantics)
    active = (radiance.x != 0.0) | (radiance.y != 0.0) | (radiance.z != 0.0)
    has_dir = (direction.x != 0.0) | (direction.y != 0.0) \
        | (direction.z != 0.0)
    t_cap = jnp.where(active & has_dir, sc.INF, 0.0)

    t_best = jnp.full(shape, sc.INF, jnp.float32)
    found = jnp.zeros(shape, bool)
    u_b = jnp.zeros(shape, jnp.float32)
    v_b = jnp.zeros(shape, jnp.float32)
    n0 = sc.v3_full(shape, 0.0)
    n1 = sc.v3_full(shape, 0.0)
    n2 = sc.v3_full(shape, 0.0)
    mat_f = jnp.zeros(shape, jnp.float32)

    def tri_row(j):
        g = lambda c: tris_ref[j, c]
        return ((g(0), g(1), g(2)), (g(3), g(4), g(5)), (g(6), g(7), g(8)),
                V3(g(9), g(10), g(11)), V3(g(12), g(13), g(14)),
                V3(g(15), g(16), g(17)), g(18))

    for j in range(n_tris):
        v0j, e1j, e2j, n0j, n1j, n2j, matj = tri_row(j)
        t, valid, u, v = _tri_scalar_t(origin, direction, v0j, e1j, e2j,
                                       _T_MIN, t_cap)
        better = valid & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        found |= better
        u_b = jnp.where(better, u, u_b)
        v_b = jnp.where(better, v, v_b)
        n0 = sc.where3(better, V3(jnp.full(shape, n0j.x),
                                  jnp.full(shape, n0j.y),
                                  jnp.full(shape, n0j.z)), n0)
        n1 = sc.where3(better, V3(jnp.full(shape, n1j.x),
                                  jnp.full(shape, n1j.y),
                                  jnp.full(shape, n1j.z)), n1)
        n2 = sc.where3(better, V3(jnp.full(shape, n2j.x),
                                  jnp.full(shape, n2j.y),
                                  jnp.full(shape, n2j.z)), n2)
        mat_f = jnp.where(better, matj, mat_f)

    hit_valid = found
    hit_t = jnp.where(found, t_best, sc.INF)
    hit_pos = origin + direction * jnp.where(found, t_best, 0.0)
    w_b = 1.0 - u_b - v_b
    hit_normal = sc.normalize3(n0 * w_b + n1 * u_b + n2 * v_b)

    # material one-hot over the static table
    mat_id = mat_f.astype(jnp.int32)

    def msel(c):
        acc = jnp.full(shape, mats_ref[0, c])
        for m in range(1, n_mats):
            acc = jnp.where(mat_id == m, mats_ref[m, c], acc)
        return acc

    def mvec(c):
        return V3(msel(c), msel(c + 1), msel(c + 2))

    mp = CoreMat(diffuse=mvec(0), specular=mvec(3), volume=mvec(6),
                 emission=mvec(9), ior=msel(12), transparency=msel(13),
                 reflectivity=msel(14), roughness=msel(15),
                 bsdf_id=msel(16).astype(jnp.int32),
                 shader_id=msel(17).astype(jnp.int32),
                 hair_alpha=msel(18), hair_beta=msel(19))

    xax = V3(jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
             jnp.zeros(shape, jnp.float32))
    up = V3(jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32))
    zax = V3(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
             jnp.ones(shape, jnp.float32))

    out = sc.shade_bounce_core(
        origin=origin, direction=direction, radiance=radiance, color=color,
        flags=flags, theta_i=theta_i, prev_pdf=prev_pdf, hit_t=hit_t,
        hit_valid=hit_valid, hit_pos=hit_pos, hit_normal=hit_normal,
        fib_u=xax, fib_v=up, fib_w=zax, mp=mp, env_color=env_color,
        env_ambient=env_ambient, lights=lights, u_bsdf1=u_bsdf1,
        u_bsdf2=u_bsdf2, u_pick=u_pick, u_light1=u_light1,
        u_light2=u_light2, u_hairp=u_hairp, u_rr=u_rr, rr_gate=rr_gate,
        cfg=cfg)

    # --- in-program shadow any-hit (bruteforce._any_chunk semantics)
    blocked = jnp.zeros(shape, bool)
    so, sd, stmax = out.shadow_o, out.shadow_d, out.shadow_tmax
    for j in range(n_tris):
        v0j, e1j, e2j, _, _, _, _ = tri_row(j)
        _, valid, _, _ = _tri_scalar_t(so, sd, v0j, e1j, e2j, _T_MIN, stmax)
        blocked |= valid
    final_color = out.color + sc.where3(blocked, 0.0, out.direct_rgb)

    for i, v in enumerate((out.origin, out.direction, out.radiance)):
        fout_ref[3 * i] = v.x
        fout_ref[3 * i + 1] = v.y
        fout_ref[3 * i + 2] = v.z
    fout_ref[9] = final_color.x
    fout_ref[10] = final_color.y
    fout_ref[11] = final_color.z
    fout_ref[12] = out.theta_i
    fout_ref[13] = out.prev_pdf
    iout_ref[0] = out.flags


def _shade_kernel(params_ref, lights_ref, fin_ref, iin_ref, fout_ref,
                  iout_ref, *, n_lights: int, cfg: CoreCfg, s: int):
    def row(c):
        return fin_ref[c]

    def vec(c):
        return V3(row(c), row(c + 1), row(c + 2))

    origin = vec(0)
    direction = vec(3)
    radiance = vec(6)
    color = vec(9)
    theta_i = row(12)
    prev_pdf = row(13)
    hit_t = row(14)
    hit_pos = vec(15)
    hit_normal = vec(18)
    fib_u = vec(21)
    fib_v = vec(24)
    fib_w = vec(27)
    mp = CoreMat(
        diffuse=vec(30), specular=vec(33), volume=vec(36), emission=vec(39),
        ior=row(42), transparency=row(43), reflectivity=row(44),
        roughness=row(45), bsdf_id=iin_ref[1], shader_id=iin_ref[2],
        hair_alpha=row(46), hair_beta=row(47))
    env_color = vec(48)
    u_bsdf1 = row(51)
    u_bsdf2 = row(52)
    u_pick = row(53)
    u_light1 = row(54)
    u_light2 = row(55)
    u_hairp = row(56)
    u_rr = row(57)
    rr_gate = row(58)
    flags = iin_ref[0]
    hit_valid = iin_ref[3] != 0

    env_ambient = V3(params_ref[0], params_ref[1], params_ref[2])
    lights = [core_light(lights_ref, l) for l in range(n_lights)]

    out = sc.shade_bounce_core(
        origin=origin, direction=direction, radiance=radiance, color=color,
        flags=flags, theta_i=theta_i, prev_pdf=prev_pdf, hit_t=hit_t,
        hit_valid=hit_valid, hit_pos=hit_pos, hit_normal=hit_normal,
        fib_u=fib_u, fib_v=fib_v, fib_w=fib_w, mp=mp, env_color=env_color,
        env_ambient=env_ambient, lights=lights, u_bsdf1=u_bsdf1,
        u_bsdf2=u_bsdf2, u_pick=u_pick, u_light1=u_light1,
        u_light2=u_light2, u_hairp=u_hairp, u_rr=u_rr, rr_gate=rr_gate,
        cfg=cfg)

    for i, v in enumerate((out.origin, out.direction, out.radiance,
                           out.color)):
        fout_ref[3 * i] = v.x
        fout_ref[3 * i + 1] = v.y
        fout_ref[3 * i + 2] = v.z
    fout_ref[12] = out.theta_i
    fout_ref[13] = out.prev_pdf
    for i, v in enumerate((out.shadow_o, out.shadow_d)):
        fout_ref[14 + 3 * i] = v.x
        fout_ref[14 + 3 * i + 1] = v.y
        fout_ref[14 + 3 * i + 2] = v.z
    fout_ref[20] = out.shadow_tmax
    fout_ref[21] = out.direct_rgb.x
    fout_ref[22] = out.direct_rgb.y
    fout_ref[23] = out.direct_rgb.z
    iout_ref[0] = out.flags
