"""Next-event estimation, light radiance, and environment shading.

Parity targets:
  * Light::calcLightdir of all 4 light kinds + distance/angular attenuation
    (/root/reference/src/libraries/KIRK/Common/Light.cpp:127-495, Light.h:72)
  * SimpleShader::calcDirectLight — one uniformly picked light, shadow ray
    through the scene AND against the analytic light geometry, with NO 1/N
    pick-probability compensation (SimpleShader.h:101-152; kept for parity)
  * LightShader (light-hit termination, LightShader.h:20-26)
  * EnvironmentShader (miss termination, EnvironmentShader.h:21-28)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import sampling as sp, vecmath as vm
from ..scene.types import (
    DeviceScene, Environment, LightPack,
    ENV_COLOR, ENV_CUBE_MAP, ENV_SPHERE_MAP,
    LIGHT_POINT, LIGHT_QUAD, LIGHT_SPOT, LIGHT_SUN,
)
from ..ops import bruteforce, intersect as isect
from . import bsdf as bsdf_mod


def distance_attenuation(lights: LightPack, idx, dist):
    """Light.h:72 — 1/(c + l·d + q·d²) only when c>0 or (l>0 and q>0)."""
    c = lights.const_att[idx]
    l = lights.lin_att[idx]
    q = lights.quad_att[idx]
    use = (c > 0.0) | ((l > 0.0) & (q > 0.0))
    denom = jnp.maximum(c + l * dist + q * dist * dist, 1e-12)
    return jnp.where(use, 1.0 / denom, 1.0)


class LightSample(NamedTuple):
    target: jnp.ndarray  # [R,3] sampled point on/toward the light
    attenuation: jnp.ndarray  # [R]


def sample_light_dir(lights: LightPack, idx, sample_pos, u) -> LightSample:
    """calcLightdir(randomize=True) for the per-ray chosen light `idx`.

    Returns the light target point (ray = target - sample_pos) and the
    attenuation factor, matching each kind's reference semantics.
    """
    pos = lights.position[idx]
    direction = lights.direction[idx]
    radius = lights.radius[idx]
    kind = lights.kind[idx]

    # --- point (Light.cpp:127-145)
    dir0 = vm.normalize(pos - sample_pos)
    sphere_pt = sp.uniform_sphere_sample(u)
    p_pos = pos + sphere_pt * radius[:, None]
    dd_point = jnp.clip(vm.dot(sphere_pt, -dir0), 0.0, 1.0)
    dist_point = vm.length(p_pos - sample_pos)
    att_point = dd_point * distance_attenuation(lights, idx, dist_point)

    # --- quad (Light.cpp:278-296): bilinear corner interpolation
    v = lights.verts[idx]  # [R,4,3]
    uu = u[:, 0:1]
    vv = u[:, 1:2]
    x1 = v[:, 0] + uu * (v[:, 1] - v[:, 0])
    x2 = v[:, 3] + uu * (v[:, 2] - v[:, 3])
    q_pos = x1 + vv * (x2 - x1)
    q_dir = q_pos - sample_pos
    dd_quad = jnp.clip(vm.dot(vm.normalize(-q_dir), direction), 0.0, 1.0)
    att_quad = dd_quad * distance_attenuation(lights, idx, vm.length(q_dir))

    # --- spot (Light.cpp:327-343): disk offset + quartic angular falloff
    disk = sp.sample_disk_about(u, direction, radius)
    s_pos = pos + disk
    s_dir = s_pos - sample_pos
    angle = jnp.degrees(jnp.arccos(jnp.clip(vm.dot(vm.normalize(-s_dir), direction), -1.0 + 1e-7, 1.0 - 1e-7)))
    inner = lights.inner_angle[idx]
    outer = lights.outer_angle[idx]
    delta = 1.0 - jnp.clip((angle - inner) / jnp.maximum(outer - inner, 1e-6), 0.0, 1.0)
    delta = delta ** 4
    att_spot = delta * distance_attenuation(lights, idx, vm.length(s_dir))

    # --- sun (Light.cpp:463-475): direction at 1e16
    sun_pt = radius[:, None] * sp.uniform_sphere_sample(u) - direction
    sun_pos = 1e16 * vm.normalize(sun_pt)
    att_sun = jnp.ones_like(att_point)

    target = jnp.where((kind == LIGHT_POINT)[:, None], p_pos,
             jnp.where((kind == LIGHT_QUAD)[:, None], q_pos,
             jnp.where((kind == LIGHT_SPOT)[:, None], s_pos, sun_pos)))
    att = jnp.where(kind == LIGHT_POINT, att_point,
          jnp.where(kind == LIGHT_QUAD, att_quad,
          jnp.where(kind == LIGHT_SPOT, att_spot, att_sun)))
    return LightSample(target, att)


def light_emitted_radiance(lights: LightPack, idx, ray_dir):
    """sampleLightSource on a light hit (Light.cpp:196-199, 234-239,
    436-440, 508-511)."""
    color = lights.color[idx]
    kind = lights.kind[idx]
    cdiv = jnp.where(lights.const_att[idx] > 0.0, lights.const_att[idx], 1.0)
    facing = vm.dot(vm.normalize(-ray_dir), lights.direction[idx]) >= 0.0
    inv_pi = 1.0 / jnp.pi

    rad_point = inv_pi * color / cdiv[:, None]
    rad_dirlike = inv_pi * jnp.where(facing[:, None], color, 0.0) / cdiv[:, None]
    rad_sun = color
    return jnp.where((kind == LIGHT_POINT)[:, None], rad_point,
           jnp.where((kind == LIGHT_SUN)[:, None], rad_sun, rad_dirlike))


def environment_color(env: Environment, ray_dir):
    """Environment::getColor (Environment.cpp:90-...): COLOR constant,
    SPHERE_MAP equirect, CUBE_MAP face pick."""
    if env.kind == ENV_COLOR or env.texture is None:
        return jnp.broadcast_to(env.color, ray_dir.shape)
    d = vm.normalize(ray_dir)
    if env.kind == ENV_SPHERE_MAP:
        u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi)
        v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0 + 1e-7, 1.0 - 1e-7)) / jnp.pi
        h, w = env.texture.shape[0], env.texture.shape[1]
        xi = jnp.clip((u * (w - 1)).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((v * (h - 1)).astype(jnp.int32), 0, h - 1)
        return env.texture[yi, xi]
    # cube map: 6 faces ordered +x,+y,+z,-x,-y,-z (Environment.cpp:105-118)
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    sx, sy, sz = jnp.sign(d[..., 0]), jnp.sign(d[..., 1]), jnp.sign(d[..., 2])
    mx = jnp.maximum(jnp.maximum(ax, ay), az)
    use_x = mx == ax
    use_y = (~use_x) & (mx == ay)
    side = jnp.where(use_x, (1.5 - 1.5 * sx).astype(jnp.int32),
           jnp.where(use_y, 1 + (1.5 - 1.5 * sy).astype(jnp.int32),
                     2 + (1.5 + 1.5 * sz).astype(jnp.int32)))
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    safe = lambda a: jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
    u = jnp.where(use_x, (dz / safe(dx) + 1) / 2,
        jnp.where(use_y, (dx / safe(ay) + 1) / 2, -(dx / safe(dz) + 1) / 2))
    v = jnp.where(use_x, (dy / safe(ax) + 1) / 2,
        jnp.where(use_y, (dz / safe(dy) + 1) / 2, (dy / safe(az) + 1) / 2))
    h, w = env.texture.shape[1], env.texture.shape[2]
    xi = jnp.clip((u % 1.0 * (w - 1)).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v % 1.0 * (h - 1)).astype(jnp.int32), 0, h - 1)
    return env.texture[side, yi, xi]


def quad_area(lights: LightPack, idx):
    """Area of the quad light's bilinear patch, as two triangles
    (Light.h:154-197 corner layout)."""
    v = lights.verts[idx]
    a1 = 0.5 * vm.length(vm.cross(v[:, 1] - v[:, 0], v[:, 3] - v[:, 0]))
    a2 = 0.5 * vm.length(vm.cross(v[:, 1] - v[:, 2], v[:, 3] - v[:, 2]))
    return jnp.maximum(a1 + a2, 1e-12)


def light_solid_angle_pdf(lights: LightPack, idx, direction, dist):
    """Solid-angle density of the NEE sampler producing `direction` toward
    light `idx` at distance `dist`, INCLUDING the uniform 1/N light pick.

    quad: area-uniform sample -> dist^2 / (A |cos theta_l|); point: the
    radius-r sphere sample approximated by its disk cross-section
    dist^2/(pi r^2); spot/sun: 0 (NEE-only strategies)."""
    kind = lights.kind[idx]
    d = vm.normalize(direction)
    cos_l = jnp.abs(vm.dot(d, lights.direction[idx]))
    p_quad = dist * dist / (quad_area(lights, idx) * jnp.maximum(cos_l, 1e-4))
    r = jnp.maximum(lights.radius[idx], 1e-6)
    p_point = dist * dist / (jnp.pi * r * r)
    p = jnp.where(kind == LIGHT_QUAD, p_quad,
        jnp.where(kind == LIGHT_POINT, p_point, 0.0))
    return p / lights.count


def power_heuristic(pf, pg):
    """Veach power heuristic (beta=2)."""
    pf2 = pf * pf
    return pf2 / jnp.maximum(pf2 + pg * pg, 1e-20)


def calc_direct_light_mis(
    scene: DeviceScene,
    mp: bsdf_mod.MatParams,
    hit: bruteforce.Hit,
    ray_dir,
    u_pick,
    u_light,
    shadow_chunk: int = 8192,
    occlude_fn=None,
    active=None,
    n_alive=None,
):
    """MIS-mode NEE: light picked uniformly WITH 1/N compensation, quad/point
    contributions in solid-angle measure weighted by the power heuristic
    against the BSDF pdf; spot/sun keep the reference attenuation form at
    weight 1 (their BSDF-hit twin contributes 0). The emitted radiance is
    `light_emitted_radiance` — the SAME Le a BSDF path sees on hitting the
    light, which is what makes the two strategies estimate one integral."""
    lights = scene.lights
    n_lights = lights.count
    if n_lights == 0:
        return jnp.zeros_like(hit.position)

    idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
    ls = sample_light_dir(lights, idx, hit.position, u_light)

    origin0 = hit.position
    direction = ls.target - origin0
    dist = vm.length(direction)
    wi = vm.normalize(direction)
    offset_n = vm.faceforward(hit.normal, -wi, hit.normal)
    origin = origin0 + 1e-4 * offset_n

    le = light_emitted_radiance(lights, idx, wi)
    f, bpdf = bsdf_mod.eval_pdf(mp, hit.normal, -vm.normalize(ray_dir), wi)
    cos_x = jnp.abs(vm.dot(wi, hit.normal))

    kind = lights.kind[idx]
    area_like = (kind == LIGHT_QUAD) | (kind == LIGHT_POINT)
    p_l = light_solid_angle_pdf(lights, idx, wi, dist)
    w = power_heuristic(p_l, bpdf)
    contrib_area = le * (cos_x * w / jnp.maximum(p_l, 1e-12))[:, None] * f
    # spot/sun: reference form x N pick compensation
    contrib_ref = lights.color[idx] * (ls.attenuation * cos_x)[:, None] * f * n_lights
    contrib = jnp.where(area_like[:, None], contrib_area, contrib_ref)

    t_max = dist * (1.0 - 1e-3)  # don't occlude against the target itself
    if active is not None:  # dead/non-geometry lanes: zero-length shadow ray
        t_max = jnp.where(active, t_max, 0.0)
    if occlude_fn is None:
        from ..ops import traverse
        blocked = traverse.any_hit(origin, wi, scene, t_max,
                                   chunk=shadow_chunk, n_alive=n_alive)
    else:
        blocked = occlude_fn(origin, wi, scene, t_max)
    t_l, valid_l = isect.light_hit_grid(origin, wi, lights)
    other = jnp.arange(n_lights)[None, :] != idx[:, None]
    blocked |= jnp.any(valid_l & other & (t_l < t_max[:, None]), axis=-1)

    has_color = jnp.any(lights.color[idx] > 0.0, axis=-1)
    return jnp.where((has_color & ~blocked)[:, None], contrib, 0.0)


def calc_direct_light(
    scene: DeviceScene,
    mp: bsdf_mod.MatParams,
    hit: bruteforce.Hit,
    ray_dir,  # [R,3] current ray direction (unnormalized ok)
    u_pick,  # [R] uniform for light selection
    u_light,  # [R,2] uniforms for the light-sample point
    shadow_chunk: int = 8192,
    occlude_fn=None,  # (o, d, scene, t_max) -> blocked [R]; default brute force
    active=None,  # [R] bool: lanes that actually shade (dead lanes get a
    # zero-length shadow ray — free under the compacted-wavefront gating)
    n_alive=None,
):
    """SimpleShader::calcDirectLight, vectorized (SimpleShader.h:101-152).

    One light is picked uniformly per ray; the contribution is NOT divided
    by the pick probability (reference parity). Shadow rays test scene
    geometry and all analytic light shapes.
    """
    lights = scene.lights
    n_lights = lights.count
    if n_lights == 0:
        return jnp.zeros_like(hit.position)

    idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
    ls = sample_light_dir(lights, idx, hit.position, u_light)

    origin0 = hit.position
    direction = ls.target - origin0
    lightpos = origin0 + direction
    # surface offset toward the light side (SimpleShader.h:117)
    offset_n = vm.faceforward(hit.normal, origin0 - lightpos, hit.normal)
    origin = origin0 + 1e-4 * offset_n
    wi = vm.normalize(direction)

    light_color = lights.color[idx]
    f = bsdf_mod.evaluate_light(mp, hit.normal, wi, -vm.normalize(ray_dir))
    contrib = light_color * ls.attenuation[:, None] * f * jnp.abs(vm.dot(wi, hit.normal))[:, None]

    t_max = vm.length(lightpos - origin)
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    if occlude_fn is None:
        from ..ops import traverse
        blocked = traverse.any_hit(origin, wi, scene, t_max,
                                   chunk=shadow_chunk, n_alive=n_alive)
    else:
        blocked = occlude_fn(origin, wi, scene, t_max)
    # light geometry also occludes (SimpleShader.h:135-144)
    t_l, valid_l = isect.light_hit_grid(origin, wi, lights)
    blocked |= jnp.any(valid_l & (t_l < t_max[:, None]), axis=-1)

    has_color = jnp.any(light_color > 0.0, axis=-1)
    return jnp.where((has_color & ~blocked)[:, None], contrib, 0.0)
