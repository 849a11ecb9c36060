"""Whitted raytracer with single-pass closed-form Marschner fur.

TPU re-design of KIRK::CPU::SimpleCPURaytracer
(/root/reference/src/libraries/KIRK/CPU/CPU_Raytracer/Simple_CPU_Raytracer.cpp):
the reference recursion (trace -> shade -> {refraction, reflection} children,
Simple_CPU_Raytracer.cpp:55-107,356-449) is a binary tree of weighted rays.
Because the reference combines child colors with `mix` (affine in each
child), the tree linearizes exactly: every node carries an accumulated color
weight, local shading is scaled by it, and the recursion becomes a breadth-
first list of pixel-aligned wavefronts — at most 2^depth traces, each a
fused XLA program over all pixels.

Parity notes:
  * lightShading: ALL lights each hit (not NEE-sampled), Phong diffuse +
    specular with shininess = 1/max(roughness,1e-3) (Material.h:119),
    ambient = env_ambient * diffuse, hard shadow rays with bias 1e-2 along
    the view-flipped normal and isIntersection(t<1) against the unnormalized
    to-light direction (:80-180).
  * shade(): fresnel = clamp(refl^2 - transp^2 + r_theta*refl, 0, 1) with
    the hardcoded 1.56 ior Schlick r_theta (:540-545); refraction spawns
    with weight volume*transparency and falls back to reflection on total
    internal reflection (:212-235); reflection spawns with weight
    specular*fresnel; both gated by Minweight=0.01 (CVK_Defs.h:67) and
    level < depth.
  * shadeMarschnerHair: final color is the R lobe ONLY — TT and TRT are
    computed but commented out of the sum in the reference (:755). Default
    reproduces that; hair_lobes="all" adds TT+TRT using REAL second-wall
    normals traced through the accel structure (:575-585), like the
    reference's computation of those lobes.
  * background: environment color at any depth (:77).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod, sampling, vecmath as vm
from ..scene.types import DeviceScene
from ..ops import traverse
from . import bsdf as bsdf_mod, fur, shading

MINWEIGHT = 0.01  # CVK_Defs.h:67
RAY_EPS = 1e-4  # Ray.h:9


class WhittedConfig(NamedTuple):
    depth: int = 3  # recursion depth (reference default 8, CPU_Raytracer.h:75;
    #                 each level doubles the wavefront tree — keep modest)
    supersamples: int = 1  # N×N subpixel grid (superSampling, :252-280)
    hair_lobes: str = "r"  # "r" (reference parity, :755) | "all" (R+TT+TRT)
    shadows: bool = True
    reflections: bool = True  # RTFLAG_USE_REFLECTIONS
    refractions: bool = True  # RTFLAG_USE_REFRACTIONS
    soft_shadows: bool = False  # RTFLAG_SOFT_SHADOWS: jittered shadow rays
    #   toward light-sphere/area samples (Ray::jitterBy + randomized
    #   calcLightdir, Light.cpp:127-159)
    shadow_samples: int = 4  # visibility samples per light when soft
    aa: str = "grid"  # subpixel pattern: "grid" | "poisson"
    #   (PoissonDiskGenerator AA, Simple_CPU_Raytracer.h:26)
    adaptive: bool = False  # adaptive supersampling: refine only pixels
    #   whose luminance differs from a neighbor beyond the threshold
    #   (Simple_CPU_Raytracer adaptive flag)
    adaptive_threshold: float = 0.1
    ray_chunk: int = 16384


def _norm_view_flip(norm, view):
    """Flip the normal toward the viewer (:97-103 / :371-376)."""
    m_dot = vm.dot(norm, view)
    flip = jnp.abs(m_dot) >= 1e-5
    flipped = -vm.normalize(m_dot[:, None] * norm)
    return jnp.where(flip[:, None], flipped, norm)


def _light_target_deterministic(lights, i, pos):
    """calcLightdir(randomize=False) for light i: point/spot/quad aim at the
    light position, sun at pos - direction * 1e16 (infinitely far opposite
    its direction, Light.cpp:463-475)."""
    kind = lights.kind[i]
    lp = lights.position[i]
    ld = lights.direction[i]
    sun_target = pos - ld[None] * 1e16
    return jnp.where(kind == 3, sun_target, jnp.broadcast_to(lp, pos.shape))


def light_shading(scene: DeviceScene, pos, norm, uv, view, mp, diff_color,
                  cfg: WhittedConfig, key=None):
    """SimpleCPURaytracer::lightShading (:80-180). Hard shadows by default;
    cfg.soft_shadows averages `shadow_samples` jittered visibility rays per
    light (randomized calcLightdir + jitterBy semantics)."""
    lights = scene.lights
    color = scene.env.ambient * diff_color  # ambient part (:88)
    norm_view = _norm_view_flip(norm, view)
    shininess = 1.0 / jnp.maximum(mp.roughness, 1e-3)

    for i in range(lights.count):
        target = _light_target_deterministic(lights, i, pos)
        ldir = target - pos
        n_ldir = vm.normalize(ldir)
        dist = vm.length(ldir)
        idx = jnp.full((pos.shape[0],), i, jnp.int32)
        att = shading.distance_attenuation(lights, idx, dist)
        # per-kind angular attenuation (Light.cpp calcLightdir non-random);
        # light->point direction is -n_ldir.
        kind = lights.kind[i]
        laxis = lights.direction[i][None]
        dd = jnp.clip(vm.dot(-n_ldir, laxis), 0.0, 1.0)
        ang = jnp.degrees(jnp.arccos(jnp.clip(vm.dot(-n_ldir, laxis), -1.0, 1.0)))
        inner, outer = lights.inner_angle[i], lights.outer_angle[i]
        delta = (1.0 - jnp.clip((ang - inner) / jnp.maximum(outer - inner, 1e-6),
                                0.0, 1.0)) ** 4
        att = jnp.where(kind == 1, att * dd,  # quad faces the point
              jnp.where(kind == 2, att * delta, att))  # spot falloff
        facing = vm.dot(norm_view, n_ldir) >= 0.0
        lit = (att > 0.0) & facing

        cos_phi = jnp.maximum(vm.dot(norm, n_ldir), 0.0)
        direct = cos_phi[:, None] * diff_color * lights.color[i] * att[:, None]
        refl = vm.reflect(n_ldir, norm)
        cos_psi = jnp.maximum(vm.dot(refl, view), 0.0) ** shininess
        direct = direct + (mp.reflectivity * cos_psi)[:, None] * mp.specular \
            * lights.color[i] * att[:, None]
        direct = jnp.where(lit[:, None], direct, 0.0)

        if cfg.shadows:
            origin = pos + 1e-2 * norm_view
            if cfg.soft_shadows and key is not None:
                # average visibility over jittered light samples: point/spot
                # jitter within the light sphere radius, quads within their
                # equivalent-area radius, suns within an angular disk (the
                # 1e16-distant target scaled accordingly).
                ns = max(1, cfg.shadow_samples)
                scale = jnp.where(kind == 3, 1e14, 1.0) * \
                    jnp.maximum(lights.radius[i], 1e-3)
                lkey = jax.random.fold_in(key, i)
                vis = jnp.zeros((pos.shape[0],), jnp.float32)
                for s in range(ns):
                    u = jax.random.uniform(jax.random.fold_in(lkey, s),
                                           (pos.shape[0], 3))
                    sphere = sampling.uniform_sphere_sample(u[:, :2]) \
                        * (u[:, 2:] ** (1.0 / 3.0))
                    sdir = target + scale * sphere - origin
                    blocked = traverse.any_hit(
                        origin, sdir, jax.lax.stop_gradient(scene),
                        jnp.ones(pos.shape[0]), chunk=cfg.ray_chunk)
                    vis = vis + jnp.where(blocked, 0.0, 1.0 / ns)
                direct = direct * vis[:, None]
            else:
                sdir = target - origin
                blocked = traverse.any_hit(origin, sdir,
                                           jax.lax.stop_gradient(scene),
                                           jnp.ones(pos.shape[0]),
                                           chunk=cfg.ray_chunk)
                direct = jnp.where(blocked[:, None], 0.0, direct)
        color = color + direct
    return color


def _hair_color(scene, hit, view_n, mp, cfg: WhittedConfig):
    """shadeMarschnerHair (:451-760) — closed-form lobes, with real traced
    second/third-wall normals when hair_lobes='all'."""
    nin = view_n  # normalized incoming ray direction
    normal = hit.normal
    if cfg.hair_lobes == "all":
        sg = jax.lax.stop_gradient
        nf = vm.faceforward(normal, -nin, normal)
        ior = mp.ior[:, None]
        t_dir = vm.refract(-nin, nf, 1.0 / ior)
        t_hit = traverse.closest_hit(hit.position + 1e-4 * t_dir, t_dir,
                                     sg(scene), chunk=cfg.ray_chunk)
        t_normal = jnp.where(t_hit.valid[:, None], t_hit.normal, normal)
        t_pos = jnp.where(t_hit.valid[:, None], t_hit.position, hit.position)
        t_nf = vm.faceforward(t_normal, -vm.normalize(t_dir), t_normal)
        tr_dir = vm.reflect(-vm.normalize(t_dir), t_nf)
        tr_hit = traverse.closest_hit(t_pos + 1e-4 * tr_dir, tr_dir,
                                      sg(scene), chunk=cfg.ray_chunk)
        tr_normal = jnp.where(tr_hit.valid[:, None], tr_hit.normal, normal)
    else:
        t_normal = tr_normal = normal

    lobes = fur.marschner_closed_form(mp, nin, normal, hit.fiber_v,
                                      t_normal, tr_normal)
    if cfg.hair_lobes == "all":
        return lobes.scat_r + lobes.scat_tt + lobes.scat_trt
    return lobes.scat_r  # reference sums only R (:755)


def render_whitted(scene: DeviceScene, camera: cam_mod.Camera,
                   cfg: WhittedConfig = WhittedConfig()) -> jnp.ndarray:
    """Deterministic Whitted render -> [H,W,3]. jit-able; wrap in jax.jit
    with cfg static."""
    w, h = camera.resolution
    px, py = cam_mod.pixel_grid(camera.resolution)
    r = px.shape[0]
    image = jnp.zeros((r, 3), jnp.float32)

    n_ss = max(1, cfg.supersamples)
    offsets = [(0.5, 0.5)] if n_ss == 1 else [
        ((i + 0.5) / n_ss, (j + 0.5) / n_ss)
        for j in range(n_ss) for i in range(n_ss)]

    for ox, oy in offsets:
        jit = jnp.broadcast_to(jnp.asarray([ox, oy], jnp.float32), (r, 2))
        o, d = cam_mod.rays_from_pixels(camera, px, py, jit)
        image = image + _trace_tree(scene, o, d, cfg) / len(offsets)

    return image.reshape(h, w, 3)


def _trace_tree(scene, o, d, cfg: WhittedConfig):
    """Breadth-first linearized recursion: wavefronts carry (o, d,
    color-weight W [R,3], scalar trace-weight w [R]).

    W is the product of the mix factors on the path to the root (what the
    child subtree's color is multiplied by); w reproduces the reference's
    scalar `weight` argument, which both gates Minweight AND multiplies the
    child color again (`weight * trace(...)`, :107,228 — a genuine quirk of
    the reference kept for parity)."""
    r = o.shape[0]
    color = jnp.zeros((r, 3), jnp.float32)
    wavefronts = [(o, d, jnp.ones((r, 3), jnp.float32), jnp.ones((r,), jnp.float32))]

    for level in range(cfg.depth + 1):
        next_wavefronts = []
        for (wo_, wd_, W_, w_) in wavefronts:
            c, children = _trace_shade(scene, wo_, wd_, W_, w_, level, cfg)
            color = color + c
            next_wavefronts.extend(children)
        if not next_wavefronts:
            break
        wavefronts = next_wavefronts
    return color


def _trace_shade(scene, o, d, W, w, level, cfg: WhittedConfig):
    """One wavefront: trace + shade; returns (color contribution [R,3],
    child wavefronts)."""
    live = jnp.any(W > 0.0, axis=-1)
    hit = traverse.closest_hit(o, d, scene, chunk=cfg.ray_chunk)
    view = vm.normalize(d)

    # background (:77)
    env_c = shading.environment_color(scene.env, d)
    miss = live & ~hit.valid
    color = jnp.where(miss[:, None], W * env_c, 0.0)

    mp = bsdf_mod.gather_materials(scene.materials, hit.mat_id, hit.uv,
                                   scene.textures, scene.tex_slots)
    is_hair = (mp.shader_id == 1) & hit.valid & live
    is_surf = hit.valid & live & ~is_hair

    # --- surface shade (:356-449)
    base = light_shading(scene, hit.position, hit.normal, hit.uv, view, mp,
                         mp.diffuse, cfg)
    norm = hit.normal
    norm_view = _norm_view_flip(norm, view)

    angle = vm.angle_between(-view, norm_view)
    r_0 = ((1.0 - 1.56) / (1.0 + 1.56)) ** 2  # hardcoded 1.56 (:543)
    r_theta = r_0 + (1.0 - r_0) * (1.0 - jnp.cos(angle)) ** 5
    fresnel = jnp.clip(mp.reflectivity ** 2 - mp.transparency ** 2
                       + r_theta * mp.reflectivity, 0.0, 1.0)

    children = []
    can_recurse = level < cfg.depth

    if can_recurse and cfg.refractions:
        ft = mp.transparency * (1.0 - fresnel)
        spawn_t = is_surf & (ft * w > MINWEIGHT)
        eta = jnp.where(hit.enter, 1.0 / mp.ior, mp.ior)[:, None]
        refr_n = jnp.where(hit.enter[:, None], norm, -norm)
        tdir = vm.refract(view, refr_n, eta)
        tir = jnp.all(tdir == 0.0, axis=-1) | jnp.isnan(tdir[:, 0])
        # total internal reflection -> reflect instead (:230-232)
        rdir = vm.normalize(vm.reflect(view, norm_view))
        safe_t = jnp.where(tir[:, None], rdir, tdir)
        cdir = jnp.where(tir[:, None], rdir, vm.normalize(safe_t))
        corig = jnp.where(tir[:, None],
                          hit.position + 1e-2 * norm_view,
                          hit.position + RAY_EPS * cdir)
        # mix(color, volume * (1 * trace(...)), T): parent keeps (1-T);
        # refraction() is called with weight=1 (:436) so no extra scalar.
        child_W = W * mp.volume * mp.transparency[:, None]
        child_W = jnp.where(spawn_t[:, None], child_W, 0.0)
        child_w = jnp.where(spawn_t, ft, 0.0)  # falloff * 1
        base = jnp.where(spawn_t[:, None],
                         base * (1.0 - mp.transparency)[:, None], base)
        children.append((corig, cdir, child_W, child_w))

    if can_recurse and cfg.reflections:
        spawn_r = is_surf & (fresnel * w > MINWEIGHT)
        rdir = vm.normalize(vm.reflect(view, norm_view))
        rorig = hit.position + 1e-2 * norm_view
        # mix(c1, specular * (w * trace(...)), F): the child color is scaled
        # by specular, the mix factor F, AND the scalar weight again (:107)
        child_W = W * mp.specular * (fresnel * w)[:, None]
        child_W = jnp.where(spawn_r[:, None], child_W, 0.0)
        child_w = jnp.where(spawn_r, fresnel * w, 0.0)
        base = jnp.where(spawn_r[:, None], base * (1.0 - fresnel)[:, None], base)
        children.append((rorig, rdir, child_W, child_w))

    color = color + jnp.where(is_surf[:, None], W * base, 0.0)

    # --- hair shade
    hair_c = _hair_color(scene, hit, view, mp, cfg)
    color = color + jnp.where(is_hair[:, None], W * hair_c, 0.0)

    return color, children


def render_whitted_jit(scene, camera, cfg: WhittedConfig = WhittedConfig()):
    fn = jax.jit(partial(render_whitted, camera=camera, cfg=cfg))
    return fn(scene)


class HairPathRecord(NamedTuple):
    """The IntersectionTest analog (src/executables/IntersectionTest/
    main.cpp:187-236): every segment of the Marschner walk for a batch of
    rays, for file/notebook visualization instead of CVK line lists.

    Each field is [R, 2, 3] = (start, end) of a segment; `valid` masks rays
    that hit a fiber at all."""

    in_ray: jnp.ndarray  # camera ray to the first fiber hit (green)
    normal0: jnp.ndarray  # normal at first hit (blue)
    normal1: jnp.ndarray  # normal at second wall (cyan)
    out_r: jnp.ndarray  # R lobe exit (red)
    out_tt: jnp.ndarray  # TT exit at second wall (yellow)
    out_trt: jnp.ndarray  # TRT exit at first-wall re-hit (orange)
    valid: jnp.ndarray  # [R]


def record_hair_paths(scene: DeviceScene, o, d,
                      cfg: WhittedConfig = WhittedConfig(),
                      seg_len: float = 0.05) -> HairPathRecord:
    """Trace rays and record the fur R/TT/TRT walk geometry
    (getInRays/getNormalRays/getOutRays, Simple_CPU_Raytracer.h:91-101)."""
    hit = traverse.closest_hit(o, d, scene, chunk=cfg.ray_chunk)
    mp = bsdf_mod.gather_materials(scene.materials, hit.mat_id, hit.uv,
                                   scene.textures, scene.tex_slots)
    nin = vm.normalize(d)
    valid = hit.valid & (mp.shader_id == 1)
    normal = hit.normal
    pos = hit.position
    nf = vm.faceforward(normal, -nin, normal)

    out_r = vm.reflect(-nin, nf)
    ior = mp.ior[:, None]
    t_dir = vm.refract(-nin, nf, 1.0 / ior)
    t_hit = traverse.closest_hit(pos + 1e-4 * t_dir, t_dir, scene,
                                 chunk=cfg.ray_chunk)
    t_n = jnp.where(t_hit.valid[:, None], t_hit.normal, normal)
    t_nf = vm.faceforward(t_n, -vm.normalize(t_dir), t_n)
    out_tt = vm.refract(-vm.normalize(t_dir), t_nf, 1.0)
    tr_dir = vm.reflect(-vm.normalize(t_dir), t_nf)
    tr_hit = traverse.closest_hit(t_hit.position + 1e-4 * tr_dir, tr_dir,
                                  scene, chunk=cfg.ray_chunk)
    tr_n = jnp.where(tr_hit.valid[:, None], tr_hit.normal, normal)
    tr_nf = vm.faceforward(tr_n, -vm.normalize(tr_dir), tr_n)
    out_trt = vm.refract(-vm.normalize(tr_dir), tr_nf,
                         jnp.clip(mp.ior, -1.0, 1.0)[:, None])

    def seg(start, direction):
        ln = vm.length(direction, keepdims=True)
        nd = direction / jnp.maximum(ln, 1e-12)  # zero dirs → zero segment
        return jnp.stack([start, start + seg_len * nd], 1)

    # misses leave position at o + INF*d — anchor fallbacks to the previous
    # walk point so recorded segments stay finite
    t_pos = jnp.where(t_hit.valid[:, None], t_hit.position, pos)
    tr_pos = jnp.where(tr_hit.valid[:, None], tr_hit.position, t_pos)
    return HairPathRecord(
        in_ray=jnp.stack([o, pos], axis=1),
        normal0=seg(pos, normal),
        normal1=seg(t_pos, t_n),
        out_r=seg(pos, out_r),
        out_tt=seg(t_pos, out_tt),
        out_trt=seg(tr_pos, out_trt),
        valid=valid,
    )
