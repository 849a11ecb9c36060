"""Accelerated scene intersection: LBVH dispatch + full Hit construction.

The runtime seam equivalent of KIRK's pluggable `CPU_DataStructure`
(CPU_DataStructure.h:14-30): a scene carries optional tri/cone BVHs
(attached by `attach_bvh`); `closest_hit`/`any_hit` here route to the LBVH
traversal when present and to the brute-force oracle otherwise — the
runtime-switchable accel-structure design of the reference
(Demo/main.cpp:94-127), expressed as pytree structure instead of virtuals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..scene.types import DeviceScene
from . import bruteforce, bvh as bvh_mod, intersect as isect

INF = isect.INF


#: Accel-structure registry — the runtime-switchable family of the
#: reference (Demo/main.cpp:94-127 swaps BVH/KD/Octree/UniformGrid/
#: NoDataStructure at runtime). Every entry is a *clustering policy*
#: feeding the same culled-cluster traversal; "none" (no BVH attached)
#: is the NoDataStructure brute-force oracle.
#:   sah    — capacity-clamped binned SAH (CPU_BVH.cpp:357-461 family)
#:   median — longest-axis object-median splits (the KD-tree analog:
#:            CPU_KD.h:15-60's plane-split recursion as object partition)
#:   morton — on-device morton clustering = a linearized octree (each
#:            cluster is a contiguous octant range; Octree.h:11 analog),
#:            jit-friendly for dynamic geometry
#:   grid   — uniform-grid cell binning (UniformGrid.h:12-50 analog)
ACCEL_BUILDERS = {
    "sah": bvh_mod.build_sah,
    "median": bvh_mod.build_median,
    "morton": bvh_mod.build,
    "grid": bvh_mod.build_grid,
}


def _prev_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n.bit_length() - 1)


def auto_leaf_size(n_prims: int, target: int = 256) -> int:
    """Pick a leaf size near `target` that fills the power-of-two leaf count
    tightly (occupancy >= ~75% instead of the worst-case 50% a fixed leaf
    size gives), rounded up to a multiple of 8 for VPU lane alignment.

    target=256 from the round-3 TPU sweep (100k tris, chunk 4096): leaf 256
    / 512 flat leaves traverses at 2.65M primary rays/s vs 2.40M at the old
    64-target (k=104) and 1.42M at 512 — fewer, larger rounds win because
    the per-round leaf gather approaches streaming bandwidth while the
    round count (the lock-step tail) drops."""
    n_leaves = max(_next_pow2(-(-n_prims // target)), 1)
    k = -(-n_prims // n_leaves)
    return max(-(-k // 8) * 8, 8)


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def auto_fanout(n_leaves: int, max_supers: int = 1024) -> int:
    """Fan-out (children per super-cluster) for the hierarchical traversal:
    0 (flat) while the dense [R, C] phase-1 grid is cheap, else the smallest
    power-of-two that keeps the super count <= max_supers."""
    if n_leaves <= 512:
        return 0
    f = 16
    while n_leaves // f > max_supers:
        f *= 2
    return min(f, n_leaves)


def attach_bvh(scene: DeviceScene, leaf_size: int | None = None,
               method: str = "median", min_prims: int = 2048,
               fanout: int | None = None) -> DeviceScene:
    """Build LBVHs over the primitive packs and reorder the packs so leaf
    clusters are contiguous.

    method: one of ACCEL_BUILDERS ("sah"/"median" host-side numpy — best
    quality; "morton" on-device, jit-friendly, for dynamic geometry;
    "grid" uniform-grid cells) or "none" for brute force. Packs smaller
    than `min_prims` are left alone — the dense all-pairs grid beats cluster
    traversal below that size, and closest_hit mixes the two per pack.

    leaf_size/fanout default to size-dependent auto choices (auto_leaf_size /
    auto_fanout); pass explicit values to override. Host (numpy) packs build
    entirely on host — call scene.to_device / types.to_device afterwards for
    a single batched transfer.
    """
    if method == "none":
        return scene
    build = ACCEL_BUILDERS[method]
    tris, cones = scene.tris, scene.cones
    tri_bvh = cone_bvh = None
    if tris.count >= min_prims:
        k = leaf_size or auto_leaf_size(tris.count)
        bmin, bmax = isect.triangle_aabbs(tris)
        tri_bvh = build(bmin, bmax, k)
        f = auto_fanout(tri_bvh.n_leaves) if fanout is None else fanout
        tri_bvh = tri_bvh.replace(fanout=f)
        tris = bvh_mod.reorder_tris(tris, tri_bvh)
        tri_bvh = bvh_mod.pack_tris(tris, tri_bvh)
    if cones.count >= min_prims:
        k = leaf_size or auto_leaf_size(cones.count)
        bmin, bmax = isect.cone_aabbs(cones)
        cone_bvh = build(bmin, bmax, k)
        f = auto_fanout(cone_bvh.n_leaves) if fanout is None else fanout
        cone_bvh = cone_bvh.replace(fanout=f)
        cones = bvh_mod.reorder_cones(cones, cone_bvh)
        cone_bvh = bvh_mod.pack_cones(cones, cone_bvh)
    return scene.replace(tris=tris, cones=cones, tri_bvh=tri_bvh,
                         cone_bvh=cone_bvh)


def _cone_enter_at(cones, cone_id, o, d, t):
    """Was the winning cone hit the entering (nearer) root? Recompute the
    quadratic for the single winner (Cylinder.cpp:126,140 semantics)."""
    base = cones.base[cone_id]
    u_ax, v_ax, w_ax = cones.u[cone_id], cones.v[cone_id], cones.w[cone_id]
    slope, r_base = cones.slope[cone_id], cones.r_base[cone_id]
    rel = o - base
    px, py, pz = vm.dot(rel, u_ax), vm.dot(rel, v_ax), vm.dot(rel, w_ax)
    dx, dy, dz = vm.dot(d, u_ax), vm.dot(d, v_ax), vm.dot(d, w_ax)
    a = dx * dx + dz * dz - slope * slope * dy * dy
    b = px * dx + pz * dz + r_base * slope * dy - slope * slope * py * dy
    disc = b * b - a * (px * px + pz * pz - (r_base - slope * py) ** 2)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    ra = (-b - sq) / a_safe
    rb = (-b + sq) / a_safe
    t1 = jnp.minimum(ra, rb)
    t2 = jnp.maximum(ra, rb)
    # classify by whichever root t is closer to (scale-free: thin-cone
    # quadratics are noisy in f32, an absolute tolerance misclassifies)
    return jnp.abs(t - t1) <= jnp.abs(t - t2)


def closest_hit_bvh(o, d, scene: DeviceScene, t_min=1e-4, t_max=INF,
                    chunk: int = 16384, n_alive=None) -> bruteforce.Hit:
    """Nearest hit via LBVH traversal; Hit layout identical to the oracle.

    The traversal while_loop is not reverse-differentiable, so it runs on
    stop_gradient'ed inputs and only *selects* the winning primitive row;
    the winner's t is then recomputed differentiably outside the loop (same
    math, same data ⇒ bit-identical value, but with a VJP)."""
    from ..scene.types import ensure_device
    scene = ensure_device(scene)
    r = o.shape[0]
    tris, cones = scene.tris, scene.cones
    sg = jax.lax.stop_gradient
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    cap = t_max_arr[:, None]

    t_tri = jnp.full((r,), INF)
    tri_row = jnp.zeros((r,), jnp.int32)
    if scene.tri_bvh is not None:
        sbvh = sg(scene.tri_bvh)
        _, tri_row, found = bvh_mod.traverse(
            sbvh, sg(o), sg(d), bvh_mod.tri_leaf_packed(sbvh), t_min,
            sg(t_max_arr), chunk=chunk, n_alive=n_alive)
        tri_row = jnp.maximum(tri_row, 0)
        t_re = bvh_mod.tri_leaf_rows(tris)(o, d, tri_row[:, None], t_min,
                                           t_max_arr)[:, 0]
        t_tri = jnp.where(found, t_re, INF)
    elif tris.count:  # small pack: dense all-pairs grid
        tg, _, _, _ = isect.triangle_hit_grid(o, d, tris, t_min, cap)
        tri_row = jnp.argmin(tg, axis=-1).astype(jnp.int32)
        t_tri = jnp.take_along_axis(tg, tri_row[:, None], axis=-1)[:, 0]

    t_cone = jnp.full((r,), INF)
    cone_row = jnp.zeros((r,), jnp.int32)
    if scene.cone_bvh is not None:
        sbvh = sg(scene.cone_bvh)
        _, cone_row, found_c = bvh_mod.traverse(
            sbvh, sg(o), sg(d), bvh_mod.cone_leaf_packed(sbvh), t_min,
            sg(t_max_arr), chunk=chunk, n_alive=n_alive)
        cone_row = jnp.maximum(cone_row, 0)
        t_re = bvh_mod.cone_leaf_rows(cones)(o, d, cone_row[:, None], t_min,
                                             t_max_arr)[:, 0]
        t_cone = jnp.where(found_c, t_re, INF)
    elif cones.count:
        cg, _, _ = isect.cone_hit_grid(o, d, cones, t_min, cap)
        cone_row = jnp.argmin(cg, axis=-1).astype(jnp.int32)
        t_cone = jnp.take_along_axis(cg, cone_row[:, None], axis=-1)[:, 0]

    return _assemble_hit(o, d, scene, t_tri, tri_row, t_cone, cone_row,
                         t_max_arr)


def _assemble_hit(o, d, scene: DeviceScene, t_tri, tri_row, t_cone, cone_row,
                  t_max) -> bruteforce.Hit:
    """Merge per-pack winners into a full Hit (Intersection.h:11-48 analog).
    Rows index the scene's CURRENT packs (reordered ones when BVHs are
    attached — perm maps back to original prim ids)."""
    r = o.shape[0]
    tris, cones = scene.tris, scene.cones
    cone_wins = t_cone < t_tri
    t = jnp.where(cone_wins, t_cone, t_tri)
    valid = t < t_max
    prim_type = jnp.where(
        ~valid, bruteforce.PRIM_NONE,
        jnp.where(cone_wins, bruteforce.PRIM_CONE, bruteforce.PRIM_TRI)).astype(jnp.int32)
    position = o + t[:, None] * d

    n = jnp.zeros_like(o)
    uv = jnp.zeros((r, 2), jnp.float32)
    mat_id = jnp.zeros((r,), jnp.int32)
    fu = jnp.zeros_like(o)
    fv = jnp.zeros_like(o)
    fw = jnp.zeros_like(o)
    enter = jnp.zeros((r,), bool)
    prim_id = jnp.zeros((r,), jnp.int32)

    if tris.count:
        tn, tuv, _ = isect.triangle_interpolate(tris, tri_row, position, o, d)
        is_tri = prim_type == bruteforce.PRIM_TRI
        n = jnp.where(is_tri[:, None], tn, n)
        uv = jnp.where(is_tri[:, None], tuv, uv)
        mat_id = jnp.where(is_tri, tris.mat_id[tri_row], mat_id)
        fu = jnp.where(is_tri[:, None], tris.fiber_u[tri_row], fu)
        fv = jnp.where(is_tri[:, None], tris.fiber_v[tri_row], fv)
        fw = jnp.where(is_tri[:, None], tris.fiber_w[tri_row], fw)
        orig = (scene.tri_bvh.perm[tri_row] if scene.tri_bvh is not None
                else tri_row)
        prim_id = jnp.where(is_tri, orig, prim_id)
    if cones.count:
        cn = isect.cone_normal(cones, cone_row, position)
        cuv = isect.cone_texcoord(cones, cone_row, position)
        is_cone = prim_type == bruteforce.PRIM_CONE
        n = jnp.where(is_cone[:, None], cn, n)
        uv = jnp.where(is_cone[:, None], cuv, uv)
        mat_id = jnp.where(is_cone, cones.mat_id[cone_row], mat_id)
        fu = jnp.where(is_cone[:, None], cones.u[cone_row], fu)
        fv = jnp.where(is_cone[:, None], cones.v[cone_row], fv)
        fw = jnp.where(is_cone[:, None], cones.w[cone_row], fw)
        enter = is_cone & _cone_enter_at(cones, cone_row, o, d, t)
        orig = (scene.cone_bvh.perm[cone_row] if scene.cone_bvh is not None
                else cone_row)
        prim_id = jnp.where(is_cone, orig, prim_id)

    return bruteforce.Hit(
        t=jnp.where(valid, t, INF), valid=valid, prim_type=prim_type,
        prim_id=prim_id, mat_id=mat_id, position=position, normal=n, uv=uv,
        enter=enter, fiber_u=fu, fiber_v=fv, fiber_w=fw)


def any_hit_bvh(o, d, scene: DeviceScene, t_max, t_min=1e-4,
                chunk: int = 16384, n_alive=None):
    """Shadow-ray occlusion via early-exit LBVH traversal (boolean result —
    no gradient path, so everything runs on stopped inputs)."""
    from ..scene.types import ensure_device
    scene = ensure_device(scene)
    sg = jax.lax.stop_gradient
    o, d, t_max = sg(o), sg(d), sg(t_max)
    blocked = jnp.zeros((o.shape[0],), bool)
    if scene.tri_bvh is not None:
        sbvh = sg(scene.tri_bvh)
        _, _, f = bvh_mod.traverse(sbvh, o, d, bvh_mod.tri_leaf_packed(sbvh),
                                   t_min, t_max, any_hit=True, chunk=chunk,
                                   n_alive=n_alive)
        blocked |= f
    elif scene.tris.count:
        tg, _, _, valid = isect.triangle_hit_grid(o, d, scene.tris, t_min,
                                                  t_max[:, None])
        blocked |= jnp.any(valid, axis=-1)
    if scene.cone_bvh is not None:
        sbvh = sg(scene.cone_bvh)
        _, _, f = bvh_mod.traverse(sbvh, o, d, bvh_mod.cone_leaf_packed(sbvh),
                                   t_min, t_max, any_hit=True, chunk=chunk,
                                   n_alive=n_alive)
        blocked |= f
    elif scene.cones.count:
        _, _, valid = isect.cone_hit_grid(o, d, scene.cones, t_min,
                                          t_max[:, None])
        blocked |= jnp.any(valid, axis=-1)
    return blocked


def closest_hit_pallas(o, d, scene: DeviceScene, t_min=1e-4, t_max=INF) -> bruteforce.Hit:
    """Nearest hit via the fused Pallas streaming kernels (ops/pallas):
    exact brute force without the [R,P] grid — for mid-size scenes on TPU
    where no BVH is attached."""
    from .pallas import intersect as pk
    from ..scene.types import ensure_device

    scene = ensure_device(scene)  # tracer-indexing needs jnp leaves
    r = o.shape[0]
    sg = jax.lax.stop_gradient

    t_tri = jnp.full((r,), INF)
    tri_row = jnp.zeros((r,), jnp.int32)
    if scene.tris.count:
        packed, _ = pk.pack_tris_cm(sg(scene.tris))
        t_k, tri_row = pk.tri_closest(sg(o), sg(d), packed, t_min)
        tri_row = jnp.maximum(tri_row, 0)
        found = t_k < t_max
        # differentiable winner-t recompute (see closest_hit_bvh)
        t_re = bvh_mod.tri_leaf_rows(scene.tris)(o, d, tri_row[:, None], t_min,
                                                 jnp.full((r,), t_max))[:, 0]
        t_tri = jnp.where(found, t_re, INF)

    t_cone = jnp.full((r,), INF)
    cone_row = jnp.zeros((r,), jnp.int32)
    if scene.cones.count:
        packed, _ = pk.pack_cones_cm(sg(scene.cones))
        t_k, cone_row = pk.cone_closest(sg(o), sg(d), packed, t_min)
        cone_row = jnp.maximum(cone_row, 0)
        found_c = t_k < t_max
        t_re = bvh_mod.cone_leaf_rows(scene.cones)(o, d, cone_row[:, None],
                                                   t_min, jnp.full((r,), t_max))[:, 0]
        t_cone = jnp.where(found_c, t_re, INF)

    return _assemble_hit(o, d, scene, t_tri, tri_row, t_cone, cone_row, t_max)


def _has_bvh(scene: DeviceScene) -> bool:
    return scene.tri_bvh is not None or scene.cone_bvh is not None


# Pallas brute-force policy, decided by data (benchmarks/ab_intersect.py on
# TPU v5e, out/AB_INTERSECT.json): the streaming kernels beat the jnp [R,P]
# grid at ~100k tris (+23%) / ~72k cones (+39%); at 34 tris the two are
# within noise (2.73M vs 2.62M rays/s), and no mid-size scene between those
# extremes has been measured, so the 16k threshold is a conservative floor
# (jnp is never materially worse below it), not a measured crossover. The
# LBVH wins whenever one is attached. The tri-state override
# (True/False/None=auto) replaces round 1's dead default-off switch.
_PALLAS_BRUTEFORCE: bool | None = None
_PALLAS_MIN_PRIMS = 16384


def enable_pallas_bruteforce(on: bool | None = True) -> None:
    """Force the Pallas brute-force path on/off; None restores the
    data-driven auto policy."""
    global _PALLAS_BRUTEFORCE
    _PALLAS_BRUTEFORCE = on


def _want_pallas(scene: DeviceScene) -> bool:
    if _PALLAS_BRUTEFORCE is not None:
        return _PALLAS_BRUTEFORCE
    if jax.default_backend() != "tpu":
        return False  # interpret-mode kernels are for tests, not speed
    n = max(int(scene.tris.count), int(scene.cones.count))
    return n >= _PALLAS_MIN_PRIMS


def closest_hit(o, d, scene: DeviceScene, t_min=1e-4, t_max=INF,
                chunk: int = 8192, n_alive=None) -> bruteforce.Hit:
    """Dispatch: culled-cluster traversal for packs with a BVH (mixing in
    the dense grid for small packs), Pallas streaming brute force for large
    BVH-less packs on TPU (see _want_pallas), plain jnp brute force
    otherwise. t_max may be per-ray [R]; n_alive enables whole-chunk
    skipping on compacted wavefronts."""
    if _has_bvh(scene):
        return closest_hit_bvh(o, d, scene, t_min, t_max,
                               chunk=chunk, n_alive=n_alive)
    if _want_pallas(scene):
        return closest_hit_pallas(o, d, scene, t_min, t_max)
    return bruteforce.closest_hit(o, d, scene, t_min, t_max, chunk=chunk,
                                  n_alive=n_alive)


def any_hit(o, d, scene: DeviceScene, t_max, t_min=1e-4, chunk: int = 8192,
            n_alive=None):
    if _has_bvh(scene):
        return any_hit_bvh(o, d, scene, t_max, t_min,
                           chunk=chunk, n_alive=n_alive)
    return bruteforce.any_hit(o, d, scene, t_max, t_min, chunk=chunk,
                              n_alive=n_alive)
