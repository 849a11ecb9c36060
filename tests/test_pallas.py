"""Pallas fused intersection kernels vs the jnp brute-force oracle.

Kernels run interpret=True off-TPU (conftest forces CPU), so these validate
kernel logic everywhere; the driver's real-TPU bench exercises the compiled
path.
"""

import jax.numpy as jnp
import numpy as np

from ba_pathtracing_fur_tpu.ops import bruteforce, intersect as isect
from ba_pathtracing_fur_tpu.ops.pallas import intersect as pk
from ba_pathtracing_fur_tpu.scene.builtins import cornell_box, fur_patch


def _rays(n, seed, aim=None):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    if aim is None:
        d = rs.normal(size=(n, 3)).astype(np.float32)
    else:
        d = rs.uniform(aim[0], aim[1], (n, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_tri_matches_grid():
    scene, _ = cornell_box(resolution=(8, 8))
    o, d = _rays(300, 0)
    packed, count = pk.pack_tris_cm(scene.tris)
    t, idx = pk.tri_closest(o, d, packed)

    tg, _, _, _ = isect.triangle_hit_grid(o, d, scene.tris, 1e-4, pk.INF)
    ref_idx = np.argmin(np.asarray(tg), axis=-1)
    ref_t = np.asarray(tg)[np.arange(300), ref_idx]

    np.testing.assert_allclose(np.asarray(t), ref_t, rtol=1e-5, atol=1e-6)
    hit = ref_t < 1e30
    # ties on shared edges can pick either triangle; t equality is the check
    assert (np.asarray(idx)[hit] >= 0).all()


def test_pallas_cone_matches_grid():
    scene, _ = fur_patch(resolution=(8, 8), fibers_per_face=16, fiber_verts=5,
                         fiber_radius=0.02)
    o, d = _rays(400, 1, aim=((-0.4, 0.0, -0.4), (0.4, 0.12, 0.4)))
    packed, count = pk.pack_cones_cm(scene.cones)
    t, idx = pk.cone_closest(o, d, packed)

    cg, _, _ = isect.cone_hit_grid(o, d, scene.cones, 1e-4, pk.INF)
    ref_idx = np.argmin(np.asarray(cg), axis=-1)
    ref_t = np.asarray(cg)[np.arange(400), ref_idx]

    np.testing.assert_allclose(np.asarray(t), ref_t, rtol=2e-3, atol=1e-6)


def test_pallas_handles_nonmultiple_ray_count():
    scene, _ = cornell_box(resolution=(8, 8))
    o, d = _rays(101, 2)
    packed, _ = pk.pack_tris_cm(scene.tris)
    t, idx = pk.tri_closest(o, d, packed)
    assert t.shape == (101,) and idx.shape == (101,)


def test_pallas_dispatch_render_matches_bruteforce():
    import jax
    from ba_pathtracing_fur_tpu.models.pathtracer import RenderConfig, render_image
    from ba_pathtracing_fur_tpu.ops import traverse

    scene, camera = cornell_box(resolution=(16, 16))
    cfg = RenderConfig(depth=2, spp=1, ray_chunk=1024)
    key = jax.random.key(4)
    ref = render_image(scene, camera, key, cfg)
    traverse.enable_pallas_bruteforce(True)
    try:
        got = render_image(scene, camera, key, cfg)
    finally:
        traverse.enable_pallas_bruteforce(None)  # restore auto policy
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# VMEM-resident traversal kernel (ops/pallas/traverse.py)
# ---------------------------------------------------------------------------

def test_vmem_traversal_matches_xla_traversal():
    """The Pallas culled-cluster kernel must agree with ops.bvh.traverse:
    identical found mask and winner rows; t within FMA ulps (the dispatch
    recomputes the winner's t via *_leaf_rows, erasing the difference)."""
    import jax
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.ops.pallas import traverse as ptrav
    from ba_pathtracing_fur_tpu.scene.builtins import tri_terrain
    from ba_pathtracing_fur_tpu.scene.types import to_device

    sc, cam = tri_terrain(resolution=(16, 16), n_tris=5000)
    sc = to_device(traverse.attach_bvh(sc, method="sah", min_prims=1))
    b = sc.tri_bvh
    o, d = _rays(512, 3)
    tmax = jnp.full((512,), isect.INF)
    t0, r0, f0 = bvh_mod.traverse(b, o, d, bvh_mod.tri_leaf_packed(b),
                                  1e-4, tmax, chunk=4096)
    t1, r1, f1 = ptrav.traverse_vmem(
        o, d, ptrav.pack_boxes_cm(b), ptrav.pack_leaf_cm(b, "tri")[0], tmax,
        kind="tri", n_clusters=b.n_leaves, leaf_k=b.leaf_size, ray_tile=256)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    m = np.asarray(f0)
    np.testing.assert_array_equal(np.asarray(r0)[m], np.asarray(r1)[m])
    assert np.allclose(np.asarray(t0)[m], np.asarray(t1)[m], rtol=1e-5)

    # any-hit variant: identical blocked sets
    tm = jnp.full((512,), 3.0)
    _, _, a0 = bvh_mod.traverse(b, o, d, bvh_mod.tri_leaf_packed(b), 1e-4,
                                tm, any_hit=True, chunk=4096)
    _, _, a1 = ptrav.traverse_vmem(
        o, d, ptrav.pack_boxes_cm(b), ptrav.pack_leaf_cm(b, "tri")[0], tm,
        kind="tri", n_clusters=b.n_leaves, leaf_k=b.leaf_size,
        any_hit=True, ray_tile=256)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_vmem_traversal_render_dispatch():
    """Forcing the VMEM kernel through the closest_hit/any_hit dispatch
    renders the same image as the XLA traversal (tolerance: FMA ulps via
    the identical-row + recomputed-t contract)."""
    import jax
    from ba_pathtracing_fur_tpu.models.pathtracer import (
        RenderConfig, render_image)
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene.builtins import fur_patch
    from ba_pathtracing_fur_tpu.scene.types import to_device

    sc, cam = fur_patch(resolution=(24, 24), fibers_per_face=60)
    sc = to_device(traverse.attach_bvh(sc, method="median", min_prims=1))
    cfg = RenderConfig(depth=2, spp=1, ray_chunk=256, compact=False)
    key = jax.random.key(0)
    base = np.asarray(render_image(sc, cam, key, cfg))
    traverse.enable_vmem_traversal(True)
    try:
        forced = np.asarray(render_image(sc, cam, key, cfg))
    finally:
        traverse.enable_vmem_traversal(None)
    assert np.all(np.isfinite(forced))
    assert np.allclose(base, forced, rtol=1e-4, atol=1e-5), \
        float(np.abs(base - forced).max())


def test_stream_traversal_matches_xla_traversal():
    """The DMA-streaming two-level kernel must agree with ops.bvh.traverse:
    identical found mask and winner rows (t recomputed by the dispatch)."""
    from ba_pathtracing_fur_tpu.ops import bvh as bvh_mod, traverse
    from ba_pathtracing_fur_tpu.ops.pallas import stream as pstream
    from ba_pathtracing_fur_tpu.scene.builtins import fur_patch
    from ba_pathtracing_fur_tpu.scene.types import to_device

    sc, cam = fur_patch(resolution=(16, 16), fibers_per_face=120,
                        fiber_verts=6)
    sc = to_device(traverse.attach_bvh(sc, method="median", min_prims=1,
                                       leaf_size=16, fanout=8))
    b = sc.cone_bvh
    assert b.fanout == 8 and b.n_leaves > 8
    o, d = _rays(512, 5, aim=((-0.4, 0.0, -0.4), (0.4, 0.12, 0.4)))
    tmax = jnp.full((512,), isect.INF)
    t0, r0, f0 = bvh_mod.traverse(b, o, d, bvh_mod.cone_leaf_packed(b),
                                  1e-4, tmax, chunk=4096)
    sb = pstream.pack_super_boxes(b)
    cb = pstream.pack_child_boxes(b)
    prim, _ = pstream.pack_prim_hbm(b, "cone")
    t1, r1, f1 = pstream.traverse_stream(
        o, d, sb, cb, prim, tmax, kind="cone", fanout=b.fanout,
        leaf_k=b.leaf_size, ray_tile=128)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    m = np.asarray(f0)
    np.testing.assert_array_equal(np.asarray(r0)[m], np.asarray(r1)[m])
    assert np.allclose(np.asarray(t0)[m], np.asarray(t1)[m], rtol=1e-4)

    # any-hit variant: identical blocked sets
    tm = jnp.full((512,), 1.0)
    _, _, a0 = bvh_mod.traverse(b, o, d, bvh_mod.cone_leaf_packed(b), 1e-4,
                                tm, any_hit=True, chunk=4096)
    _, _, a1 = pstream.traverse_stream(
        o, d, sb, cb, prim, tm, kind="cone", fanout=b.fanout,
        leaf_k=b.leaf_size, any_hit=True, ray_tile=128)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_stream_traversal_render_dispatch():
    """Forcing the streaming kernel through closest_hit/any_hit dispatch
    (entry-morton sort + winner-t recompute) renders the same image as the
    XLA traversal."""
    import jax
    from ba_pathtracing_fur_tpu.models.pathtracer import (
        RenderConfig, render_image)
    from ba_pathtracing_fur_tpu.ops import traverse
    from ba_pathtracing_fur_tpu.scene.builtins import fur_patch
    from ba_pathtracing_fur_tpu.scene.types import to_device

    sc, cam = fur_patch(resolution=(24, 24), fibers_per_face=60)
    sc = to_device(traverse.attach_bvh(sc, method="median", min_prims=1,
                                       leaf_size=16, fanout=8))
    cfg = RenderConfig(depth=2, spp=1, ray_chunk=256, compact=False)
    key = jax.random.key(0)
    base = np.asarray(render_image(sc, cam, key, cfg))
    traverse.enable_stream_traversal(True)
    try:
        forced = np.asarray(render_image(sc, cam, key, cfg))
    finally:
        traverse.enable_stream_traversal(None)
    assert np.all(np.isfinite(forced))
    assert np.allclose(base, forced, rtol=1e-4, atol=1e-5), \
        float(np.abs(base - forced).max())
