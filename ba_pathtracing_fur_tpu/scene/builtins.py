"""Built-in validation scenes matching BASELINE.json configs.

The reference ships JSON scenes (e.g. Fur_SmallSkinPatch) that are not in
the tree; these factories produce the equivalent workloads procedurally:
  * cornell_box        — config 1/2 (diffuse / +specular+glass Cornell)
  * fur_patch          — config 4 (Marschner fibers on a ground patch,
                         Mesh::addFurToFaces semantics, Mesh.cpp:82-148)
  * hair_ball          — config 5 (~N fibers on a sphere)
"""

from __future__ import annotations

import numpy as np

from ..core.camera import make_camera
from . import mesh as mesh_mod
from .types import (
    BSDF_EMISSION, BSDF_GLASS, BSDF_LAMBERT, BSDF_MARSCHNER_HAIR,
    BSDF_SPECULAR_REFLECTION, DeviceScene, Environment,
    empty_cone_pack, empty_triangle_pack,
    make_cone_pack, make_light_pack, make_material_table, make_triangle_pack,
    scene_bsdfs_present,
    scene_has_hair,
)


def _quad(a, b, c, d):
    """Two CCW triangles for quad corners a-b-c-d."""
    return [(a, b, c), (a, c, d)]


def _box(lo, hi):
    """12 triangles of an axis-aligned box, outward normals."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    p = {
        "000": (x0, y0, z0), "001": (x0, y0, z1), "010": (x0, y1, z0),
        "011": (x0, y1, z1), "100": (x1, y0, z0), "101": (x1, y0, z1),
        "110": (x1, y1, z0), "111": (x1, y1, z1),
    }
    tris = []
    tris += _quad(p["001"], p["101"], p["111"], p["011"])  # front +z
    tris += _quad(p["100"], p["000"], p["010"], p["110"])  # back -z
    tris += _quad(p["000"], p["001"], p["011"], p["010"])  # left -x
    tris += _quad(p["101"], p["100"], p["110"], p["111"])  # right +x
    tris += _quad(p["011"], p["111"], p["110"], p["010"])  # top +y
    tris += _quad(p["000"], p["100"], p["101"], p["001"])  # bottom -y
    return tris


def cornell_box(resolution=(256, 256), variant="diffuse", light_kind="quad"):
    """Cornell box. variant: 'diffuse' | 'glossy' (adds mirror + glass boxes).

    Returns (DeviceScene, Camera).
    """
    white = dict(name="white", diffuse=(0.73, 0.73, 0.73), bsdf=BSDF_LAMBERT)
    red = dict(name="red", diffuse=(0.65, 0.05, 0.05), bsdf=BSDF_LAMBERT)
    green = dict(name="green", diffuse=(0.12, 0.45, 0.15), bsdf=BSDF_LAMBERT)
    mirror = dict(name="mirror", specular=(0.95, 0.95, 0.95), bsdf=BSDF_SPECULAR_REFLECTION)
    glass = dict(name="glass", volume=(1.0, 1.0, 1.0), specular=(1, 1, 1), ior=1.5, bsdf=BSDF_GLASS)
    mats = [white, red, green, mirror, glass]

    tris = []
    mat_ids = []

    def add(triangles, mid):
        tris.extend(triangles)
        mat_ids.extend([mid] * len(triangles))

    s = 1.0
    # room interior: windings chosen so normals face INWARD (the Whitted
    # tracer's Phong term uses the raw normal like the reference,
    # Simple_CPU_Raytracer.cpp:117; only flips toward the view for gating)
    add(_quad((-s, -s, -s), (-s, -s, s), (s, -s, s), (s, -s, -s)), 0)  # floor +y
    add(_quad((-s, s, s), (-s, s, -s), (s, s, -s), (s, s, s)), 0)  # ceiling -y
    add(_quad((-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s)), 0)  # back +z
    add(_quad((-s, -s, s), (-s, -s, -s), (-s, s, -s), (-s, s, s)), 1)  # left +x red
    add(_quad((s, -s, -s), (s, -s, s), (s, s, s), (s, s, -s)), 2)  # right -x green

    if variant == "diffuse":
        add(_box((-0.55, -1.0, -0.6), (-0.05, -0.3, -0.1)), 0)
        add(_box((0.1, -1.0, -0.2), (0.6, -0.55, 0.35)), 0)
    else:
        add(_box((-0.55, -1.0, -0.6), (-0.05, -0.3, -0.1)), 3)  # mirror box
        add(_box((0.1, -1.0, -0.2), (0.6, -0.55, 0.35)), 4)  # glass box

    v = np.asarray(tris, np.float32)
    pack = make_triangle_pack(v[:, 0], v[:, 1], v[:, 2], mat_id=np.asarray(mat_ids))

    lights = make_light_pack([
        dict(kind=light_kind, color=(8.0, 8.0, 8.0), position=(0.0, 0.98, 0.0),
             direction=(0.0, -1.0, 0.0), size=(0.5, 0.5), radius=0.15,
             const_att=1.0),
    ])

    mat_table = make_material_table(mats)
    scene = DeviceScene(
        tris=pack, cones=empty_cone_pack(),
        materials=mat_table, lights=lights,
        env=Environment(color=np.zeros(3, np.float32) + 0.0,
                        ambient=np.zeros(3, np.float32)),
        has_hair=False,
        bsdfs_present=scene_bsdfs_present(mat_table),
    )
    cam = make_camera(position=(0.0, 0.0, 3.4), look_at=(0.0, 0.0, -1.0),
                      up=(0.0, 1.0, 0.0), resolution=resolution)
    return scene, cam


def tri_terrain(resolution=(512, 512), n_tris=100_000, seed=0):
    """~n_tris-triangle fBm heightfield — the BASELINE config-3 workload
    class (BVH over ~100k triangles; stands in for a Blender-exported OBJ,
    which `scene.io`/`scene.obj` load the same way). Returns (scene, cam)."""
    g = max(int(np.sqrt(n_tris / 2)), 2)  # g*g quads = 2g^2 triangles
    xs = np.linspace(-1.0, 1.0, g + 1, dtype=np.float32)
    zs = np.linspace(-1.0, 1.0, g + 1, dtype=np.float32)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    # host-side fBm heightfield (sin-lattice value noise; deterministic)
    rs = np.random.RandomState(seed)
    yy = np.zeros_like(xx)
    amp, freq = 1.0, 3.0
    for _ in range(4):
        px, py = rs.uniform(0, 2 * np.pi, 2)
        yy += amp * np.sin(freq * xx + px) * np.cos(freq * zz + py)
        amp *= 0.5
        freq *= 2.0
    yy = (0.25 * yy / 1.875).astype(np.float32)
    v = np.stack([xx, yy, zz], axis=-1)  # [g+1, g+1, 3]

    a = v[:-1, :-1].reshape(-1, 3)
    b = v[1:, :-1].reshape(-1, 3)
    c = v[1:, 1:].reshape(-1, 3)
    d = v[:-1, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, a])
    v1 = np.concatenate([b, c])
    v2 = np.concatenate([c, d])
    # uv from xz position; checker material split
    def uvs(p):
        return (p[:, [0, 2]] + 1.0) * 0.5
    cx = ((v0[:, 0] + 1) * 4).astype(np.int64)
    cz = ((v0[:, 2] + 1) * 4).astype(np.int64)
    mat = ((cx + cz) % 2).astype(np.int64)

    # procedural diffuse texture on material A (config 3 is the "textured
    # OBJ" workload — every ray pays the atlas bilinear fetch)
    ty, tx = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    tex = np.stack([0.4 + 0.3 * np.sin(tx / 9.0) * np.sin(ty / 7.0),
                    0.45 + 0.2 * np.sin(tx / 13.0 + 1.0),
                    0.35 + 0.2 * np.sin(ty / 11.0 + 2.0)],
                   axis=-1).astype(np.float32)
    mats = [dict(name="ground_a", diffuse=(0.65, 0.55, 0.40),
                 bsdf=BSDF_LAMBERT, diffuse_tex=0),
            dict(name="ground_b", diffuse=(0.30, 0.45, 0.25), bsdf=BSDF_LAMBERT)]
    pack = make_triangle_pack(v0, v1, v2, uv0=uvs(v0), uv1=uvs(v1),
                              uv2=uvs(v2), mat_id=mat)
    lights = make_light_pack([
        dict(kind="sun", color=(2.2, 2.1, 1.9), direction=(-0.4, -1.0, -0.2),
             radius=0.05),
        dict(kind="quad", color=(6.0, 6.0, 6.0), position=(0.0, 1.6, 0.0),
             direction=(0.0, -1.0, 0.0), size=(0.8, 0.8)),
    ])
    from .texture import build_atlas
    mat_table = make_material_table(mats)
    scene = DeviceScene(
        tris=pack, cones=empty_cone_pack(), materials=mat_table,
        lights=lights,
        env=Environment(color=np.asarray((0.25, 0.3, 0.4), np.float32),
                        ambient=np.asarray((0.05, 0.05, 0.05), np.float32)),
        textures=build_atlas([tex]), tex_slots=("diffuse",),
        has_hair=False,
        bsdfs_present=scene_bsdfs_present(mat_table),
    )
    cam = make_camera(position=(0.0, 0.9, 1.8), look_at=(0.0, -0.1, -1.0),
                      up=(0.0, 1.0, 0.0), resolution=resolution)
    return scene, cam


def fur_patch(resolution=(256, 256), fibers_per_face=5, fiber_verts=10,
              fiber_radius=0.004, bsdf="MarschnerHairBSDF", seed=0,
              patch_halfsize=0.5):
    """Fur skin patch: 2-triangle ground plane + grown fibers as cone chains
    (the Fur_SmallSkinPatch default workload, Demo/main.cpp:207,235)."""
    s = patch_halfsize
    ground = _quad((-s, 0.0, -s), (-s, 0.0, s), (s, 0.0, s), (s, 0.0, -s))
    v = np.asarray(ground, np.float32)

    skin = dict(name="skin", diffuse=(0.35, 0.25, 0.18), bsdf=BSDF_LAMBERT)
    # fur material defaults from CPU_Scene.cpp:115-117 (brown, ior 1.55)
    fur_mat = dict(name="Fiber_Mat", diffuse=(0.545, 0.353, 0.169), ior=1.55,
                   bsdf=bsdf)
    mats = [skin, fur_mat]

    pack = make_triangle_pack(v[:, 0], v[:, 1], v[:, 2], mat_id=np.zeros(len(ground)))

    faces = np.stack([v[:, 0], v[:, 1], v[:, 2]], axis=1)
    fibers = mesh_mod.grow_fur_fibers(faces, fibers_per_face, fiber_verts,
                                      fiber_radius, seed=seed)
    base, apex, r0, r1 = mesh_mod.fibers_to_cone_chain(fibers)
    cones = make_cone_pack(base, apex, r0, r1, np.ones(base.shape[0]))

    lights = make_light_pack([
        dict(kind="point", color=(10.0, 10.0, 10.0), position=(0.6, 1.2, 0.8),
             radius=0.05, const_att=1.0),
        dict(kind="sun", color=(1.5, 1.4, 1.2), direction=(-0.4, -1.0, -0.3),
             radius=0.05),
    ])

    mat_table = make_material_table(mats)
    scene = DeviceScene(
        tris=pack, cones=cones, materials=mat_table,
        lights=lights,
        env=Environment(color=np.asarray((0.05, 0.06, 0.08), np.float32),
                        ambient=np.asarray((0.08, 0.08, 0.08), np.float32)),
        has_hair=scene_has_hair(mat_table),
        bsdfs_present=scene_bsdfs_present(mat_table),
    )
    cam = make_camera(position=(0.0, 0.45, 1.1), look_at=(0.0, -0.35, -1.0),
                      up=(0.0, 1.0, 0.0), resolution=resolution)
    return scene, cam


#: Split hint of the most recent on-device hair_ball generation: {"centroids"
#: np [M,3] (host, closed-form from the same threefry draws the device pack
#: used), "fingerprint" str}. Pass to attach_bvh(cone_split_hint=...) so the
#: at-scale build never pulls the device pack back to host.
LAST_HAIRBALL_GEN: dict = {}


def _hair_ball_draws(n_fibers: int, seed: int, lean: float = 0.25):
    """The threefry draws both generation paths consume: (u [N,2] sphere
    uniforms, lean_raw [N,3] gaussian lean). Counter-based, so device and
    host see identical bits."""
    import jax

    key = jax.random.key(np.uint32(seed))
    ku, kl = jax.random.split(key)
    u = jax.random.uniform(ku, (n_fibers, 2), jnp_dtype())
    lean_raw = jax.random.normal(kl, (n_fibers, 3), jnp_dtype()) * lean
    return u, lean_raw


def jnp_dtype():
    import jax.numpy as jnp
    return jnp.float32


def _dirs_from_u(u, xp):
    """Uniform sphere directions from [N,2] uniforms (same formula as the
    numpy path)."""
    phi = 2.0 * np.pi * u[:, 0]
    cos_t = 2.0 * u[:, 1] - 1.0
    sin_t = xp.sqrt(xp.maximum(0.0, 1.0 - cos_t ** 2))
    return xp.stack([sin_t * xp.cos(phi), cos_t, sin_t * xp.sin(phi)],
                    axis=-1)


def _hair_ball_cones_device(n_fibers, fiber_verts, fiber_radius,
                            sphere_radius, seed):
    """Generate the fiber cone pack ON DEVICE as one jit of the threefry
    draws (VERDICT r4 weak #2 / r5 task 3: the geometry is a pure function
    of (params, seed), so the ~90 s host-numpy growth and the 600 MB pack
    upload both disappear). Returns (device ConePack, split hint dict)."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from . import mesh as mesh_mod
    from .types import make_cone_pack_jnp

    u, lean_raw = _hair_ball_draws(n_fibers, seed)

    @jax.jit
    def gen(u, lean_raw):
        dirs = _dirs_from_u(u, jnp)
        base_pts = dirs * sphere_radius
        fibers = mesh_mod.grow_fur_fibers_along_jnp(
            base_pts, dirs, lean_raw, fiber_verts, fiber_radius)
        b, a, r0, r1 = mesh_mod.fibers_to_cone_chain(fibers)
        return make_cone_pack_jnp(b, a, r0, r1,
                                  jnp.ones(b.shape[0], jnp.int32))

    pack = gen(u, lean_raw)

    # host-side split inputs: pull only the 20 MB of draws, recompute the
    # cone centroids closed-form (clustering needs nothing else; tiny f32
    # drift vs the device pack only perturbs cluster QUALITY, never
    # correctness — the AABBs/leaves come from the actual device pack)
    un = np.asarray(u, np.float32)
    ln = np.asarray(lean_raw, np.float32)
    cent = _hair_ball_host_centroids(un, ln, fiber_verts, sphere_radius)
    h = hashlib.blake2b(
        f"hairball:v1:{n_fibers}:{fiber_verts}:{fiber_radius}:"
        f"{sphere_radius}:{seed}".encode(), digest_size=16)
    return pack, {"centroids": cent, "fingerprint": h.hexdigest()}


def _hair_ball_host_centroids(u, lean_raw, fiber_verts, sphere_radius):
    """numpy mirror of the device generator, reduced to what the median
    split consumes: cone AABB centroids 0.5*(base' + apex) with the
    joint-hiding -0.008*seg base offset (mesh.fibers_to_cone_chain)."""
    d = _dirs_from_u(u.astype(np.float32), np).astype(np.float32)
    dn = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    lean = lean_raw - dn * np.sum(lean_raw * dn, axis=-1, keepdims=True)
    v = fiber_verts
    pos = (d * sphere_radius - 0.003 * dn).astype(np.float32)
    positions = [pos]
    k = 1
    for i in range(v, 1, -1):
        step = np.float32(np.log(float(i)) / 90.0)
        gd = dn + lean * (k / max(v - 1, 1))
        gd = gd / np.maximum(np.linalg.norm(gd, axis=-1, keepdims=True),
                             1e-12)
        pos = pos + step * gd * np.float32(3.0)
        positions.append(pos.astype(np.float32))
        k += 1
    p = np.stack(positions, axis=1)  # [N,V,3]
    b = p[:, :-1]
    a = p[:, 1:]
    b = b - np.float32(0.008) * (a - b)
    return (0.5 * (b + a)).reshape(-1, 3).astype(np.float32)


def hair_ball(resolution=(512, 512), n_fibers=10000, fiber_verts=10,
              fiber_radius=0.004, sphere_radius=0.5, bsdf="MarschnerHairBSDF",
              seed=0, on_device=False):
    """Hair ball: icosphere-ish core + radially grown fibers (config 5).

    on_device=True generates the fiber pack directly on the accelerator
    (threefry draws -> one jit; different RNG stream than the numpy path,
    so geometry differs at equal seed) and records the BVH split hint in
    LAST_HAIRBALL_GEN — pass it to attach_bvh(cone_split_hint=...)."""
    rs = np.random.RandomState(seed)
    # core sphere triangles (UV sphere, coarse)
    n_lat, n_lon = 16, 24
    verts = []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append((sphere_radius * np.sin(th) * np.cos(ph),
                          sphere_radius * np.cos(th),
                          sphere_radius * np.sin(th) * np.sin(ph)))
    verts = np.asarray(verts, np.float32)
    tris = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            tris.append((verts[a], verts[b], verts[c]))
            tris.append((verts[b], verts[d], verts[c]))
    v = np.asarray(tris, np.float32)

    skin = dict(name="scalp", diffuse=(0.3, 0.2, 0.15), bsdf=BSDF_LAMBERT)
    fur_mat = dict(name="Fiber_Mat", diffuse=(0.545, 0.353, 0.169), ior=1.55, bsdf=bsdf)
    pack = make_triangle_pack(v[:, 0], v[:, 1], v[:, 2], mat_id=np.zeros(len(tris)))

    if on_device:
        cones, hint = _hair_ball_cones_device(
            n_fibers, fiber_verts, fiber_radius, sphere_radius, seed)
        LAST_HAIRBALL_GEN.clear()
        LAST_HAIRBALL_GEN.update(hint)
    else:
        # radial fibers from random sphere points
        u = rs.rand(n_fibers, 2)
        phi = 2 * np.pi * u[:, 0]
        cos_t = 2 * u[:, 1] - 1
        sin_t = np.sqrt(np.maximum(0, 1 - cos_t ** 2))
        dirs = np.stack([sin_t * np.cos(phi), cos_t, sin_t * np.sin(phi)], axis=-1)
        base_pts = dirs * sphere_radius
        fibers = mesh_mod.grow_fur_fibers_along(base_pts, dirs, fiber_verts,
                                                fiber_radius, seed=seed)
        base, apex, r0, r1 = mesh_mod.fibers_to_cone_chain(fibers)
        cones = make_cone_pack(base, apex, r0, r1, np.ones(base.shape[0]))

    lights = make_light_pack([
        dict(kind="quad", color=(12.0, 12.0, 12.0), position=(1.5, 2.0, 1.5),
             direction=(-0.5, -0.7, -0.5), size=(1.0, 1.0)),
        dict(kind="sun", color=(1.0, 1.0, 0.95), direction=(0.3, -1.0, 0.2),
             radius=0.05),
    ])
    mat_table = make_material_table([skin, fur_mat])
    scene = DeviceScene(
        tris=pack, cones=cones,
        materials=mat_table, lights=lights,
        env=Environment(color=np.asarray((0.1, 0.1, 0.12), np.float32),
                        ambient=np.asarray((0.05, 0.05, 0.05), np.float32)),
        has_hair=scene_has_hair(mat_table),
        bsdfs_present=scene_bsdfs_present(mat_table),
    )
    cam = make_camera(position=(0.0, 0.3, 2.2), look_at=(0.0, -0.1, -1.0),
                      up=(0.0, 1.0, 0.0), resolution=resolution)
    return scene, cam
