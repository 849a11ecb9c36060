"""Wavefront OBJ loader (pure python/numpy — no Assimp on TPU hosts).

Parity with the reference's Assimp import path (SceneGraph::importObj /
createMeshFromAi, /root/reference/src/libraries/KIRK/Common/
SceneGraph.cpp:85-256): triangle-fan triangulation of n-gon faces
(:196-216), smooth normal generation when the file has none
(aiProcess_GenSmoothNormals), texcoords when present, usemtl → per-face
material slots.
"""

from __future__ import annotations

import numpy as np

from .graph import HostMesh


def load_obj(path: str, name: str | None = None) -> HostMesh:
    positions: list = []
    normals: list = []
    uvs: list = []
    # corner = (pos_idx, uv_idx, n_idx); OBJ indexes each independently, so
    # unique corners become output vertices
    corner_index: dict = {}
    out_pos: list = []
    out_uv: list = []
    out_n: list = []
    faces: list = []
    face_mat: list = []
    materials: list = ["default"]
    cur_mat = 0
    has_normals = False
    has_uvs = False

    def corner(tok: str) -> int:
        nonlocal has_normals, has_uvs
        if tok in corner_index:
            return corner_index[tok]
        parts = tok.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ni = None
        if len(parts) > 1 and parts[1]:
            t = int(parts[1])
            ti = t - 1 if t > 0 else len(uvs) + t
            has_uvs = True
        if len(parts) > 2 and parts[2]:
            nn = int(parts[2])
            ni = nn - 1 if nn > 0 else len(normals) + nn
            has_normals = True
        idx = len(out_pos)
        out_pos.append(positions[vi])
        out_uv.append(uvs[ti] if ti is not None else (0.0, 0.0))
        out_n.append(normals[ni] if ni is not None else (0.0, 0.0, 0.0))
        corner_index[tok] = idx
        return idx

    with open(path, "r", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tag, *rest = line.split()
            if tag == "v":
                positions.append(tuple(float(x) for x in rest[:3]))
            elif tag == "vn":
                normals.append(tuple(float(x) for x in rest[:3]))
            elif tag == "vt":
                uvs.append(tuple(float(x) for x in rest[:2]))
            elif tag == "usemtl":
                mat = rest[0] if rest else "default"
                if mat not in materials:
                    materials.append(mat)
                cur_mat = materials.index(mat)
            elif tag == "f":
                ids = [corner(t) for t in rest]
                # triangle fan (SceneGraph.cpp:196-216)
                for k in range(1, len(ids) - 1):
                    faces.append((ids[0], ids[k], ids[k + 1]))
                    face_mat.append(cur_mat)

    mesh = HostMesh(
        vertices=np.asarray(out_pos, np.float32).reshape(-1, 3),
        faces=np.asarray(faces, np.int64).reshape(-1, 3),
        normals=np.asarray(out_n, np.float32) if has_normals else None,
        uvs=np.asarray(out_uv, np.float32) if has_uvs else None,
        face_material=np.asarray(face_mat, np.int64),
        name=name or path.rsplit("/", 1)[-1],
    )
    mesh.material_slot_names = materials  # type: ignore[attr-defined]
    if mesh.normals is None:
        mesh.compute_smooth_normals()
    return mesh


def save_obj(path: str, mesh: HostMesh) -> None:
    """Minimal OBJ writer (round-trip support for the converter CLI)."""
    with open(path, "w") as fh:
        fh.write(f"# ba_pathtracing_fur_tpu export: {mesh.name}\n")
        for p in mesh.vertices:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if mesh.normals is not None:
            for n in mesh.normals:
                fh.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        if mesh.uvs is not None:
            for t in mesh.uvs:
                fh.write(f"vt {t[0]} {t[1]}\n")
        full = mesh.normals is not None and mesh.uvs is not None
        for f in mesh.faces:
            if full:
                fh.write("f " + " ".join(f"{i+1}/{i+1}/{i+1}" for i in f) + "\n")
            elif mesh.normals is not None:
                fh.write("f " + " ".join(f"{i+1}//{i+1}" for i in f) + "\n")
            else:
                fh.write("f " + " ".join(str(i + 1) for i in f) + "\n")
