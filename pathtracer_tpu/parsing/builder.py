"""SceneBuilder: host-side accumulation of curves/textures/materials/geometry
into the flattened device World.

This is the TPU-native equivalent of the reference's construct_world output
stage (src/parsing/mod.rs:145-563 producing World + MaterialTable +
Accelerator): instead of boxed enums it bakes everything into SoA device
arrays. The TOML front-end (parsing/scene.py) drives this builder; tests
drive it directly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import spectral
from pathtracer_tpu.core.bounds import EXTENDED_VISIBLE_RANGE
from pathtracer_tpu.core.transform import transform_aabb
from pathtracer_tpu.geometry.soa import (
    PRIM_DISK,
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    Primitives,
)
from pathtracer_tpu.materials.tables import (
    MAT_DIFFUSE_LIGHT,
    MAT_GGX,
    MAT_LAMBERTIAN,
    MAT_PASSTHROUGH,
    MAT_SHARP_LIGHT,
    Materials,
)
from pathtracer_tpu.mediums.tables import Mediums, MED_HG, MED_RAYLEIGH, MED_VACUUM
from pathtracer_tpu.textures.texture import Textures
from pathtracer_tpu.world.environment import Environment
from pathtracer_tpu.world.world import World

_PAD = 16


@dataclasses.dataclass
class _Prim:
    ptype: int
    pa: np.ndarray
    pb: np.ndarray
    pc: np.ndarray
    na: np.ndarray
    nb: np.ndarray
    nc: np.ndarray
    material_id: int
    mat_kind: int
    instance_id: int
    transform_id: int
    area: float
    aabb_lo: np.ndarray
    aabb_hi: np.ndarray


class SceneBuilder:
    def __init__(self):
        self.curves: List[spectral.HostCurve] = []
        self._curve_names = {}
        self.tex_layers: List[Tuple[np.ndarray, int]] = []  # (weights HxW, curve)
        self.tex_ranges: List[Tuple[int, int]] = []
        self._tex_names = {}
        self.mat_rows: List[dict] = []
        self._mat_names = {}
        self.med_rows: List[dict] = [dict(mtype=MED_VACUUM, g=0, ss=0, sa=0, ior=0, corr=0.0)]
        self._med_names = {}
        self.prims: List[_Prim] = []
        self.env: Optional[Environment] = None
        self.env_sampling_probability = 0.5
        self._next_instance = 0
        self.camera_surfaces: List[int] = []  # prim ids tagged Camera
        self.transforms: List[np.ndarray] = [np.eye(4)]  # id 0 = identity
        self._mesh_defs: dict = {}  # mesh_key -> geometry def (shared)
        self.mesh_instances: List[dict] = []  # deferred; resolved in build()
        self.force_instancing = False  # route even single instances via BLAS

    # ------------------------------------------------------------- curves

    def add_curve(self, curve: spectral.HostCurve, name: Optional[str] = None) -> int:
        if name is not None and name in self._curve_names:
            return self._curve_names[name]
        self.curves.append(curve)
        idx = len(self.curves) - 1
        if name is not None:
            self._curve_names[name] = idx
        return idx

    def curve_index(self, name: str) -> int:
        return self._curve_names[name]

    # ------------------------------------------------------------ textures

    def add_texture(
        self, layers: Sequence[Tuple[np.ndarray, int]], name: Optional[str] = None
    ) -> int:
        """layers: list of (weight map HxW float, curve index)."""
        if name is not None and name in self._tex_names:
            return self._tex_names[name]
        start = len(self.tex_layers)
        for w, c in layers:
            self.tex_layers.append((np.asarray(w, np.float32), int(c)))
        self.tex_ranges.append((start, len(layers)))
        idx = len(self.tex_ranges) - 1
        if name is not None:
            self._tex_names[name] = idx
        return idx

    # ----------------------------------------------------------- materials

    def _add_mat(self, row: dict, name: Optional[str]) -> int:
        if name is not None and name in self._mat_names:
            return self._mat_names[name]
        self.mat_rows.append(row)
        idx = len(self.mat_rows) - 1
        if name is not None:
            self._mat_names[name] = idx
        return idx

    def material_index(self, name: str) -> int:
        return self._mat_names[name]

    def add_lambertian(self, tex_id: int, name=None) -> int:
        return self._add_mat(
            dict(mtype=MAT_LAMBERTIAN, tex_id=tex_id), name
        )

    def add_ggx(
        self,
        alpha: float,
        eta_idx: int,
        eta_o_idx: int,
        kappa_idx: int,
        permeability: float = 0.0,
        inner_medium: int = 0,
        outer_medium: int = 0,
        name=None,
    ) -> int:
        # metallic := kappa integral > 0 (reference: src/materials/ggx.rs:205)
        kappa_integral = self.curves[kappa_idx].integral(EXTENDED_VISIBLE_RANGE, 128)
        return self._add_mat(
            dict(
                mtype=MAT_GGX,
                alpha=alpha,
                eta_idx=eta_idx,
                eta_o_idx=eta_o_idx,
                kappa_idx=kappa_idx,
                permeability=permeability,
                metallic=kappa_integral > 0.0,
                inner_medium=inner_medium,
                outer_medium=outer_medium,
            ),
            name,
        )

    def add_diffuse_light(self, emit_idx: int, bounce_idx: int, sidedness: int, name=None) -> int:
        return self._add_mat(
            dict(mtype=MAT_DIFFUSE_LIGHT, emit_idx=emit_idx, bounce_idx=bounce_idx, sidedness=sidedness),
            name,
        )

    def add_sharp_light(
        self, emit_idx: int, bounce_idx: int, sidedness: int, sharpness: float, name=None
    ) -> int:
        return self._add_mat(
            dict(
                mtype=MAT_SHARP_LIGHT,
                emit_idx=emit_idx,
                bounce_idx=bounce_idx,
                sidedness=sidedness,
                sharpness=sharpness,
            ),
            name,
        )

    # ------------------------------------------------------------- mediums

    def add_medium_hg(self, g_idx: int, sigma_s_idx: int, sigma_a_idx: int, name=None) -> int:
        self.med_rows.append(dict(mtype=MED_HG, g=g_idx, ss=sigma_s_idx, sa=sigma_a_idx, ior=0, corr=0.0))
        idx = len(self.med_rows) - 1
        if name is not None:
            self._med_names[name] = idx
        return idx

    def add_medium_rayleigh(self, ior_idx: int, corrective: float, name=None) -> int:
        self.med_rows.append(dict(mtype=MED_RAYLEIGH, g=0, ss=0, sa=0, ior=ior_idx, corr=corrective))
        idx = len(self.med_rows) - 1
        if name is not None:
            self._med_names[name] = idx
        return idx

    def medium_index(self, name: str) -> int:
        return self._med_names[name]

    # ------------------------------------------------------------ geometry

    def _mat_kind(self, material_id: int, kind: Optional[int]) -> int:
        if kind is not None:
            return kind
        mt = self.mat_rows[material_id]["mtype"]
        return 1 if mt in (MAT_DIFFUSE_LIGHT, MAT_SHARP_LIGHT) else 0

    def _new_instance(self) -> int:
        self._next_instance += 1
        return self._next_instance - 1

    def add_transform(self, m: np.ndarray) -> int:
        self.transforms.append(np.asarray(m, np.float64))
        return len(self.transforms) - 1

    def add_sphere(self, center, radius: float, material_id: int, kind=None, transform_id: int = 0) -> int:
        c = np.asarray(center, np.float32)
        iid = self._new_instance()
        lo, hi = c - radius, c + radius
        area = 4.0 * np.pi * radius * radius
        if transform_id:
            m = self.transforms[transform_id]
            lo, hi = transform_aabb(m, lo, hi)
            # area under non-uniform scale approximated by the mean squared
            # singular value (exact for uniform scales)
            svals = np.linalg.svd(m[:3, :3], compute_uv=False)
            area *= float(np.mean(svals**2))
        self.prims.append(
            _Prim(
                PRIM_SPHERE,
                c,
                np.array([radius, 0, 0], np.float32),
                np.zeros(3, np.float32),
                *[np.zeros(3, np.float32)] * 3,
                material_id,
                self._mat_kind(material_id, kind),
                iid,
                transform_id,
                area,
                lo,
                hi,
            )
        )
        return iid

    def add_rect(self, center, edge_u, edge_v, material_id: int, kind=None, two_sided=True, transform_id: int = 0) -> int:
        """edge_u/edge_v: half-edge vectors."""
        c = np.asarray(center, np.float32)
        eu = np.asarray(edge_u, np.float32)
        ev = np.asarray(edge_v, np.float32)
        m = self.transforms[transform_id]
        wc = np.stack([
            (m[:3, :3] @ (c + su * eu + sv * ev) + m[:3, 3])
            for su in (-1, 1) for sv in (-1, 1)
        ])
        # corners ordered (-,-),(-,+),(+,-),(+,+): wc[2]-wc[0] = 2eu (world),
        # wc[1]-wc[0] = 2ev -> |cross| = 4|eu x ev| = full rect area
        area = float(np.linalg.norm(np.cross(wc[2] - wc[0], wc[1] - wc[0])))
        iid = self._new_instance()
        self.prims.append(
            _Prim(
                PRIM_RECT,
                c,
                eu,
                ev,
                *[np.zeros(3, np.float32)] * 3,
                material_id,
                self._mat_kind(material_id, kind),
                iid,
                transform_id,
                area,
                wc.min(0) - 1e-4,
                wc.max(0) + 1e-4,
            )
        )
        return iid

    def add_disk(self, center, normal, radius: float, material_id: int, kind=None, transform_id: int = 0) -> int:
        c = np.asarray(center, np.float32)
        n = np.asarray(normal, np.float32)
        n = n / np.linalg.norm(n)
        lo, hi = c - radius, c + radius
        area = float(np.pi * radius * radius)
        if transform_id:
            m = self.transforms[transform_id]
            lo, hi = transform_aabb(m, lo, hi)
            svals = np.linalg.svd(m[:3, :3], compute_uv=False)
            area *= float(np.mean(svals**2))
        iid = self._new_instance()
        self.prims.append(
            _Prim(
                PRIM_DISK,
                c,
                n,
                np.array([radius, 0, 0], np.float32),
                *[np.zeros(3, np.float32)] * 3,
                material_id,
                self._mat_kind(material_id, kind),
                iid,
                transform_id,
                area,
                lo,
                hi,
            )
        )
        return iid

    def add_mesh(
        self,
        vertices: np.ndarray,
        indices: np.ndarray,
        normals: Optional[np.ndarray],
        material_ids,
        transform: Optional[np.ndarray] = None,
        kind=None,
        mesh_key=None,
        material_override: Optional[int] = None,
    ) -> int:
        """Triangle-mesh instance. Processing is deferred to build():
        meshes instanced more than once (sharing `mesh_key`, non-emissive)
        keep their triangles ONCE in local space under a shared per-mesh
        BLAS + instance transforms (reference two-level scheme,
        src/geometry/mesh.rs:283-304 + src/accelerator/mod.rs); single or
        emissive instances are baked to world-space rows (joining the light
        list like src/world/mod.rs:42-66).

        material_ids: per-face world material ids (or a scalar).
        material_override: instance-level material replacing per-face ids
        (instances.material_name in scene TOMLs)."""
        iid = self._new_instance()
        mat_arr = np.asarray(material_ids, np.int64)
        if mesh_key is None:
            # monotonic counter, not id(): CPython reuses id() values after
            # GC, which could silently alias two different anonymous meshes
            self._anon_mesh_counter = getattr(self, "_anon_mesh_counter", 0) + 1
            mesh_key = ("anon", self._anon_mesh_counter)
        else:
            mesh_key = (mesh_key, mat_arr.tobytes())
        if mesh_key not in self._mesh_defs:
            self._mesh_defs[mesh_key] = dict(
                vertices=np.asarray(vertices, np.float64),
                indices=np.asarray(indices, np.int64).reshape(-1, 3),
                normals=(np.asarray(normals, np.float64)
                         if normals is not None and len(normals) else None),
                mat_ids=mat_arr,
            )
        self.mesh_instances.append(
            dict(key=mesh_key, transform=transform, kind=kind, iid=iid,
                 override=material_override)
        )
        return iid

    def _expand_mesh_rows(self, df: dict, mat_arr, transform, kind, iid,
                          out: Optional[list] = None, local: bool = False):
        """Emit _Prim triangle rows for one mesh def. `local=True` keeps
        vertices in mesh-local space (shared-BLAS path); otherwise rows are
        baked into world space via `transform`."""
        v = df["vertices"]
        idx = df["indices"]
        vn = df["normals"]
        if not local and transform is not None:
            v = v @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
            if vn is not None:
                inv_t = np.linalg.inv(np.asarray(transform))[:3, :3].T
                vn = vn @ inv_t.T
                vn = vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        mat_arr = np.broadcast_to(np.asarray(mat_arr, np.int64), (len(idx),))
        rows = self.prims if out is None else out
        for t in range(len(idx)):
            i0, i1, i2 = idx[t]
            p0, p1, p2 = v[i0], v[i1], v[i2]
            e1, e2 = p1 - p0, p2 - p0
            cr = np.cross(e1, e2)
            area = 0.5 * float(np.linalg.norm(cr))
            if area < 1e-12:
                continue
            gn = cr / np.linalg.norm(cr)
            n0 = vn[i0] if vn is not None else gn
            n1 = vn[i1] if vn is not None else gn
            n2 = vn[i2] if vn is not None else gn
            lo = np.minimum(np.minimum(p0, p1), p2) - 1e-5
            hi = np.maximum(np.maximum(p0, p1), p2) + 1e-5
            m = int(mat_arr[t])
            rows.append(
                _Prim(
                    PRIM_TRIANGLE,
                    p0.astype(np.float32),
                    p1.astype(np.float32),
                    p2.astype(np.float32),
                    n0.astype(np.float32),
                    n1.astype(np.float32),
                    n2.astype(np.float32),
                    m,
                    self._mat_kind(m, kind),
                    iid,
                    0,
                    area,
                    lo.astype(np.float32),
                    hi.astype(np.float32),
                )
            )
        return rows

    def add_camera_surface(self, camera_id: int, origin, direction, lens_radius: float) -> int:
        """Camera lens proxy: a Disk tagged MaterialId::Camera in the scene
        so light paths can hit the lens directly (reference
        src/camera/projective_camera.rs:73-79 — upstream builds the proxy
        but its accelerator insertion is unimplemented!(); here it is real).
        Returns the instance id, or -1 for a zero-area (pinhole) lens."""
        if lens_radius <= 0.0:
            return -1
        c = np.asarray(origin, np.float32)
        nrm = np.asarray(direction, np.float32)
        nrm = nrm / np.linalg.norm(nrm)
        iid = self._new_instance()
        lo = c - lens_radius
        hi = c + lens_radius
        self.prims.append(
            _Prim(
                PRIM_DISK,
                c,
                nrm,
                np.array([lens_radius, 0, 0], np.float32),
                *[np.zeros(3, np.float32)] * 3,
                camera_id,
                2,  # MaterialId::Camera kind
                iid,
                0,
                float(np.pi * lens_radius * lens_radius),
                lo,
                hi,
            )
        )
        self.camera_surfaces.append(len(self.prims) - 1)
        return iid

    # ---------------------------------------------------------------- env

    def set_environment_constant(self, curve_idx: int, strength: float):
        self.env = Environment.constant(curve_idx, strength)

    # -------------------------------------------------------------- build

    def _resolve_mesh_instances(self):
        """Decide bake vs shared-BLAS per mesh group; emit baked world rows
        into self.prims; return (blas_meshes, blas_instances) with local
        rows appended AFTER all world rows (their global row ids follow).

        Flattening policy (TPU-first): when baking EVERY instance to world
        space keeps the scene under PT_FLATTEN_MAX total rows (default
        8192), do that instead of building the TLAS/BLAS — lockstep
        two-level traversal pays per-step gathers on every lane while the
        flattened scene rides the dense lockstep sweep (VPU-saturating, no
        gathers) and the Pallas megakernel. The HBM cost of duplicated
        rows is negligible at this scale (8 f32 rows/prim). Shared-BLAS
        instancing (reference scheme, src/geometry/mesh.rs:283-304) still
        engages for genuinely large instanced scenes and under
        force_instancing (tests, memory-bound workloads)."""
        from collections import defaultdict

        groups = defaultdict(list)
        for mi in self.mesh_instances:
            groups[mi["key"]].append(mi)

        def eff_emissive(df, mi):
            if mi["override"] is not None:
                return self._mat_kind(int(mi["override"]), mi["kind"]) == 1
            if mi["kind"] is not None:
                return mi["kind"] == 1
            mats = np.unique(np.broadcast_to(df["mat_ids"], (len(df["indices"]),)))
            return any(self._mat_kind(int(m), None) == 1 for m in mats)

        flatten_max = int(os.environ.get("PT_FLATTEN_MAX", "8192"))
        projected_rows = len(self.prims) + sum(
            len(self._mesh_defs[k]["indices"]) * len(v)
            for k, v in groups.items())
        flatten_all = (not self.force_instancing
                       and projected_rows <= flatten_max)

        shared_groups = []
        for key, insts in groups.items():
            df = self._mesh_defs[key]
            bake_list, inst_list = [], []
            for mi in insts:
                (bake_list if eff_emissive(df, mi) else inst_list).append(mi)
            if not flatten_all and (len(inst_list) >= 2
                                    or (self.force_instancing and inst_list)):
                shared_groups.append((key, inst_list))
            else:
                bake_list.extend(inst_list)
            for mi in bake_list:
                mats = mi["override"] if mi["override"] is not None else df["mat_ids"]
                self._expand_mesh_rows(df, mats, mi["transform"], mi["kind"], mi["iid"])

        # world rows are final now; local-space shared-mesh rows follow
        blas_meshes, blas_instances = [], []
        for mesh_i, (key, insts) in enumerate(shared_groups):
            df = self._mesh_defs[key]
            row_start = len(self.prims)
            local_rows = self._expand_mesh_rows(
                df, df["mat_ids"], None, None, -1, out=[], local=True
            )
            self.prims.extend(local_rows)
            lo = np.stack([r.aabb_lo for r in local_rows])
            hi = np.stack([r.aabb_hi for r in local_rows])
            blas_meshes.append(dict(row_start=row_start, aabb_lo=lo, aabb_hi=hi))
            mesh_lo, mesh_hi = lo.min(axis=0), hi.max(axis=0)
            for mi in insts:
                xf = (np.asarray(mi["transform"], np.float64)
                      if mi["transform"] is not None else np.eye(4))
                wlo, whi = transform_aabb(xf, mesh_lo, mesh_hi)
                ovr = mi["override"]
                blas_instances.append(
                    dict(
                        mesh=mesh_i,
                        xf_fwd=xf,
                        mat_override=-1 if ovr is None else int(ovr),
                        kind_override=(-1 if ovr is None
                                       else self._mat_kind(int(ovr), mi["kind"])),
                        gid=mi["iid"],
                        world_lo=wlo,
                        world_hi=whi,
                    )
                )
        return blas_meshes, blas_instances

    def build(self) -> World:
        if self.env is None:
            zero = self.add_curve(spectral.FlatCurve(0.0), name="__black__")
            self.set_environment_constant(zero, 0.0)
        # ensure at least one texture layer exists (dummy)
        if not self.tex_ranges:
            self.add_texture([(np.ones((1, 1), np.float32), 0)], name="__white__")

        blas_meshes, blas_instances = self._resolve_mesh_instances()
        self.mesh_instances = []  # consumed
        # hot loops ride int ids (materials, curves, prim rows) through f32
        # packed rows — exact only below 2^24; fail loudly at build instead
        # of silently corrupting lookups on absurdly large scenes
        for label, count in (("primitives", len(self.prims)),
                             ("materials", len(self.mat_rows)),
                             ("curves", len(self.curves))):
            if count >= (1 << 24):
                raise ValueError(
                    f"{label} count {count} >= 2^24: too large for "
                    f"f32-packed hot-loop indices")
        n_world_rows = (len(self.prims) - sum(len(m["aabb_lo"]) for m in blas_meshes))

        bank = spectral.bake_curves(self.curves)

        # textures -> atlas
        offsets, ws, hs, curves = [], [], [], []
        atlas = []
        acc = 0
        for w, c in self.tex_layers:
            offsets.append(acc)
            hs.append(w.shape[0])
            ws.append(w.shape[1])
            curves.append(c)
            atlas.append(w.ravel())
            acc += w.size
        tex = Textures(
            layer_start=jnp.asarray([r[0] for r in self.tex_ranges], jnp.int32),
            layer_count=jnp.asarray([r[1] for r in self.tex_ranges], jnp.int32),
            layer_curve=jnp.asarray(curves, jnp.int32),
            layer_offset=jnp.asarray(offsets, jnp.int32),
            layer_w=jnp.asarray(ws, jnp.int32),
            layer_h=jnp.asarray(hs, jnp.int32),
            atlas=jnp.asarray(np.concatenate(atlas), jnp.float32),
        )

        # materials
        def col(key, default, dtype):
            return jnp.asarray(
                [r.get(key, default) for r in self.mat_rows], dtype
            )

        mats = Materials(
            mtype=col("mtype", MAT_PASSTHROUGH, jnp.int32),
            tex_id=col("tex_id", -1, jnp.int32),
            alpha=col("alpha", 0.0, jnp.float32),
            eta_idx=col("eta_idx", 0, jnp.int32),
            eta_o_idx=col("eta_o_idx", 0, jnp.int32),
            kappa_idx=col("kappa_idx", 0, jnp.int32),
            permeability=col("permeability", 0.0, jnp.float32),
            metallic=col("metallic", False, bool),
            inner_medium=col("inner_medium", 0, jnp.int32),
            outer_medium=col("outer_medium", 0, jnp.int32),
            emit_idx=col("emit_idx", -1, jnp.int32),
            bounce_idx=col("bounce_idx", 0, jnp.int32),
            sharpness=col("sharpness", 0.0, jnp.float32),
            sidedness=col("sidedness", 2, jnp.int32),
        )

        def mcol(key, dtype):
            return jnp.asarray([r[key] for r in self.med_rows], dtype)

        meds = Mediums(
            mtype=mcol("mtype", jnp.int32),
            g_idx=mcol("g", jnp.int32),
            sigma_s_idx=mcol("ss", jnp.int32),
            sigma_a_idx=mcol("sa", jnp.int32),
            ior_idx=mcol("ior", jnp.int32),
            corrective=mcol("corr", jnp.float32),
        )

        # primitives (padded)
        p = len(self.prims)
        if p == 0:
            raise ValueError("scene has no primitives")
        pad = (-p) % _PAD

        def pv(get, fill=0.0):
            arr = np.stack([get(x) for x in self.prims]).astype(np.float32)
            if pad:
                arr = np.concatenate([arr, np.full((pad,) + arr.shape[1:], fill, np.float32)])
            return jnp.asarray(arr)

        def pi(get, fill=0):
            arr = np.asarray([get(x) for x in self.prims], np.int32)
            if pad:
                arr = np.concatenate([arr, np.full((pad,), fill, np.int32)])
            return jnp.asarray(arr)

        # prune unused transforms: an all-identity table enables the
        # intersector's static fast path (a vestigial entry — e.g. a mesh
        # transform that was baked into vertices — costs ~16x on TPU by
        # forcing per-(ray,prim) 4x4 gathers in every sweep)
        used = sorted({x.transform_id for x in self.prims} | {0})
        remap = {old: new for new, old in enumerate(used)}
        if len(used) < len(self.transforms):
            for x in self.prims:
                x.transform_id = remap[x.transform_id]
            self.transforms = [self.transforms[i] for i in used]
        xf_fwd = np.stack(self.transforms).astype(np.float32)
        xf_inv = np.stack([np.linalg.inv(t) for t in self.transforms]).astype(np.float32)
        prims = Primitives(
            ptype=pi(lambda x: x.ptype),
            pa=pv(lambda x: x.pa),
            pb=pv(lambda x: x.pb),
            pc=pv(lambda x: x.pc),
            na=pv(lambda x: x.na),
            nb=pv(lambda x: x.nb),
            nc=pv(lambda x: x.nc),
            material_id=pi(lambda x: x.material_id),
            mat_kind=pi(lambda x: x.mat_kind, -1),
            instance_id=pi(lambda x: x.instance_id, -1),
            transform_id=pi(lambda x: x.transform_id),
            area=pv(lambda x: x.area, 1.0),
            valid=jnp.asarray(np.concatenate([np.ones(p, bool), np.zeros(pad, bool)])),
            xf_fwd=jnp.asarray(xf_fwd),
            xf_inv=jnp.asarray(xf_inv),
        )

        # light list (reference collects instances with MaterialId::Light,
        # including per-triangle mesh lights, src/world/mod.rs:42-66);
        # shared-BLAS local rows are non-emissive by construction and are
        # excluded (emissive mesh instances are always baked to world rows)
        light_ids = [
            i for i, x in enumerate(self.prims[:n_world_rows]) if x.mat_kind == 1
        ]
        n_lights = len(light_ids)
        lpad = max(1, n_lights)
        lights = np.zeros(lpad, np.int32)
        lights[:n_lights] = light_ids

        bound_lo = [x.aabb_lo for x in self.prims[:n_world_rows]]
        bound_hi = [x.aabb_hi for x in self.prims[:n_world_rows]]
        bound_lo += [i["world_lo"] for i in blas_instances]
        bound_hi += [i["world_hi"] for i in blas_instances]
        lo = np.min(np.stack(bound_lo), axis=0)
        hi = np.max(np.stack(bound_hi), axis=0)
        center = (lo + hi) / 2.0
        radius = float(np.linalg.norm(hi - center))

        from pathtracer_tpu.accel import build_bvh_arrays

        if blas_instances:
            # two-level: TLAS over world rows + instance AABBs; shared
            # per-mesh BLASes over the local rows (accel/two_level.py)
            from pathtracer_tpu.accel.two_level import build_two_level

            accel2 = build_two_level(
                np.stack([x.aabb_lo for x in self.prims[:n_world_rows]])
                if n_world_rows else np.zeros((0, 3), np.float32),
                np.stack([x.aabb_hi for x in self.prims[:n_world_rows]])
                if n_world_rows else np.zeros((0, 3), np.float32),
                blas_meshes,
                blas_instances,
            )
            # legacy single-level BVH unused on this path; build a minimal
            # placeholder to keep the World pytree layout uniform
            bvh = build_bvh_arrays(
                np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32)
            )
        else:
            accel2 = None
            # stackless SAH BVH over ALL primitives (single-level world BVH)
            bvh = build_bvh_arrays(
                np.stack([x.aabb_lo for x in self.prims]),
                np.stack([x.aabb_hi for x in self.prims]),
            )

        return World(
            prims=prims,
            mats=mats,
            tex=tex,
            bank=bank,
            mediums=meds,
            env=self.env,
            lights=jnp.asarray(lights),
            n_lights=jnp.int32(n_lights),
            env_sampling_probability=jnp.float32(self.env_sampling_probability),
            center=jnp.asarray(center, jnp.float32),
            radius=jnp.float32(max(radius, 1.0)),
            bvh=bvh,
            accel2=accel2,
        )
