"""construct_world: TOML scene -> device World + camera specs.

Capability parity with src/parsing/mod.rs:145-563: load the scene TOML,
resolve path-or-inline libraries (MaybeXLib semantics), lazily parse only
the curves/textures/materials/meshes actually referenced (usage scan),
material id 0 = the mauve error light, per-mesh OBJ material names remapped
to world material ids, instances expanded (meshes pre-transformed to world
space), cameras returned as specs for per-settings aspect-ratio fixup
(src/parsing/cameras.rs:116-204).
"""

from __future__ import annotations

import dataclasses
import tomllib
from typing import List, Optional

import numpy as np

from pathtracer_tpu.core import spectral
from pathtracer_tpu.core.transform import from_stack
from pathtracer_tpu.materials.diffuse_light import SIDE_DUAL, SIDE_FORWARD, SIDE_REVERSE
from pathtracer_tpu.parsing.builder import SceneBuilder
from pathtracer_tpu.parsing.curves import parse_curve
from pathtracer_tpu.parsing.images import (
    load_bmp_rgba,
    load_exr_rgba,
    load_hdr_rgba,
    load_png_rgba,
    srgb_to_linear,
)
from pathtracer_tpu.parsing.meshes import load_obj
from pathtracer_tpu.parsing.paths import resolve
from pathtracer_tpu.world.environment import ENV_HDR, ENV_SUN, Environment
from pathtracer_tpu.world import importance_map as imp_mod

import jax.numpy as jnp

_SIDEDNESS = {"Forward": SIDE_FORWARD, "Reverse": SIDE_REVERSE, "Dual": SIDE_DUAL}
_AXES = {
    "X": (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])),
    "Y": (np.array([0, 1.0, 0]), np.array([0, 0, 1.0]), np.array([1.0, 0, 0])),
    "Z": (np.array([0, 0, 1.0]), np.array([1.0, 0, 0]), np.array([0, 1.0, 0])),
}


@dataclasses.dataclass
class CameraSpec:
    """Host-side camera description; materialised per render-settings with
    the film aspect ratio (with_aspect_ratio equivalent)."""

    kind: str
    name: str
    data: dict


@dataclasses.dataclass
class SceneBundle:
    world: object
    cameras: List[CameraSpec]
    builder: SceneBuilder

    def camera_by_id(self, camera_id: str) -> CameraSpec:
        for c in self.cameras:
            if c.name == camera_id:
                return c
        return self.cameras[0]


def _load_lib(value, search_paths) -> dict:
    """MaybeXLib: a path string loads a library TOML, a table is inline."""
    if isinstance(value, str):
        with open(resolve(value, search_paths), "rb") as f:
            return tomllib.load(f)
    return value or {}


class _Resolver:
    """Lazy by-name resolution into the SceneBuilder (usage-scan
    equivalent: unreferenced library entries are never parsed)."""

    def __init__(self, builder: SceneBuilder, libs: dict, search_paths):
        self.b = builder
        self.libs = libs
        self.sp = search_paths

    # curves -------------------------------------------------------------
    def curve(self, data, name_hint: Optional[str] = None) -> int:
        name = data if isinstance(data, str) else name_hint
        if isinstance(name, str) and name in self.b._curve_names:
            return self.b._curve_names[name]
        host = parse_curve(data, self.libs["curves"], self.sp)
        return self.b.add_curve(host, name=name if isinstance(name, str) else None)

    # textures -----------------------------------------------------------
    def texture(self, name: str) -> int:
        if name in self.b._tex_names:
            return self.b._tex_names[name]
        entry = self.libs["textures"][name]
        if isinstance(entry, list):  # [[name]] array-of-tables syntax
            entry = entry[0]
        layers = self._texture_layers(entry)
        return self.b.add_texture(layers, name=name)

    def _texture_layers(self, entry: dict):
        typ = entry["type"]
        path = resolve(entry["filename"], self.sp)
        if typ == "Texture1":
            img = self._load_ldr(path)
            weight = srgb_to_linear(img[..., :3].mean(axis=-1))
            return [(weight, self.curve(entry["curve"]))]
        if typ == "Texture4":
            img = self._load_ldr(path)
            curves = [self.curve(c) for c in entry["curves"]]
            planes = [srgb_to_linear(img[..., k]) for k in range(3)] + [img[..., 3]]
            return list(zip(planes, curves))
        if typ == "SRGB":
            # sRGB basis upsampling: image RGB drives the standard sRGB
            # basis spectra (parsing/texture.rs SRGB variant)
            img = self._load_ldr(path)
            curves = [self.curve(c) for c in ("srgb_r", "srgb_g", "srgb_b")]
            planes = [srgb_to_linear(img[..., k]) for k in range(3)]
            return list(zip(planes, curves))
        if typ in ("HDR", "EXR"):
            if typ == "HDR":
                img = load_hdr_rgba(path, float(entry.get("alpha_fill", 0.0)))
            else:
                img = load_exr_rgba(path)
            curves = [self.curve(c) for c in entry["curves"]]
            return [(img[..., k], curves[k]) for k in range(4)]
        raise ValueError(f"unknown texture type {typ!r}")

    @staticmethod
    def _load_ldr(path: str):
        if path.lower().endswith(".png"):
            return load_png_rgba(path)
        if path.lower().endswith(".bmp"):
            return load_bmp_rgba(path)
        raise ValueError(f"unsupported LDR texture format: {path}")

    # mediums ------------------------------------------------------------
    def medium(self, name: str) -> int:
        if name in self.b._med_names:
            return self.b._med_names[name]
        entry = self.libs["mediums"][name]
        typ = entry["type"]
        if typ == "HG":
            return self.b.add_medium_hg(
                self.curve(entry["g"], f"{name}.g"),
                self.curve(entry["sigma_s"], f"{name}.sigma_s"),
                self.curve(entry["sigma_a"], f"{name}.sigma_a"),
                name=name,
            )
        if typ == "Rayleigh":
            return self.b.add_medium_rayleigh(
                self.curve(entry["ior"], f"{name}.ior"),
                float(entry.get("corrective_factor", 1.0)),
                name=name,
            )
        raise ValueError(f"unknown medium type {typ!r}")

    # materials ----------------------------------------------------------
    def material(self, name: str) -> int:
        if name in self.b._mat_names:
            return self.b._mat_names[name]
        entry = self.libs["materials"][name]
        typ = entry["type"]
        if typ == "Lambertian":
            return self.b.add_lambertian(self.texture(entry["texture_id"]), name=name)
        if typ == "GGX":
            inner = entry.get("inner_medium_id")
            outer = entry.get("outer_medium_id")
            return self.b.add_ggx(
                alpha=float(entry.get("alpha", 0.001)),
                eta_idx=self.curve(entry["eta"], f"{name}.eta"),
                eta_o_idx=self.curve(entry["eta_o"], f"{name}.eta_o"),
                kappa_idx=self.curve(entry["kappa"], f"{name}.kappa"),
                permeability=float(entry.get("permeability", 0.0)),
                inner_medium=self.medium(inner) if inner else 0,
                outer_medium=self.medium(outer) if outer else 0,
                name=name,
            )
        if typ in ("DiffuseLight", "SharpLight"):
            emit = self.curve(entry["emit_color"], f"{name}.emit")
            bounce = self.curve(entry["bounce_color"], f"{name}.bounce")
            side = _SIDEDNESS[entry.get("sidedness", "Dual")]
            if typ == "DiffuseLight":
                return self.b.add_diffuse_light(emit, bounce, side, name=name)
            return self.b.add_sharp_light(
                emit, bounce, side, float(entry.get("sharpness", 1.0)), name=name
            )
        raise ValueError(f"unknown material type {typ!r}")


def _error_material(b: SceneBuilder):
    """Material id 0 = mauve error light flagging unmapped materials
    (reference: src/parsing/mod.rs:438-467, src/curves.rs mauve)."""
    mauve = b.add_curve(
        spectral.MachineCurve(
            0.0,
            [
                ("add", spectral.SpikeCurve(420.0, 30.0, 30.0, 1.0)),
                ("add", spectral.SpikeCurve(640.0, 40.0, 40.0, 0.8)),
            ],
        ),
        name="__mauve__",
    )
    zero = b.add_curve(spectral.FlatCurve(0.0), name="__zero__")
    b.add_diffuse_light(mauve, zero, SIDE_DUAL, name="__error__")
    return zero


def construct_world(
    scene_path: str,
    search_paths: Optional[List[str]] = None,
    cache_dir: str = "cache",
    camera_surfaces: bool = False,
) -> SceneBundle:
    """camera_surfaces: insert each projective camera's lens-proxy disk
    into the scene (MaterialId::Camera) so LT light paths can hit the lens
    directly — enable for LT renders (reference projective_camera.rs:73-79;
    upstream's accelerator insertion is unimplemented!())."""
    with open(resolve(scene_path, search_paths), "rb") as f:
        scene = tomllib.load(f)

    libs = {
        key: _load_lib(scene.get(key), search_paths)
        for key in ("curves", "textures", "materials", "mediums", "meshes")
    }

    b = SceneBuilder()
    zero_curve = _error_material(b)
    r = _Resolver(b, libs, search_paths)
    b.env_sampling_probability = float(scene.get("env_sampling_probability", 0.5))

    # ------------------------------------------------------------ env
    env_data = scene.get("environment", {"type": "Constant", "color": {"type": "Flat", "strength": 0.0}, "strength": 0.0})
    _build_environment(b, r, env_data, cache_dir)

    # ------------------------------------------------------- instances
    obj_cache = {}
    for inst in scene.get("instances", []):
        agg = inst["aggregate"]
        typ = agg["type"]
        mat_name = inst.get("material_name")
        tid = 0
        if "transform" in inst:
            t = inst["transform"]
            rotations = [(rot["axis"], rot["angle"]) for rot in t.get("rotate", [])]
            tid = b.add_transform(
                from_stack(t.get("scale"), rotations, t.get("translate"))
            )
        if typ == "Sphere":
            mid = r.material(mat_name) if mat_name else 0
            b.add_sphere(agg.get("origin", [0, 0, 0]), float(agg["radius"]), mid, transform_id=tid)
        elif typ == "Rect":
            mid = r.material(mat_name) if mat_name else 0
            normal_ax, u_ax, v_ax = _AXES[agg.get("normal", "Z")]
            sx, sy = agg["size"]
            b.add_rect(
                agg.get("origin", [0, 0, 0]),
                u_ax * (float(sx) / 2.0),
                v_ax * (float(sy) / 2.0),
                mid,
                two_sided=bool(agg.get("two_sided", True)),
                transform_id=tid,
            )
        elif typ == "Disk":
            mid = r.material(mat_name) if mat_name else 0
            normal_ax, _, _ = _AXES[agg.get("normal", "Z")]
            b.add_disk(agg.get("origin", [0, 0, 0]), normal_ax, float(agg["radius"]), mid, transform_id=tid)
        elif typ == "Mesh":
            _build_mesh_instance(b, r, libs, agg, mat_name, inst, search_paths,
                                 obj_cache=obj_cache)
        else:
            raise ValueError(f"unknown aggregate type {typ!r}")

    # --------------------------------------------------------- cameras
    cameras = []
    for cam in scene.get("cameras", []):
        cameras.append(CameraSpec(kind=cam["type"], name=cam.get("name", "main"), data=cam))

    if camera_surfaces:
        for ci, spec in enumerate(cameras):
            if spec.kind != "SimpleCamera":
                continue
            d = spec.data
            lf = np.asarray(d["look_from"], np.float64)
            la = np.asarray(d["look_at"], np.float64)
            w_dir = la - lf
            w_dir = w_dir / np.linalg.norm(w_dir)
            b.add_camera_surface(
                ci, lf, w_dir, float(d.get("aperture_diameter", 0.0)) / 2.0
            )

    world = b.build()
    return SceneBundle(world=world, cameras=cameras, builder=b)


def _build_mesh_instance(b, r, libs, agg, mat_name, inst, search_paths,
                         obj_cache=None):
    mesh_entry = libs["meshes"][agg["name"]]
    path = resolve(mesh_entry["filename"], search_paths)
    mesh_index = mesh_entry.get("mesh_index")
    cache_key = (path, mesh_index)
    if obj_cache is not None and cache_key in obj_cache:
        meshes = obj_cache[cache_key]
    else:
        meshes = load_obj(path, mesh_index)
        if obj_cache is not None:
            obj_cache[cache_key] = meshes
    transform = None
    if "transform" in inst:
        t = inst["transform"]
        rotations = [(rot["axis"], rot["angle"]) for rot in t.get("rotate", [])]
        transform = from_stack(t.get("scale"), rotations, t.get("translate"))
    for sub_i, mesh in enumerate(meshes):
        # per-face OBJ material names -> world ids; unknown -> 0 (mauve)
        name_map = []
        for nm in mesh.material_names:
            try:
                name_map.append(r.material(nm))
            except KeyError:
                name_map.append(0)
        if name_map:
            lut = np.asarray(name_map + [0], np.int64)
            mat_ids = lut[np.where(mesh.face_materials >= 0, mesh.face_materials, len(name_map))]
        else:
            mat_ids = 0
        override = r.material(mat_name) if mat_name else None
        # mesh_key lets repeated instances of one OBJ share a BLAS
        # (builder decides bake-vs-instance; see SceneBuilder.add_mesh)
        b.add_mesh(
            mesh.vertices, mesh.indices, mesh.normals, mat_ids,
            transform=transform, mesh_key=(path, mesh_index, sub_i),
            material_override=override,
        )


def _build_environment(b: SceneBuilder, r: _Resolver, env: dict, cache_dir: str):
    typ = env.get("type", "Constant")
    strength = float(env.get("strength", 0.0))
    if typ == "Constant":
        cidx = r.curve(env.get("color", {"type": "Flat", "strength": 0.0}), "__env_color__")
        b.set_environment_constant(cidx, strength)
        return
    if typ == "Sun":
        cidx = r.curve(env.get("color", {"type": "Flat", "strength": 1.0}), "__env_color__")
        base = Environment.constant(cidx, strength)
        sd = np.asarray(env.get("sun_direction", [0, 0, 1]), np.float64)
        sd = sd / np.linalg.norm(sd)
        ang = float(env.get("angular_diameter", 0.1))
        b.env = base._replace(
            kind=jnp.int32(ENV_SUN),
            sun_direction=jnp.asarray(sd, jnp.float32),
            sun_cos_angle=jnp.float32(np.cos(ang / 2.0)),
        )
        return
    if typ == "HDRI":
        try:
            tex_idx = r.texture(env["texture_name"])
        except (FileNotFoundError, KeyError) as e:
            # several reference scenes point at .hdr assets that were never
            # committed upstream; degrade to a black constant environment
            # (exact behaviour for strength == 0 scenes like
            # cornell_box_medium.toml) instead of failing the build
            import logging

            logging.getLogger("pathtracer_tpu").warning(
                "HDRI texture %r unavailable (%s); using black environment",
                env.get("texture_name"), e)
            zero = b.add_curve(spectral.FlatCurve(0.0), name="__env_black__")
            b.set_environment_constant(zero, 0.0)
            return
        base = Environment.constant(0, strength)
        imp = env.get("importance_map")
        rot = np.eye(3)
        if "rotation" in env:
            rotations = [(q["axis"], q["angle"]) for q in env["rotation"]] if isinstance(env["rotation"], list) else []
            rot = from_stack(None, rotations, None)[:3, :3]
        fields = dict(
            kind=jnp.int32(ENV_HDR),
            tex_id=jnp.int32(tex_idx),
            rotation=jnp.asarray(np.linalg.inv(rot), jnp.float32),
            rotation_inv=jnp.asarray(rot, jnp.float32),
        )
        if imp:
            start, count = b.tex_ranges[tex_idx]
            layers = b.tex_layers[start : start + count]
            marginal, row, pdf = imp_mod.load_or_bake(
                cache_dir,
                env["texture_name"],
                layers,
                b.curves,
                int(imp.get("width", 512)),
                int(imp.get("height", 256)),
                use_cache=bool(imp.get("cache", True)),
            )
            fields.update(
                imp_marginal_cdf=jnp.asarray(marginal),
                imp_row_cdf=jnp.asarray(row),
                imp_pdf=jnp.asarray(pdf),
                imp_baked=jnp.bool_(True),
            )
        b.env = base._replace(**fields)
        return
    raise ValueError(f"unknown environment type {typ!r}")
