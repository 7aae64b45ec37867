"""Parse-check configs, scenes and asset libraries from disk.

Capability parity with the reference's verify_data binary
(src/bin/verify_data.rs:23-50): subcommands validate each library kind plus
full configs/scenes without rendering.

Usage: python -m pathtracer_tpu.cli.verify_data {config,scene,curves,
materials,mediums,textures,meshes,all} PATH [--data-root ROOT]
"""

from __future__ import annotations

import argparse
import sys
import tomllib
import traceback

from pathtracer_tpu.parsing.config import parse_config
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.curves import parse_curve
from pathtracer_tpu.parsing.paths import DEFAULT_SEARCH_PATHS, resolve
from pathtracer_tpu.parsing.meshes import load_obj


def _load(path, search):
    with open(resolve(path, search), "rb") as f:
        return tomllib.load(f)


def check_curves(path, search):
    lib = _load(path, search)
    for name in lib:
        parse_curve(name, lib, search)
    return len(lib)


def check_materials(path, search, curves_path="data/lib_curves.toml"):
    lib = _load(path, search)
    curve_lib = _load(curves_path, search)
    n = 0
    for name, entry in lib.items():
        assert entry["type"] in ("Lambertian", "GGX", "DiffuseLight", "SharpLight"), name
        for key in ("eta", "eta_o", "kappa", "emit_color", "bounce_color"):
            if key in entry and isinstance(entry[key], dict):
                parse_curve(entry[key], curve_lib, search)
        n += 1
    return n


def check_mediums(path, search):
    lib = _load(path, search)
    for name, entry in lib.items():
        assert entry["type"] in ("HG", "Rayleigh"), name
    return len(lib)


def check_textures(path, search):
    lib = _load(path, search)
    n = 0
    for name, entries in lib.items():
        for entry in entries if isinstance(entries, list) else [entries]:
            assert entry["type"] in ("Texture1", "Texture4", "HDR", "EXR", "SRGB"), name
            n += 1
    return n


def check_meshes(path, search):
    lib = _load(path, search)
    n = 0
    for name, entry in lib.items():
        try:
            meshes = load_obj(resolve(entry["filename"], search), entry.get("mesh_index"))
            n += sum(len(m.indices) for m in meshes)
        except FileNotFoundError:
            print(f"  warning: mesh file missing: {entry['filename']}")
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["config", "scene", "curves", "materials",
                                     "mediums", "textures", "meshes", "all"])
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--data-root", action="append", default=None)
    args = ap.parse_args(argv)
    search = (args.data_root or []) + DEFAULT_SEARCH_PATHS

    checks = {
        "config": lambda p: parse_config(resolve(p, search)),
        "scene": lambda p: construct_world(p, search_paths=search),
        "curves": lambda p: check_curves(p, search),
        "materials": lambda p: check_materials(p, search),
        "mediums": lambda p: check_mediums(p, search),
        "textures": lambda p: check_textures(p, search),
        "meshes": lambda p: check_meshes(p, search),
    }
    if args.kind == "all":
        jobs = [("curves", "data/lib_curves.toml"), ("materials", "data/lib_materials.toml"),
                ("mediums", "data/lib_mediums.toml"), ("textures", "data/lib_textures.toml"),
                ("meshes", "data/lib_meshes.toml")]
    else:
        jobs = [(args.kind, args.path)]
    failed = 0
    for kind, path in jobs:
        try:
            result = checks[kind](path)
            print(f"OK {kind}: {path} ({result if isinstance(result, int) else 'parsed'})")
        except Exception:
            failed += 1
            print(f"FAIL {kind}: {path}")
            traceback.print_exc()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
