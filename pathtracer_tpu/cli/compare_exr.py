"""EXR image-diff tool: abs diff / RMSE / relative error + heatmap.

Capability parity with the reference's compare_exr binary
(src/bin/compare_exr.rs:38-60) — the project's own accuracy comparator used
for golden-image validation.

Usage: python -m pathtracer_tpu.cli.compare_exr a.exr b.exr [--mode rmse]
       [--heatmap out.png]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from pathtracer_tpu.tonemap.io_exr import read_exr
from pathtracer_tpu.tonemap.io_png import write_png


def compare(a: np.ndarray, b: np.ndarray):
    diff = a.astype(np.float64) - b.astype(np.float64)
    abs_diff = np.abs(diff)
    rmse = float(np.sqrt(np.mean(diff**2)))
    denom = np.maximum(np.abs(b), 1e-6)
    rel = abs_diff / denom
    # normalised RMSE relative to the reference's dynamic range
    scale = float(np.abs(b).mean()) or 1.0
    return dict(
        rmse=rmse,
        rmse_relative=rmse / scale,
        mean_abs=float(abs_diff.mean()),
        max_abs=float(abs_diff.max()),
        mean_rel=float(rel.mean()),
        max_rel=float(rel.max()),
    ), abs_diff


def heatmap(abs_diff: np.ndarray) -> np.ndarray:
    """Simple blue->red heatmap of per-pixel mean abs error."""
    e = abs_diff.mean(axis=-1)
    e = e / max(float(e.max()), 1e-12)
    rgb = np.zeros(e.shape + (3,), np.float32)
    rgb[..., 0] = np.clip(2 * e - 1, 0, 1) * 0.9 + np.clip(2 * e, 0, 1) * 0.1
    rgb[..., 1] = np.clip(1 - np.abs(2 * e - 1), 0, 1)
    rgb[..., 2] = np.clip(1 - 2 * e, 0, 1)
    return rgb


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("image_a")
    ap.add_argument("image_b")
    ap.add_argument("--heatmap", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    a = read_exr(args.image_a)
    b = read_exr(args.image_b)
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}", file=sys.stderr)
        return 2
    stats, abs_diff = compare(a, b)
    if args.heatmap:
        write_png(args.heatmap, heatmap(abs_diff))
    if args.json:
        print(json.dumps(stats))
    else:
        for k, v in stats.items():
            print(f"{k}: {v:.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
