"""Vec2D: row-major 2-D buffer with uv addressing.

Capability parity with src/vec2d.rs:2-53 (`at/at_uv/write_at`, clamped
nearest uv sampling). Device-side film/texture access normally goes through
the SoA atlas (textures/texture.py); this host-side utility exists for tool
code (compare_exr heatmaps, preview downsampling).
"""

from __future__ import annotations

import numpy as np


class Vec2D:
    def __init__(self, width: int, height: int, fill=0.0, dtype=np.float32, channels=None):
        shape = (height, width) if channels is None else (height, width, channels)
        self.buffer = np.full(shape, fill, dtype)
        self.width = width
        self.height = height

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "Vec2D":
        v = cls.__new__(cls)
        v.buffer = np.asarray(arr)
        v.height, v.width = arr.shape[:2]
        return v

    def at(self, x: int, y: int):
        return self.buffer[y, x]

    def write_at(self, x: int, y: int, value):
        self.buffer[y, x] = value

    def at_uv(self, u: float, v: float):
        """Nearest sample with uv clamped to [0, 1) (vec2d.rs:at_uv)."""
        x = min(int(np.clip(u, 0.0, 1.0 - 1e-9) * self.width), self.width - 1)
        y = min(int(np.clip(v, 0.0, 1.0 - 1e-9) * self.height), self.height - 1)
        return self.buffer[y, x]
