"""Image loaders for texture assets: PNG, BMP, Radiance HDR, EXR.

Capability parity with src/parsing/texture.rs:49-147 (png/bmp/hdr/exr ->
float weight planes). All pure Python/numpy, no external image deps.
"""

from __future__ import annotations

import struct

import numpy as np

from pathtracer_tpu.tonemap.io_exr import read_exr
from pathtracer_tpu.tonemap.io_png import read_png


def srgb_to_linear(x):
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def load_png_rgba(path: str) -> np.ndarray:
    """-> float32 [H,W,4] in [0,1] (sRGB-encoded values left as stored)."""
    img = read_png(path)
    if img.dtype == np.uint16:
        img = (img / 65535.0).astype(np.float32)
    else:
        img = (img / 255.0).astype(np.float32)
    h, w, c = img.shape
    out = np.ones((h, w, 4), np.float32)
    out[..., :c] = img[..., :4]
    if c == 1:
        out[..., 1] = out[..., 2] = out[..., 0]
    elif c == 2:
        out[..., 1] = out[..., 2] = out[..., 0]
        out[..., 3] = img[..., 1]
    return out


def load_bmp_rgba(path: str) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> float32 [H,W,4]."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM", "not a BMP"
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    assert comp in (0, 3), f"compressed BMP unsupported ({comp})"
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    flip = h > 0
    h = abs(h)
    img = np.zeros((h, w, 4), np.float32)
    img[..., 3] = 1.0
    for y in range(h):
        row = np.frombuffer(data, np.uint8, count=w * nch, offset=pix_off + y * stride)
        row = row.reshape(w, nch).astype(np.float32) / 255.0
        dest = h - 1 - y if flip else y
        img[dest, :, 0] = row[:, 2]  # BGR order
        img[dest, :, 1] = row[:, 1]
        img[dest, :, 2] = row[:, 0]
        if nch == 4:
            img[dest, :, 3] = row[:, 3]
    return img


def load_hdr_rgba(path: str, alpha_fill: float = 0.0) -> np.ndarray:
    """Radiance RGBE (.hdr) -> float32 [H,W,4] linear."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends at blank line; then resolution line
    pos = data.index(b"\n\n") + 2
    res_end = data.index(b"\n", pos)
    res = data[pos:res_end].decode().split()
    assert res[0] == "-Y" and res[2] == "+X", f"unsupported orientation {res}"
    h, w = int(res[1]), int(res[3])
    pos = res_end + 1
    rgbe = np.zeros((h, w, 4), np.uint8)
    for y in range(h):
        # new-style RLE scanline
        if data[pos] == 2 and data[pos + 1] == 2 and (data[pos + 2] << 8 | data[pos + 3]) == w:
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            data, np.uint8, count=count, offset=pos
                        )
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(data, np.uint8, count=w * 4, offset=pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4
    scale = np.ldexp(1.0, rgbe[..., 3].astype(np.int32) - 136)  # 2^(e-128)/256
    out = np.ones((h, w, 4), np.float32)
    out[..., :3] = rgbe[..., :3].astype(np.float32) * scale[..., None]
    out[..., 3] = alpha_fill
    return out


def load_exr_rgba(path: str, alpha_fill: float = 1.0) -> np.ndarray:
    rgb = read_exr(path)
    h, w = rgb.shape[:2]
    out = np.full((h, w, 4), alpha_fill, np.float32)
    out[..., :3] = rgb
    return out
