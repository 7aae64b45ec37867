"""Minimal dependency-free OpenEXR scanline I/O (float32/half, NO_COMPRESSION
and ZIP), with a chromaticities attribute like the reference's EXR output
(src/tonemap/mod.rs:207-338). Enough for round-tripping renders and for the
compare_exr tool."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXELTYPE_HALF = 1
_PIXELTYPE_FLOAT = 2


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data


def write_exr(path: str, rgb: np.ndarray, chromaticities=None):
    """rgb: float32 [H,W,3] linear. Writes uncompressed scanline EXR."""
    arr = np.asarray(rgb, np.float32)
    h, w = arr.shape[:2]
    # channel list sorted alphabetically: B, G, R
    chans = b""
    for name in (b"B", b"G", b"R"):
        chans += name + b"\x00" + struct.pack("<iiii", _PIXELTYPE_FLOAT, 0, 1, 1)
    chans += b"\x00"
    header = b""
    header += _attr(b"channels", b"chlist", chans)
    header += _attr(b"compression", b"compression", b"\x00")  # none
    header += _attr(b"dataWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"displayWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    if chromaticities is not None:
        c = chromaticities
        vals = [*c["r"], *c["g"], *c["b"], *c["w"]]
        header += _attr(b"chromaticities", b"chromaticities", struct.pack("<8f", *vals))
    header += b"\x00"

    with open(path, "wb") as f:
        f.write(struct.pack("<I", _MAGIC))
        f.write(struct.pack("<I", 2))  # version 2, scanline
        f.write(header)
        offset_table_pos = f.tell()
        f.write(b"\x00" * 8 * h)
        offsets = []
        for y in range(h):
            offsets.append(f.tell())
            # scanline: y, data size, then channel-planar B,G,R
            row = arr[y]
            data = row[:, 2].tobytes() + row[:, 1].tobytes() + row[:, 0].tobytes()
            f.write(struct.pack("<i", y) + struct.pack("<i", len(data)) + data)
        f.seek(offset_table_pos)
        f.write(struct.pack("<%dQ" % h, *offsets))


def _read_attrs(data, pos):
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e]
        pos = e + 1
        e = data.index(b"\x00", pos)
        typ = data[pos:e]
        pos = e + 1
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        attrs[name.decode()] = (typ.decode(), data[pos : pos + size])
        pos += size
    return attrs, pos + 1


def _parse_channels(raw: bytes):
    chans = []
    pos = 0
    while raw[pos] != 0:
        e = raw.index(b"\x00", pos)
        name = raw[pos:e].decode()
        ptype, _, xs, ys = struct.unpack_from("<iiii", raw, e + 1)
        chans.append((name, ptype))
        pos = e + 1 + 16
    return chans


def read_exr(path: str):
    """Returns float32 [H,W,3] RGB (channels beyond RGB ignored; missing
    channels zero-filled). Supports NO_COMPRESSION and ZIP/ZIPS."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<II", data, 0)
    assert magic == _MAGIC, "not an EXR"
    assert version & 0x200 == 0, "tiled EXR unsupported"
    attrs, pos = _read_attrs(data, 8)
    chans = _parse_channels(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    lines_per_block = {0: 1, 2: 1, 3: 16}.get(comp)
    assert lines_per_block is not None, f"compression {comp} unsupported"
    n_blocks = -(-h // lines_per_block)
    offsets = struct.unpack_from("<%dQ" % n_blocks, data, pos)
    out = np.zeros((h, w, 3), np.float32)
    name_to_idx = {"R": 0, "G": 1, "B": 2}
    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        raw = data[off + 8 : off + 8 + size]
        if comp in (2, 3):  # ZIPS / ZIP
            raw = zlib.decompress(raw)
            # EXR zip postprocess: delta-decode (t[i] += t[i-1] - 128) then
            # deinterleave (first half -> even byte positions)
            buf = np.frombuffer(raw, np.uint8).astype(np.int64)
            rec = (np.cumsum(np.concatenate([buf[:1], buf[1:] - 128])) % 256).astype(np.uint8)
            half = (len(rec) + 1) // 2
            inter = np.zeros(len(rec), np.uint8)
            inter[0::2] = rec[:half]
            inter[1::2] = rec[half:]
            raw = inter.tobytes()
        rows = min(lines_per_block, h - (y - y0))
        rowbytes = {_PIXELTYPE_HALF: 2, _PIXELTYPE_FLOAT: 4}
        pos2 = 0
        for r in range(rows):
            for name, ptype in chans:
                nb = rowbytes[ptype] * w
                seg = raw[pos2 : pos2 + nb]
                pos2 += nb
                if name in name_to_idx:
                    if ptype == _PIXELTYPE_FLOAT:
                        vals = np.frombuffer(seg, "<f4")
                    else:
                        vals = np.frombuffer(seg, "<f2").astype(np.float32)
                    out[y - y0 + r, :, name_to_idx[name]] = vals
    return out
