"""Minimal OpenEXR codec (capability ref: the reference links OpenEXR
via OIIO for multilayer output — render/image_oiio.cpp and the
session's EXR writers; independent implementation of the public OpenEXR
2.0 file format spec, scanline, uncompressed).

Good enough for production interchange of render passes: float32 (and
half on write) channels, single-part scanline images, multilayer via
dotted channel names ("Combined.R", "crypto_object.00.R", ...). Any
EXR-aware tool (Blender, Nuke, oiiotool) reads these files; the reader
accepts what the writer emits (NO_COMPRESSION, FLOAT/HALF).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_VERSION = struct.pack("<I", 2)
_PT_HALF, _PT_FLOAT = 1, 2


def _attr(name, typ, data):
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<I", len(data)) + data)


def _chlist(channels, pixel_type):
    out = b""
    for name in channels:          # must be alphabetically sorted
        out += (name.encode() + b"\0"
                + struct.pack("<i", pixel_type)
                + struct.pack("<B3x", 0)
                + struct.pack("<ii", 1, 1))
    return out + b"\0"


def write_exr(path, channels, half=False, compression="zip"):
    """channels: {name: (H, W) float32}; all same shape. Layered names
    use dots ("Combined.R"). half=True stores 16-bit floats.

    The native C++ codec (native/exr_codec.cpp) handles the hot path
    and ZIP compression; this Python body is the portable fallback
    (uncompressed) and the parity twin the native codec is tested
    against. compression: "zip" | "zips" | "none"."""
    try:
        from raytracingproject_tpu import native as nat
        comp = {"none": nat.EXR_COMP_NONE, "zips": nat.EXR_COMP_ZIPS,
                "zip": nat.EXR_COMP_ZIP}[compression]
        if nat.exr_write_native(path, channels, half=half,
                                compression=comp):
            return path
    except ImportError:  # pragma: no cover
        pass
    names = sorted(channels)
    if not names:
        raise ValueError("no channels")
    arrs = {n: np.asarray(channels[n], np.float32) for n in names}
    h, w = next(iter(arrs.values())).shape
    for n, a in arrs.items():
        if a.shape != (h, w):
            raise ValueError(f"channel {n} shape {a.shape} != {(h, w)}")
    ptype = _PT_HALF if half else _PT_FLOAT
    psize = 2 if half else 4

    header = b""
    header += _attr("channels", "chlist", _chlist(names, ptype))
    header += _attr("compression", "compression", b"\0")  # NO_COMPRESSION
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")      # INCREASING_Y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f",
                    struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    line_bytes = w * psize * len(names)
    data_start = (len(_MAGIC) + len(_VERSION) + len(header) + 8 * h)
    offsets = [data_start + y * (8 + line_bytes) for y in range(h)]

    with open(path, "wb") as f:
        f.write(_MAGIC + _VERSION + header)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<iI", y, line_bytes))
            for n in names:
                row = arrs[n][y]
                if half:
                    row = row.astype(np.float16)
                f.write(row.tobytes())
    return path


def _read_attrs(buf, pos):
    attrs = {}
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e].decode(); pos = e + 1
        e = buf.index(b"\0", pos)
        typ = buf[pos:e].decode(); pos = e + 1
        size = struct.unpack_from("<I", buf, pos)[0]; pos += 4
        attrs[name] = (typ, buf[pos:pos + size]); pos += size
    return attrs, pos + 1


def _parse_chlist(data):
    chans, pos = [], 0
    while data[pos] != 0:
        e = data.index(b"\0", pos)
        name = data[pos:e].decode(); pos = e + 1
        ptype = struct.unpack_from("<i", data, pos)[0]
        pos += 16
        chans.append((name, ptype))
    return chans


def read_exr(path):
    """Read a single-part scanline EXR with HALF/FLOAT channels —
    NO_COMPRESSION, ZIP, or ZIPS via the native codec; the Python body
    below reads the uncompressed subset as the portable fallback.
    Returns {channel_name: (H, W) float32}."""
    try:
        from raytracingproject_tpu import native as nat
        out = nat.exr_read_native(path)
        if out is not None:
            return out
    except ImportError:  # pragma: no cover
        pass
    buf = open(path, "rb").read()
    if buf[:4] != _MAGIC:
        raise ValueError("not an EXR file")
    version = struct.unpack_from("<I", buf, 4)[0]
    if version & (0x200 | 0x800 | 0x1000):
        raise NotImplementedError(
            "tiled/deep/multi-part EXR not supported")
    attrs, pos = _read_attrs(buf, 8)
    if attrs["compression"][1][0] != 0:
        raise NotImplementedError(
            "only NO_COMPRESSION files supported (got "
            f"{attrs['compression'][1][0]})")
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    chans = _parse_chlist(attrs["channels"][1])
    offsets = struct.unpack_from(f"<{h}Q", buf, pos)
    out = {n: np.empty((h, w), np.float32) for n, _ in chans}
    for yi, off in enumerate(offsets):
        y, nbytes = struct.unpack_from("<iI", buf, off)
        p = off + 8
        for n, ptype in chans:        # alphabetical in-file order
            if ptype == _PT_FLOAT:
                row = np.frombuffer(buf, np.float32, w, p)
                p += 4 * w
            elif ptype == _PT_HALF:
                row = np.frombuffer(buf, np.float16, w, p).astype(
                    np.float32)
                p += 2 * w
            else:
                raise NotImplementedError(f"pixel type {ptype}")
            out[n][y - y0] = row
    return out


def write_multilayer_exr(path, layers, half=False):
    """layers: {name: (H, W, C)} -> channels name.R/G/B/A (C<=4) or
    name.00..name.NN for deep stacks (cryptomatte ranks)."""
    channels = {}
    suffix4 = ["R", "G", "B", "A"]
    for name, arr in layers.items():
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        c = arr.shape[-1]
        for k in range(c):
            suf = suffix4[k] if c <= 4 else f"{k:02d}"
            channels[f"{name}.{suf}"] = arr[..., k]
    return write_exr(path, channels, half=half)


def read_multilayer_exr(path):
    """Inverse of write_multilayer_exr: groups channels by layer."""
    chans = read_exr(path)
    layers = {}
    order = {"R": 0, "G": 1, "B": 2, "A": 3}
    groups = {}
    for full in chans:
        layer, _, suf = full.rpartition(".")
        groups.setdefault(layer, []).append(suf)
    for layer, sufs in groups.items():
        sufs.sort(key=lambda s: order.get(s, 100 + int(s)
                                          if s.isdigit() else 999))
        layers[layer] = np.stack(
            [chans[f"{layer}.{s}"] for s in sufs], -1)
    return layers
