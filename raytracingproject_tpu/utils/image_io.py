"""Image input/output (ref: render/image_oiio.cpp, render/merge.cpp).

The reference uses OpenImageIO + OpenEXR. Here: PNG/JPEG/TGA/TIFF/BMP
via PIL for LDR, native codecs for the HDR formats OIIO covers —
OpenEXR (utils/exr.py), Radiance RGBE .hdr and Portable FloatMap .pfm
(below) — and a self-contained multilayer float format (.npz with a
manifest) standing in for multilayer EXR — it round-trips every render
pass with exact float32 bits, which is what the resumable-chunk merge
path (ref: render/merge.cpp ImageMerger) needs.
"""

from __future__ import annotations

import json
import numpy as np


def write_png(path, rgb, srgb=True):
    """Write (H, W, 3|4) float image in [0,inf) to an 8-bit PNG."""
    from PIL import Image
    arr = np.asarray(rgb, np.float32)
    if srgb:
        a = np.clip(arr[..., :3], 0.0, None)
        a = np.where(a < 0.0031308, a * 12.92,
                     1.055 * np.power(np.maximum(a, 1e-10), 1 / 2.4) - 0.055)
        if arr.shape[-1] == 4:
            a = np.concatenate([a, arr[..., 3:4]], axis=-1)
        arr = a
    arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def read_image(path):
    """Read an LDR/HDR image file to linear float32 (H, W, C)."""
    if str(path).endswith((".npz", ".mlx")):
        layers = read_multilayer(path)
        return next(iter(layers.values()))
    if str(path).endswith(".hdr"):
        return read_hdr(path)
    if str(path).endswith(".pfm"):
        return read_pfm(path)
    if str(path).endswith(".exr"):
        # linear HDR, no sRGB decode (utils/exr.py codec)
        from raytracingproject_tpu.utils import exr as exr_mod
        layers = exr_mod.read_multilayer_exr(path)
        for key in ("Combined", "", "combined"):
            if key in layers:
                return layers[key].astype(np.float32)
        return next(iter(layers.values())).astype(np.float32)
    from PIL import Image
    img = Image.open(path)
    arr = np.asarray(img).astype(np.float32)
    if arr.dtype == np.uint8 or arr.max() > 1.0 + 1e-6:
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    # sRGB -> linear for LDR color channels
    c = arr[..., :3] if arr.shape[-1] >= 3 else arr
    c = np.where(c < 0.04045, c / 12.92, np.power((c + 0.055) / 1.055, 2.4))
    if arr.shape[-1] >= 3:
        arr = np.concatenate([c, arr[..., 3:]], axis=-1)
    else:
        arr = c
    return arr.astype(np.float32)


# ---------------------------------------------------------------------------
# Radiance RGBE (.hdr) — shared-exponent HDR, the classic env-map
# format (ref: render/image_oiio.cpp reads it via OIIO's hdr plugin).
# Written from the published format spec (Ward, "Real Pixels"): header,
# "-Y H +X W" resolution line, then per-scanline either flat RGBE
# quadruples or the new-RLE encoding (2,2,hi,lo marker + 4 RLE-coded
# component planes).
# ---------------------------------------------------------------------------

def _rgbe_decode(rgbe):
    """(..., 4) uint8 RGBE -> (..., 3) float32 linear."""
    rgbe = rgbe.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0.0, np.exp2(e - 136.0), 0.0)  # 2^(e-128-8)
    return rgbe[..., :3] * scale[..., None]


def _rgbe_encode(rgb):
    """(..., 3) float32 linear -> (..., 4) uint8 RGBE."""
    rgb = np.maximum(np.asarray(rgb, np.float32), 0.0)
    maxc = rgb.max(axis=-1)
    m, e = np.frexp(maxc)
    # factor maps maxc into [128, 256) mantissa counts
    factor = np.where(maxc >= 1e-32, m * 256.0 / np.maximum(maxc, 1e-32),
                      0.0)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    out[..., :3] = np.clip(rgb * factor[..., None] + 0.5, 0,
                           255).astype(np.uint8)
    out[..., 3] = np.where(maxc >= 1e-32, e + 128, 0).astype(np.uint8)
    return out


def read_hdr(path):
    """Read a Radiance .hdr file to linear float32 (H, W, 3)."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    # header ends at the first blank line; next line is the resolution
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    H, W = int(res[1]), int(res[3])
    pos = eol + 1
    buf = np.frombuffer(data, np.uint8, offset=pos)
    img = np.zeros((H, W, 4), np.uint8)
    i = 0
    for y in range(H):
        if W < 8 or W >= 32768 or not (
                buf[i] == 2 and buf[i + 1] == 2
                and (int(buf[i + 2]) << 8 | int(buf[i + 3])) == W):
            # flat scanline (old format); old-RLE (1,1,1) repeats of the
            # previous pixel
            row = img[y].reshape(-1, 4)
            x = 0
            while x < W:
                px = buf[i:i + 4]
                if px[0] == 1 and px[1] == 1 and px[2] == 1 and x > 0:
                    n = int(px[3])
                    row[x:x + n] = row[x - 1]
                    x += n
                else:
                    row[x] = px
                    x += 1
                i += 4
            continue
        i += 4
        for c in range(4):  # 4 RLE-coded component planes
            x = 0
            while x < W:
                n = int(buf[i])
                if n > 128:  # run of one value
                    img[y, x:x + n - 128, c] = buf[i + 1]
                    x += n - 128
                    i += 2
                else:        # literal span
                    img[y, x:x + n, c] = buf[i + 1:i + 1 + n]
                    x += n
                    i += 1 + n
    return _rgbe_decode(img)


def write_hdr(path, rgb):
    """Write (H, W, 3) linear float32 to a Radiance .hdr file (flat
    scanlines — always-valid encoding, readers don't require RLE)."""
    rgb = np.asarray(rgb, np.float32)
    H, W = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(_rgbe_encode(rgb[..., :3]).tobytes())


# ---------------------------------------------------------------------------
# Portable FloatMap (.pfm) — raw float32 (debug/interchange format;
# ref OIIO pnm plugin). Rows are stored bottom-to-top per the spec.
# ---------------------------------------------------------------------------

def read_pfm(path):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().split()
        W, H = int(dims[0]), int(dims[1])
        scale = float(f.readline())
        C = 3 if magic == b"PF" else 1
        dt = "<f4" if scale < 0 else ">f4"
        arr = np.frombuffer(f.read(W * H * C * 4), dt).astype(np.float32)
    return arr.reshape(H, W, C)[::-1].copy()


def write_pfm(path, img):
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    assert C in (1, 3), f"PFM is 1- or 3-channel, got {C}"
    with open(path, "wb") as f:
        f.write(b"PF\n" if C == 3 else b"Pf\n")
        f.write(f"{W} {H}\n".encode())
        f.write(b"-1.0\n")  # negative scale = little-endian
        f.write(img[::-1].astype("<f4").tobytes())


def write_image(path, img, srgb=None):
    """Write by extension: .hdr/.pfm/.exr linear HDR, else 8-bit sRGB."""
    s = str(path)
    if s.endswith(".hdr"):
        return write_hdr(path, img)
    if s.endswith(".pfm"):
        return write_pfm(path, img)
    if s.endswith(".exr"):
        from raytracingproject_tpu.utils import exr as exr_mod
        return exr_mod.write_multilayer_exr(
            path, {"Combined": np.asarray(img, np.float32)})
    return write_png(path, img, srgb=True if srgb is None else srgb)


def write_multilayer(path, layers, metadata=None):
    """Write named float32 pass layers {name: (H, W, C)} (EXR analog)."""
    meta = dict(metadata or {})
    arrays = {name: np.asarray(a, np.float32) for name, a in layers.items()}
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"layers": sorted(layers), "metadata": meta}).encode(),
        dtype=np.uint8).copy()
    np.savez_compressed(path, **arrays)


def read_multilayer(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files if k != "__manifest__"}


def read_multilayer_metadata(path):
    with np.load(path) as z:
        if "__manifest__" not in z.files:
            return {}
        return json.loads(bytes(z["__manifest__"]).decode()).get("metadata", {})
