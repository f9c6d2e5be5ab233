"""Image input/output (ref: render/image_oiio.cpp, render/merge.cpp).

The reference uses OpenImageIO + OpenEXR. Here: PNG/JPEG via PIL for
display output, and a self-contained multilayer float format (.npz with a
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
