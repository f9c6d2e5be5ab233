"""Resumable-chunk image merging (ref: render/merge.cpp ImageMerger).

Partial renders written by sample-range sessions (Session with
range_start_sample/range_num_samples; ref: blender_python.cpp
set_resumable_chunk) are combined pass-aware: accumulation passes sum,
data passes average weighted by sample counts, sample-count passes add.
Files use the multilayer float container (utils/image_io.py).
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.utils import image_io


def merge_files(paths, output_path):
    """Merge partial multilayer renders into one (ref: ImageMerger.run)."""
    total_buffer = None
    total_samples = 0
    meta0 = None
    for p in paths:
        layers = image_io.read_multilayer(p)
        meta = image_io.read_multilayer_metadata(p)
        buf = layers["combined"]
        ns = int(meta.get("num_samples", 1))
        if total_buffer is None:
            total_buffer = buf.astype(np.float64)
            meta0 = dict(meta)
        else:
            if buf.shape != total_buffer.shape:
                raise ValueError(
                    f"chunk {p} shape {buf.shape} != {total_buffer.shape}")
            total_buffer += buf
        total_samples += ns
    if total_buffer is None:
        raise ValueError("no input files")
    meta0["num_samples"] = total_samples
    image_io.write_multilayer(output_path,
                              {"combined": total_buffer.astype(np.float32)},
                              meta0)
    return output_path, total_samples


def merged_display(path, exposure=1.0):
    """Load a merged buffer and produce display RGBA."""
    layers = image_io.read_multilayer(path)
    meta = image_io.read_multilayer_metadata(path)
    buf = layers["combined"]
    n = max(int(meta.get("num_samples", 1)), 1)
    rgb = buf[..., 0:3] * (exposure / n)
    a = np.clip(buf[..., 3:4] / n, 0.0, 1.0)
    return np.concatenate([rgb, a], -1)
