"""Resumable-chunk image merging (ref: render/merge.cpp ImageMerger).

Partial renders written by sample-range sessions (Session with
range_start_sample/range_num_samples; ref: blender_python.cpp
set_resumable_chunk) are combined pass-aware:

- "combined" holds the pass-interleaved accumulation buffer; every pass
  in it is stored as a raw per-sample SUM (radiance sums, data-pass
  sums, absolute sample counts), so chunk buffers add directly and the
  display scaling by total sample count stays exact (the same contract
  RenderBuffers uses, session/buffers.py get_pass_rect).
- cryptomatte layers ("crypto_object"/"crypto_material") hold ranked
  [id-hash, coverage] pairs with coverage normalized per chunk; they
  are re-merged by sample-weighted coverage per id and re-ranked
  (ref: render/merge.cpp merge_render_tile cryptomatte handling).
- unknown extra layers are treated as accumulation sums (the
  conservative contract for future passes).

Files use the multilayer float container (utils/image_io.py).
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.utils import image_io

CRYPTO_LAYERS = ("crypto_object", "crypto_material")


def _merge_crypto(stacks, weights, depth=None):
    """Merge ranked [id, coverage] crypto planes across chunks.

    stacks: list of (H, W, 2K) arrays; weights: per-chunk sample
    fractions (sum to 1). Coverages for the same id are summed, then
    slots are re-ranked by merged coverage (cryptomatte spec)."""
    k_in = stacks[0].shape[-1] // 2
    depth = depth or k_in
    ids = np.concatenate([s[..., 0::2] for s in stacks], -1)
    cov = np.concatenate(
        [s[..., 1::2] * w for s, w in zip(stacks, weights)], -1)
    order = np.argsort(ids, -1)
    ids_s = np.take_along_axis(ids, order, -1)
    cov_s = np.take_along_axis(cov, order, -1).copy()
    same = ids_s[..., 1:] == ids_s[..., :-1]
    # fold runs of equal ids into the run head (sequential pairwise
    # pass; run lengths are tiny — chunks x rank depth)
    for j in range(ids_s.shape[-1] - 1, 0, -1):
        add = np.where(same[..., j - 1], cov_s[..., j], 0.0)
        cov_s[..., j - 1] += add
        cov_s[..., j] -= add
    rank = np.argsort(-cov_s, -1)[..., :depth]
    out_ids = np.take_along_axis(ids_s, rank, -1)
    out_cov = np.take_along_axis(cov_s, rank, -1)
    live = out_cov > 0.0
    out = np.zeros(ids.shape[:2] + (2 * depth,), np.float32)
    out[..., 0::2] = np.where(live, out_ids, 0.0)
    out[..., 1::2] = np.where(live, out_cov, 0.0)
    return out


def merge_files(paths, output_path):
    """Merge partial multilayer renders into one (ref: ImageMerger.run).

    Returns (output_path, total_samples)."""
    sums = {}
    crypto = {}
    chunk_samples = []
    meta0 = None
    shape0 = None
    for p in paths:
        layers = image_io.read_multilayer(p)
        meta = image_io.read_multilayer_metadata(p)
        ns = int(meta.get("num_samples", 1))
        chunk_samples.append(ns)
        if meta0 is None:
            meta0 = dict(meta)
            shape0 = layers["combined"].shape
        elif layers["combined"].shape != shape0:
            raise ValueError(
                f"chunk {p} shape {layers['combined'].shape} != {shape0}")
        for name, buf in layers.items():
            if name in CRYPTO_LAYERS:
                crypto.setdefault(name, []).append(
                    buf.astype(np.float64))
            elif name in sums:
                sums[name] += buf.astype(np.float64)
            else:
                sums[name] = buf.astype(np.float64)
    if meta0 is None:
        raise ValueError("no input files")
    total_samples = int(sum(chunk_samples))
    out_layers = {k: v.astype(np.float32) for k, v in sums.items()}
    weights = [ns / max(total_samples, 1) for ns in chunk_samples]
    for name, stacks in crypto.items():
        if len(stacks) != len(paths):
            raise ValueError(
                f"layer {name} present in only {len(stacks)}/{len(paths)} "
                "chunks — refusing a silently partial merge")
        out_layers[name] = _merge_crypto(stacks, weights)
    meta0["num_samples"] = total_samples
    meta0.pop("range_start", None)
    image_io.write_multilayer(output_path, out_layers, meta0)
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
