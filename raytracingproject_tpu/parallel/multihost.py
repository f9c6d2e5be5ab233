"""Multi-host distribution (capability ref: device/device_network.{h,cpp}
NetworkDevice TCP RPC + DeviceServer + app/cycles_server.cpp:31, and the
resumable-chunk partitioning of blender_python.cpp:871-947 — redesigned
TPU-native).

The reference scales across machines with a boost::asio RPC that
mirrors every Device virtual over TCP and steals tiles back through the
master's TileManager. On TPU pods the transport is the platform's own
job fabric instead: hosts join ONE jax.distributed process group
(coordinator service + collectives over DCN/Gloo); each host renders a
disjoint SAMPLE RANGE of the whole frame — the reference's own
multi-process partitioning — and partial accumulation buffers combine
either

  (a) in-job: `gather_image` all-gathers the per-host buffer sums and
      adds them (every host ends with the full frame), or
  (b) offline: each host writes a multilayer chunk file and host 0
      merges pass-aware via session/merge.py — exactly the reference's
      standalone merger workflow (render/merge.cpp).

Elastic behavior: a lost host costs only its sample range — the merge
accepts any subset of chunks (fewer samples, never a corrupt frame),
unlike an RPC mesh where a dead peer wedges the tile scheduler.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Join the process group (idempotent). On a real multi-host TPU
    job the three args come from the scheduler and may all be None
    (jax auto-detects); tests pass them explicitly."""
    import jax
    if getattr(initialize, "_done", False):
        return
    # NOTE: must run before ANY backend touch (jax.devices() etc.), so
    # no jax.process_count() guard here — double-init raises and is
    # translated into a no-op below.
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    initialize._done = True


def host_sample_range(total_samples, num_hosts, host_id):
    """Split samples into contiguous near-equal ranges (ref:
    TileManager range_start_sample/range_num_samples semantics)."""
    base = total_samples // num_hosts
    extra = total_samples % num_hosts
    start = host_id * base + min(host_id, extra)
    count = base + (1 if host_id < extra else 0)
    return start, count


class MultiHostSession:
    """Drives one host's share of a render and combines results.

    scene/params describe the FULL render (params.samples = total
    samples across all hosts); the local Session gets this host's
    sample range."""

    def __init__(self, scene, params, process_id=None,
                 num_processes=None):
        import jax
        from raytracingproject_tpu.session import Session, SessionParams
        self.process_id = (jax.process_index() if process_id is None
                           else int(process_id))
        self.num_processes = (jax.process_count()
                              if num_processes is None
                              else int(num_processes))
        start, count = host_sample_range(
            int(params.samples), self.num_processes, self.process_id)
        self.range_start, self.range_count = start, count
        local = SessionParams(**{**vars(params),
                                 "range_start_sample": start,
                                 "range_num_samples": count})
        self.session = Session(scene, local)
        self.total_samples = int(params.samples)

    def render(self):
        self.session.reset()
        self.session.render()
        return self.session

    def gather_image(self, exposure=1.0):
        """In-job combine: all-gather per-host buffer sums over the
        process group and add (every host returns the full-frame
        display RGBA). Requires jax.distributed to be initialized."""
        from jax.experimental import multihost_utils
        buf = self.session.buffers.buffer
        all_bufs = np.asarray(
            multihost_utils.process_allgather(buf, tiled=False))
        total = all_bufs.sum(0)
        n = max(self.total_samples, 1)
        rgb = total[..., 0:3] * (exposure / n)
        a = np.clip(total[..., 3:4] / n, 0.0, 1.0)
        return np.concatenate([rgb, a], -1)

    def write_chunk(self, out_dir):
        """Offline combine, step 1: write this host's multilayer chunk
        (ref: resumable chunk files)."""
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(
            out_dir, f"chunk_{self.range_start:06d}"
            f"_{self.range_count:04d}.npz")
        return self.session.write_output(path)

    @staticmethod
    def merge_chunks(out_dir, output_path):
        """Offline combine, step 2 (host 0): pass-aware merge of every
        chunk in out_dir (ref: render/merge.cpp ImageMerger)."""
        from raytracingproject_tpu.session import merge as mg
        paths = sorted(
            os.path.join(out_dir, p) for p in os.listdir(out_dir)
            if p.startswith("chunk_") and p.endswith(".npz"))
        if not paths:
            raise ValueError(f"no chunk files in {out_dir}")
        return mg.merge_files(paths, output_path)

    def barrier(self, tag="render_done"):
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
