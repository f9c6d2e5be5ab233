"""Multi-host distribution tests (capability ref: device_network.cpp
NetworkDevice/DeviceServer, replaced by jax.distributed + sample-range
chunking; see parallel/multihost.py).

The 2-process test spawns two REAL python processes that join one
jax.distributed group over localhost, render disjoint sample ranges of
the same scene, combine both ways (in-job all-gather and chunk-file
merge), and must reproduce the single-process render bit-near-exactly
(the ranges partition the identical sample sequence)."""

import json
import os
import subprocess
import sys

import numpy as np

from raytracingproject_tpu.parallel import multihost as mh


class TestSampleRanges:
    def test_partition_covers_all_samples(self):
        for total in (1, 7, 64, 129):
            for nproc in (1, 2, 3, 8):
                ranges = [mh.host_sample_range(total, nproc, i)
                          for i in range(nproc)]
                # contiguous, disjoint, complete
                pos = 0
                for start, count in ranges:
                    assert start == pos
                    pos += count
                assert pos == total


_WORKER = r"""
import sys, os, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
out_dir = sys.argv[2]
from raytracingproject_tpu.parallel import multihost as mh
mh.initialize(coordinator_address="localhost:{port}", num_processes=2,
              process_id=pid)
import numpy as np
from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import SessionParams
scene = examples.cornell_box(12, 12, spp=8)
sess = mh.MultiHostSession(scene, SessionParams(samples=8))
sess.render()
img = sess.gather_image()
np.save(os.path.join(out_dir, f"gathered_{{pid}}.npy"), img)
sess.write_chunk(out_dir)
sess.barrier("chunks_written")
if pid == 0:
    sess.merge_chunks(out_dir, os.path.join(out_dir, "merged.npz"))
print("WORKER_OK", pid, flush=True)
"""


class TestTwoProcess:
    def test_two_process_render_matches_single(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "worker.py"
        script.write_text(_WORKER.format(repo=repo, port=19847))
        env = {k: v for k, v in os.environ.items()
               if k != "PYTHONPATH"}
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=repo, env=env, text=True) for i in range(2)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
            assert f"WORKER_OK {i}" in out

        # single-process reference
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.session import Session, SessionParams
        scene = examples.cornell_box(12, 12, spp=8)
        ref = Session(scene, SessionParams(samples=8))
        ref.reset()
        img_ref = np.asarray(ref.render())

        # (a) in-job all-gather path: both hosts hold the full frame
        g0 = np.load(tmp_path / "gathered_0.npy")
        g1 = np.load(tmp_path / "gathered_1.npy")
        np.testing.assert_allclose(g0, g1, atol=1e-6)
        np.testing.assert_allclose(g0[..., :3], img_ref[..., :3],
                                   atol=1e-5)

        # (b) chunk-merge path
        from raytracingproject_tpu.session import merge as mg
        rgba = mg.merged_display(str(tmp_path / "merged.npz"))
        # merged buffer is stored top-down (write_output flips)
        np.testing.assert_allclose(rgba[::-1][..., :3],
                                   img_ref[..., :3], atol=1e-5)
