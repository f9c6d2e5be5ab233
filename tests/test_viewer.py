"""Interactive viewer tests (capability ref: the standalone GL
viewport + keyboard nav, app/cycles_standalone.cpp:366-536 — replaced
by an HTTP progressive viewer, app/viewer.py)."""

import json
import threading
import time
import urllib.request

import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.app.viewer import ViewerState, make_server


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.read()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body.encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


class TestViewer:
    def test_progressive_frames_and_navigation(self):
        scene = examples.cornell_box(32, 32, spp=4)
        state = ViewerState(scene, samples=4, dividers=(4, 1))
        srv = make_server(state, port=0)      # ephemeral port
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        state.start()
        t.start()
        try:
            page = _get(port, "/")
            assert b"viewer" in page
            # wait for at least one refined frame
            deadline = time.time() + 120
            seq = 0
            while time.time() < deadline:
                st = json.loads(_get(port, "/status"))
                if st["seq"] >= 2:
                    seq = st["seq"]
                    break
                time.sleep(0.5)
            assert seq >= 2, "no progressive frames produced"
            png = _get(port, "/frame.png")
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

            cam0 = np.asarray(scene.camera.matrix).copy()
            assert _post(port, "/nav", "dolly:1") == b"ok"
            cam1 = np.asarray(scene.camera.matrix)
            assert not np.allclose(cam0, cam1)
            # orbit preserves orthonormality
            _post(port, "/nav", "orbit:1,0")
            m = np.asarray(scene.camera.matrix)[:3, :3]
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
            # reset restores home
            _post(port, "/nav", "reset:0")
            np.testing.assert_allclose(np.asarray(scene.camera.matrix),
                                       cam0, atol=1e-6)
            # navigation triggers a new refinement pass
            deadline = time.time() + 120
            ok = False
            while time.time() < deadline:
                st = json.loads(_get(port, "/status"))
                if st["seq"] > seq:
                    ok = True
                    break
                time.sleep(0.5)
            assert ok, "navigation did not restart refinement"
            # bad command -> 400
            try:
                _post(port, "/nav", "warp:9")
                assert False, "expected HTTPError"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            state.stop()
            srv.shutdown()
