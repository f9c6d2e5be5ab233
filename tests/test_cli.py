"""CLI smoke tests (ref: app/cycles_standalone.cpp flag surface)."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


class TestCLI:
    def test_render_xml_scene(self, tmp_path):
        out = tmp_path / "out.png"
        r = subprocess.run(
            [sys.executable, "-m", "raytracingproject_tpu",
             os.path.join(REPO, "scenes", "cornell.xml"),
             "--samples", "2", "--width", "16", "--height", "16",
             "--output", str(out), "--quiet", "--device", "cpu"],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=540)
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists()

    def test_list_devices(self):
        r = subprocess.run(
            [sys.executable, "-m", "raytracingproject_tpu",
             "--list-devices", "--device", "cpu"],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0
        assert "cpu" in r.stdout.lower()
