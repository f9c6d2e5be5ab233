"""Light pass decomposition tests (ref: kernel_accumulate.h PathRadiance;
pass categories tests/python light/shadow categories)."""

import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.models import film as fm


class TestLightPasses:
    def test_diffuse_decomposition_sums_to_combined(self):
        """For a pure-diffuse Cornell: combined ==
        emission + diffuse_direct + diffuse_indirect (+background=0)."""
        scene = examples.cornell_box(20, 20, spp=6)
        scene.film.set_passes([
            fm.PASS_COMBINED, fm.PASS_EMISSION, fm.PASS_BACKGROUND,
            fm.PASS_DIFFUSE_DIRECT, fm.PASS_DIFFUSE_INDIRECT,
            fm.PASS_DIFFUSE_COLOR, fm.PASS_GLOSSY_DIRECT,
            fm.PASS_GLOSSY_INDIRECT])
        sess = Session(scene, SessionParams(samples=6))
        sess.reset()
        combined = sess.render()[..., :3]
        dd = sess.buffers.get_pass_rect(fm.PASS_DIFFUSE_DIRECT)
        di = sess.buffers.get_pass_rect(fm.PASS_DIFFUSE_INDIRECT)
        em = sess.buffers.get_pass_rect(fm.PASS_EMISSION)
        bg = sess.buffers.get_pass_rect(fm.PASS_BACKGROUND)
        gd = sess.buffers.get_pass_rect(fm.PASS_GLOSSY_DIRECT)
        recon = dd + di + em + bg
        # glossy passes empty in a diffuse-only scene
        assert float(np.abs(gd).max()) == 0.0
        # decomposition reconstructs combined
        np.testing.assert_allclose(recon, combined, atol=2e-3)
        assert dd.mean() > 0.001  # direct light present
        assert di.mean() > 0.0005  # indirect bounce light present

    def test_diffuse_color_pass(self):
        scene = examples.cornell_box(16, 16, spp=2)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DIFFUSE_COLOR])
        sess = Session(scene, SessionParams(samples=2))
        sess.reset()
        sess.render()
        dc = sess.buffers.get_pass_rect(fm.PASS_DIFFUSE_COLOR)
        # wall albedos visible: green-ish column on left wall
        assert dc.max() > 0.3
        left = dc[8, 1]
        assert left[1] > left[0]  # x=0 wall is green in this scene
