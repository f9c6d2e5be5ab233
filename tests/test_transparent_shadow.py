"""Transparent shadows (ref: kernel/kernel_shadow.h:142-454
shadow_blocked_transparent_all/_stepped; per-shader gate
Shader::use_transparent_shadow, render/shader.h)."""

import numpy as np

from raytracingproject_tpu.app import examples
from tests.test_render import render


def _floor_patch(img):
    # center-bottom region of the frame views the lit floor
    h, w = img.shape[:2]
    return img[int(h * 0.55):int(h * 0.8), int(w * 0.3):int(w * 0.7)]


class TestTransparentShadow:
    def test_white_panel_passes_all_light(self):
        """A fully transparent occluder must not darken NEE light —
        with max_bounce=1 the only transport is camera hit + NEE, so
        the images agree to sampling noise ~0."""
        base = examples.shadow_panel_scene(32, 32, panel="none")
        a, _ = render(base, 32, 32, spp=8)
        pan = examples.shadow_panel_scene(32, 32, panel="transparent")
        b, _ = render(pan, 32, 32, spp=8)
        pa, pb = _floor_patch(a), _floor_patch(b)
        # pixels whose camera rays also miss the panel are bit-equal;
        # panel-crossing rays shift RNG dims (transparent bounce) and
        # differ only by MC noise
        same = np.isclose(pb, pa, rtol=1e-5).mean()
        assert same > 0.9, same
        assert abs(pb.mean() / pa.mean() - 1.0) < 0.005

    def test_half_gray_panel_halves_direct(self):
        base = examples.shadow_panel_scene(32, 32, panel="none")
        a, _ = render(base, 32, 32, spp=8)
        pan = examples.shadow_panel_scene(
            32, 32, panel="transparent", panel_color=(0.5, 0.5, 0.5))
        b, _ = render(pan, 32, 32, spp=8)
        ratio = _floor_patch(b).mean() / _floor_patch(a).mean()
        assert abs(ratio - 0.5) < 0.02, ratio

    def test_colored_panel_tints_shadow(self):
        pan = examples.shadow_panel_scene(
            32, 32, panel="transparent", panel_color=(1.0, 0.0, 0.0))
        b, _ = render(pan, 32, 32, spp=8)
        patch = _floor_patch(b).mean(axis=(0, 1))
        assert patch[0] > 10 * max(patch[1], 1e-8), patch

    def test_use_transparent_shadow_off_blocks(self):
        """Honoring the socket: same panel with the flag off must block
        NEE light entirely (the round-1 behavior for everything)."""
        pan = examples.shadow_panel_scene(
            32, 32, panel="transparent", use_transparent_shadow=False)
        b, _ = render(pan, 32, 32, spp=8)
        base = examples.shadow_panel_scene(32, 32, panel="none")
        a, _ = render(base, 32, 32, spp=8)
        assert _floor_patch(b).mean() < 0.02 * _floor_patch(a).mean()

    def test_two_stacked_panels_multiply(self):
        """Transmittance accumulates across multiple transparent hits
        (the bounded record-and-step loop)."""
        pan = examples.shadow_panel_scene(
            32, 32, panel="transparent", panel_color=(0.6, 0.6, 0.6))
        # add a second identical panel above the first
        from raytracingproject_tpu.models import Object
        from raytracingproject_tpu.models.mesh import make_plane_mesh
        pm2 = make_plane_mesh((-3, -3, 3.0), (6, 0, 0), (0, 6, 0), 0,
                              "panel2")
        pm2.used_shaders = [pan.shaders[-1]]
        pan.add_object(Object("panel2", pm2))
        b, _ = render(pan, 32, 32, spp=8)
        base = examples.shadow_panel_scene(32, 32, panel="none")
        a, _ = render(base, 32, 32, spp=8)
        ratio = _floor_patch(b).mean() / _floor_patch(a).mean()
        assert abs(ratio - 0.36) < 0.02, ratio
