"""True displacement at scene sync (ref: render/geometry.cpp
displacement step; svm_displace.h)."""

import numpy as np

from raytracingproject_tpu.models import (
    Scene, Object, Shader, ShaderGraph)
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.models import film as fm
from raytracingproject_tpu.models.mesh import make_plane_mesh
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.utils import transform as tfm


def _displaced_shader(scale, method="true", height_node=None):
    g = ShaderGraph()
    d = g.add(sn.DiffuseBsdfNode("d", color=(0.8, 0.8, 0.8)))
    g.connect(d, "bsdf", g.output_node, "surface")
    disp = g.add(sn.DisplacementNode("disp", midlevel=0.0, scale=scale))
    if height_node is not None:
        hn = g.add(height_node)
        g.connect(hn, "fac", disp, "height")
    else:
        disp.set("height", 1.0)
    g.connect(disp, "displacement", g.output_node, "displacement")
    return Shader("displaced", g, displacement_method=method)


def _plane_scene(shader, size=100.0):
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at(
        (0, 0, 200), (0, 0, 0), (0, 1, 0)))
    scene.camera.set("fov", 0.6)
    scene.camera.set("width", 12)
    scene.camera.set("height", 12)
    scene.add_shader(shader)
    m = make_plane_mesh((-size / 2, -size / 2, 0), (size, 0, 0),
                        (0, size, 0))
    m.used_shaders = [shader]
    scene.add_object(Object("plane", m))
    return scene


def _depth(scene):
    scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH])
    sess = Session(scene, SessionParams(samples=1))
    sess.reset()
    sess.render()
    return sess.buffers.get_pass_rect(fm.PASS_DEPTH)[..., 0]


class TestDisplacement:
    def test_constant_height_moves_surface_exactly(self):
        d0 = _depth(_plane_scene(_displaced_shader(0.0)))
        d1 = _depth(_plane_scene(_displaced_shader(10.0)))
        hit = (d0 > 0) & (d1 > 0)
        assert hit.mean() > 0.5
        # plane normal +z, camera looks -z from z=200: surface moves
        # 10 toward the camera; depth is ray LENGTH, so oblique pixels
        # shift by 10/cos(theta) (fov 0.6 -> at most ~10.6)
        shift = d0[hit] - d1[hit]
        assert shift.min() > 9.9 and shift.max() < 11.0

    def test_bump_method_does_not_move_geometry(self):
        d0 = _depth(_plane_scene(_displaced_shader(0.0)))
        db = _depth(_plane_scene(_displaced_shader(10.0, method="bump")))
        hit = (d0 > 0) & (db > 0)
        np.testing.assert_allclose(d0[hit], db[hit], atol=1e-3)

    def test_procedural_height_varies(self):
        wave = sn.NoiseTextureNode("n", scale=0.05)
        d0 = _depth(_plane_scene(_displaced_shader(0.0)))
        dn = _depth(_plane_scene(_displaced_shader(
            30.0, height_node=wave)))
        hit = (d0 > 0) & (dn > 0)
        diff = d0[hit] - dn[hit]
        assert np.abs(diff).max() > 1.0   # geometry actually moved
        assert diff.std() > 0.3           # and non-uniformly
