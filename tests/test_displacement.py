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


class TestBump:
    """Shade-time bump mapping (ref: svm_displace.h svm_node_set_bump;
    ops/shade.py eval_bump_normals)."""

    def _bump_shader(self, scale, method="bump"):
        g = ShaderGraph()
        d = g.add(sn.DiffuseBsdfNode("d", color=(0.8, 0.8, 0.8)))
        g.connect(d, "bsdf", g.output_node, "surface")
        tc = g.add(sn.TextureCoordinateNode("tc"))
        sx = g.add(sn.SeparateXYZNode("sx"))
        g.connect(tc, "generated", sx, "vector")
        disp = g.add(sn.DisplacementNode("disp", midlevel=0.0,
                                         scale=scale))
        g.connect(sx, "x", disp, "height")
        g.connect(disp, "displacement", g.output_node, "displacement")
        return Shader("bumped", g, displacement_method=method)

    def test_bump_socket_switches_paths(self):
        """displacement_method genuinely selects sync-displacement vs
        shade-time bump (no silently ignored socket)."""
        for method, expect in (("true", False), ("bump", True),
                               ("both", True)):
            sc = _plane_scene(self._bump_shader(5.0, method))
            sc.device_update()
            kg = sc.make_kernel_globals()
            assert kg["features"]["has_bump"] == expect, method

    def test_bump_tilts_normals_keeps_geometry(self):
        """height = generated.x: the normal pass leans -x by the
        analytic slope while the depth pass stays that of a flat
        plane (bump never moves geometry)."""
        sc = _plane_scene(self._bump_shader(40.0))
        sc.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                            fm.PASS_NORMAL])
        sess = Session(sc, SessionParams(samples=4))
        sess.reset()
        sess.render()
        nrm = sess.buffers.get_pass_rect(fm.PASS_NORMAL)
        dep = sess.buffers.get_pass_rect(fm.PASS_DEPTH)[..., 0]

        sc0 = _plane_scene(self._bump_shader(0.0))
        sc0.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                             fm.PASS_NORMAL])
        s0 = Session(sc0, SessionParams(samples=4))
        s0.reset()
        s0.render()
        nrm0 = s0.buffers.get_pass_rect(fm.PASS_NORMAL)
        dep0 = s0.buffers.get_pass_rect(fm.PASS_DEPTH)[..., 0]

        hit = (dep > 0) & (dep0 > 0)
        assert hit.mean() > 0.5
        np.testing.assert_allclose(dep[hit], dep0[hit], atol=1e-3)
        # slope dh/dx = scale/extent = 40/100 -> Nx ~ -0.37
        assert nrm0[hit][:, 0].mean() > -0.02     # flat: Nx ~ 0
        assert nrm[hit][:, 0].mean() < -0.25, nrm[hit][:, 0].mean()
        # still mostly +z (edge pixels average in missed samples)
        assert (nrm[hit][:, 2] > 0.8).mean() > 0.9
