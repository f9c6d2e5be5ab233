"""Multiscatter GGX energy compensation (ref:
bsdf_microfacet_multi.h — redesigned as a Kulla-Conty lobe)."""

import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.app.examples import glossy_shader
from raytracingproject_tpu.models import Object
from raytracingproject_tpu.models.mesh import make_sphere_mesh
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.ops import bsdf as bops


class TestTables:
    def test_directional_albedo_properties(self):
        E, Eavg = bops._ms_tables_np()
        assert E.shape == (bops.MS_TABLE_MU, bops.MS_TABLE_R)
        assert (E >= 0).all() and (E <= 1.0).all()
        # smooth surfaces lose almost nothing; rough lose a lot
        assert E[:, 0].min() > 0.95
        assert E[bops.MS_TABLE_MU // 2, -1] < 0.85
        # rougher -> lower average albedo (energy loss grows)
        assert Eavg[0] > Eavg[-1]


def _glossy_furnace(rough, dist):
    scene = examples.furnace_scene(24, 24, bounces=24)
    mat = glossy_shader("g", (1.0, 1.0, 1.0), roughness=rough)
    node = mat.graph.nodes[1]
    node.set("distribution", dist)
    scene.shaders = []
    scene.default_background = None
    scene.add_shader(mat)
    scene.objects[0].geometry.used_shaders = [mat]
    bg = scene.background.shader
    scene.integrator.set("min_bounce", 8)
    sess = Session(scene, SessionParams(samples=96))
    sess.reset()
    img = sess.render()
    # center crop avoids silhouette pixels
    c = img[8:16, 8:16, :3]
    return float(c.mean())


class TestFurnace:
    def test_multi_ggx_recovers_lost_energy(self):
        m_ss = _glossy_furnace(0.8, "ggx")
        m_ms = _glossy_furnace(0.8, "multi_ggx")
        # plain GGX visibly darkens the rough white furnace...
        assert m_ss < 0.93
        # ...the compensation lobe brings it near 1
        assert m_ms > m_ss + 0.03
        assert 0.93 < m_ms < 1.07
