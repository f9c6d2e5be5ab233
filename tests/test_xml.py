"""XML scene format tests (ref semantics: app/cycles_xml.cpp,
graph/node_xml.cpp)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import xml as cxml
from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


class TestXML:
    def test_parse_cornell(self):
        scene = cxml.read_scene(os.path.join(SCENES, "cornell.xml"))
        assert int(scene.camera.width) == 256
        assert len(scene.objects) == 8
        names = [s.name for s in scene.shaders]
        for expect in ("white", "red", "green", "lightshader"):
            assert expect in names
        assert int(scene.integrator.max_bounce) == 4
        # light shader drives an emissive mesh
        ds = scene.device_update()
        assert float(np.max(ds["arrays"]["prim_emission"])) > 0

    def test_xml_render_matches_programmatic(self):
        """XML Cornell must look like the programmatic Cornell (same
        geometry semantics end to end)."""
        w = h = 24
        sx = cxml.read_scene(os.path.join(SCENES, "cornell.xml"))
        sx.camera.set("width", w)
        sx.camera.set("height", h)
        sx.device_update()
        kg = sx.make_kernel_globals()
        yy, xx = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        Lx, _ = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 8))(px, py, py * w + px)
        imgx = np.asarray(Lx).reshape(h, w, 3) / 8

        sp = examples.cornell_box(w, h, spp=8)
        sp.device_update()
        kgp = sp.make_kernel_globals()
        Lp, _ = jax.jit(lambda a, b, c: integ.render_samples(
            kgp, a, b, c, 0, 8))(px, py, py * w + px)
        imgp = np.asarray(Lp).reshape(h, w, 3) / 8
        # same scene up to camera matrix details: compare means loosely
        assert np.isfinite(imgx).all()
        assert abs(imgx.mean() - imgp.mean()) < 0.5 * max(imgx.mean(),
                                                          imgp.mean())

    def test_transform_scoping(self, tmp_path):
        xmltext = """<cycles>
          <shader name="m"><diffuse_bsdf name="d"/>
            <connect from="d bsdf" to="output surface"/></shader>
          <transform translate="5 0 0">
            <transform scale="2">
              <state shader="m">
                <mesh P="0 0 0  1 0 0  0 1 0" nverts="3" verts="0 1 2"/>
              </state>
            </transform>
          </transform>
        </cycles>"""
        p = tmp_path / "t.xml"
        p.write_text(xmltext)
        scene = cxml.read_scene(str(p))
        obj = scene.objects[0]
        v = np.array([1.0, 0.0, 0.0])
        from raytracingproject_tpu.utils import transform as tfm
        world = tfm.transform_point(np.asarray(obj.transform), v)
        np.testing.assert_allclose(world, [7.0, 0.0, 0.0], atol=1e-5)

    def test_include(self, tmp_path):
        (tmp_path / "inner.xml").write_text(
            """<cycles><shader name="inner_shader">
               <diffuse_bsdf name="d"/>
               <connect from="d bsdf" to="output surface"/>
               </shader></cycles>""")
        (tmp_path / "outer.xml").write_text(
            """<cycles><include src="inner.xml"/></cycles>""")
        scene = cxml.read_scene(str(tmp_path / "outer.xml"))
        assert any(s.name == "inner_shader" for s in scene.shaders)
