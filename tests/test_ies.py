"""IES photometric profiles (ref: util_ies.cpp, light.cpp IES path)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.utils import ies as iesu
from raytracingproject_tpu.models import Scene, Light
from raytracingproject_tpu.ops import light as lops


IES_COSINE = """IESNA:LM-63-1995
[TEST] synthetic cosine-down profile
TILT=NONE
1 1000.0 1.0 3 1 1 2 0.0 0.0 0.0
1.0 1.0 0.0
0.0 90.0 180.0
0.0
100.0 50.0 0.0
"""


class TestParser:
    def test_parse_and_resample(self):
        v, h, c = iesu.parse_ies(IES_COSINE)
        np.testing.assert_allclose(np.rad2deg(v), [0, 90, 180])
        assert c.shape == (1, 3)
        grid = iesu.resample_ies(v, h, c)
        assert grid.shape == (iesu.IES_RES_H, iesu.IES_RES_V)
        np.testing.assert_allclose(grid.max(), 1.0)
        np.testing.assert_allclose(grid[:, 0], 1.0)     # straight down
        np.testing.assert_allclose(grid[:, -1], 0.0)    # straight up
        mid = grid[0, iesu.IES_RES_V // 2]
        assert 0.35 < mid < 0.65                        # ~0.5 at 90 deg

    def test_reject_garbage(self):
        import pytest
        with pytest.raises(ValueError):
            iesu.parse_ies("not an ies file")


class TestLamp:
    def _scene(self, ies_text=""):
        scene = Scene()
        li = Light("lamp")
        li.set("light_type", "point")
        li.set("co", (0.0, 0.0, 0.0))
        li.set("strength", (100.0, 100.0, 100.0))
        if ies_text:
            li.set("ies", ies_text)
        scene.add_light(li)
        scene.device_update()
        return scene

    def test_ies_shapes_point_light(self):
        scene = self._scene(IES_COSINE)
        ds = scene.make_kernel_globals()["dscene"]
        n = 8
        below = jnp.tile(jnp.asarray([[0.0, 0.0, -5.0]]), (n, 1))
        above = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1))
        u = jnp.full((n,), 0.5)
        ls_b = lops.sample_light(ds, below, u, u, u)
        ls_a = lops.sample_light(ds, above, u, u, u)
        eb = float(np.asarray(ls_b["eval"]).mean())
        ea = float(np.asarray(ls_a["eval"]).mean())
        # ldir default (0,0,-1): below the lamp = profile peak,
        # above = profile zero
        assert eb > 1e-4
        assert ea < eb * 1e-3

    def test_no_ies_is_isotropic(self):
        scene = self._scene()
        ds = scene.make_kernel_globals()["dscene"]
        n = 4
        below = jnp.tile(jnp.asarray([[0.0, 0.0, -5.0]]), (n, 1))
        above = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1))
        u = jnp.full((n,), 0.5)
        eb = float(np.asarray(
            lops.sample_light(ds, below, u, u, u)["eval"]).mean())
        ea = float(np.asarray(
            lops.sample_light(ds, above, u, u, u)["eval"]).mean())
        np.testing.assert_allclose(eb, ea, rtol=1e-5)


class TestIESNode:
    def test_node_shapes_directionally(self):
        import types
        import jax.numpy as jnp
        from raytracingproject_tpu.models.shader_nodes import \
            IESTextureNode
        node = IESTextureNode("ies", ies=IES_COSINE)
        n = 4
        # viewing directions: from below (light leaves downward, -z)
        # vs from above (upward)
        I_down = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        I_up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
        ctx = types.SimpleNamespace(batch_shape=(n,), I=I_down)
        f_down = np.asarray(node.eval(
            ctx, {"vector": np.zeros(3, np.float32),
                  "strength": 1.0})["fac"])
        ctx.I = I_up
        f_up = np.asarray(node.eval(
            ctx, {"vector": np.zeros(3, np.float32),
                  "strength": 1.0})["fac"])
        assert f_down[0] > 0.95    # straight down: profile peak
        assert f_up[0] < 0.05      # straight up: profile zero
