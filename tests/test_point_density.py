"""Point-density 3D texture (ref: PointDensityTextureNode, svm_voxel.h)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.ops import texture as tex
from raytracingproject_tpu.models import shader_nodes as sn


class TestGrid:
    def test_build_and_sample(self):
        pts = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
        grid, lo, inv = tex.build_point_density_grid(pts, 0.25, 16)
        assert grid.shape == (16, 16, 16)
        assert grid.max() == 1.0
        # density peaks at the points, zero far away
        q = jnp.asarray(np.array(
            [[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]], np.float32))
        d = np.asarray(tex.sample_grid3d(
            jnp.asarray(grid), jnp.asarray(lo), jnp.asarray(inv), q))
        assert d[0] > 0.5 and d[1] > 0.5
        assert d[2] < 0.1

    def test_outside_is_zero(self):
        pts = np.zeros((1, 3), np.float32)
        grid, lo, inv = tex.build_point_density_grid(pts, 0.2, 8)
        q = jnp.asarray(np.array([[50.0, 0.0, 0.0]], np.float32))
        d = np.asarray(tex.sample_grid3d(
            jnp.asarray(grid), jnp.asarray(lo), jnp.asarray(inv), q))
        assert d[0] == 0.0


class TestNode:
    def test_node_eval_shapes(self):
        import types
        node = sn.PointDensityTextureNode(
            "pd", points=np.random.default_rng(0).normal(
                size=(50, 3)).astype(np.float32))
        ctx = types.SimpleNamespace(
            batch_shape=(7,),
            P=jnp.zeros((7, 3), jnp.float32),
            P_object=jnp.zeros((7, 3), jnp.float32))
        out = node.eval(ctx, {"vector": np.zeros(3, np.float32)})
        assert out["density"].shape == (7,)
        assert out["color"].shape == (7, 3)
        assert float(out["density"][0]) > 0.0  # dense near the origin
