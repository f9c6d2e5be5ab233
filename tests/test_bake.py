"""Baking tests (ref category: bake)."""

import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import bake
from raytracingproject_tpu.models.mesh import make_plane_mesh


class TestRasterize:
    def test_full_coverage_plane(self):
        m = make_plane_mesh((0, 0, 0), (1, 0, 0), (0, 1, 0))
        m.attribute_set("std_uv", "corner", np.array(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
            np.float32))
        prim, bu, bv = bake.rasterize_uv(m, 32, 32)
        assert (prim >= 0).mean() > 0.95  # near-full coverage
        # both triangles present
        assert set(np.unique(prim[prim >= 0])) == {0, 1}


class TestBake:
    def test_bake_cornell_floor(self):
        scene = examples.cornell_box(24, 24, spp=4)
        floor_obj = next(o for o in scene.objects if o.name == "floor")
        floor_obj.geometry.attribute_set("std_uv", "corner", np.array(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
            np.float32))
        img = bake.bake(scene, floor_obj, 16, 16, spp=8)
        cov = img[..., 3] > 0
        assert cov.mean() > 0.9
        lit = img[cov][:, :3]
        assert np.isfinite(lit).all()
        # the floor receives light everywhere (direct + bounce)
        assert lit.mean() > 0.02
        assert lit.max() < 50.0
