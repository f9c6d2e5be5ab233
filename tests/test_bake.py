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

    def test_bake_normal_mode(self):
        scene = examples.cornell_box(24, 24, spp=1)
        floor_obj = next(o for o in scene.objects if o.name == "floor")
        floor_obj.geometry.attribute_set("std_uv", "corner", np.array(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
            np.float32))
        img = bake.bake(scene, floor_obj, 16, 16, mode="normal")
        cov = img[..., 3] > 0
        # floor normal is +y in cornell's coordinates -> one channel ~1
        nrm = img[cov][:, :3] * 2.0 - 1.0
        assert np.abs(np.linalg.norm(nrm, axis=-1) - 1.0).max() < 1e-4
        assert np.abs(nrm).max(axis=0).max() > 0.99

    def test_bake_ao_mode(self):
        scene = examples.cornell_box(24, 24, spp=1)
        floor_obj = next(o for o in scene.objects if o.name == "floor")
        floor_obj.geometry.attribute_set("std_uv", "corner", np.array(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
            np.float32))
        img = bake.bake(scene, floor_obj, 16, 16, spp=16, mode="ao")
        cov = img[..., 3] > 0
        ao = img[cov][:, 0]
        assert np.isfinite(ao).all()
        assert (ao >= 0).all() and (ao <= 1).all()
        # floor inside a closed box: occluded (<1) but not black
        assert 0.05 < ao.mean() < 0.999
        # texels under the boxes darker than open-floor texels
        assert ao.min() < ao.max()
