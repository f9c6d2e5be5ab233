"""Aux subsystems: merge, stats, adaptive sampling, passes."""

import numpy as np
import pytest

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.session import merge
from raytracingproject_tpu.models import film as fm


class TestMerge:
    def test_chunk_merge_equals_full(self, tmp_path):
        """ref: ImageMerger — merged partial chunks == single render."""
        paths = []
        for start in (0, 3):
            sc = examples.cornell_box(12, 12, spp=6)
            se = Session(sc, SessionParams(samples=6,
                                           range_start_sample=start,
                                           range_num_samples=3))
            se.reset()
            se.render()
            p = tmp_path / f"chunk_{start}.npz"
            se.write_output(p)
            paths.append(p)
        out, total = merge.merge_files(paths, tmp_path / "merged.npz")
        assert total == 6
        merged = merge.merged_display(out)

        full_scene = examples.cornell_box(12, 12, spp=6)
        fs = Session(full_scene, SessionParams(samples=6))
        fs.reset()
        full = fs.render()[::-1]  # write_output flips vertically
        np.testing.assert_allclose(merged[..., :3], full[..., :3], atol=1e-5)


class TestPasses:
    def test_data_passes(self):
        scene = examples.cornell_box(16, 16, spp=2)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                               fm.PASS_NORMAL, fm.PASS_OBJECT_ID])
        sess = Session(scene, SessionParams(samples=2))
        sess.reset()
        sess.render()
        depth = sess.buffers.get_pass_rect(fm.PASS_DEPTH)
        normal = sess.buffers.get_pass_rect(fm.PASS_NORMAL)
        oid = sess.buffers.get_pass_rect(fm.PASS_OBJECT_ID)
        assert depth.min() > 0  # every camera ray hits the box interior
        # normals are unit-ish after averaging (edge pixels may average
        # different faces and shorten)
        ln = np.linalg.norm(normal, axis=-1)
        assert (ln > 0.3).all() and (ln < 1.1).all()
        assert (ln > 0.9).mean() > 0.5  # most pixels single-face
        assert oid.max() >= 1  # multiple objects visible


class TestAdaptive:
    def test_adaptive_converges_flat_regions_first(self):
        scene = examples.cornell_box(24, 24, spp=32)
        scene.integrator.set("adaptive_threshold", 0.05)
        scene.integrator.set("adaptive_min_samples", 8)
        sess = Session(scene, SessionParams(samples=32,
                                            progressive_refine_chunk=8))
        sess.reset()
        img = sess.render()
        assert np.isfinite(img).all()
        counts = sess.buffers.per_pixel_samples
        assert counts is not None
        assert counts.min() >= 8
        assert counts.max() <= 32

    def test_stats_report(self):
        scene = examples.cornell_box(12, 12, spp=2)
        sess = Session(scene, SessionParams(samples=2))
        sess.reset()
        sess.render()
        rep = sess.stats.full_report()
        assert "Device scene memory" in rep
        assert "prim_table" in rep
        assert "Msamples/s" in rep


class TestAO:
    def test_ao_pass(self):
        scene = examples.cornell_box(20, 20, spp=4)
        scene.integrator.set("ao_distance", 200.0)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_AO])
        sess = Session(scene, SessionParams(samples=4))
        sess.reset()
        sess.render()
        ao = sess.buffers.get_pass_rect(fm.PASS_AO)
        assert np.isfinite(ao).all()
        # open wall areas bright, crevices near boxes darker
        assert ao.max() > 0.8
        assert ao.min() < 0.6
        assert 0.2 < ao.mean() < 1.0


class TestAOV:
    def test_aov_color_and_value_passes(self):
        from raytracingproject_tpu.models.shader_nodes import OutputAOVNode
        scene = examples.cornell_box(16, 16, spp=2)
        # attach AOV sinks to the white wall material
        white = next(s for s in scene.shaders if s.name == "white")
        aovc = OutputAOVNode("aovc", aov_name="my_color", aov_type="color")
        aovc.set("color", (0.2, 0.5, 0.9))
        white.graph.add(aovc)
        aovv = OutputAOVNode("aovv", aov_name="my_value", aov_type="value")
        aovv.set("value", 0.75)
        white.graph.add(aovv)
        scene.film.set_passes([
            fm.PASS_COMBINED,
            fm.Pass(fm.PASS_AOV_COLOR, name="my_color"),
            fm.Pass(fm.PASS_AOV_VALUE, name="my_value")])
        sess = Session(scene, SessionParams(samples=2))
        sess.reset()
        sess.render()
        col = sess.buffers.get_pass_rect_name("my_color")
        val = sess.buffers.get_pass_rect_name("my_value")
        assert col is not None and val is not None
        # pixels where EVERY sample's first hit was the white material
        # carry the full AOV (edge pixels mix materials across samples,
        # averaging the AOV exactly like any other pass)
        hit_white = col[..., 2] > 0.7
        assert hit_white.mean() > 0.2
        np.testing.assert_allclose(
            col[hit_white], np.array([0.2, 0.5, 0.9]) *
            np.ones((hit_white.sum(), 3)), atol=0.05)
        np.testing.assert_allclose(val[hit_white][:, 0], 0.75, atol=0.05)


class TestMist:
    def test_mist_pass_monotone_with_depth(self):
        scene = examples.cornell_box(16, 16, spp=2)
        scene.film.set("mist_start", 0.0)
        scene.film.set("mist_depth", 2000.0)
        scene.film.set("mist_falloff", 1.0)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                               fm.PASS_MIST])
        # 1 sample: every pixel is purely hit or miss, so the formula
        # comparison is exact (multi-sample pixels average hit+miss)
        sess = Session(scene, SessionParams(samples=1))
        sess.reset()
        sess.render()
        mist = sess.buffers.get_pass_rect(fm.PASS_MIST)[..., 0]
        depth = sess.buffers.get_pass_rect(fm.PASS_DEPTH)[..., 0]
        assert (mist >= 0).all() and (mist <= 1).all()
        hit = depth > 0
        assert hit.mean() > 0.8
        # linear falloff from 0: mist == clamp(depth / mist_depth)
        np.testing.assert_allclose(
            mist[hit], np.clip(depth[hit] / 2000.0, 0.0, 1.0), atol=1e-3)
        # camera rays escaping the open box front saturate to 1
        if (~hit).any():
            np.testing.assert_allclose(mist[~hit], 1.0, atol=1e-5)
        assert mist[hit].std() > 0.01  # depth variation in the box
