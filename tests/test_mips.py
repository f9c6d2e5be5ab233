"""Texture size limits + mip pyramids (ref: render/image.cpp
texture_limit handling; the CPU path's ray-differential footprints in
kernel/kernel_differential.h drive mip selection — here a first-hit
footprint estimate: ray_length x pixel angle x per-triangle uv density).

Covers: box-filter mip chain construction (mean preservation), the
ImageManager texture_limit downscale, packed mip-slot bookkeeping, and
the ImageTextureNode auto-mip trilinear lookup (footprint-driven lod:
tiny footprint == base level bilinear; huge footprint == texture mean).
"""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.models.image import (
    ImageManager, TextureStore, build_mip_chain, _downscale_box)
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.ops.shade import ShaderData
from raytracingproject_tpu.ops import texture as tex


def _rand_img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, 4)).astype(np.float32)


class TestMipChain:
    def test_chain_shapes_and_mean(self):
        img = _rand_img(16, 8)
        chain = build_mip_chain(img)
        assert chain[0].shape == (16, 8, 4)
        assert chain[-1].shape[:2] == (1, 1)
        # pow2 dims: every level's mean is exactly the base mean
        for lvl in chain:
            np.testing.assert_allclose(
                lvl.mean(axis=(0, 1)), img.mean(axis=(0, 1)), atol=1e-5)

    def test_downscale_limit(self):
        img = _rand_img(64, 32)
        out = _downscale_box(img, 16)
        assert max(out.shape[:2]) <= 16
        np.testing.assert_allclose(
            out.mean(axis=(0, 1)), img.mean(axis=(0, 1)), atol=1e-5)

    def test_odd_dims_terminate(self):
        img = _rand_img(5, 3)
        chain = build_mip_chain(img)
        assert chain[-1].shape[:2] == (1, 1)


class TestImageManager:
    def test_texture_limit_pack(self):
        im = ImageManager()
        im.add_image(_rand_img(64, 64)[..., :3])
        im.texture_limit = 16
        data, sizes = im.device_update()
        assert sizes[0] == (16, 16)
        assert data.shape[1] <= 16 and data.shape[2] <= 16

    def test_mip_slots_appended(self):
        im = ImageManager()
        s = im.add_image(_rand_img(8, 8)[..., :3])
        im.want_mips.add(s)
        data, sizes = im.device_update()
        ids = im.mip_slots[s]
        # 8x8 -> 4x4 -> 2x2 -> 1x1: 4 levels, base first
        assert len(ids) == 4 and ids[0] == s
        for lvl, sid in enumerate(ids):
            assert sizes[sid] == (8 >> lvl, 8 >> lvl)


def _mip_store(img):
    im = ImageManager()
    s = im.add_image(img[..., :3])
    im.want_mips.add(s)
    data, sizes = im.device_update()
    store = TextureStore(jnp.asarray(data), sizes)
    store.mips = dict(im.mip_slots)
    store.pixel_angle = 1.0
    return s, store


class TestAutoMipNode:
    def _eval(self, node, store, n, uv, ray_length, uv_density):
        ctx = ShaderData(
            uv=jnp.broadcast_to(jnp.asarray(uv, jnp.float32), (n, 3)),
            ray_length=jnp.full((n,), ray_length, jnp.float32),
            uv_density=jnp.full((n,), uv_density, jnp.float32),
            textures=store, batch_shape=(n,))
        return node.eval(ctx, {"vector": None})

    def test_small_footprint_matches_base(self):
        img = _rand_img(16, 16, seed=3)
        slot, store = _mip_store(img)
        node = sn.ImageTextureNode(use_auto_mip=True)
        node.slot = slot
        out = self._eval(node, store, 4, (0.3, 0.6, 0.0),
                         ray_length=1e-6, uv_density=1.0)
        base = tex.sample_image(
            store.get(slot)[0], 16, 16,
            jnp.full((4,), 0.3), jnp.full((4,), 0.6),
            tex.INTERPOLATION_LINEAR, tex.EXTENSION_REPEAT)
        np.testing.assert_allclose(np.asarray(out["color"]),
                                   np.asarray(base[..., :3]), atol=1e-6)

    def test_huge_footprint_is_texture_mean(self):
        img = _rand_img(16, 16, seed=4)
        slot, store = _mip_store(img)
        node = sn.ImageTextureNode(use_auto_mip=True)
        node.slot = slot
        out = self._eval(node, store, 4, (0.3, 0.6, 0.0),
                         ray_length=1e6, uv_density=1.0)
        np.testing.assert_allclose(
            np.asarray(out["color"])[0], img[..., :3].mean(axis=(0, 1)),
            atol=1e-5)

    def test_off_by_default_identical(self):
        img = _rand_img(16, 16, seed=5)
        slot, store = _mip_store(img)
        node = sn.ImageTextureNode()   # use_auto_mip False
        node.slot = slot
        out = self._eval(node, store, 4, (0.3, 0.6, 0.0),
                         ray_length=1e6, uv_density=1.0)
        base = tex.sample_image(
            store.get(slot)[0], 16, 16,
            jnp.full((4,), 0.3), jnp.full((4,), 0.6),
            tex.INTERPOLATION_LINEAR, tex.EXTENSION_REPEAT)
        np.testing.assert_allclose(np.asarray(out["color"]),
                                   np.asarray(base[..., :3]), atol=1e-6)


class TestSceneWiring:
    def test_scene_auto_mip_render(self):
        """use_auto_mip on a scene node packs a pyramid and the regen
        render consumes uv_density without shape errors."""
        import jax
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.ops import integrator as integ

        scene = examples.instanced_scene(16, 16, spp=2, grid=2)
        for sh in scene.shaders:
            for node in sh.graph.nodes:
                if node.NODE_NAME == "image_texture":
                    node.use_auto_mip = True
        scene.device_update()
        kg = scene.make_kernel_globals()
        ids = scene.image_manager.mip_slots
        assert ids and len(next(iter(ids.values()))) > 1
        yy, xx = np.mgrid[0:16, 0:16]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        L, _ = integ.render_samples_regen(kg, px, py, py * 16 + px,
                                          jnp.uint32(0), 2)
        img = np.asarray(L)
        assert np.isfinite(img).all() and img.mean() > 0.01
