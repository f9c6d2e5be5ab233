"""Gated OpenVDB loading (ref: render/image_vdb.cpp, render/volume.cpp).

The spec-subset codec in utils/vdb.py is exercised the same way the
EXR codec is: byte-level round-trips through our own writer (which
emits the real archive layout: magic/version/uuid header, grid
descriptors with offsets, 5-4-3 tree topology with node masks and
per-node compression metadata), the BLOSC gate, and an end-to-end
heterogeneous smoke render through VolumeGridTextureNode."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.utils import vdb


def _sphere_density(nx=24, ny=17, nz=30, r=10.0):
    x, y, z = np.mgrid[0:nx, 0:ny, 0:nz]
    c = (nx / 2, ny / 2, nz / 2)
    d = 1 - np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2
                    + (z - c[2]) ** 2) / r
    return np.maximum(0, d).astype(np.float32)


class TestRoundTrip:
    @pytest.mark.parametrize("comp", ["none", "zip"])
    def test_offset_grid_roundtrip(self, tmp_path, comp):
        d = _sphere_density()
        g = vdb.VdbGrid("density", d, (5, -9, 3),
                        vdb._affine(0.25, (1.0, 2.0, 3.0)))
        p = tmp_path / "t.vdb"
        vdb.write_vdb(p, [g], compression=comp)
        g2 = vdb.read_vdb(p)[0]
        assert g2.name == "density"
        # every original voxel must read back exactly (dense extent is
        # leaf-aligned over ACTIVE leaves, all-zero leaves dropped)
        a = np.asarray([5, -9, 3]) - g2.ijk0
        total = 0.0
        full = np.zeros_like(d)
        sh = g2.values.shape
        for i in range(d.shape[0]):
            ii = a[0] + i
            if not 0 <= ii < sh[0]:
                assert not d[i].any()
                continue
            sub = g2.values[ii]
            for j in range(d.shape[1]):
                jj = a[1] + j
                if 0 <= jj < sh[1]:
                    kk0, kk1 = a[2], a[2] + d.shape[2]
                    lo, hi = max(kk0, 0), min(kk1, sh[2])
                    full[i, j, lo - kk0:hi - kk0] = sub[jj, lo:hi]
        np.testing.assert_array_equal(full, d)
        assert np.isclose(g2.values.sum(), d.sum())
        np.testing.assert_allclose(g2.index_to_world, g.index_to_world)

    def test_zip_is_smaller(self, tmp_path):
        d = _sphere_density()
        vdb.write_vdb(tmp_path / "a.vdb", {"density": d})
        vdb.write_vdb(tmp_path / "b.vdb", {"density": d},
                      compression="zip")
        assert (tmp_path / "b.vdb").stat().st_size \
            < (tmp_path / "a.vdb").stat().st_size / 3

    def test_multi_grid(self, tmp_path):
        d = _sphere_density(16, 16, 16, r=7.0)
        vdb.write_vdb(tmp_path / "m.vdb",
                      {"density": d, "temperature": d * 2.0})
        grids = vdb.read_vdb(tmp_path / "m.vdb")
        names = sorted(g.name for g in grids)
        assert names == ["density", "temperature"]


class TestGates:
    def test_blosc_gated(self, tmp_path):
        d = _sphere_density(8, 8, 8, r=3.0)
        p = tmp_path / "b.vdb"
        vdb.write_vdb(p, {"density": d})
        raw = bytearray(p.read_bytes())
        # compression flags live right after magic+version+lib+offsets
        off = 8 + 4 + 8 + 1
        struct.pack_into("<I", raw, off, vdb.COMPRESS_BLOSC)
        p.write_bytes(bytes(raw))
        with pytest.raises(vdb.VdbError, match="BLOSC"):
            vdb.read_vdb(p)

    def test_bad_magic(self):
        with pytest.raises(vdb.VdbError, match="magic"):
            vdb.read_vdb(b"\x00" * 64)

    def test_old_version_gated(self, tmp_path):
        d = _sphere_density(8, 8, 8, r=3.0)
        p = tmp_path / "o.vdb"
        vdb.write_vdb(p, {"density": d})
        raw = bytearray(p.read_bytes())
        struct.pack_into("<I", raw, 8, 210)
        p.write_bytes(bytes(raw))
        with pytest.raises(vdb.VdbError, match="version"):
            vdb.read_vdb(p)


class TestNode:
    def test_node_eval_from_file(self, tmp_path):
        import types
        from raytracingproject_tpu.models import shader_nodes as sn
        d = _sphere_density(16, 16, 16, r=7.0)
        p = tmp_path / "n.vdb"
        # voxel 0.1 => world extent [0, 1.6]^3
        vdb.write_vdb(p, {"density": d}, voxel_size=0.1)
        node = sn.VolumeGridTextureNode("v", filename=str(p))
        centre = jnp.full((5, 3), 0.8, jnp.float32)
        far = jnp.full((5, 3), 99.0, jnp.float32)
        ctx = types.SimpleNamespace(batch_shape=(5,), P=centre,
                                    P_object=centre)
        out = node.eval(ctx, {"vector": np.zeros(3, np.float32)})
        assert out["density"].shape == (5,)
        assert float(out["density"][0]) > 0.5
        ctx_far = types.SimpleNamespace(batch_shape=(5,), P=far,
                                        P_object=far)
        out2 = node.eval(ctx_far, {"vector": np.zeros(3, np.float32)})
        assert float(out2["density"][0]) == 0.0

    def test_vdb_smoke_render(self, tmp_path):
        """End-to-end: a VDB density grid drives a heterogeneous
        volume in a small emissive-light scene; the render is finite,
        brighter where the smoke is, and darker than the homogeneous
        equivalent away from it."""
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.models import shader_nodes as sn
        from raytracingproject_tpu.ops import integrator as integ

        W = H = 24
        d = _sphere_density(16, 16, 16, r=7.0) * 3.0
        p = tmp_path / "s.vdb"
        # world extent [-2, 2]^3: voxel 0.25, translate -2
        vdb.write_vdb(p, {"density": d}, voxel_size=0.25,
                      translate=(-2.0, -2.0, -2.0))

        scene = examples.smoke_small_light(W, H, spp=4, density=1.0)
        vol = [s for s in scene.shaders if s.name == "smoke"][0]
        g = vol.graph
        tex_node = g.add(sn.VolumeGridTextureNode(
            "vdb", filename=str(p), space="world"))
        pv = [n for n in g.nodes
              if n.NODE_NAME == "principled_volume"][0]
        g.connect(tex_node, "density", pv, "density")
        scene.device_update()
        kg = scene.make_kernel_globals()

        yy, xx = np.mgrid[0:H, 0:W]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        L, _ = integ.render_samples_regen(kg, px, py, py * W + px,
                                          jnp.uint32(0), 4)
        img = np.asarray(L).reshape(H, W, 3) / 4
        assert np.isfinite(img).all()
        assert img.mean() > 1e-4     # smoke scatters the light
