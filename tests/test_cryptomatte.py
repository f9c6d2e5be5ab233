"""Cryptomatte id/coverage passes (ref: film.cpp cryptomatte,
kernel_id_passes.h, util_murmurhash.cpp)."""

import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.session import crypto as cr


class TestHash:
    def test_murmur_reference_vector(self):
        # public murmur3_x86_32 test vector: "hello" seed 0 -> 0x248bfa47
        assert cr.murmur_hash3_32(b"hello") == 0x248BFA47

    def test_hash_to_float_finite(self):
        for h in (0, 0xFFFFFFFF, 0x7F800000, 0x248BFA47):
            f = cr.hash_to_float(h)
            assert np.isfinite(f) and f != 0.0


class TestCryptomatte:
    def test_object_coverage(self):
        scene = examples.cornell_box(20, 20, spp=8)
        scene.film.set("cryptomatte_depth", 2)
        sess = Session(scene, SessionParams(samples=8))
        sess.reset()
        sess.render()
        co = sess.get_cryptomatte("object")
        cm = sess.get_cryptomatte("material")
        assert co.shape == (20, 20, 4)
        cov0, cov1 = co[..., 1], co[..., 3]
        # rank-0 coverage dominates and ranks are ordered
        assert (cov0 >= cov1 - 1e-6).all()
        assert (cov0 + cov1 <= 1.0 + 1e-6).all()
        # interior pixels fully covered by their dominant object
        assert (cov0 > 0.99).mean() > 0.5
        # several distinct objects visible
        ids = co[..., 0][cov0 > 0.5]
        assert len(np.unique(ids)) >= 3
        # name-hash values, not raw indices
        names = {o.name for o in scene.objects}
        from raytracingproject_tpu.session.crypto import name_hash
        hashes = {np.float32(name_hash(n)) for n in names}
        assert set(np.unique(ids)).issubset(hashes)
        # material matte: white walls share one id over many pixels
        mid = cm[..., 0][cm[..., 1] > 0.5]
        assert len(np.unique(mid)) >= 2
