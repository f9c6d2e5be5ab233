"""Pallas kernel tests (interpret mode on CPU; compiled path exercised
on TPU by tools/ benchmarks)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.ops import pallas_intersect as pi
from raytracingproject_tpu.ops import intersect as isect


class TestPallasIntersect:
    def test_matches_xla_brute(self):
        rng = np.random.default_rng(3)
        ntri = 37
        n = pi.TILE  # one tile
        base = rng.uniform(-6, 6, (ntri, 1, 3))
        tris = (base + rng.uniform(-1, 1, (ntri, 3, 3))).astype(np.float32)
        pad = (-ntri) % pi.TRI_BLOCK
        tv = np.pad(tris, ((0, pad), (0, 0), (0, 0)))
        v0 = jnp.asarray(tv[:, 0].reshape(-1, pi.TRI_BLOCK, 3))
        e1 = jnp.asarray((tv[:, 1] - tv[:, 0]).reshape(-1, pi.TRI_BLOCK, 3))
        e2 = jnp.asarray((tv[:, 2] - tv[:, 0]).reshape(-1, pi.TRI_BLOCK, 3))
        o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
        dn = rng.normal(size=(n, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        d = jnp.asarray(dn)
        tmin = jnp.zeros(n)
        tmax = jnp.full(n, 1e30)
        h = pi.intersect_brute_pallas(v0, e1, e2, o, d, tmin, tmax,
                                      interpret=True)
        hb = isect.intersect_brute(
            jnp.asarray(tv), jnp.asarray(np.zeros(len(tv), np.int32)),
            o, d, tmin, tmax)
        pm = np.asarray(h["prim"])
        pb = np.asarray(hb["prim"])
        assert (pm >= 0).sum() > 0
        np.testing.assert_array_equal(pm, pb)
        hits = pm >= 0
        np.testing.assert_allclose(np.asarray(h["t"])[hits],
                                   np.asarray(hb["t"])[hits], rtol=1e-5)
