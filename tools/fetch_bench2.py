"""Fetch-strategy bench with the iteration loop INSIDE jit (chained
data dependence, 8 iterations — mirrors the traversal while_loop) so
the ~2 ms tunnel dispatch overhead amortizes away.

Run from the repo root: python tools/fetch_bench2.py
"""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

C = 512
W = 781
ITERS = 8
REPS = 10


def split_int8_limbs(table_f32):
    bits = table_f32.view(np.uint32).astype(np.int64)
    return np.stack([(((bits >> (8 * k)) & 0xFF) + 128).astype(np.int64)
                     .astype(np.uint8).view(np.int8) - 0
                     for k in range(4)]) if False else np.stack(
        [((((bits >> (8 * k)) & 0xFF) + 128) % 256 - 128).astype(np.int8)
         for k in range(4)])


def main():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((C, W)).astype(np.float32)
    table_j = jnp.asarray(table)
    table_bf = table_j.astype(jnp.bfloat16)
    limbs_j = jnp.asarray(split_int8_limbs(table))
    cids = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    print("device:", jax.devices()[0].platform, flush=True)

    def loop(fetch, cid0):
        def body(i, carry):
            cid, acc = carry
            row = fetch(cid)                       # (W, N)
            acc = acc + row[0]
            cid = (cid + row[1].astype(jnp.int32) % 7 + 1) % C
            return cid, acc
        return jax.lax.fori_loop(0, ITERS, body, (cid0, jnp.zeros_like(
            cid0, jnp.float32)))[1]

    def fetch_f32(cid):
        oh = (cids == cid[None]).astype(jnp.float32)
        return jnp.dot(table_j.T, oh, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    def fetch_int8(cid):
        oh = (cids == cid[None]).astype(jnp.int8)
        mm = [jnp.dot(limbs_j[k].T, oh, preferred_element_type=jnp.int32)
              for k in range(4)]
        w = (mm[0] & 0xFF) | ((mm[1] & 0xFF) << 8) \
            | ((mm[2] & 0xFF) << 16) | (mm[3] << 24)
        return jax.lax.bitcast_convert_type(w, jnp.float32)

    def fetch_bf16(cid):
        oh = (cids == cid[None]).astype(jnp.bfloat16)
        return jnp.dot(table_bf, oh.reshape(C, -1),
                       preferred_element_type=jnp.float32).reshape(
            W, cid.shape[0]) if False else jnp.dot(
            table_bf.T, oh, preferred_element_type=jnp.float32)

    def fetch_gather(cid):
        return table_j[cid].T

    for N in (8192, 32768):
        cid0 = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
        for name, f in [("onehot_f32", fetch_f32),
                        ("onehot_int8", fetch_int8),
                        ("onehot_bf16", fetch_bf16),
                        ("gather", fetch_gather)]:
            fn = jax.jit(lambda c, f=f: loop(f, c))
            fn(cid0).block_until_ready()
            t0 = time.time()
            for _ in range(REPS):
                out = fn(cid0)
            out.block_until_ready()
            per_fetch = (time.time() - t0) / REPS / ITERS
            print(f"N={N:6d} {name:12s} {per_fetch * 1e3:8.3f} ms/fetch "
                  f"({per_fetch * 1e3 * 262144 / N:7.2f} ms per 256k)",
                  flush=True)


if __name__ == "__main__":
    main()
