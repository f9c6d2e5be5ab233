"""Measure cluster-row fetch strategies on the attached accelerator.

The cluster-shortlist traversal (ops/cluster_intersect.py) fetches one
(W,)-wide table row per lane per iteration. Candidates:

  onehot_f32   current: (W, C) @ (C, N) one-hot at HIGHEST precision
               (6 bf16 passes -> exact f32)
  onehot_int8  bit-exact int8-limb variant: the table is pre-split into
               4 int8 limbs of the f32 BIT PATTERN; 4 int8 matmuls with
               int32 accumulate reconstruct the word exactly at ~6x the
               per-pass rate of HIGHEST f32
  gather       plain dynamic row gather ctable[cid] (XLA gather) —
               bandwidth-bound in theory (~3 KB/lane)

Run from the repo root (no PYTHONPATH): python tools/fetch_bench.py
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
REPS = 20


def time_fn(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.time() - t0) / REPS


def split_int8_limbs(table_f32):
    """f32 table -> (4, C, W) int8 limbs of the raw bit pattern.

    Reconstruction: w = sum_k limb_k * 2^(8k) with int32 accumulate is
    exact because each product is one signed byte of the word."""
    bits = table_f32.view(np.uint32).astype(np.int64)
    limbs = []
    for k in range(4):
        b = (bits >> (8 * k)) & 0xFF
        limbs.append(((b + 128) % 256 - 128).astype(np.int8))  # signed
    return np.stack(limbs)


def reconstruct(mm):  # mm: (4, W, N) int32
    w = (mm[0].astype(jnp.int32) & 0xFF) \
        | ((mm[1].astype(jnp.int32) & 0xFF) << 8) \
        | ((mm[2].astype(jnp.int32) & 0xFF) << 16) \
        | (mm[3].astype(jnp.int32) << 24)
    return jax.lax.bitcast_convert_type(w, jnp.float32)


def main():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((C, W)).astype(np.float32)
    table_j = jnp.asarray(table)
    limbs_j = jnp.asarray(split_int8_limbs(table))
    cids = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

    print("device:", jax.devices()[0].platform, flush=True)

    for N in (8192, 32768):
        cid = jnp.asarray(rng.integers(0, C, N).astype(np.int32))

        @jax.jit
        def onehot_f32(cid):
            oh = (cids == cid[None]).astype(jnp.float32)
            return jnp.dot(table_j.T, oh,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

        @jax.jit
        def onehot_int8(cid):
            oh = (cids == cid[None]).astype(jnp.int8)      # (C, N)
            mm = [jnp.dot(limbs_j[k].T, oh,
                          preferred_element_type=jnp.int32)
                  for k in range(4)]
            return reconstruct(jnp.stack(mm))

        @jax.jit
        def onehot_bf16(cid):
            # NOT exact — headroom probe only
            oh = (cids == cid[None]).astype(jnp.bfloat16)
            return jnp.dot(table_j.T.astype(jnp.bfloat16), oh,
                           preferred_element_type=jnp.float32)

        @jax.jit
        def row_gather(cid):
            return table_j[cid].T

        ref = np.asarray(onehot_f32(cid))
        got = np.asarray(onehot_int8(cid))
        exact = np.array_equal(ref.view(np.uint32), got.view(np.uint32))
        g = np.asarray(row_gather(cid))
        gexact = np.array_equal(ref, g)

        for name, fn in [("onehot_f32", onehot_f32),
                         ("onehot_int8", onehot_int8),
                         ("onehot_bf16", onehot_bf16),
                         ("gather", row_gather)]:
            dt = time_fn(fn, cid)
            print(f"N={N:6d} {name:12s} {dt * 1e3:8.3f} ms "
                  f"({dt * 1e3 * 262144 / N:7.2f} ms per 256k lanes)",
                  flush=True)
        print(f"        int8 exact={exact} gather exact={gexact}",
              flush=True)


if __name__ == "__main__":
    main()
