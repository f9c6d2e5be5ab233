"""Isolate the ~115ms per-dispatch floor seen in trav_bench: sweep
input size, output count, scan length, and op-chain depth separately.

FLOOR_OUT=path writes the results as a JSON artifact (round-5 verdict
item 5: publish the floor so probe sizes are chosen above it — every
single-dispatch micro-benchmark on the tunneled chip sits on this
floor and is meaningless without subtracting it).
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, time.time() - t0)
    return best


RESULTS = {}


def rec(label, ms):
    RESULTS[label] = round(ms, 2)
    return ms


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    print("device", jax.devices()[0].platform, flush=True)

    n = 262144
    x = jnp.ones((n,), jnp.float32)
    x8 = jnp.ones((8, n), jnp.float32)

    # 1. trivial elementwise on (N,)
    f1 = jax.jit(lambda a: a * 2.0 + 1.0)
    print(f"elementwise (262k,): {rec('elementwise', timeit(f1, x)*1e3):.2f}ms", flush=True)

    # 2. five outputs of (N,)
    f2 = jax.jit(lambda a: (a * 2, a + 1, a - 1, a * a, a / 2))
    print(f"5 outputs (262k,): {rec('outputs5', timeit(f2, x)*1e3):.2f}ms", flush=True)

    # 3. deep VPU chain on (8, N): 512 fused ops
    def chain(a):
        for i in range(512):
            a = a * 1.000001 + 1e-7
        return a
    f3 = jax.jit(chain)
    print(f"512-op chain (8, 262k): {rec('chain512', timeit(f3, x8)*1e3):.2f}ms", flush=True)

    # 4. scan of K cheap steps on (8, N)
    for k in (16, 64, 128, 256):
        def scanner(a, _k=k):
            def body(c, _):
                return c * 1.000001 + 1e-7, None
            c, _ = jax.lax.scan(body, a, None, length=_k)
            return c
        f4 = jax.jit(scanner)
        print(f"scan x{k} (8, 262k): {rec(f'scan{k}', timeit(f4, x8)*1e3):.2f}ms", flush=True)

    # 5. while_loop of K steps
    for k in (16, 64, 256):
        def whiler(a, _k=k):
            def cond(c):
                return c[1] < _k
            def body(c):
                return (c[0] * 1.000001 + 1e-7, c[1] + 1)
            return jax.lax.while_loop(cond, body, (a, 0))[0]
        f5 = jax.jit(whiler)
        print(f"while x{k} (8, 262k): {rec(f'while{k}', timeit(f5, x8)*1e3):.2f}ms",
              flush=True)

    # 6. dense-sweep shape: scan over 128 blocks of (8, N) triangle-ish
    #    math (~36 ops per block) with select-reduction winner
    v = jnp.ones((128, 8, 9), jnp.float32)
    def sweep(a, vv):
        def body(c, blk):
            t = a
            for j in range(4):
                t = t * blk[:, 0:1] + blk[:, 1:2]
            tk = jnp.min(t, axis=0)
            c = jnp.minimum(c, tk)
            return c, None
        c, _ = jax.lax.scan(body, a[0], vv)
        return c
    f6 = jax.jit(sweep)
    print(f"sweep scan 128 blocks: {rec('sweep128', timeit(f6, x8, v)*1e3):.2f}ms",
          flush=True)

    # 7. u32 hash chain (the rng pattern), 4 x ~350 ops on (N,)
    u = jnp.ones((n,), jnp.uint32)
    def hashchain(a):
        r = a
        for i in range(64):
            r = r ^ (r * jnp.uint32(0x6C50B47C))
            r = r ^ (r >> jnp.uint32(3))
        return r
    f7 = jax.jit(hashchain)
    print(f"u32 128-op hash chain (262k,): {rec('hash128', timeit(f7, u)*1e3):.2f}ms",
          flush=True)

    # 8. one-hot MXU lookup (512, 128) table x (512, N) mask
    tab = jnp.ones((512, 128), jnp.float32)
    idx = jnp.zeros((n,), jnp.int32)
    def onehot(i):
        oh = (i[None, :] == jnp.arange(512, dtype=jnp.int32)[:, None])
        return jnp.einsum("cn,cw->nw", oh.astype(jnp.float32), tab,
                          preferred_element_type=jnp.float32)
    f8 = jax.jit(onehot)
    print(f"one-hot lookup 512x128 @ 262k: {rec('onehot', timeit(f8, idx)*1e3):.2f}ms",
          flush=True)

    # 9. dynamic row gather (512-row table)
    f9 = jax.jit(lambda i: tab[i])
    print(f"row gather 512x128 @ 262k: {rec('gather', timeit(f9, idx)*1e3):.2f}ms",
          flush=True)


if __name__ == "__main__":
    import os
    main()
    out = os.environ.get("FLOOR_OUT")
    if out:
        floor = min(RESULTS.values()) if RESULTS else None
        with open(out, "w") as f:
            json.dump({"per_probe_ms": RESULTS,
                       "floor_ms": floor,
                       "note": "best-of-5 single-dispatch walls on the "
                               "tunneled chip; the minimum IS the "
                               "per-dispatch floor"}, f, indent=1)
        print(f"wrote {out} (floor={floor}ms)")
