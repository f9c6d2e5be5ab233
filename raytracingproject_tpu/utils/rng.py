"""Samplers and hashes (ref: kernel/kernel_random.h, render/sobol.cpp,
render/jitter.cpp).

The reference ships three pattern generators: table-driven Sobol
(render/sobol.cpp — a ~21k-line direction-number table), progressive
multi-jitter PMJ02 tables (render/jitter.cpp) and CMJ (kernel_jitter.h).
On TPU a table-light design wins: we implement **hash-based
Owen-scrambled Sobol** (Burley 2020, "Practical Hash-based Owen
Scrambling") — 4 Sobol dimensions generated at import time from the
standard Joe–Kuo primitive-polynomial data, padded to arbitrary
dimension count by per-dimension-pair shuffling/scrambling keyed on hash
seeds. This is pure uint32 VPU math (no gathers), has strictly better
equidistribution than CMJ, and keeps the same call surface as the
reference (`path_rng_1D/2D(rng_hash, sample, dimension)` —
kernel_random.h:58-120).

A PCG4D-based uncorrelated sampler is kept for debugging
(ref: DebugFlags-forced pattern switches).

All functions are jnp-traceable and vectorize over arbitrary batch
shapes; everything also runs under NumPy semantics on host for golden
tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Dimension-pair enumeration (ref: kernel/kernel_types.h:235-258 PRNG_*).
# Each named slot consumes ONE 2D sample pair.
PRNG_FILTER = 0          # pixel-filter / subpixel jitter (u, v)
PRNG_LENS = 1            # depth-of-field aperture (u, v)
PRNG_TIME = 2            # motion-blur time (u) + unused (v)
PRNG_BASE_NUM = 4
# Per-bounce pairs, offset by PRNG_BASE_NUM + bounce * PRNG_BOUNCE_NUM:
PRNG_BSDF = 0            # BSDF sampling (u, v)
PRNG_LIGHT = 1           # NEE light selection + surface point (u, v)
PRNG_TERMINATE = 2       # Russian roulette (u) + light-select (v)
PRNG_PHASE = 3           # volume phase / scatter distance
PRNG_BOUNCE_NUM = 4

SOBOL_SAMPLER = 0
PCG_SAMPLER = 1
CMJ_SAMPLER = 2      # correlated multi-jitter (kernel_jitter.h)
PMJ02_SAMPLER = 3    # progressive multi-jitter tables (render/jitter.cpp)

_U32 = np.uint32


def _np_u32(x):
    return np.uint32(x)


# ---------------------------------------------------------------------------
# Sobol direction matrices (generated, not tabulated).
# ---------------------------------------------------------------------------
# Joe–Kuo "new-joe-kuo-6" initialization for dimensions 2..4 (dimension 1 is
# the van-der-Corput sequence). (s = polynomial degree, a = coefficient bits,
# m = initial direction numbers.) These are standard published mathematical
# constants, independent of the reference implementation.
_JOE_KUO = [
    # (s, a, m)
    (1, 0, [1]),          # dim 2
    (2, 1, [1, 3]),       # dim 3
    (3, 1, [1, 3, 1]),    # dim 4
]


def _generate_sobol_matrices(num_dims=4, bits=32):
    """Direction 'matrices': V[d][j] = j-th direction number of dim d."""
    v = np.zeros((num_dims, bits), dtype=np.uint64)
    # Dimension 0: van der Corput — v_j = 2^(31-j)
    for j in range(bits):
        v[0, j] = 1 << (bits - 1 - j)
    for d, (s, a, m_init) in enumerate(_JOE_KUO[: num_dims - 1], start=1):
        m = list(m_init)
        for k in range(s, bits):
            # m_k = 2*a_1*m_{k-1} ^ ... ^ 2^(s-1)*a_{s-1}*m_{k-s+1}
            #       ^ 2^s*m_{k-s} ^ m_{k-s}
            mk = m[k - s] ^ (m[k - s] << s)
            for i in range(1, s):
                if (a >> (s - 1 - i)) & 1:
                    mk ^= m[k - i] << i
            m.append(mk)
        for j in range(bits):
            v[d, j] = m[j] << (bits - 1 - j)
    return v.astype(np.uint32)


SOBOL_MATRICES = _generate_sobol_matrices()  # (4, 32) uint32


# ---------------------------------------------------------------------------
# uint32 hashing (jnp-traceable; also accepts numpy arrays)
# ---------------------------------------------------------------------------

def _xnp(*args):
    return jnp if any(isinstance(a, jnp.ndarray) for a in args) else np


def _as_u32(xp, x):
    return xp.asarray(x).astype(np.uint32)


def hash_pcg(x):
    """PCG output-permutation hash of a uint32. High-quality 1-in-1-out."""
    xp = _xnp(x)
    x = _as_u32(xp, x)
    with np.errstate(over="ignore"):  # uint32 wrap IS the algorithm
        state = x * _np_u32(747796405) + _np_u32(2891336453)
        word = ((state >> ((state >> _np_u32(28)) + _np_u32(4))) ^ state) \
            * _np_u32(277803737)
        return (word >> _np_u32(22)) ^ word


def hash_combine(seed, v):
    """boost-style hash_combine (ref: util/util_hash.h hash_*)."""
    xp = _xnp(seed, v)
    seed = _as_u32(xp, seed)
    v = _as_u32(xp, v)
    with np.errstate(over="ignore"):
        return seed ^ (hash_pcg(v) + _np_u32(0x9E3779B9)
                       + (seed << _np_u32(6)) + (seed >> _np_u32(2)))


def hash_pcg2d(a, b):
    return hash_pcg(hash_combine(hash_pcg(a), b))


def hash_pcg3d(a, b, c):
    return hash_pcg(hash_combine(hash_combine(hash_pcg(a), b), c))


def hash_pcg4d(a, b, c, d):
    return hash_pcg(hash_combine(hash_combine(hash_combine(hash_pcg(a), b), c), d))


def uint_to_float_01(x):
    """uint32 -> float32 in [0, 1) with 24-bit mantissa exactness."""
    xp = _xnp(x)
    return (_as_u32(xp, x) >> _np_u32(8)).astype(np.float32) \
        * np.float32(1.0 / (1 << 24))


def reverse_bits(x):
    xp = _xnp(x)
    x = _as_u32(xp, x)
    x = ((x >> _np_u32(1)) & _np_u32(0x55555555)) | ((x & _np_u32(0x55555555)) << _np_u32(1))
    x = ((x >> _np_u32(2)) & _np_u32(0x33333333)) | ((x & _np_u32(0x33333333)) << _np_u32(2))
    x = ((x >> _np_u32(4)) & _np_u32(0x0F0F0F0F)) | ((x & _np_u32(0x0F0F0F0F)) << _np_u32(4))
    x = ((x >> _np_u32(8)) & _np_u32(0x00FF00FF)) | ((x & _np_u32(0x00FF00FF)) << _np_u32(8))
    return (x >> _np_u32(16)) | (x << _np_u32(16))


def _laine_karras_permutation(x, seed):
    """Base-2 nested uniform permutation on reversed-bit ordering
    (Laine–Karras 2011 hash with Burley's improved constants)."""
    xp = _xnp(x)
    with np.errstate(over="ignore"):  # uint32 wrap IS the algorithm
        x = _as_u32(xp, x) + _as_u32(xp, seed)
        x ^= x * _np_u32(0x6C50B47C)
        x ^= x * _np_u32(0xB82F1E52)
        x ^= x * _np_u32(0xC7AFE638)
        x ^= x * _np_u32(0x8D22F6E6)
    return x


def nested_uniform_scramble(x, seed):
    """Owen scramble of a [0,1)-fixed-point uint32."""
    return reverse_bits(_laine_karras_permutation(reverse_bits(x), seed))


def _sobol_eval(dim, index):
    """Sobol' sequence value (uint32) of `index` for matrix row `dim`.

    Statically unrolled over 32 bits — compiles to a chain of fused
    VPU select/xor ops, no gathers.
    """
    xp = _xnp(index)
    index = _as_u32(xp, index)
    if dim == 0:
        return reverse_bits(index)  # van der Corput fast path
    result = xp.zeros_like(index)
    mat = SOBOL_MATRICES[dim]
    for j in range(32):
        bit = (index >> _np_u32(j)) & _np_u32(1)
        # select, not multiply: integer multiplies are the slow path on
        # the TPU VPU; select is single-issue
        result = result ^ xp.where(bit != 0, _np_u32(int(mat[j])),
                                   _np_u32(0))
    return result


def sobol_burley_2d(sample_index, dim_pair, seed):
    """Owen-scrambled, index-shuffled 2D Sobol point.

    Replaces path_rng_2D + table lookup (ref: kernel_random.h:104-120).
    `sample_index`, `dim_pair`, `seed` broadcast; returns two float32
    arrays in [0, 1).
    """
    pair_seed = hash_pcg2d(dim_pair, seed)
    shuffled = nested_uniform_scramble(
        sample_index, hash_combine(pair_seed, _np_u32(0x55AAFACE)))
    x = _sobol_eval(0, shuffled)
    y = _sobol_eval(1, shuffled)
    x = nested_uniform_scramble(x, hash_combine(pair_seed, _np_u32(1)))
    y = nested_uniform_scramble(y, hash_combine(pair_seed, _np_u32(2)))
    return uint_to_float_01(x), uint_to_float_01(y)


def sobol_burley_1d(sample_index, dim_pair, seed):
    pair_seed = hash_pcg2d(dim_pair, seed)
    shuffled = nested_uniform_scramble(
        sample_index, hash_combine(pair_seed, _np_u32(0x55AAFACE)))
    x = _sobol_eval(0, shuffled)
    x = nested_uniform_scramble(x, hash_combine(pair_seed, _np_u32(1)))
    return uint_to_float_01(x)


def pcg_2d(sample_index, dim_pair, rng_hash):
    """Uncorrelated hash sampler (debug / comparison)."""
    u = hash_pcg3d(sample_index, dim_pair, rng_hash)
    v = hash_pcg3d(sample_index, dim_pair, hash_combine(rng_hash, _np_u32(0x9139)))
    return uint_to_float_01(u), uint_to_float_01(v)


# ---------------------------------------------------------------------------
# Path-sampling API (ref: kernel_random.h path_state_rng_1D/2D)
# ---------------------------------------------------------------------------

def pixel_rng_hash(pixel_index, seed):
    """Per-pixel decorrelation hash (ref: kernel_random.h path_rng_init)."""
    return hash_pcg2d(pixel_index, seed)


# ---------------------------------------------------------------------------
# CMJ — correlated multi-jitter (ref: kernel/kernel_jitter.h, Kensler
# 2013). The reference's data-dependent cycle-walking permutation loop
# (do { i = hash(i) } while (i >= l)) becomes a vectorized masked walk:
# lax.while_loop under jit, a plain loop on NumPy. The hash is a
# bijection of [0, w+1), so the walk is an exact permutation of [0, l)
# and terminates (expected < 2 rounds: the smeared mask is < 2l).
# ---------------------------------------------------------------------------

def _cmj_hash_round(i, p, w):
    with np.errstate(over="ignore"):
        i ^= p
        i *= _np_u32(0xE170893D)
        i ^= p >> _np_u32(16)
        i ^= (i & w) >> _np_u32(4)
        i ^= p >> _np_u32(8)
        i *= _np_u32(0x0929EB3F)
        i ^= p >> _np_u32(23)
        i ^= (i & w) >> _np_u32(1)
        i *= _np_u32(1) | (p >> _np_u32(27))
        i *= _np_u32(0x6935FA69)
        i ^= (i & w) >> _np_u32(11)
        i *= _np_u32(0x74DCB303)
        i ^= (i & w) >> _np_u32(2)
        i *= _np_u32(0x9E501CC3)
        i ^= (i & w) >> _np_u32(2)
        i *= _np_u32(0xC860A3DF)
        i &= w
        i ^= i >> _np_u32(5)
    return i


def cmj_permute(i, l, p):
    """Pseudorandom permutation of [0, l) (cmj_permute semantics)."""
    xp = _xnp(i, p)
    i = _as_u32(xp, i)
    p = _as_u32(xp, p)
    l = int(l)
    w = l - 1
    w |= w >> 1; w |= w >> 2; w |= w >> 4; w |= w >> 8; w |= w >> 16
    w = _np_u32(w)
    lu = _np_u32(l)
    cur = _cmj_hash_round(i, p, w)
    if xp is jnp:
        cur = jax.lax.while_loop(
            lambda c: (c >= lu).any(),
            lambda c: jnp.where(c >= lu, _cmj_hash_round(c, p, w), c),
            cur)
    else:
        while (cur >= lu).any():
            cur = np.where(cur >= lu, _cmj_hash_round(cur.copy(), p, w),
                           cur)
    with np.errstate(over="ignore"):
        return (cur + p) % lu


def cmj_randfloat(i, p):
    xp = _xnp(i, p)
    i = _as_u32(xp, i)
    p = _as_u32(xp, p)
    with np.errstate(over="ignore"):
        i ^= p
        i ^= i >> _np_u32(17)
        i ^= i >> _np_u32(10)
        i *= _np_u32(0xB36534E5)
        i ^= i >> _np_u32(12)
        i ^= i >> _np_u32(21)
        i *= _np_u32(0x93FC4795)
        i ^= _np_u32(0xDF6E307F)
        i ^= i >> _np_u32(17)
        i *= _np_u32(1) | (p >> _np_u32(18))
    return i.astype(np.float32) * np.float32(1.0 / 4294967808.0)


def cmj_2d(sample_index, dim_pair, rng_hash, num_samples):
    """One CMJ 2D point: sample_index of num_samples in the pattern
    keyed by (dim_pair, rng_hash) (ref: kernel_jitter.h cmj_sample_2D).
    Indices beyond num_samples wrap into a fresh pattern."""
    xp = _xnp(sample_index, dim_pair)
    s = _as_u32(xp, sample_index)
    N = max(int(num_samples), 1)
    m = max(int(np.floor(np.sqrt(N))), 1)
    n = (N + m - 1) // m
    with np.errstate(over="ignore"):
        p = hash_pcg3d(dim_pair, rng_hash, s // _np_u32(N))
        s = s % _np_u32(N)
        s = cmj_permute(s, N, p * _np_u32(0x51633E2D))
        sdivm = s // _np_u32(m)
        smodm = s - sdivm * _np_u32(m)
        sx = cmj_permute(smodm, m, p * _np_u32(0x68BC21EB))
        sy = cmj_permute(sdivm, n, p * _np_u32(0x02E5BE93))
        jx = cmj_randfloat(s, p * _np_u32(0x967A889B))
        jy = cmj_randfloat(s, p * _np_u32(0x368CC8B7))
    fx = (sx.astype(np.float32) + (sy.astype(np.float32) + jx)
          / np.float32(n)) / np.float32(m)
    fy = (s.astype(np.float32) + jy) / np.float32(N)
    return fx, fy


# ---------------------------------------------------------------------------
# PMJ02 — progressive multi-jittered (0,2) tables (ref: render/
# jitter.cpp + kernel_random.h PMJ usage). The tables are built at
# first use by Owen-scrambling the Sobol (0,2) sequence — the same
# stratification class as the reference's generator (Christensen et
# al. 2018 §10.1: pmj02 sequences are exactly the (0,2)-sequences in
# base 2); every power-of-two prefix is (0,2)-stratified, which the
# tests assert directly. Runtime behavior matches the reference's:
# table row chosen per (dimension, pixel) hash, Cranley-Patterson
# rotation decorrelates beyond the table period. Costs one gather per
# batch (docs/PERF.md) — opt-in via integrator.sampling_pattern.
# ---------------------------------------------------------------------------

PMJ02_NUM_PATTERNS = 16
PMJ02_NUM_SAMPLES = 1024
_PMJ02_TABLES = None


def _pmj02_tables():
    global _PMJ02_TABLES
    if _PMJ02_TABLES is None:
        idx = np.arange(PMJ02_NUM_SAMPLES, dtype=np.uint32)
        tabs = np.zeros((PMJ02_NUM_PATTERNS, PMJ02_NUM_SAMPLES, 2),
                        np.float32)
        for pat in range(PMJ02_NUM_PATTERNS):
            x, y = sobol_burley_2d(idx, np.uint32(pat),
                                   np.uint32(0x9C8F2D3B))
            tabs[pat, :, 0] = x
            tabs[pat, :, 1] = y
        _PMJ02_TABLES = tabs
    return _PMJ02_TABLES


def pmj02_2d(sample_index, dim_pair, rng_hash):
    xp = _xnp(sample_index, dim_pair)
    tabs = _pmj02_tables()
    if xp is jnp:
        tabs = jnp.asarray(tabs)
    s = _as_u32(xp, sample_index)
    pat = (hash_pcg2d(dim_pair, rng_hash)
           % _np_u32(PMJ02_NUM_PATTERNS)).astype(np.int32)
    idx = (s % _np_u32(PMJ02_NUM_SAMPLES)).astype(np.int32)
    x = tabs[pat, idx, 0]
    y = tabs[pat, idx, 1]
    # Cranley-Patterson rotation keyed on the wrap count decorrelates
    # samples past the table period
    wrap = s // _np_u32(PMJ02_NUM_SAMPLES)
    rx = uint_to_float_01(hash_pcg4d(dim_pair, rng_hash, wrap,
                                     _np_u32(0x11)))
    ry = uint_to_float_01(hash_pcg4d(dim_pair, rng_hash, wrap,
                                     _np_u32(0x29)))
    rx = xp.where(wrap > 0, rx, np.float32(0.0))
    ry = xp.where(wrap > 0, ry, np.float32(0.0))
    fx = x + rx
    fy = y + ry
    return fx - xp.floor(fx), fy - xp.floor(fy)


def path_rng_2d(rng_hash, sample, dim_pair, pattern=SOBOL_SAMPLER,
                num_samples=0):
    if pattern == PCG_SAMPLER:
        return pcg_2d(sample, dim_pair, rng_hash)
    if pattern == CMJ_SAMPLER:
        return cmj_2d(sample, dim_pair, rng_hash, num_samples or 256)
    if pattern == PMJ02_SAMPLER:
        return pmj02_2d(sample, dim_pair, rng_hash)
    return sobol_burley_2d(sample, dim_pair, rng_hash)


def path_rng_1d(rng_hash, sample, dim_pair, pattern=SOBOL_SAMPLER,
                num_samples=0):
    if pattern == PCG_SAMPLER:
        return pcg_2d(sample, dim_pair, rng_hash)[0]
    if pattern == CMJ_SAMPLER:
        return cmj_2d(sample, dim_pair, rng_hash, num_samples or 256)[0]
    if pattern == PMJ02_SAMPLER:
        return pmj02_2d(sample, dim_pair, rng_hash)[0]
    return sobol_burley_1d(sample, dim_pair, rng_hash)


def bounce_dim_pair(bounce, which):
    """Dimension pair index for per-bounce slot `which` (PRNG_BSDF, ...)."""
    return PRNG_BASE_NUM + bounce * PRNG_BOUNCE_NUM + which
