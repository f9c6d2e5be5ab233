"""Fixed-shape adaptive-sampling driver.

Error-driven sample allocation (ref: blender/intern/cycles/kernel/
kernel_adaptive_sampling.h + the session-side active-pixel handling in
render/session.cpp) redesigned for XLA's static-shape compilation
model: instead of shrinking the launch to the unconverged pixel list
(every new list size would be a fresh TPU compile), the wavefront KEEPS
ITS FULL SHAPE and the host re-points converged pixels' lanes at
still-active pixels as additional samples. Which pixel a lane renders
and which sample index it starts at are device DATA (int arrays), so
one compiled kernel serves the whole adaptive loop, and occupancy is
100% in every chunk.

The error metric is the reference's half-buffer estimate: the kernel
returns an even-sample-only accumulator next to the full accumulator,
and a pixel is converged when |A - 2E| / (n * sqrt(mean)) drops below
the threshold (ref: kernel_adaptive_sampling.h kernel_do_adaptive_*).
"""
import numpy as np


def render_adaptive(kg, W, H, spp, *, threshold, min_samples=None,
                    chunk=4, lanes=None, render_chunk=None,
                    progress=None):
    """Render W x H with error-driven per-pixel sample counts.

    Returns (L_sum (H*W, 3), A_sum (H*W,), counts (H*W,), stats dict).
    The image is L_sum / counts[:, None]. `chunk` is the number of
    consecutive samples one lane renders per dispatch; `lanes` is the
    wavefront width (default W*H). `render_chunk(px, py, pidx, s0)`
    overrides the kernel call (tests); default jits
    integrator.render_samples_adaptive_chunk over `kg`.
    """
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.ops import integrator as integ

    npix = W * H
    n = int(lanes or npix)
    if min_samples is None:
        min_samples = max(spp // 8, 8)
    min_samples = max(int(min_samples), 2)

    if render_chunk is None:
        fn = jax.jit(lambda a, b, c, s: integ.render_samples_adaptive_chunk(
            kg, a, b, c, s, chunk))

        def render_chunk(px, py, pidx, s0):
            L, A, E = fn(jnp.asarray(px, jnp.int32),
                         jnp.asarray(py, jnp.int32),
                         jnp.asarray(pidx, jnp.int32),
                         jnp.asarray(s0, jnp.uint32))
            return np.asarray(L), np.asarray(A), np.asarray(E)

    L_sum = np.zeros((npix, 3), np.float32)
    A_sum = np.zeros(npix, np.float32)
    E_sum = np.zeros((npix, 3), np.float32)
    counts = np.zeros(npix, np.int64)
    active = np.arange(npix, dtype=np.int64)
    err_act = None  # per-active-pixel error from the previous test
    dispatches = 0
    lanes_wasted = 0

    while active.size:
        # fill the wavefront: active pixels get floor/ceil(n / A)
        # replicas each; replica r of a pixel covers samples
        # [count, count + chunk) shifted by r*chunk
        A = active.size
        R = n // A
        extra = n - R * A
        reps = np.full(A, R, np.int64)
        reps[:extra] += 1
        # per-dispatch milestone: stop at min_samples for the first
        # convergence check, then at each doubling (ref:
        # kernel_adaptive_sampling.h checks on a power-of-two-ish
        # cadence) — otherwise a wide wavefront (lanes >> active*chunk)
        # would exhaust the whole spp budget in one dispatch and the
        # error estimator never gets to cull anything
        ca = counts[active]
        milestone = np.where(ca < min_samples, min_samples,
                             np.minimum(np.maximum(ca * 2, ca + chunk),
                                        spp))
        cap = np.maximum((milestone - ca + chunk - 1) // chunk, 1)
        reps_c = np.minimum(reps, cap)
        # milestone caps must never turn surplus lanes into padding
        # (round-3 bench: 75% of every dispatch was masked duplicate
        # work — the 6.7x dof regression). Surplus lanes render REAL
        # extra chunks beyond the milestone, highest-error pixels
        # first: the lanes are paid for either way, and the pixels
        # least likely to converge absorb them with the least risk of
        # over-rendering.
        leftover = n - int(reps_c.sum())
        if leftover > 0:
            rem = np.maximum((spp - ca) // chunk - reps_c, 0)
            order = (np.argsort(-err_act, kind="stable")
                     if err_act is not None and err_act.size == A
                     else np.arange(A))
            rs = rem[order]
            # waterfill: largest level m with sum(min(rs, m)) <= leftover
            lo, hi = 0, int(rs.max()) if rs.size else 0
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if int(np.minimum(rs, mid).sum()) <= leftover:
                    lo = mid
                else:
                    hi = mid - 1
            extra_sorted = np.minimum(rs, lo)
            short = leftover - int(extra_sorted.sum())
            if short > 0:
                idxs = np.flatnonzero(rs > lo)[:short]
                extra_sorted[idxs] += 1
            extras = np.zeros(A, np.int64)
            extras[order] = extra_sorted
            reps_c = reps_c + extras
        lane_pix = np.repeat(active, reps_c)
        offs = np.repeat(np.cumsum(reps_c) - reps_c, reps_c)
        rep_idx = np.arange(lane_pix.size, dtype=np.int64) - offs
        # pad the tail cyclically with already-scheduled work; padded
        # lanes are masked out of the accumulation (wasted compute only
        # in the closing chunks when caps bite)
        pad = n - lane_pix.size
        if pad > 0:
            lanes_wasted += pad
            lane_pix = np.concatenate([lane_pix, lane_pix[:pad]]) \
                if lane_pix.size >= pad else np.concatenate(
                    [lane_pix, np.resize(lane_pix, pad)])
            rep_idx = np.concatenate([rep_idx, np.full(pad, -1)])
        live = rep_idx >= 0
        s0 = counts[lane_pix] + np.maximum(rep_idx, 0) * chunk

        px = (lane_pix % W).astype(np.int32)
        py = (lane_pix // W).astype(np.int32)
        L, Al, E = render_chunk(px, py, lane_pix.astype(np.int32),
                                s0.astype(np.uint32))
        dispatches += 1
        lp = lane_pix[live]
        np.add.at(L_sum, lp, L[live])
        np.add.at(A_sum, lp, Al[live])
        np.add.at(E_sum, lp, E[live])
        np.add.at(counts, active, reps_c * chunk)
        if progress is not None:
            progress.add_samples(int(live.sum()) * chunk,
                                 int(counts.max()))

        # convergence test (half-buffer error, ref metric)
        nact = counts[active].astype(np.float64)
        mean = L_sum[active].sum(-1) / np.maximum(nact, 1)
        err = np.abs(L_sum[active] - 2.0 * E_sum[active]).sum(-1) / (
            nact * np.sqrt(np.maximum(mean, 1e-4)))
        keep = counts[active] < spp
        if threshold > 0.0:
            keep &= (counts[active] < min_samples) | (err >= threshold)
        active = active[keep]
        err_act = err[keep]

    stats = {
        "samples_rendered": int(counts.sum()),
        "samples_nominal": npix * spp,
        "dispatches": dispatches,
        "lanes_wasted": int(lanes_wasted),
        "max_samples": int(counts.max()) if npix else 0,
        "min_samples": int(counts.min()) if npix else 0,
    }
    return L_sum, A_sum, counts, stats
