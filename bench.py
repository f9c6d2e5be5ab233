"""Benchmark: Cornell-box throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Protocol mirrors BASELINE.md: samples = width x height x spp; wall-clock
excludes scene sync + compile (reported separately on stderr), matching
the reference's "render time without synchronization"
(ref: blender_session.cpp:584-587).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.app.examples import cornell_box
    from raytracingproject_tpu.ops import integrator as integ

    W = H = 512
    SPP = 128
    t0 = time.time()
    scene = cornell_box(W, H, spp=SPP)
    scene.device_update()
    kg = scene.make_kernel_globals()
    sync_time = time.time() - t0

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    pidx = py * W + px

    spp_chunk = 32
    fn = jax.jit(lambda a, b, c, s: integ.render_samples_regen(
        kg, a, b, c, s, spp_chunk))
    # warmup / compile
    t0 = time.time()
    L, A = fn(px, py, pidx, jnp.uint32(0))
    L.block_until_ready()
    compile_time = time.time() - t0

    t0 = time.time()
    acc = None
    for chunk in range(SPP // spp_chunk):
        L, A = fn(px, py, pidx, jnp.uint32(chunk * spp_chunk))
        acc = L if acc is None else acc + L
    acc.block_until_ready()
    render_time = time.time() - t0

    samples = W * H * SPP
    msps = samples / render_time / 1e6
    img = np.asarray(acc).reshape(H, W, 3) / SPP
    print(f"sync={sync_time:.2f}s compile={compile_time:.2f}s "
          f"render={render_time:.3f}s mean={img.mean():.4f} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)
    # Baseline: >= 100 Msamples/s on a v5e-8 pod slice (BASELINE.json,
    # metric "Msamples/sec/chip") -> 12.5 Msamples/s per chip; this
    # benchmark runs on the single attached chip.
    print(json.dumps({
        "metric": f"Cornell box {W}x{H}@{SPP}spp path-trace throughput "
                  "(single chip)",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 12.5, 3),
    }))


if __name__ == "__main__":
    main()
