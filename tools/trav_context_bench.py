"""In-CONTEXT traversal A/B: time one real integrator chunk per
traversal backend on the bench scenes, plus the regen-loop iteration
count — the numbers the probe-based autotune cannot see (VERDICT r03
weak #3: the probe's incoherent rays mispredict in-context behavior).

Usage: python tools/trav_context_bench.py [config ...] [--lanes K]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

CONFIGS = {
    "cornell_diffuse": ("cornell_box", {}, 512, 512, 32, 1),
    "glossy_nee_mis": ("cornell_box", {"spheres": "glossy"},
                       512, 512, 16, 1),
    "textured_instanced": ("instanced_scene", {}, 256, 256, 16, 4),
    "dof_motion_adaptive": ("dof_motion_scene", {}, 256, 256, 16, 4),
    "volume_sss": ("volume_sss_scene", {}, 256, 256, 16, 4),
}


def timeit(fn, *args, iters=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def run(name, lpp_override=None):
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.ops import integrator as integ

    factory, kwargs, W, H, chunk, lpp = CONFIGS[name]
    if lpp_override:
        lpp = lpp_override
    scene = getattr(examples, factory)(W, H, spp=64, **kwargs)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    n = W * H * lpp
    has_clusters = "cluster_bounds" in ds \
        and int(kg.get("cluster_tris", 0)) > 0
    print(f"\n=== {name} {W}x{H} lanes={n} chunk={chunk} "
          f"prims={ds['prim_table'].shape[0]} "
          f"clusters={ds['cluster_bounds'].shape[0] if has_clusters else 0} "
          f"ct={kg.get('cluster_tris', 0)} use_brute={kg['use_brute']}",
          flush=True)

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(np.tile(xx.reshape(-1), lpp), jnp.int32)
    py = jnp.asarray(np.tile(yy.reshape(-1), lpp), jnp.int32)
    pidx = py * W + px

    variants = [("default", {})]
    if has_clusters and "sc_bounds" not in ds:
        variants = [
            ("onehot", {"use_brute": False, "pallas_onehot": True,
                        "pallas_clusters": False}),
            ("xla_clusters", {"use_brute": False, "pallas_onehot": False,
                              "pallas_clusters": False}),
            ("pallas", {"use_brute": False, "pallas_clusters": True,
                        "pallas_onehot": False,
                        "pallas_occlusion": False}),
            ("pallas+dual", {"use_brute": False, "pallas_clusters": True,
                             "pallas_onehot": False,
                             "pallas_occlusion": True}),
            ("onehot+dual", {"use_brute": False, "pallas_clusters": False,
                             "pallas_onehot": True,
                             "pallas_occlusion": True}),
        ]
        if not kg.get("has_instances", False) \
                and ds["tri_verts_world"].shape[0] <= 65536:
            variants.append(("brute", {"use_brute": True}))

    for vname, flags in variants:
        kg2 = {**kg, **flags, "count_iters": True}
        fn = jax.jit(lambda a, b, c, s: integ.render_samples_regen(
            kg2, a, b, c, s, chunk, lanes_per_pixel=lpp))
        try:
            t0 = time.time()
            out = fn(px, py, pidx, jnp.uint32(0))
            jax.block_until_ready(out)
            comp = time.time() - t0
            t, out = timeit(lambda s: fn(px, py, pidx, s),
                            jnp.uint32(chunk))
        except Exception as e:
            print(f"  {vname}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        iters = int(out[-1]) if kg2.get("count_iters") else -1
        msps = n // lpp * chunk / t / 1e6
        per_it = t * 1e3 / max(iters, 1)
        print(f"  {vname:<14} t={t*1e3:8.1f}ms msps={msps:6.2f} "
              f"iters={iters} per_iter={per_it:.2f}ms compile={comp:.0f}s",
              flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lpp = None
    if "--lanes" in sys.argv:
        lpp = int(sys.argv[sys.argv.index("--lanes") + 1])
    print("device", jax.devices()[0].platform, flush=True)
    for nm in (args or ["glossy_nee_mis"]):
        run(nm, lpp_override=lpp)
