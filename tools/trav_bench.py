"""Traversal backend microbench on the live chip.

Times one closest-hit sweep per backend x lane-count x ray-coherence
on a bench scene, plus a tiny-dispatch probe that isolates the tunnel
round-trip. This is the measurement the round-4 kernel work is driven
by (VERDICT r03 weak #3: never tune traversal without a stage profile).

Usage: python tools/trav_bench.py [scene] [out.json]
  scene: glossy (default) | textured | dof | volume
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

SCENES = {
    "glossy": ("cornell_box", {"spheres": "glossy"}),
    "textured": ("instanced_scene", {}),
    "dof": ("dof_motion_scene", {}),
    "volume": ("volume_sss_scene", {}),
}


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
        best = min(best, time.time() - t0)
    return best


def ray_sets(kg, n, w, h):
    """camera: coherent primary rays; bounce: cosine hemisphere from the
    camera hits (the real secondary regime); random: box-spanning
    incoherent probes (the autotune worst case)."""
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.ops import camera as cam_ops
    from raytracingproject_tpu.ops import integrator as integ
    from raytracingproject_tpu.models import object as ob

    yy, xx = np.mgrid[0:h, 0:w]
    reps = -(-n // (w * h))
    px = np.tile(xx.reshape(-1), reps)[:n]
    py = np.tile(yy.reshape(-1), reps)[:n]
    ray = jax.jit(lambda a, b: cam_ops.camera_sample_ray(
        kg["cam"], a, b,
        jnp.full((n,), 0.5), jnp.full((n,), 0.5), jnp.zeros((n,))))(
        jnp.asarray(px, jnp.float32) + 0.5, jnp.asarray(py, jnp.float32) + 0.5)
    vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
    sets = {"camera": (ray["o"], ray["d"])}

    kg_x = {**kg, "pallas_clusters": False}  # XLA twin for the hit points
    hit = jax.jit(lambda o, d: integ._scene_intersect(
        kg_x, o, d, jnp.full((n,), 1e-4), jnp.full((n,), 1e30), vis))(
        ray["o"], ray["d"])
    t = jnp.where(hit["prim"] >= 0, hit["t"], 1.0)
    P = ray["o"] + ray["d"] * (t[:, None] * 0.999)
    rng = np.random.default_rng(1)
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    sets["bounce"] = (P, jnp.asarray(d2))

    ds = kg["dscene"]
    if "cluster_bounds" in ds:
        cb = np.asarray(ds["cluster_bounds"])
        lo, hi = cb[:, :3].min(0), cb[:, 3:].max(0)
    else:
        tv = np.asarray(ds["tri_verts_world"]).reshape(-1, 3)
        lo, hi = tv.min(0), tv.max(0)
    span = np.maximum(hi - lo, 1e-3)
    o3 = (lo - 0.25 * span) + rng.uniform(0, 1, (n, 3)) * 1.5 * span
    d3 = rng.normal(size=(n, 3)).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
    sets["random"] = (jnp.asarray(o3, jnp.float32), jnp.asarray(d3))
    return sets


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.ops import integrator as integ
    from raytracingproject_tpu.models import object as ob

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "glossy"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    factory, kwargs = SCENES[scene_name]
    w = h = 256
    scene = getattr(examples, factory)(w, h, spp=8, **kwargs)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    print(f"scene={scene_name} prims={ds['prim_table'].shape[0]} "
          f"clusters={ds['cluster_bounds'].shape[0] if 'cluster_bounds' in ds else 0} "
          f"ct={kg.get('cluster_tris', 0)} device={jax.devices()[0].platform}",
          flush=True)

    # tunnel round-trip floor
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    o1 = jnp.ones((8, 128))
    print(f"tiny-dispatch: {timeit(tiny, o1) * 1e3:.2f}ms", flush=True)

    res = {"scene": scene_name, "sweeps": {}}
    backends = [("brute", {"use_brute": True})] \
        if not kg.get("has_instances") else []
    if "cluster_bounds" in ds and "sc_bounds" not in ds \
            and int(kg.get("cluster_tris", 0)) > 0:
        backends += [("xla", {"use_brute": False, "pallas_clusters": False}),
                     ("pallas", {"use_brute": False, "pallas_clusters": True})]
    for n in (65536, 262144):
        sets = ray_sets(kg, n, w, h)
        for bname, flags in backends:
            kg2 = {**kg, **flags}
            fn = jax.jit(lambda o, d, _kg=kg2, _n=n: integ._scene_intersect_tris(
                _kg, o, d, jnp.full((_n,), 1e-4), jnp.full((_n,), 1e30),
                jnp.full((_n,), ob.PATH_RAY_CAMERA, jnp.uint32)))
            fs = jax.jit(lambda o, d, _kg=kg2, _n=n: integ._scene_intersect_tris(
                _kg, o, d, jnp.full((_n,), 1e-4), jnp.full((_n,), 1e30),
                jnp.full((_n,), ob.PATH_RAY_SHADOW, jnp.uint32), shadow=True))
            for rname, (o, d) in sets.items():
                try:
                    t = timeit(fn, o, d)
                    ts = timeit(fs, o, d)
                except Exception as e:
                    print(f"  n={n} {bname} {rname}: FAILED "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                key = f"{bname}/{rname}/{n}"
                res["sweeps"][key] = {"closest_ms": round(t * 1e3, 2),
                                      "shadow_ms": round(ts * 1e3, 2)}
                print(f"  n={n:7d} {bname:7s} {rname:7s} "
                      f"closest={t * 1e3:7.2f}ms shadow={ts * 1e3:7.2f}ms",
                      flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
