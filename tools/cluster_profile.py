"""Where does cluster-traversal time go? Times the main closest-hit
and NEE shadow any-hit traversals on real integrator wavefronts
(camera rays + bounce-1 rays) for a bench scene, sweeps chunk size,
and reports per-chunk while_loop iteration counts.

Usage: python tools/cluster_profile.py [scene] [W] [H]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.ops import camera as cam_ops
    from raytracingproject_tpu.ops import cluster_intersect as ci
    from raytracingproject_tpu.ops import integrator as integ
    from raytracingproject_tpu.utils import rng as rngu
    import raytracingproject_tpu.utils.math as um

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "glossy_box"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    factory = {"glossy_box": lambda w, h: examples.cornell_box(
        w, h, spheres="glossy"),
        "textured": examples.instanced_scene,
        "dof": examples.dof_motion_scene}[scene_name]
    scene = factory(W, H)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    n = W * H
    print(f"{scene_name} lanes={n} prims={ds['tri_verts'].shape[0]} "
          f"clusters={ds['cluster_bounds'].shape[0]} "
          f"cluster_tris={kg['cluster_tris']}", flush=True)

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)

    # camera wavefront
    u = rngu.hash_pcg3d(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
                        jnp.uint32(1))
    ray = cam_ops.camera_sample_ray(
        kg["cam"], px.astype(jnp.float32) + rngu.uint_to_float_01(u),
        py.astype(jnp.float32) + rngu.uint_to_float_01(u ^ 12345),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32))
    o, d = ray["o"], ray["d"]
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), um.RAY_TMAX, jnp.float32)
    vis_c = jnp.full((n,), 1, jnp.uint32)

    has_inst = bool(kg.get("has_instances", False))
    ct = int(kg["cluster_tris"])

    def bench(label, o_, d_, tmax_, shadow, chunk):
        f = jax.jit(lambda a, b, c2: ci.intersect_clusters(
            ds["cluster_bounds"], ds["cluster_table"], ct, a, b, tmin, c2,
            visibility=vis_c, shadow_any_hit=shadow, has_instances=has_inst,
            chunk=chunk, want_stats=True))
        out = f(o_, d_, tmax_)
        out["t"].block_until_ready()
        t0 = time.time()
        for _ in range(3):
            out = f(o_, d_, tmax_)
        out["t"].block_until_ready()
        dt = (time.time() - t0) / 3
        iters = np.asarray(out["iters"]).reshape(-1, chunk)[:, 0] \
            if n > chunk else np.asarray(out["iters"])[:1]
        print(f"  {label:<22} chunk={chunk:<6} t={dt * 1e3:7.2f}ms  "
              f"iters/chunk mean={iters.mean():5.1f} max={iters.max()}",
              flush=True)
        return out

    for chunk in (8192, 32768, 131072, 262144):
        hit = bench("camera closest", o, d, tmax, False, chunk)

    # bounce-1 wavefront: diffuse-ish scatter from the hit points
    hit = jax.jit(lambda: ci.intersect_clusters(
        ds["cluster_bounds"], ds["cluster_table"], ct, o, d, tmin, tmax,
        visibility=vis_c, has_instances=has_inst))()
    thit = np.asarray(hit["t"])
    P = np.asarray(o) + np.asarray(d) * thit[:, None]
    rnd = np.random.default_rng(1)
    nd = rnd.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    o2 = jnp.asarray(P - np.asarray(d) * 1e-3)
    d2 = jnp.asarray(nd)
    for chunk in (8192, 32768, 131072, 262144):
        bench("bounce-1 closest", o2, d2, tmax, False, chunk)
        bench("bounce-1 shadow any", o2, d2,
              jnp.full((n,), 600.0, jnp.float32), True, chunk)


if __name__ == "__main__":
    main()
