"""Sweep the one-hot walk's independent cluster-cut size on real
integrator wavefronts (camera + bounce-1 + NEE shadow rays).

Per-visit MXU MAC for the one-hot fetch is ~invariant in cluster size
(row width W x cluster count C ~ 12P), so a coarser TRUE BVH re-cut
(tight subtree bounds — NOT the r4 adjacent-merge whose union boxes
were loose) trades visit count against cheap VPU triangle tests.
This measures the crossover per scene.

Usage: python tools/onehot_cut_bench.py [scene] [ct ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.models import scene as scene_mod
    from raytracingproject_tpu.ops import camera as cam_ops
    from raytracingproject_tpu.ops import integrator as integ
    from raytracingproject_tpu.models import object as ob
    from raytracingproject_tpu.utils import rng as rngu
    import raytracingproject_tpu.utils.math as um

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "glossy_box"
    cts = [int(a) for a in sys.argv[2:]] or [0, 24, 32, 48, 64]
    factory = {"glossy_box": lambda w, h: examples.cornell_box(
        w, h, spheres="glossy"),
        "textured": examples.instanced_scene,
        "dof": examples.dof_motion_scene}[scene_name]
    W = H = 512
    n = W * H

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
            best = min(best, time.time() - t0)
        return best

    for ct in cts:
        scene_mod.OH_CUT_TRIS = ct or None
        scene = factory(W, H)
        scene.device_update()
        kg = scene.make_kernel_globals()
        kg["pallas_onehot"] = True
        kg["pallas_clusters"] = False
        ds = kg["dscene"]
        if "oh_cbounds" not in ds:
            print(f"ct={ct}: one-hot tables declined (VMEM)", flush=True)
            continue
        c_pad = ds["oh_cbounds"].shape[0]
        w_pad = ds["oh_table_hi"].shape[0]
        ohtris = int(kg.get("oh_cluster_tris", 0) or kg["cluster_tris"])

        yy, xx = np.mgrid[0:H, 0:W]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        u = rngu.hash_pcg3d(jnp.arange(n, dtype=jnp.uint32),
                            jnp.uint32(0), jnp.uint32(1))
        ray = cam_ops.camera_sample_ray(
            kg["cam"], px.astype(jnp.float32) + rngu.uint_to_float_01(u),
            py.astype(jnp.float32) + rngu.uint_to_float_01(u ^ 12345),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
        o, d = ray["o"], ray["d"]
        tmin = jnp.full((n,), 1e-5, jnp.float32)
        tmax = jnp.full((n,), um.RAY_TMAX, jnp.float32)
        vis_c = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        vis_s = jnp.full((n,), ob.PATH_RAY_SHADOW, jnp.uint32)

        fn_c = jax.jit(lambda o_, d_, tm: integ._scene_intersect_tris(
            kg, o_, d_, tmin, tm, vis_c))
        hit = fn_c(o, d, tmax)
        t_cam = timeit(fn_c, o, d, tmax)

        # bounce-1 wavefront: cosine hemisphere at the camera hits
        P = o + d * hit["t"][:, None]
        nrm = um.safe_normalize(jnp.stack(
            [rngu.uint_to_float_01(u ^ 7) - 0.5,
             rngu.uint_to_float_01(u ^ 77) - 0.5,
             rngu.uint_to_float_01(u ^ 777) - 0.5], -1))
        d2, _ = um.sample_cos_hemisphere(
            nrm, rngu.uint_to_float_01(u ^ 3),
            rngu.uint_to_float_01(u ^ 31))
        o2 = P - d * 1e-3
        t_bounce = timeit(fn_c, o2, d2, tmax)

        # NEE shadow wavefront: from bounce origins toward the light
        lco = np.asarray(ds["lamp_co"])
        tgt = jnp.asarray(lco[0] if len(lco) else np.zeros(3), jnp.float32)
        dl = um.safe_normalize(tgt[None, :] - o2)
        dist = um.length(tgt[None, :] - o2)
        fn_s = jax.jit(lambda o_, d_, tm: integ._shadow_blocked(
            kg, o_, d_, tmin, tm))
        t_shadow = timeit(fn_s, o2, dl, dist * 0.999)

        print(f"ct={ct or 'same'}(rows={ohtris}) C_pad={c_pad} "
              f"W_pad={w_pad}: camera={t_cam*1e3:7.2f}ms "
              f"bounce={t_bounce*1e3:7.2f}ms "
              f"shadow={t_shadow*1e3:7.2f}ms", flush=True)
    scene_mod.OH_CUT_TRIS = None


if __name__ == "__main__":
    main()
