"""Big-scene traversal A/B: two-level Pallas walk vs packed BVH.

The 5 BASELINE configs all stay under ~32k prims, so the >40k-prim
regime (VERDICT r2 weak #5) is measured here: a displaced-sphere field
at a chosen prim count, random incoherent + coherent wavefronts,
closest-hit and shadow sweeps per backend.

Run from the repo root (PYTHONPATH breaks axon init):
    python tools/cluster2_bench.py [prims] [lanes] [--cpu]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_mesh(nprims):
    """Jittered sphere-shell triangle soup with ~nprims tris."""
    rng = np.random.default_rng(0)
    n = nprims
    u = rng.uniform(0, 1, n)
    v = rng.uniform(0, 1, n)
    theta = 2 * np.pi * u
    phi = np.arccos(2 * v - 1)
    r = 100.0 * (1.0 + 0.2 * rng.standard_normal(n))
    c = np.stack([r * np.sin(phi) * np.cos(theta),
                  r * np.sin(phi) * np.sin(theta),
                  r * np.cos(phi)], -1).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32)
    e2 = rng.normal(size=(n, 3)).astype(np.float32)
    s = (2.0 * rng.uniform(0.2, 1.0, (n, 1))).astype(np.float32)
    v0 = c - 0.5 * s * e1
    return np.stack([v0, v0 + s * e1, v0 + s * e2], axis=1)


def main():
    nprims = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144

    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.models.scene import Scene
    from raytracingproject_tpu.models.mesh import Mesh
    from raytracingproject_tpu.models.object import Object
    from raytracingproject_tpu.models import object as ob
    from raytracingproject_tpu.ops import integrator as integ

    print(f"device={jax.default_backend()} prims={nprims} lanes={lanes}",
          file=sys.stderr)

    tv = make_mesh(nprims)
    scene = Scene()
    mesh = Mesh("field")
    mesh.set_mesh(tv.reshape(-1, 3),
                  np.arange(3 * nprims, dtype=np.int32).reshape(-1, 3))
    mesh.used_shaders = [scene.default_surface]
    scene.add_object(Object("field", mesh))
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    two_level = "sc_bounds" in ds
    print(f"two_level={two_level} "
          f"clusters={ds['cluster_bounds'].shape[0] if 'cluster_bounds' in ds else 0} "
          f"gmax={kg.get('sc_gmax', 0)}", file=sys.stderr)

    rng = np.random.default_rng(1)
    o = rng.uniform(-150, 150, (lanes, 3)).astype(np.float32)
    d = rng.normal(size=(lanes, 3)).astype(np.float32)
    d[: lanes // 2] = [0.577, 0.577, 0.577]   # coherent half
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmin = jnp.full((lanes,), 1e-4, jnp.float32)
    tmax = jnp.full((lanes,), 1e30, jnp.float32)
    vis = jnp.full((lanes,), ob.PATH_RAY_CAMERA, jnp.uint32)

    backends = [("packed", {"use_brute": False,
                            "pallas_clusters2": False})]
    if two_level and jax.default_backend() == "tpu":
        backends.insert(0, ("clusters2_pallas",
                            {"use_brute": False,
                             "pallas_clusters2": True}))

    for shadow in (False, True):
        for name, flags in backends:
            kg2 = {**kg, **flags}
            try:
                fn = jax.jit(lambda a, b: integ._scene_intersect_tris(
                    kg2, a, b, tmin, tmax, vis, shadow=shadow))
                t0 = time.time()
                h = fn(o, d)
                h["t"].block_until_ready()
                compile_s = time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    h = fn(o, d)
                    h["t"].block_until_ready()
                    best = min(best, time.time() - t0)
                hits = float((np.asarray(h["prim"]) >= 0).mean())
                print(f"[{'shadow' if shadow else 'closest'}] {name}: "
                      f"{best * 1e3:.1f} ms  (compile {compile_s:.1f}s, "
                      f"hit-rate {hits:.2f})")
            except Exception as e:
                print(f"[{'shadow' if shadow else 'closest'}] {name}: "
                      f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
