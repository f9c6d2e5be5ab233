"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
(parallel/) are exercised without TPU hardware, mirroring how the driver
dry-runs `__graft_entry__.dryrun_multichip`. Must set env BEFORE jax
import.
"""

import os

# Force-override: the environment exports JAX_PLATFORMS=axon (tunneled
# TPU with ~0.7 s/op eager dispatch) which would make the suite crawl and
# break fp32 golden tests via TPU default-precision matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep CPU feature parity with TPU defaults: everything fp32.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Per-op XLA compiles cost ~0.4 s in this sandbox; persist them across runs.
import jax  # noqa: E402

# The env var alone is not always honored once the axon PJRT plugin has
# registered; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
