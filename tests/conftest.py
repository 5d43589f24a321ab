"""Force CPU with 8 virtual devices so sharding tests run without TPUs."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored by this jax build (the axon TPU plugin
# registers eagerly); force the platform through the config API. This also
# keeps test processes from grabbing the single-process TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of the tiny model are slow;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
