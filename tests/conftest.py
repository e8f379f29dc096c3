"""Test configuration: CPU backend with 8 virtual devices + float64.

Sharding tests exercise a virtual 8-device mesh on CPU
(xla_force_host_platform_device_count); numerics tests run in f64 to compare
tightly against the double-precision reference.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be pre-imported at interpreter startup (sitecustomize)
# with JAX_PLATFORMS=axon pointing at the real TPU tunnel — in that case
# the os.environ assignment above is too late and every test op would run
# over the tunnel (slow, and f64 transcendentals drop to f32 accuracy).
# config.update works as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: first compile of the big CTU graphs is ~30s,
# cached compiles are near-instant across test processes
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
