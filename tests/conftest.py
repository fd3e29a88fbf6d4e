"""Test config: run on a virtual 8-device CPU mesh (JAX fake-backend idiom).

Must set flags before jax imports anything device-related.
"""
import os

# Force CPU: the ambient environment registers an "axon" remote-TPU backend
# via sitecustomize and forces jax_platforms="axon,cpu", which would make
# every eager op / compile a network round-trip. Env vars alone cannot
# override it (jax is already imported at interpreter startup); the config
# update below can, as long as it runs before first backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert len(jax.devices()) == 8, jax.devices()
# XLA:CPU compiles are very slow in this environment; persist them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
