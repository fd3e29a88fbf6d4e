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
# XLA:CPU compiles are very slow in this environment; persist them across
# runs. The cache dir is scoped by the HOST CPU feature set: XLA:CPU AOT
# executables are machine-specific, and loading an entry written on a host
# with different features SIGILLs (measured: two pytest segfaults in
# backend_compile_and_load / cache put at tests/test_serving.py after the
# runner host changed — cpu_aot_loader warns "Machine type used for
# compilation doesn't match"). TPU entries are device binaries and stay in
# the shared .jax_cache.
import hashlib  # noqa: E402


def _cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


jax.config.update("jax_compilation_cache_dir",
                  f"/root/repo/.jax_cache_cpu_{_cpu_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
