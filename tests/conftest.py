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
# runs. The cache dir is scoped per host CPU (model + flags + kernel):
# XLA:CPU AOT executables are machine-specific, and loading an entry
# written on a different host SIGILLs/segfaults (measured three times in
# backend_compile_and_load at tests/test_serving.py when the runner host
# changed between rounds — the flags line alone was NOT discriminating
# enough, see utils/compile_cache.py). TPU entries are device binaries
# and stay in the shared .jax_cache.
from lina_speech_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo")
