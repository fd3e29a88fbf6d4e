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
# runs. The cache dir is scoped per host CPU (vendor/family/model/
# stepping/flags + kernel): XLA:CPU AOT executables are machine-specific
# — cpu_aot_loader warns "machine type ... doesn't match" and can SIGILL
# when entries cross runner hosts (LLVM pseudo-features like
# prefer-no-gather are derived from the exact CPU model, so the flags
# line alone does not discriminate; see utils/compile_cache.py). NB the
# repeated full-suite segfaults originally blamed on host changes turned
# out to be vm.max_map_count exhaustion — see the fixture below. TPU
# entries are device binaries and stay in the shared .jax_cache.
from lina_speech_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """Unmap compiled XLA:CPU executables between test modules.

    Root cause (measured with a /proc/<pid>/maps monitor): every
    compiled/cache-loaded XLA:CPU executable holds ~300 memory mappings
    and jax keeps all executables alive for the process lifetime, so a
    full suite run climbs to vm.max_map_count (65530 here) around test
    ~210 and mmap failures surface as SIGSEGV/SIGABRT inside the
    compilation-cache serialize/deserialize paths (three reproductions,
    all at tests/test_serving.py — simply the first big program past the
    ceiling). Dropping jit caches at module boundaries unmaps them; the
    persistent compile cache makes the re-loads cheap.
    """
    yield
    jax.clear_caches()
    gc.collect()
