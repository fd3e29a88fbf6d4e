"""Persistent-compile-cache helpers.

XLA:CPU cache entries are AOT-compiled host executables: loading an entry
written on a machine with a different microarchitecture can SIGILL or
segfault (observed here: `cpu_aot_loader.cc` "machine type ... doesn't
match" warnings, then a segfault inside ``backend_compile_and_load``
during the full test suite when the runner host changed between rounds).
The raw /proc/cpuinfo *flags* line is NOT a sufficient discriminator —
two runner hosts with identical flags produced mismatched XLA pseudo-
features (``+prefer-no-gather``) — so the tag also folds in the CPU
model name and the kernel release.

TPU entries are device binaries (machine-independent w.r.t. the host)
and stay in the shared ``.jax_cache``.
"""
from __future__ import annotations

import hashlib
import os


_CPUINFO_KEYS = ("vendor_id", "cpu family", "model name", "model",
                 "stepping", "flags")


def cpu_cache_tag() -> str:
    """Short hash identifying this host's CPU for cache scoping.

    Hashes vendor / family / model / stepping / flags (first processor
    block) plus the kernel release. Stepping and model number matter:
    LLVM derives pseudo-features like ``prefer-no-gather`` from the exact
    CPU model, so two hosts with identical flags AND model-name strings
    can still produce mutually incompatible AOT entries (observed: a
    feature-mismatch warning storm from entries written under the
    model-name+flags tag of a sibling runner host).
    """
    found = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in _CPUINFO_KEYS and key not in found:
                    found[key] = line.strip()
                if len(found) == len(_CPUINFO_KEYS):
                    break
    except OSError:
        pass
    parts = [os.uname().release] + [found[k] for k in _CPUINFO_KEYS
                                    if k in found]
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def enable_persistent_cache(root: str | None = None) -> str:
    """Point jax's persistent compilation cache at a platform-appropriate
    directory under ``root`` (default: ``$XDG_CACHE_HOME/lina_speech_tpu``
    — suitable for installed CLIs; the repo's conftest/bench/driver entry
    pass the checkout root explicitly). Returns the chosen directory.
    Must run after the platform is decided (it reads
    ``jax.default_backend()``)."""
    import jax

    if root is None:
        root = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "lina_speech_tpu")
        os.makedirs(root, exist_ok=True)
    if jax.default_backend() == "cpu":
        cache_dir = os.path.join(root, f".jax_cache_cpu_{cpu_cache_tag()}")
    else:
        cache_dir = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
