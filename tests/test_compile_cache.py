"""Unit tests for utils/compile_cache.py (host-scoped persistent cache).

The cache helper exists because XLA:CPU cache entries are AOT host
executables: loading one written on a different host can SIGILL, and the
/proc/cpuinfo flags line alone does not discriminate hosts (LLVM derives
pseudo-features like ``prefer-no-gather`` from the exact CPU model). See
the module docstring of lina_speech_tpu/utils/compile_cache.py.
"""
import os

import jax

from lina_speech_tpu.utils.compile_cache import (
    cpu_cache_tag,
    enable_persistent_cache,
)


def test_cpu_cache_tag_stable_and_short():
    tag = cpu_cache_tag()
    assert tag == cpu_cache_tag()  # deterministic per host
    assert len(tag) == 10
    assert all(c in "0123456789abcdef" for c in tag)


def test_enable_persistent_cache_explicit_root(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        cache_dir = enable_persistent_cache(str(tmp_path))
        # CPU backend (forced in conftest) -> host-scoped directory name
        assert cache_dir == str(tmp_path / f".jax_cache_cpu_{cpu_cache_tag()}")
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_persistent_cache_xdg_default(tmp_path, monkeypatch):
    """With no explicit root, the cache lands under $XDG_CACHE_HOME —
    installed console scripts (lina-train / lina-codec-train) rely on
    this default."""
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    try:
        cache_dir = enable_persistent_cache()
        root = tmp_path / "lina_speech_tpu"
        assert os.path.isdir(root)  # created on demand
        assert cache_dir == str(root / f".jax_cache_cpu_{cpu_cache_tag()}")
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
