"""Compile-cache hygiene: oversized entries are pruned (big cached
executables hang the relay's load RPC — see utils/compile_cache.py)."""

import os

from coma_unet_tpu.utils.compile_cache import prune_compile_cache


def test_prune_removes_only_oversized_cache_entries(tmp_path):
    small = tmp_path / "jit_small-cache"
    big = tmp_path / "jit_big-cache"
    other = tmp_path / "flagship_vars_s128.msgpack"
    small.write_bytes(b"x" * 1024)
    big.write_bytes(b"x" * (20 * 1024 * 1024))
    other.write_bytes(b"x" * (30 * 1024 * 1024))

    removed = prune_compile_cache(str(tmp_path), max_mb=16.0)

    assert removed == 1
    assert small.exists()
    assert not big.exists()
    assert other.exists()  # params caches are not JAX cache entries


def test_prune_noop_without_cache_dir(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert prune_compile_cache(None) == 0


def test_prune_missing_dir(tmp_path):
    assert prune_compile_cache(str(tmp_path / "nope")) == 0
