"""The persistent compile cache must never serve CPU AOT code.

XLA:CPU's cache entries embed host machine features that are NOT part of
the cache key, so an entry written in one container can be loaded on a
different host CPU and SIGILL (cpu_aot_loader logs "machine type doesn't
match"). The cache exists for the TPU tunnel's slow compile RPCs only.
"""

import os

from bert4clickpath_tpu.utils import compile_cache


def test_enable_skips_cpu_platform(tmp_path, monkeypatch):
    # conftest forces jax_platforms=cpu for the whole suite
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert compile_cache.enable(str(tmp_path / "cache")) is None
    assert not (tmp_path / "cache").exists()


def test_enable_respects_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("B4CP_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable(str(tmp_path / "cache")) is None


def test_enable_skips_cpu_via_jax_config(tmp_path, monkeypatch):
    # even with no env var, the suite's jax.config.update("jax_platforms",
    # "cpu") (tests/conftest.py) must be seen
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert compile_cache.enable(str(tmp_path / "cache")) is None


def test_cpu_backend_blocked_per_compile():
    # the string check runs pre-init and cannot see an implicit axon->cpu
    # fallback; the per-compile guard sees the ACTUAL backend and must
    # refuse cpu whatever the configured platform string said
    from jax._src import compilation_cache as cc

    compile_cache._block_cpu_backend()
    compile_cache._block_cpu_backend()  # idempotent: no double-wrap

    class _Cpu:
        platform = "cpu"

    assert cc.is_cache_used(_Cpu()) is False


def test_config_override_beats_env(tmp_path, monkeypatch):
    # the real dryrun/test scenario: the image pins JAX_PLATFORMS=axon
    # globally, but the process switched to CPU via jax.config.update —
    # the effective platform (config) must win over the stale env var
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert compile_cache.enable(str(tmp_path / "cache")) is None
    assert not (tmp_path / "cache").exists()
