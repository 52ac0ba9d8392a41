"""Persistent XLA compilation cache for tunnel-backed TPU sessions.

On the axon remote-tunnel backend a *compile* RPC can take minutes when the
tunnel is congested (measured 2026-08-19: 402 s for a trivial matmul's first
compile while steady-state dispatch stayed at ~3 ms) — an outage mode that
round 3 hit as unparseable BENCH files. Executables are keyed by HLO hash,
so a persistent cache makes every re-run of an unchanged program skip the
compile RPC entirely: bench.py / profile_step.py / the train driver survive
a congested tunnel as long as their programs were compiled once before.

Opt-out: set B4CP_NO_COMPILE_CACHE=1 (e.g. when measuring cold-compile
behavior on purpose).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_compile_cache",
)


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    ``<repo>/.jax_compile_cache``). Call BEFORE the first jit execution;
    idempotent; returns the directory (None when opted out or unavailable).
    """
    if os.environ.get("B4CP_NO_COMPILE_CACHE"):
        return None
    import jax

    # TPU-tunnel cache only: XLA:CPU caches AOT machine code whose cache key
    # does NOT include the host's CPU features, so an entry written in one
    # container can be loaded on a different host CPU and SIGILL (observed as
    # cpu_aot_loader "machine type doesn't match" errors when a fresh
    # container reused this repo's cache). CPU compiles are fast and local —
    # nothing to win, a crashed dryrun to lose.
    # jax.config first: its default is seeded from JAX_PLATFORMS, and a
    # jax.config.update("jax_platforms", "cpu") (the CPU-mesh test override)
    # wins over the env var, which this image pins to "axon" globally.
    plats = (
        getattr(jax.config, "jax_platforms", "") or os.environ.get("JAX_PLATFORMS", "") or ""
    )
    if plats.split(",")[0].strip().lower() == "cpu":
        return None

    path = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: on the tunnel the RPC round-trip, not
        # the compile itself, is the cost being avoided
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return None
    _block_cpu_backend()
    return path


_guard_installed = False


def _block_cpu_backend() -> None:
    """Refuse the persistent cache per-compile when the EFFECTIVE backend is
    CPU, whatever the configured platform string said.

    The string check above runs before backend init (it must not block on a
    dead tunnel), so it cannot see an implicit axon->cpu fallback: with
    jax_platforms defaulting to "axon,cpu", a process whose tunnel is down
    silently resolves to CPU and would write host-specific AOT entries into
    the shared dir. jax gates both cache read and write on
    ``compilation_cache.is_cache_used(backend)`` (compiler.py:_get_cache_key
    returns None without it), and that hook receives the actual backend at
    each compile — wrap it so cpu backends never touch the cache. Best
    effort: if jax's internals move, the pre-init string check still covers
    every explicit-CPU session.
    """
    global _guard_installed
    if _guard_installed:
        return
    try:
        from jax._src import compilation_cache as _cc

        _orig = _cc.is_cache_used

        def _is_cache_used_tpu_only(backend):
            if getattr(backend, "platform", None) == "cpu":
                return False
            return _orig(backend)

        _cc.is_cache_used = _is_cache_used_tpu_only
        _guard_installed = True
    except Exception:  # noqa: BLE001 — guard is defensive, never fatal
        pass
