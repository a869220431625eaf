"""Runtime/backend management.

The tunneled TPU backends this framework targets have two operational
hazards the reference never faced (its OpenCL JIT was local and instant):
  - XLA compiles are expensive (seconds to minutes through a remote
    compile service) and occasionally fail transiently
  - device<->host transfers can be orders of magnitude slower than PCIe

Mitigations owned here:
  - a persistent XLA compilation cache shared across processes, so a
    render pays each program's compile cost once per machine
  - `retry_reexec` for top-level drivers: a failed attempt re-execs the
    process; the attempt still made forward progress because every
    successfully compiled program landed in the cache
"""

from __future__ import annotations

import os
import sys

_cache_enabled = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at a persistent on-disk compilation cache
    (opt out with RAYVERB_NO_COMPILE_CACHE=1)."""
    global _cache_enabled
    if _cache_enabled or os.environ.get("RAYVERB_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "rayverb_tpu", "xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _cache_enabled = True


_RETRY_ENV = "RAYVERB_RETRY_ATTEMPT"


def retry_reexec(max_attempts: int = 3) -> int:
    """Return the current attempt number; call `retry_reexec_fail()` to
    restart the whole process on a transient backend failure."""
    return int(os.environ.get(_RETRY_ENV, "0"))


def retry_reexec_fail(max_attempts: int = 3) -> None:
    """Re-exec the current process (fresh backend state, warm compile
    cache). Raises RuntimeError when attempts are exhausted."""
    attempt = retry_reexec()
    if attempt + 1 >= max_attempts:
        raise RuntimeError(f"giving up after {attempt + 1} attempts")
    os.environ[_RETRY_ENV] = str(attempt + 1)
    print(
        f"transient backend failure; re-executing (attempt {attempt + 2}/"
        f"{max_attempts})",
        file=sys.stderr,
    )
    os.execv(sys.executable, [sys.executable] + sys.argv)
