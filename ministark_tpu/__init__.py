"""ministark_tpu: a TPU-native STARK prover/verifier framework (JAX/Pallas).

Built from scratch with the capabilities of andrewmilson/ministark (see
SURVEY.md at the repo root for the structural map of the reference).
"""

__version__ = "0.1.0"

import os as _os


def _setup_compile_cache() -> None:
    """Point JAX at a persistent compilation cache unless the user already
    configured one.  STARK proving compiles many medium-sized uint32 programs
    (NTT stages, per-term constraint jits, DEEP chunks); the cache turns that
    into a one-time cost per (shape, program) on every backend — including
    the remote-TPU tunnel, where cold compiles dominate wall-clock."""
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "jax_ms_tpu")
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compile_cache()
