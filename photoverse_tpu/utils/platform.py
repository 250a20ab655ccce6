"""Platform helpers shared by the CLIs."""

from __future__ import annotations

import os

__all__ = ["force_cpu", "enable_compilation_cache"]

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/photoverse_tpu/jax")


def enable_compilation_cache(path: str | None = DEFAULT_CACHE_DIR) -> None:
    """Point JAX's persistent compilation cache at `path` (created lazily).

    SD-scale programs take 10-20 min to compile through the TPU compile
    service; the cache makes restart-after-preemption (train --resume_from)
    and repeat CLI invocations pay that once per program shape. Entries are
    content-addressed (HLO + compiler flags), so stale entries are misses,
    never wrong programs. Pass a falsy path to disable.
    """
    if not path:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # don't spend disk on trivial sub-second programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def force_cpu() -> bool:
    """Force the CPU platform via jax.config (the axon TPU plugin ignores
    the JAX_PLATFORMS env var). Returns False — with a loud warning — when
    the backend was already initialized and the switch cannot take effect."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        plat = jax.devices()[0].platform
        if plat != "cpu":
            print(
                f"WARNING: --cpu requested but the {plat!r} backend is "
                "already initialized; continuing on it"
            )
            return False
    return True
