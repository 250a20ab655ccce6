"""Platform helpers shared by the CLIs."""

from __future__ import annotations

__all__ = ["force_cpu"]


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
