"""Runtime configuration helpers."""

import os


def respect_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative. The tunneled-TPU (axon) plugin
    registers itself regardless of the JAX_PLATFORMS environment variable,
    so ``JAX_PLATFORMS=cpu <tool>`` would still grab the chip (and can
    deadlock against another TPU client); mirroring the env var into
    jax.config before backend init restores the documented semantics.
    No-op once a backend exists."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # noqa: BLE001 - backend already initialized
        pass


def enable_compile_cache(path: str | None = None) -> None:
    respect_platform_env()
    return _enable_compile_cache(path)


def _enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache - the membership-plane build kernel
    compiles slowly (minutes for the k=32 scatter pipeline); caching makes
    it a one-time cost per machine."""
    import jax

    path = path or os.environ.get(
        "COMMET_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
