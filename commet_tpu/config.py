"""Runtime configuration helpers."""

import os


def enable_compile_cache(path: str | None = None) -> None:
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
