"""Automatic one-time compile-cache seeding (VERDICT r4 #5).

The persistent XLA cache serves the tunneled TPU (<1 s first call of a
cached kernel), so a fresh process's jit wall is exactly the one-time
compilation of kernels absent from the cache. Previously that cost landed
inside the first real pipeline run unless the user ran
``python -m commet_tpu.cli.prewarm`` by hand; now every CLI entry point
calls :func:`ensure_prewarmed` which compiles the default-geometry kernel
set ONCE per code version (a stamp file in the cache directory keyed by
the installed package source hash) and is a no-op ever after.

Disable with COMMET_TPU_AUTOWARM=0 (tests run on CPU and skip it
automatically).
"""

from __future__ import annotations

import hashlib
import os


def _source_stamp() -> str:
    """Hash of the package sources + jax version: any edit that can change
    kernel cache hashes changes the stamp."""
    import jax

    root = os.path.dirname(__file__)
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    for dirpath, _dirs, files in sorted(os.walk(root)):
        if ".jax_cache" in dirpath:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                h.update(f.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def ensure_prewarmed(ks=(32, 33), quick: bool = True,
                     verbose: bool = True) -> bool:
    """Seed the persistent compile cache for the default geometry if this
    code version hasn't been warmed yet. Returns True when a warm pass ran.

    Only acts on non-CPU backends (the CPU backend compiles fast and the
    test suite must stay quick)."""
    if os.environ.get("COMMET_TPU_AUTOWARM", "1") == "0":
        return False
    from commet_tpu.config import enable_compile_cache

    enable_compile_cache()
    import jax

    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:  # noqa: BLE001 - no backend: nothing to warm
        return False
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return False
    stamp = os.path.join(cache_dir, f".prewarmed-{_source_stamp()}")
    if os.path.exists(stamp):
        return False
    if verbose:
        print("commet_tpu: first run of this version - seeding the "
              "compile cache (one-time; COMMET_TPU_AUTOWARM=0 skips)",
              flush=True)
    from commet_tpu.cli.prewarm import prewarm

    batches = (16384, 65536) if quick else (2048, 16384, 65536)
    prewarm(ks=tuple(ks), batches=batches, verbose=verbose)
    with open(stamp, "w") as f:
        f.write("ok\n")
    return True
