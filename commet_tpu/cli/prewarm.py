"""Populate the persistent compile cache for the default serving geometry.

First-touch latency diagnosis (round 4, scratch/casc_tune2): the
persistent XLA cache DOES serve the tunneled TPU (a previously-compiled
kernel's first call is <1 s), so a cold `commet` run's multi-minute jit
wall is exactly the one-time compilation of kernels not yet in
`.jax_cache/`. Running `python -m commet_tpu.cli.prewarm` once after
install (or after upgrading, which changes kernel hashes) moves that cost
out of the first real pipeline run; subsequent processes pay only Python
tracing (~seconds).

Compiles (without executing) the kernel set the engine uses for the
default geometry: read length <= 128 after bucketing, batch buckets
2048..65536, k in {32, 33} (the README smoke-test k and the reference
default, src/index_and_search.cpp:71), V in the engine's fill policy set.
"""

from __future__ import annotations

import argparse
import sys
import time


def _lower_compile(fn, *args, **kwargs):
    fn.lower(*args, **kwargs).compile()


def prewarm(ks=(32, 33), lpad: int = 128, batches=(2048, 16384, 65536),
            verbose: bool = True) -> int:
    from commet_tpu.config import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from commet_tpu.core import kernels, stream
    from commet_tpu.engine.engine import max_kmer_for

    t, wmax = 2, lpad - 33 + 1
    n = 0
    t_all = time.time()
    for k in ks:
        wmax = lpad - k + 1
        planes = jnp.zeros(4 * kernels.plane_words(min(k, 26)), jnp.uint32)
        # plane shapes for the real k would allocate GiBs just to compile;
        # lower with ShapeDtypeStructs instead
        import jax

        planes_s = jax.ShapeDtypeStruct((4 * kernels.plane_words(k),),
                                        jnp.uint32)
        for b in batches:
            c2 = jax.ShapeDtypeStruct((b, lpad // 16), jnp.uint32)
            vd = jax.ShapeDtypeStruct((b, lpad // 32), jnp.uint32)
            ln = jax.ShapeDtypeStruct((b,), jnp.int32)
            todo = [
                (kernels.build_chunk_packed, (planes_s, c2, vd, lpad, k)),
                (kernels.search_batch_fwd_packed,
                 (planes_s, c2, vd, lpad, k, t)),
                (kernels.search_batch_rc_packed,
                 (planes_s, c2, vd, lpad, k, t)),
                (stream.chunk_index_keys, (c2, vd, lpad, k)),
            ]
            for v in (4, 8, 16, 24):
                todo.append((kernels.probe_cascade2_clean,
                             (planes_s, c2, ln, lpad, k, t, v, wmax)))
                todo.append((kernels.probe_cascade2_packed,
                             (planes_s, c2, vd, lpad, k, t, v, wmax)))
            for fn, args in todo:
                t0 = time.time()
                try:
                    _lower_compile(fn, *args)
                    n += 1
                    if verbose:
                        print(f"  compiled {fn.__name__} k={k} b={b} "
                              f"({time.time()-t0:.1f}s)", flush=True)
                except Exception as exc:  # pragma: no cover
                    print(f"  skip {fn.__name__} k={k} b={b}: {exc!r}",
                          file=sys.stderr)
        # stream probe shapes depend on the index size via the join chunk;
        # warm the common low-fill chunk (2048) at the stream batch size
        b = 65536
        c2 = jax.ShapeDtypeStruct((b, lpad // 16), jnp.uint32)
        vd = jax.ShapeDtypeStruct((b, lpad // 32), jnp.uint32)
        ln = jax.ShapeDtypeStruct((b,), jnp.int32)
        ri = 8 * 2048  # representative padded join-plane rows
        ika = jax.ShapeDtypeStruct((ri, 128), jnp.uint32)
        mi = jax.ShapeDtypeStruct((), jnp.int32)
        try:
            if k <= 32:
                _lower_compile(stream.probe_cascade2_stream,
                               ika, ika, mi, c2, ln, lpad, k, t, wmax, 2048)
            else:
                _lower_compile(stream.probe_cascade2_stream,
                               ika, ika, mi, c2, ln, lpad, k, t, wmax, 2048,
                               ihib=ika)
            n += 1
            if verbose:
                print(f"  compiled probe_cascade2_stream k={k}", flush=True)
        except Exception as exc:  # pragma: no cover
            print(f"  skip stream k={k}: {exc!r}", file=sys.stderr)
    if verbose:
        print(f"prewarm: {n} kernels compiled into the persistent cache "
              f"in {time.time()-t_all:.0f}s", flush=True)
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-k", type=int, action="append", default=None,
                   help="k values to warm (default: 32 and 33)")
    p.add_argument("--quick", action="store_true",
                   help="only the 65536-read bucket")
    args = p.parse_args(argv)
    ks = tuple(args.k) if args.k else (32, 33)
    batches = (65536,) if args.quick else (2048, 16384, 65536)
    prewarm(ks=ks, batches=batches)
    return 0


if __name__ == "__main__":
    sys.exit(main())
