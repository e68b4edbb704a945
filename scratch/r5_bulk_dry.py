"""Bulk-build dry run on the TPU: (1) plane parity vs the per-batch build
at k=30 scale, (2) timed full k=33 build at the reference-default 1e9-kmer
partition scale with synthetic device-generated batches (no host upload --
upload overlap is a known separate ~15 s, hidden behind device work by the
prefetch pipeline in the real engine loop)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from commet_tpu.config import enable_compile_cache
enable_compile_cache()

from commet_tpu.core import kernels, stream as _stream

OUT = "/tmp/r5_bulk_dry.json"
RESULTS = {}


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(key, val):
    RESULTS[key] = val
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"{key} = {val}")


def wait_tunnel(tries=8, threshold=0.35):
    x = jnp.zeros(1024, jnp.uint32)
    float(x.sum())
    for i in range(tries):
        t0 = time.time()
        float((x + np.uint32(i)).sum())
        if time.time() - t0 < threshold:
            return
        log(f"tunnel slow; wait 60s ({i+1}/{tries})")
        time.sleep(60)


def bulk_build(k, batches, lpad, cap, planes=None):
    """The engine's _build_planes_bulk loop on pre-made device batches.
    Returns (planes, keygen_s, flush_s)."""
    w = kernels.plane_words(k)
    wide = k > 32
    if planes is None:
        planes = jnp.zeros(4 * w, jnp.uint32)
    acc, slots = [], 0
    t_key = t_flush = 0.0

    def flush():
        nonlocal acc, slots, planes, t_flush
        if not acc:
            return
        t0 = time.time()
        if len(acc) == 1:
            ka, kb, hib, fl = acc[0]
        else:
            ka = jnp.concatenate([a[0] for a in acc])
            kb = jnp.concatenate([a[1] for a in acc])
            hib = jnp.concatenate([a[2] for a in acc]) if wide else None
            fl = jnp.concatenate([a[3] for a in acc])
        acc, slots = [], 0
        for p in range(4):
            word, om = kernels.bulk_plane_sorted(
                ka, kb, hib if wide else fl, fl, k, p, wide)
            scratch = kernels.bulk_scatter_set(
                jnp.zeros(w, jnp.uint32), word, om)
            planes = kernels.bulk_or_plane(planes, scratch, p * w, w)
        np.asarray(planes[:1])
        t_flush += time.time() - t0

    for c2, vd in batches:
        t0 = time.time()
        ka, kb, hib, fl, _ = _stream.chunk_index_keys(c2, vd, lpad, k)
        acc.append((ka, kb, hib, fl))
        slots += int(ka.size)
        if slots >= cap:
            np.asarray(ka[:1])
            t_key += time.time() - t0
            flush()
        else:
            t_key += time.time() - t0
    flush()
    return planes, t_key, t_flush


def perbatch_build(k, batches, lpad):
    planes = jnp.zeros(4 * kernels.plane_words(k), jnp.uint32)
    t0 = time.time()
    for c2, vd in batches:
        planes = kernels.build_chunk_packed(planes, c2, vd, lpad, k)
    np.asarray(planes[:1])
    return planes, time.time() - t0


def make_batches(key, n_batches, B, lpad, full=True):
    """Random packed batches fully on device."""
    w16, w32 = lpad // 16, lpad // 32
    out = []
    for i in range(n_batches):
        c2 = jax.random.bits(jax.random.fold_in(key, i), (B, w16),
                             jnp.uint32)
        vd = jnp.full((B, w32), np.uint32(0xFFFFFFFF))
        out.append((c2, vd))
    jax.block_until_ready(out[-1][0])
    return out


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    assert dev.platform != "cpu"
    key = jax.random.PRNGKey(0)

    # ---- parity + timing at k=30 realfill scale (125M kmers) ----
    k, lpad, B = 30, 128, 16384
    nb = 20  # 20 x 16384 x 99 windows ~ 32M kmers (fast check)
    batches = make_batches(key, nb, B, lpad)
    wait_tunnel()
    p_ref, dt_ref = perbatch_build(k, batches, lpad)
    wait_tunnel()
    p_bulk, t_key, t_flush = bulk_build(k, batches, lpad, cap=1 << 27)
    same = bool((np.asarray(p_ref) == np.asarray(p_bulk)).all())
    record("k30_parity", {"same": same, "perbatch_s": round(dt_ref, 2),
                          "bulk_keygen_s": round(t_key, 2),
                          "bulk_flush_s": round(t_flush, 2)})
    assert same, "bulk planes differ from per-batch planes on TPU!"
    del p_ref, p_bulk, batches

    # ---- timed k=33 full-scale build: 1e9 kmers ----
    k, lpad, B = 33, 128, 65536
    W = lpad - k + 1  # 96
    nb = int(1e9) // (B * W) + 1  # ~159 batches
    log(f"k33 scale: {nb} batches x {B} x {W} = {nb*B*W/1e9:.2f}G kmers")
    # generate in flight to avoid holding 159 batches (~7.6 GB) + planes:
    # feed the build loop lazily
    w16, w32 = lpad // 16, lpad // 32
    vd_full = jnp.full((B, w32), np.uint32(0xFFFFFFFF))

    def gen():
        for i in range(nb):
            c2 = jax.random.bits(jax.random.fold_in(key, 1000 + i),
                                 (B, w16), jnp.uint32)
            yield c2, vd_full

    wait_tunnel()
    t0 = time.time()
    planes, t_key, t_flush = bulk_build(k, gen(), lpad, cap=1 << 27)
    total = time.time() - t0
    fill = float(np.asarray(
        jax.jit(lambda p: jnp.sum(
            jax.lax.population_count(p[: kernels.plane_words(33)])
        ))(planes))) / 2.0**33
    record("k33_bulk_build", {
        "total_s": round(total, 1), "keygen_s": round(t_key, 1),
        "flush_s": round(t_flush, 1), "kmers_G": round(nb * B * W / 1e9, 3),
        "planeA_fill": round(fill, 4)})
    log("DONE")


if __name__ == "__main__":
    main()
