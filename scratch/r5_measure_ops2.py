"""Round-5 measurements, part 2: gather/scatter rates (random vs sorted)
and the current build-batch breakdown. Run after r5_measure_ops.py (whose
2^30 sort OOM leaked buffers and killed these sections)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from commet_tpu.config import enable_compile_cache
enable_compile_cache()

OUT = "/tmp/r5_measure2.json"
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


def timed(fn, *args, reps=3):
    best = 1e9
    for _ in range(reps):
        wait_tunnel(tries=2)
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1] if leaf.ndim else leaf)
        best = min(best, time.time() - t0)
    return best


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    assert dev.platform != "cpu"
    key = jax.random.PRNGKey(0)

    # 2-op sort rate (one size is enough; 1-op scaling measured already)
    n = 1 << 26
    fn = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=1))
    x = jax.random.bits(key, (n,), jnp.uint32)
    y = jax.random.bits(jax.random.PRNGKey(1), (n,), jnp.uint32)
    np.asarray(x[:1])
    c = fn.lower(x, y).compile()
    dt = timed(c, x, y)
    record("sort2_26", {"n": n, "s": round(dt, 4),
                        "ms_per_M": round(dt * 1e3 / (n / 1e6), 3)})
    # 3-op (the stream probe's sort shape)
    fn3 = jax.jit(lambda x, y, z: jax.lax.sort([x, y, z], num_keys=1))
    z = jnp.arange(n, dtype=jnp.uint32)
    c3 = fn3.lower(x, y, z).compile()
    dt = timed(c3, x, y, z)
    record("sort3_26", {"n": n, "s": round(dt, 4),
                        "ms_per_M": round(dt * 1e3 / (n / 1e6), 3)})
    del x, y, z

    # gather: random vs sorted, from a 1 GiB plane
    W = 1 << 28
    plane = jax.random.bits(key, (W,), jnp.uint32)
    for nidx in (1 << 21, 1 << 24):
        idx = jax.random.randint(jax.random.PRNGKey(2), (nidx,), 0, W,
                                 dtype=jnp.int32)
        idx_sorted = jnp.sort(idx)
        np.asarray(idx_sorted[:1])
        g = jax.jit(lambda p, i: jnp.take(p, i, axis=0).sum())
        cg = g.lower(plane, idx).compile()
        dt_r = timed(cg, plane, idx)
        dt_s = timed(cg, plane, idx_sorted)
        record(f"gather_{nidx}", {
            "random_s": round(dt_r, 4), "sorted_s": round(dt_s, 4),
            "random_M_per_s": round(nidx / dt_r / 1e6, 1),
            "sorted_M_per_s": round(nidx / dt_s / 1e6, 1)})
        del idx, idx_sorted

    # scatter variants into the 1 GiB plane
    for nidx in (1 << 21, 1 << 24, 1 << 26):
        idx = jax.random.randint(jax.random.PRNGKey(3), (nidx,), 0, W,
                                 dtype=jnp.int32)
        idx_sorted = jnp.sort(idx)
        vals = jax.random.bits(jax.random.PRNGKey(4), (nidx,), jnp.uint32)
        np.asarray(idx_sorted[:1])

        def sc_add(p, i, v):
            return p.at[i].add(v, mode="drop", unique_indices=False)

        def sc_set(p, i, v):
            return p.at[i].set(v, mode="drop", unique_indices=True)

        add_c = jax.jit(sc_add, donate_argnums=(0,)).lower(
            plane, idx, vals).compile()
        set_c = jax.jit(sc_set, donate_argnums=(0,)).lower(
            plane, idx, vals).compile()

        def run(cfn, i):
            p = jnp.zeros(W, jnp.uint32)
            np.asarray(p[:1])
            wait_tunnel(tries=2)
            t0 = time.time()
            p = cfn(p, i, vals)
            np.asarray(p[:1])
            return time.time() - t0

        r = {}
        r["add_random_s"] = round(min(run(add_c, idx) for _ in range(2)), 4)
        r["add_sorted_s"] = round(min(run(add_c, idx_sorted)
                                      for _ in range(2)), 4)
        r["set_sorted_s"] = round(min(run(set_c, idx_sorted)
                                      for _ in range(2)), 4)
        for kk in list(r):
            r[kk.replace("_s", "_M_per_s")] = round(nidx / r[kk] / 1e6, 1)
        record(f"scatter_{nidx}", r)
        del idx, idx_sorted, vals
    del plane

    # current per-batch build at k=33: total + component costs
    from commet_tpu.core import kernels
    B, L = 16384, 128
    k = 33
    codes = np.random.default_rng(5).integers(0, 4, (B, L), dtype=np.uint8)
    c2_np, vd_np = kernels.pack_codes_np(codes)
    c2, vd = jnp.asarray(c2_np), jnp.asarray(vd_np)

    bc = jax.jit(kernels.build_chunk_packed.__wrapped__,
                 static_argnames=("length", "k"),
                 donate_argnums=(0,)).lower(
        kernels.alloc_planes(k), c2, vd, L, k).compile()

    def run_build():
        p = kernels.alloc_planes(k)
        np.asarray(p[:1])
        wait_tunnel(tries=2)
        t0 = time.time()
        p = bc(p, c2, vd)
        np.asarray(p[:1])
        return time.time() - t0
    record("build_batch_16384_k33_s",
           round(min(run_build() for _ in range(3)), 4))

    def keys_only(c2, vd):
        cc = kernels.unpack_codes(c2, vd, L)
        wk = kernels.window_keys(cc, k, "fwd")
        return (wk["fa_lo"].sum() + wk["fb_lo"].sum() + wk["fa_hi"].sum()
                + wk["fb_hi"].sum())
    ck = jax.jit(keys_only).lower(c2, vd).compile()
    record("build_keys_only_s", round(timed(ck, c2, vd), 4))

    nkeys = B * (L - k + 1)
    word = jax.random.randint(jax.random.PRNGKey(6), (nkeys,), 0, W
                              ).astype(jnp.uint32)
    mask = jax.random.bits(jax.random.PRNGKey(7), (nkeys,), jnp.uint32)
    s2 = jax.jit(lambda w, m: jax.lax.sort((w, m), num_keys=1)).lower(
        word, mask).compile()
    record("build_plane_sort2_s", round(timed(s2, word, mask), 4))

    from commet_tpu.core.kernels import _segmented_or_last
    so = jax.jit(_segmented_or_last).lower(word, mask).compile()
    record("build_seg_or_s", round(timed(so, word, mask), 4))

    planes4 = jnp.zeros(4 * kernels.plane_words(k), jnp.uint32)
    np.asarray(planes4[:1])
    gi = jax.jit(lambda p, i: jnp.take(p, i, axis=0).sum()).lower(
        planes4, word.astype(jnp.int32)).compile()
    record("build_gather_existing_s",
           round(timed(gi, planes4, word.astype(jnp.int32)), 4))
    del planes4

    sa = jax.jit(lambda p, i, v: p.at[i].add(v, mode="drop"),
                 donate_argnums=(0,)).lower(
        jnp.zeros(4 * kernels.plane_words(k), jnp.uint32),
        word.astype(jnp.int32), mask).compile()

    def run_sc():
        p = jnp.zeros(4 * kernels.plane_words(k), jnp.uint32)
        np.asarray(p[:1])
        wait_tunnel(tries=2)
        t0 = time.time()
        p = sa(p, word.astype(jnp.int32), mask)
        np.asarray(p[:1])
        return time.time() - t0
    record("build_scatter_add_s", round(min(run_sc() for _ in range(3)), 4))

    log("DONE")


if __name__ == "__main__":
    main()
