"""Round-4 lab notes: can the query sort/unsort amortize across S resident
indexes, and what join (chunk, ki) geometry is fastest at bench scale?

Run on the tunneled TPU from /root/repo:  python scratch/multi_probe.py

Measures, per 131072-read batch (both strands, 20.7M window keys):
  1. join_membership time for (chunk, ki) in a sweep (single index);
  2. the amortized pipeline: ONE 3-operand query sort, S joins against S
     different 7.9M-entry indexes, ONE 2-operand packed unsort carrying all
     S verdict streams, batched greedy over [S*B] rows;
  3. per-pair effective reads/s vs the round-3 single-pair 360 ms budget.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from commet_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from commet_tpu.core import kernels, stream

K, T, L = 32, 2, 110
N_IDX, N_QRY, S = 100_000, 131_072, 8
W = L - K + 1


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def healthy(tries=6):
    x = jnp.zeros(1024, jnp.uint32)
    float(x.sum())
    for i in range(tries):
        t0 = time.time()
        float((x + np.uint32(i)).sum())
        if time.time() - t0 < 0.35:
            return
        log(f"tunnel slow; wait 60s ({i+1}/{tries})")
        time.sleep(60)


def fetch(x):
    return np.asarray(x[:1])


log(f"device: {jax.devices()[0]}")
rng = np.random.default_rng(7)
lpad = -(-L // 32) * 32

# ---- build S stream indexes (planeless) ----
idxs = []
for s in range(S):
    codes = rng.integers(0, 4, size=(N_IDX, L), dtype=np.int8)
    codes = np.pad(codes, ((0, 0), (0, lpad - L)), constant_values=4)
    c2, v = kernels.pack_codes_np(codes.astype(np.uint8))
    kk, kb, _h, ff, cc = stream.chunk_index_keys(
        jnp.asarray(c2), jnp.asarray(v), lpad, K)
    ika, ikb, _hib, mi = stream.finalize_index_keys(
        [kk], [kb], None, [ff], [int(cc)])
    fetch(ika)
    idxs.append((ika, ikb, mi))
    log(f"index {s} built mi={int(mi)}")
mi0 = int(idxs[0][2])

# ---- query batch: half positives from index 0 ----
qry = rng.integers(0, 4, size=(N_QRY, L), dtype=np.int8)
qry = np.pad(qry, ((0, 0), (0, lpad - L)), constant_values=4)
qc2 = kernels.pack_codes2_np(qry.astype(np.uint8))
lens = np.full(N_QRY, L, dtype=np.int32)
qc2d = jnp.asarray(qc2)
lensd = jnp.asarray(lens)


@jax.jit
def make_sorted(codes2, lengths):
    codes = kernels.unpack_codes_clean(codes2, lengths, lpad)
    wk = kernels.window_keys(codes, K, "both", W)
    ok = wk["ok"]
    b, w = ok.shape
    qa = jnp.where(ok, wk["fa_lo"], 0)
    ra = jnp.where(ok, wk["ra_lo"], 0)
    qb = jnp.where(ok, wk["fb_lo"], 0)
    rb = jnp.where(ok, wk["rb_lo"], 0)
    q = jnp.stack([qa, ra], axis=1).reshape(-1)
    q2 = jnp.stack([qb, rb], axis=1).reshape(-1)
    return q, q2, ok


m = N_QRY * 2 * W


def pad_to(x, mpad, fill):
    return jnp.concatenate([x, jnp.full((mpad - m,), fill, jnp.uint32)])


def timed(fn, reps=3, label=""):
    fetch(fn())  # warm/compile
    healthy(tries=2)
    best = 9e9
    for _ in range(reps):
        t0 = time.time()
        fetch(fn())
        best = min(best, time.time() - t0)
    log(f"{label}: {best*1000:.1f} ms")
    return best


# ---- 1. join sweep ----
q, q2, ok = make_sorted(qc2d, lensd)
fetch(q)
results = {(2048, 8): 0.0942}
for chunk in ((2048, 4096, 8192) if "--sweep" in sys.argv else ()):
    mpad = -(-m // chunk) * chunk
    pay = jnp.arange(mpad, dtype=jnp.uint32)

    @jax.jit
    def sort3(q, q2, pay=pay, mpad=mpad):
        ops = [pad_to(q, mpad, stream.SENTINEL), pad_to(q2, mpad, stream.SENTINEL)]
        return jax.lax.sort(ops + [pay], num_keys=1)

    sk, skb, spay = sort3(q, q2)
    fetch(sk)
    for ki in (8, 16):
        label = f"join chunk={chunk} ki={ki}"
        try:
            ika, ikb, mi = idxs[0]
            fn = lambda: stream.join_membership(ika, ikb, mi, sk, skb,
                                                chunk, ki)
            results[(chunk, ki)] = timed(fn, 3, label)
        except Exception as e:
            log(f"{label}: FAILED {e!r}")

best_chunk, best_ki = min(results, key=results.get)
log(f"best join geometry: chunk={best_chunk} ki={best_ki} "
    f"({results[(best_chunk, best_ki)]*1000:.1f} ms)")

# ---- 2. amortized multi-index pipeline ----
chunk, ki = best_chunk, best_ki
mpad = -(-m // chunk) * chunk
pay = jnp.arange(mpad, dtype=jnp.uint32)


@jax.jit
def qsort(codes2, lengths):
    qq, qq2, ok = make_sorted(codes2, lengths)
    ops = [pad_to(qq, mpad, stream.SENTINEL),
           pad_to(qq2, mpad, stream.SENTINEL)]
    return jax.lax.sort(ops + [pay], num_keys=1) + (ok,)


def joins(sk, skb, n):
    return [stream.join_membership(idxs[s][0], idxs[s][1], idxs[s][2],
                                   sk, skb, chunk, ki) for s in range(n)]


@jax.jit
def unsort_multi(spay, mems):
    packed = jnp.zeros(mpad, jnp.uint32)
    for s, mem in enumerate(mems):
        packed = packed | (mem.astype(jnp.uint32) << (2 * s))
    _, vp = jax.lax.sort([spay, packed], num_keys=1)
    return vp[:m]


import functools


@functools.partial(jax.jit, static_argnames=("n_s",))
def verdicts_batched(vp, ok, n_s):
    mem = vp.reshape(1, N_QRY, 2, W)
    mems = jnp.concatenate(
        [(mem >> (2 * s)) & 3 for s in range(n_s)], axis=0)  # [S, B, 2, W]
    sb = n_s * N_QRY
    okx = jnp.broadcast_to(ok[None], (n_s, N_QRY, W)).reshape(sb, W)
    tagged = jnp.zeros(sb, bool)
    untagged = None
    for st in range(2):
        memf = mems[:, :, st, :].reshape(sb, W)
        conf = (memf == stream.CONF) & okx
        maybe = ((memf == stream.CAND) | (memf == stream.RESIDUAL)) & okx
        tag_s = kernels._greedy(conf, K, T) >= T
        untag_s = kernels._greedy(conf | maybe, K, T) < T
        tagged = tagged | tag_s
        untagged = untag_s if untagged is None else (untagged & untag_s)
    v = jnp.where(tagged, jnp.int8(kernels.VERDICT_TAGGED),
                  jnp.where(untagged, jnp.int8(kernels.VERDICT_UNTAGGED),
                            jnp.int8(kernels.VERDICT_AMBIG)))
    return v.reshape(n_s, N_QRY)


for n_s in (1, 4, 8):
    def full(n_s=n_s):
        sk, skb, spay, ok = qsort(qc2d, lensd)
        mems = joins(sk, skb, n_s)
        vp = unsort_multi(spay, mems)
        return verdicts_batched(vp, ok, n_s)

    best = timed(full, 3, f"amortized pipeline S={n_s}")
    log(f"  -> per-pair {best/n_s*1000:.1f} ms = "
        f"{N_QRY/(best/n_s):,.0f} reads/s/pair")

# ---- phase timings at the best geometry ----
sk, skb, spay, ok = qsort(qc2d, lensd)
fetch(sk)
timed(lambda: qsort(qc2d, lensd)[0], 3, "qsort (3-op sort incl window keys)")
mems = joins(sk, skb, 8)
fetch(mems[0])
timed(lambda: unsort_multi(spay, mems), 3, "unsort 2-op packed (8 sets)")
vp = unsort_multi(spay, mems)
fetch(vp)
timed(lambda: verdicts_batched(vp, ok, 8), 3, "greedy verdicts (8 sets)")

# sanity: S=1 verdicts agree with the existing single-index probe
ref = stream.probe_cascade2_stream(
    idxs[0][0], idxs[0][1], idxs[0][2], qc2d, lensd, lpad, K, T, W,
    stream.pick_chunk(m, mi0))
sk, skb, spay, ok = qsort(qc2d, lensd)
got = verdicts_batched(unsort_multi(spay, joins(sk, skb, 1)), ok, 1)[0]
agree = (np.asarray(ref) == np.asarray(got)).mean()
log(f"S=1 verdict agreement with probe_cascade2_stream: {agree:.6f} "
    f"(chunk geometry may differ -> AMBIG rate differs slightly)")


# ---- 3. production path (stream.probe_multi_stream_clean, greedy_ge) ----
for n_s in (1, 8):
    ikas = tuple(idxs[s][0] for s in range(n_s))
    ikbs = tuple(idxs[s][1] for s in range(n_s))
    mis = tuple(idxs[s][2] for s in range(n_s))

    def prod(n_s=n_s, ikas=ikas, ikbs=ikbs, mis=mis):
        return stream.probe_multi_stream_clean(
            ikas, ikbs, mis, qc2d, lensd, lpad, K, T, W, chunk, ki)

    best = timed(prod, 3, f"production probe_multi S={n_s}")
    log(f"  -> per-pair {best/n_s*1000:.1f} ms = "
        f"{N_QRY/(best/n_s):,.0f} reads/s/pair")
v = np.asarray(prod())
log(f"verdict counts S=8 slot0: tagged={int((v[0]==2).sum())} "
    f"untag={int((v[0]==0).sum())} ambig={int((v[0]==1).sum())}")
