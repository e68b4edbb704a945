"""TPU-side micro-measurements: Mosaic compile of the join kernel, sort
throughput (the stream path's dominant cost), and join kernel rate."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from commet_tpu.config import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

from commet_tpu.core import stream

# ---- 1. compiled self-check (tiny): does Mosaic accept the kernel?
keys = jnp.arange(0, 1024, 2, dtype=jnp.uint32)
flags = jnp.zeros_like(keys)
ik2d, mi = stream.finalize_index_keys([keys], [flags], [512], ki=8)
q = jnp.arange(512, dtype=jnp.uint32)
t0 = time.time()
got = np.asarray(stream.join_membership(ik2d, mi, q, chunk=512, ki=8))
print(f"tiny compiled join: {time.time()-t0:.1f}s, "
      f"verdicts {np.bincount(got, minlength=3)}", flush=True)
want = (np.arange(512) % 2 == 0)
dec = got != 2
assert (got[dec] == want[dec].astype(np.int8)).all(), "wrong verdicts!"
print("tiny join verdicts correct", flush=True)

# ---- 2. sort throughput at stream scale
rng = np.random.default_rng(0)
MI = 7_900_000          # index keys (100k reads x 79 windows)
MQ = 20_709_376         # query keys (131072 reads x 2 x 79), mult of 2048
ikeys = np.sort(rng.integers(0, 2**32, size=MI, dtype=np.uint32))
qkeys = rng.integers(0, 2**32, size=MQ, dtype=np.uint32)
qd = jnp.asarray(qkeys)

def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 9e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        # value-fetch barrier (block_until_ready unreliable through tunnel)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return out, best

pay = jnp.arange(MQ, dtype=jnp.uint32)

@jax.jit
def sort1(q):
    return jax.lax.sort([q], num_keys=1)[0]

@jax.jit
def sort2(q, p):
    return jax.lax.sort([q, p], num_keys=1)

@jax.jit
def sort3(q, p):
    return jax.lax.sort([q, q, p], num_keys=1)

_, t_s1 = timed("sort 20.7M x1 u32", sort1, qd)
_, t_s2 = timed("sort 20.7M x2 u32", sort2, qd, pay)
_, t_s3 = timed("sort 20.7M x3 u32", sort3, qd, pay)

# ---- 3. join kernel at real scale (sorted queries, ki=16)
ik = np.full((-(-MI // 128) // 32 * 32 + 32, 128), 0xFFFFFFFF, np.uint32)
flat = ik.reshape(-1)
flat[:MI] = ikeys
ik2d_big = jnp.asarray(ik)
mi_big = jnp.asarray(MI, jnp.int32)
qs_sorted = jnp.sort(qd)
jax.block_until_ready(qs_sorted)
chunk = stream.pick_chunk(MQ, MI)
print(f"pick_chunk -> {chunk}", flush=True)
_, t_join = timed("join 20.7M vs 7.9M (compiled)",
                  lambda: stream.join_membership(ik2d_big, mi_big, qs_sorted,
                                                 chunk, 16))
out = np.asarray(stream.join_membership(ik2d_big, mi_big, qs_sorted, chunk, 16))
print("verdict counts:", np.bincount(out, minlength=3),
      f"residual frac {np.mean(out==2):.4f}", flush=True)

# spot-check correctness vs np.isin on a sample
samp = rng.integers(0, MQ, size=20000)
qv = np.asarray(qs_sorted)[samp]
member = np.isin(qv, ikeys)
dec = out[samp] != 2
assert (out[samp][dec] == member[dec].astype(np.int8)).all(), "join wrong!"
print("join verdicts correct on 20k sample", flush=True)
print(f"summary: sort1 {t_s1*1000:.0f}ms sort2 {t_s2*1000:.0f}ms "
      f"sort3 {t_s3*1000:.0f}ms join {t_join*1000:.0f}ms", flush=True)
