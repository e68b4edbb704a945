"""Round-3 design probes: scatter rate (unsort-free greedy for t=2),
join-kernel variants (row skipping, window sizes), narrow-payload sorts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from commet_tpu.config import enable_compile_cache
enable_compile_cache()

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from commet_tpu.core import stream

print("device:", jax.devices()[0], flush=True)

rng = np.random.default_rng(0)
MI = 7_900_000
MQ = 20_709_376
SLOTS = 262_144  # B*2 read-strand slots

ikeys = np.sort(rng.integers(0, 2**32, size=MI, dtype=np.uint32))
qkeys = rng.integers(0, 2**32, size=MQ, dtype=np.uint32)
qd = jnp.asarray(qkeys)
qs_sorted = jnp.sort(qd)
jax.block_until_ready(qs_sorted)


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 9e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return out, best


# ---- scatter-min rate: 20.7M updates into 262k slots
rs_id = jnp.asarray(rng.integers(0, SLOTS, size=MQ, dtype=np.int32))
vals = jnp.asarray(rng.integers(0, 128, size=MQ, dtype=np.int32))


@jax.jit
def scat_min(rs, v):
    base = jnp.full((SLOTS,), 127, jnp.int32)
    return base.at[rs].min(v, mode="drop")


timed("scatter-min 20.7M -> 262k", scat_min, rs_id, vals)


# ---- segment-min via one more sort: sort by rs_id then segmented reduce
@jax.jit
def seg_min_sort(rs, v):
    rs2, v2 = jax.lax.sort([rs, v], num_keys=1)
    return rs2, v2


timed("sort-by-slot (i32,i32) 20.7M", seg_min_sort, rs_id, vals)

# ---- sort with int8 payload (narrower second operand)
pay8 = jnp.asarray(rng.integers(0, 3, size=MQ, dtype=np.int8))
pay32 = jnp.arange(MQ, dtype=jnp.uint32)


@jax.jit
def sort_u32_i8(q, p):
    return jax.lax.sort([q, p], num_keys=1)


timed("sort 20.7M (u32 key, i8 payload)", sort_u32_i8, qd, pay8)

# ---- half-size sorts (strand split economics)
qh = qd[: MQ // 2]
ph = pay32[: MQ // 2]


@jax.jit
def sort_half(q, p):
    return jax.lax.sort([q, p], num_keys=1)


timed("sort 10.35M x2 u32", sort_half, qh, ph)

# ---- join variants: ki=8 chunk=2048 vs default
ik = np.full(((-(-MI // 128) + 31) // 32 * 32 + 32, 128), 0xFFFFFFFF,
             np.uint32)
ik.reshape(-1)[:MI] = ikeys
ik2d = jnp.asarray(ik)
mi_big = jnp.asarray(MI, jnp.int32)

for ki, chunk in ((16, 4096), (8, 2048), (8, 4096), (16, 2048), (32, 8192)):
    try:
        timed(f"join ki={ki} chunk={chunk}",
              functools.partial(stream.join_membership, ik2d, mi_big,
                                qs_sorted, chunk, ki))
    except Exception as exc:
        print(f"join ki={ki} chunk={chunk}: FAILED {type(exc).__name__}",
              flush=True)
