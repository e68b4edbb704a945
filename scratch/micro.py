"""TPU primitive microbenchmarks for the round-2 probe redesign.

Measures, on the real device:
  1. random single-element gather rate into big HBM planes (the round-1 wall)
  2. gather with sorted indices / small operands
  3. lax.sort throughput (1 and 2 operands) at several sizes
  4. scatter-add rate
  5. Pallas in-kernel gather variants (flat take, per-lane take_along_axis)
  6. lane-shuffle gather (128-entry table)
All timings use value-fetch barriers (device_get of a small slice) since
block_until_ready is unreliable over the tunneled platform.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, *args, reps=3, name=""):
    # warmup / compile
    try:
        r = fn(*args)
        fetch(r)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        fetch(r)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)

    # ---------------- 1. gather walls ----------------
    PW = 1 << 27  # 512MB plane as uint32 words
    planes = jnp.zeros(PW, dtype=jnp.uint32)
    for M in (1 << 22, 1 << 24):
        idx = jnp.asarray(rng.integers(0, PW, size=M, dtype=np.int64).astype(np.int32))
        f = jax.jit(lambda p, i: jnp.take(p, i, axis=0).sum())
        dt = bench(f, planes, idx, name=f"take_{M}")
        if dt: print(f"take 1-elem random M={M>>20}M from 512MB: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)
        sidx = jnp.sort(idx)
        dt = bench(f, planes, sidx, name=f"take_sorted_{M}")
        if dt: print(f"take 1-elem SORTED M={M>>20}M from 512MB: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    # small operand gather (4MB)
    small = jnp.zeros(1 << 20, dtype=jnp.uint32)
    M = 1 << 24
    idx_s = jnp.asarray(rng.integers(0, 1 << 20, size=M, dtype=np.int64).astype(np.int32))
    f = jax.jit(lambda p, i: jnp.take(p, i, axis=0).sum())
    dt = bench(f, small, idx_s, name="take_small")
    if dt: print(f"take 1-elem random M=16M from 4MB operand: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    # row gather [R,128]
    R = 1 << 20
    tab2 = jnp.zeros((R, 128), dtype=jnp.uint32)  # 512MB
    Mr = 1 << 21
    ridx = jnp.asarray(rng.integers(0, R, size=Mr, dtype=np.int64).astype(np.int32))
    f = jax.jit(lambda p, i: jnp.take(p, i, axis=0).sum())
    dt = bench(f, tab2, ridx, name="take_rows")
    if dt: print(f"take 512B-rows M=2M from 512MB: {dt*1e3:.1f} ms = {Mr/dt/1e6:.1f} Mrows/s = {Mr*512/dt/1e9:.0f} GB/s", flush=True)

    # ---------------- 2. sort ----------------
    for M in (1 << 22, 1 << 24, 1 << 25):
        keys = jnp.asarray(rng.integers(0, 2**32, size=M, dtype=np.uint64).astype(np.uint32))
        pay = jnp.arange(M, dtype=jnp.uint32)
        f1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
        dt = bench(f1, keys, name=f"sort1_{M}")
        if dt: print(f"sort 1-op M={M>>20}M u32: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)
        f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[1])
        dt = bench(f2, keys, pay, name=f"sort2_{M}")
        if dt: print(f"sort 2-op M={M>>20}M u32: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    # sort nearly-sorted (payload backsort case: keys are a permutation)
    M = 1 << 24
    keys = jnp.asarray(rng.permutation(M).astype(np.uint32))
    f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[1])
    pay = jnp.arange(M, dtype=jnp.uint32)
    dt = bench(f2, keys, pay, name="sort_perm")
    if dt: print(f"sort 2-op permutation M=16M: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    # ---------------- 3. scatter ----------------
    M = 1 << 22
    sidx = jnp.asarray(rng.integers(0, PW, size=M, dtype=np.int64).astype(np.int32))
    upd = jnp.ones(M, dtype=jnp.uint32)
    f = jax.jit(lambda p, i, u: p.at[i].add(u, mode="drop").ravel()[:1])
    dt = bench(f, planes, sidx, upd, name="scatter")
    if dt: print(f"scatter-add M=4M into 512MB: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    # ---------------- 4. associative_scan / searchsorted ----------------
    M = 1 << 24
    keys = jnp.asarray(rng.integers(0, 2**32, size=M, dtype=np.uint64).astype(np.uint32))
    f = jax.jit(lambda k: jax.lax.associative_scan(jnp.maximum, k)[:1])
    dt = bench(f, keys, name="ascan")
    if dt: print(f"associative_scan max M=16M: {dt*1e3:.1f} ms = {M/dt/1e6:.1f} M/s", flush=True)

    T = 1 << 23
    table = jnp.sort(jnp.asarray(rng.integers(0, 2**32, size=T, dtype=np.uint64).astype(np.uint32)))
    Mq = 1 << 22
    q = jnp.asarray(rng.integers(0, 2**32, size=Mq, dtype=np.uint64).astype(np.uint32))
    f = jax.jit(lambda t, q: jnp.searchsorted(t, q).sum())
    dt = bench(f, table, q, name="searchsorted")
    if dt: print(f"searchsorted 4M into 8M: {dt*1e3:.1f} ms = {Mq/dt/1e6:.1f} M/s", flush=True)

    # ---------------- 5. pallas in-VMEM gather variants ----------------
    # (a) flat take from a VMEM table
    TW = 1 << 20  # 4MB table
    table_small = jnp.zeros(TW, dtype=jnp.uint32)
    B, LN = 8192, 128  # 1M queries
    qidx = jnp.asarray(rng.integers(0, TW, size=(B, LN), dtype=np.int64).astype(np.int32))

    def k_flat(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def pallas_flat(tab, idx):
        return pl.pallas_call(
            k_flat,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    f = jax.jit(pallas_flat)
    dt = bench(f, table_small, qidx, name="pallas_flat_take")
    if dt: print(f"pallas flat take 1M from 4MB VMEM: {dt*1e3:.2f} ms = {B*LN/dt/1e6:.1f} M/s", flush=True)

    # (b) per-lane take_along_axis (dynamic_gather over sublanes)
    Rr = 8192
    tabl = jnp.zeros((Rr, 128), dtype=jnp.uint32)  # 4MB
    ridx2 = jnp.asarray(rng.integers(0, Rr, size=(B, LN), dtype=np.int64).astype(np.int32))

    def k_lane(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def pallas_lane(tab, idx):
        return pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    f = jax.jit(pallas_lane)
    dt = bench(f, tabl, ridx2, name="pallas_lane_taa")
    if dt: print(f"pallas take_along_axis axis0 [8192,128] tab, 1M idx: {dt*1e3:.2f} ms = {B*LN/dt/1e6:.1f} M/s", flush=True)

    # (b2) bigger per-lane table
    Rr2 = 1 << 16
    tabl2 = jnp.zeros((Rr2, 128), dtype=jnp.uint32)  # 32MB -- may not fit VMEM
    ridx3 = jnp.asarray(rng.integers(0, Rr2, size=(B, LN), dtype=np.int64).astype(np.int32))
    f = jax.jit(pallas_lane)
    dt = bench(f, tabl2, ridx3, name="pallas_lane_taa_64k")
    if dt: print(f"pallas take_along_axis axis0 [65536,128] tab: {dt*1e3:.2f} ms = {B*LN/dt/1e6:.1f} M/s", flush=True)

    # (c) lane-shuffle: 128-entry table gather, axis=-1 form
    tab128 = jnp.zeros((8, 128), dtype=jnp.uint32)
    lidx = jnp.asarray(rng.integers(0, 128, size=(B, LN), dtype=np.int64).astype(np.int32))

    def k_l128(tab_ref, idx_ref, out_ref):
        t = tab_ref[0, :]  # [128]
        out_ref[:] = jnp.take(t, idx_ref[:], axis=0)

    def pallas_l128(tab, idx):
        return pl.pallas_call(
            k_l128,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    f = jax.jit(pallas_l128)
    dt = bench(f, tab128, lidx, name="pallas_l128")
    if dt: print(f"pallas 128-entry lane take 1M: {dt*1e3:.2f} ms = {B*LN/dt/1e6:.1f} M/s", flush=True)

    # (d) XLA-level take_along_axis per-lane (outside pallas)
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0).sum())
    dt = bench(f, tabl, ridx2, name="xla_taa")
    if dt: print(f"XLA take_along_axis axis0 [8192,128]: {dt*1e3:.2f} ms = {B*LN/dt/1e6:.1f} M/s", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
