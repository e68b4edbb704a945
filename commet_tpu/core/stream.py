"""Sorted-set membership streaming: the TPU-native replacement for the
reference's random-access Bloom probe (include/bloom_filter.h:124-131).

Why
---
The reference probes its bit-planes with one random byte load per k-mer per
plane; on TPU that lowers to gather descriptors and hits the measured
~45-65M descriptors/s wall (BENCH_NOTES.md). This module reformulates plane
membership as a *merge join of two sorted key sets*:

  - the index side is the sorted multiset of projection-key values fed into
    a plane (exactly the set of bits the reference's plane would contain --
    the reference maps each key injectively to one bit, so sorted-set
    membership == plane-bit membership, bit for bit);
  - the query side is sorted once per batch (XLA's TPU sort: ~5 ms/M keys),
    then a Pallas kernel streams aligned windows of the sorted index past
    each query chunk with sequential DMA (full HBM bandwidth, zero gather
    descriptors) and decides membership by vectorized equality compares.

Soundness: the kernel returns 0/1 only when the fetched index window
provably brackets the query value (coverage test); otherwise it returns the
sentinel 2 and the caller falls back to an exact path. All verdicts are
exact, so results stay bit-identical to the reference probe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.uint32(0xFFFFFFFF)
RESIDUAL = 2  # join verdict: window did not bracket the query -> fall back


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# The join kernel
# --------------------------------------------------------------------------

def _join_kernel(mi_ref, ih_ref, q_ref, w0_ref, w1_ref, out_ref, *, ki: int):
    """One grid step: decide membership of CHUNK sorted query keys against a
    2*ki x 128 window of the sorted index (rows ih*ki .. ih*ki+2ki-1).

    Soundness invariant (why 0/1 verdicts are exact): the flattened index is
    globally ascending with all valid entries in the prefix [0, mi). If a
    query q satisfies wmin <= q <= wmax (the masked min/max of the window's
    valid entries), then any occurrence of q outside the window would force
    an equal value at the window boundary -- i.e. q also occurs inside the
    window -- so in-window equality decides global membership. ih == 0 /
    covers_end extend coverage to the array ends."""
    g = pl.program_id(0)
    mi = mi_ref[0]
    ih = ih_ref[g]
    base = ih * (ki * 128)  # first flat index element of the window

    qk = q_ref[0]  # [1, C] uint32
    # order-preserving signed view (Mosaic has no unsigned reductions)
    bias = jnp.uint32(0x80000000)
    qs = (qk ^ bias).astype(jnp.int32)

    int_min = jnp.int32(-0x80000000)
    int_max = jnp.int32(0x7FFFFFFF)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ki, 128), 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (ki, 128), 1)
    lanet = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

    def minmax_half(ref, half):
        ws = (ref[:] ^ bias).astype(jnp.int32)  # [ki, 128]
        fp = base + (half * ki + rowi) * 128 + lanei
        v = fp < mi
        return (jnp.min(jnp.where(v, ws, int_max)),
                jnp.max(jnp.where(v, ws, int_min)))

    def scan_half(ref, half, acc):
        # ki is static: unroll (Mosaic cannot carry i1 vectors through
        # scf.for). Each row compares its 128 sorted entries against all C
        # queries as a 2D [128, C] equality; sum-reduce over the sublane
        # axis accumulates the per-query match count (cap 2*ki*128 << 2^31).
        start0 = base + half * (ki * 128)
        for r in range(ki):
            row = (ref[pl.ds(r, 1), :] ^ bias).astype(jnp.int32)  # [1, 128]
            rowt = row.reshape(128, 1)
            vrow = (start0 + r * 128 + lanet) < mi  # [128, 1]
            eq = jnp.where((rowt == qs) & vrow, 1, 0)  # [128, C] int32
            acc = acc + jnp.sum(eq, axis=0, keepdims=True)  # [1, C]
        return acc

    wmin0, wmax0 = minmax_half(w0_ref, 0)
    wmin1, wmax1 = minmax_half(w1_ref, 1)
    wmin = jnp.minimum(wmin0, wmin1)
    wmax = jnp.maximum(wmax0, wmax1)

    acc = jnp.zeros(qs.shape, dtype=jnp.int32)
    acc = scan_half(w0_ref, 0, acc)
    acc = scan_half(w1_ref, 1, acc)
    hit = acc > 0

    covers_end = (base + 2 * ki * 128) >= mi
    cov_lo = (qs >= wmin) | (ih == 0)
    cov_hi = (qs <= wmax) | covers_end
    out_ref[0] = jnp.where(cov_lo & cov_hi, hit.astype(jnp.int8),
                           jnp.int8(RESIDUAL))


@functools.partial(jax.jit,
                   static_argnames=("chunk", "ki", "interpret"))
def join_membership(ik2d: jax.Array, mi: jax.Array, q_sorted: jax.Array,
                    chunk: int = 2048, ki: int = 16,
                    interpret: bool = False) -> jax.Array:
    """Membership of every sorted query key in the sorted index.

    ik2d: [Ri, 128] uint32, ascending when flattened; entries at flat
          position >= mi are padding (any value). Ri must be a multiple of
          ki and >= 2*ki.
    mi:   scalar int32 array, number of valid index entries.
    q_sorted: [Mq] uint32 ascending (Mq a multiple of ``chunk``).

    Returns [Mq] int8: 1 = member, 0 = not a member, RESIDUAL(2) = the
    streamed window could not bracket this key (caller must fall back).
    """
    ri = ik2d.shape[0]
    assert ri % ki == 0 and ri >= 2 * ki, (ri, ki)
    n_half = ri // ki
    mq = q_sorted.shape[0]
    assert mq % chunk == 0, (mq, chunk)
    g = mq // chunk

    firsts = q_sorted.reshape(g, chunk)[:, 0]
    pos = jnp.searchsorted(ik2d.reshape(-1), firsts).astype(jnp.int32)
    ih = jnp.clip(pos // (ki * 128), 0, n_half - 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, mi_r, ih_r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ki, 128), lambda i, mi_r, ih_r: (ih_r[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ki, 128), lambda i, mi_r, ih_r: (ih_r[i] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk), lambda i, mi_r, ih_r: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_join_kernel, ki=ki),
        out_shape=jax.ShapeDtypeStruct((g, 1, chunk), jnp.int8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(mi.reshape(1).astype(jnp.int32), ih,
      q_sorted.reshape(g, 1, chunk), ik2d, ik2d)
    return out.reshape(-1)


def pick_chunk(mq: int, mi: int, ki: int = 16) -> int:
    """Query-chunk size so the expected index span per chunk stays well
    inside the 2*ki*128 window (span ~ chunk * mi/mq)."""
    window = 2 * ki * 128
    target = max(1, (window * mq) // (3 * max(mi, 1)))
    c = 1 << (target - 1).bit_length()
    return int(min(8192, max(512, c)))


# --------------------------------------------------------------------------
# Index-side helpers: collect sorted key sets per partition
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("length", "k", "wmax"))
def chunk_index_keys(codes2, valid, length: int, k: int, wmax=None):
    """Per-batch forward-strand keya values (uint32) with invalid windows
    mapped to SENTINEL, plus the count of valid windows. Feeds
    finalize_index_keys."""
    assert k <= 32, f"streaming join keys on fa_lo only: k={k} > 32"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes(codes2, valid, length)
    wk = kernels.window_keys(codes, k, "fwd", wmax)
    ok = wk["ok"]
    keys = jnp.where(ok, wk["fa_lo"], SENTINEL).reshape(-1)
    flags = jnp.where(ok, jnp.uint32(0), jnp.uint32(1)).reshape(-1)
    return keys, flags, ok.sum(dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "wmax"))
def chunk_index_keys_codes(codes, k: int, wmax=None):
    """chunk_index_keys for plain int32 codes batches (CPU path)."""
    assert k <= 32, f"streaming join keys on fa_lo only: k={k} > 32"
    from commet_tpu.core import kernels
    wk = kernels.window_keys(codes, k, "fwd", wmax)
    ok = wk["ok"]
    keys = jnp.where(ok, wk["fa_lo"], SENTINEL).reshape(-1)
    flags = jnp.where(ok, jnp.uint32(0), jnp.uint32(1)).reshape(-1)
    return keys, flags, ok.sum(dtype=jnp.int32)


def finalize_index_keys(key_chunks, flag_chunks, counts, ki: int = 16):
    """Sort the collected key chunks into the padded [Ri, 128] index array.

    Valid keys sort before SENTINEL-flagged invalid windows even when a
    *real* key equals 0xFFFFFFFF (the flag is a secondary sort key), so the
    first ``mi`` flattened entries are exactly the valid multiset.
    """
    keys = jnp.concatenate(key_chunks)
    flags = jnp.concatenate(flag_chunks)
    mi = int(sum(int(c) for c in counts))
    ri = max(4 * ki, _round_up(_round_up(keys.shape[0], 128) // 128, 2 * ki))
    pad = ri * 128 - keys.shape[0]
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), SENTINEL, jnp.uint32)])
        flags = jnp.concatenate([flags, jnp.ones((pad,), jnp.uint32)])
    keys, _ = jax.lax.sort([keys, flags], num_keys=2)
    return keys.reshape(ri, 128), jnp.asarray(mi, jnp.int32)


# --------------------------------------------------------------------------
# The streamed cascade round: memA via sort + join + unsort, then the
# existing selection/verification/greedy machinery (kernels._strand_cascade)
# --------------------------------------------------------------------------

def _membership_stream(ik2d, mi, wk, chunk: int, ki: int, interpret: bool):
    """Sorted-join membership for every (read, strand, window) key.

    Returns mem [B, 2, W] int8 (0/1/RESIDUAL) in original window order.
    Two sorts realize the gather-free permutation: key-order for the join,
    then payload-order (= original order) to invert it.
    """
    ok = wk["ok"]
    b, w = ok.shape
    qa = jnp.where(ok, wk["fa_lo"], 0)
    ra = jnp.where(ok, wk["ra_lo"], 0)
    q = jnp.stack([qa, ra], axis=1).reshape(-1)  # [(b*2*w)]
    m = b * 2 * w
    mpad = _round_up(m, chunk)
    # the unsort packs the payload as (pay << 2) in uint32: the batch
    # geometry must keep payloads inside 30 bits (callers size batches so
    # this never binds; see Engine.stream_batch)
    assert mpad <= (1 << 30), (
        f"stream batch too large for the packed unsort: {mpad} window keys "
        f"> 2^30; reduce the query batch size")
    pay = jnp.arange(mpad, dtype=jnp.uint32)
    if mpad != m:
        q = jnp.concatenate([q, jnp.full((mpad - m,), SENTINEL, jnp.uint32)])
    sk, pay = jax.lax.sort([q, pay], num_keys=1)
    mem_s = join_membership(ik2d, mi, sk, chunk, ki, interpret)
    packed = (pay << 2) | (mem_s.astype(jnp.uint32) & 3)
    mem = (jnp.sort(packed) & 3)[:m].reshape(b, 2, w).astype(jnp.int8)
    return mem


@functools.partial(jax.jit, static_argnames=(
    "length", "k", "t", "V", "wmax", "chunk", "ki", "interpret"))
def probe_cascade2_stream(planes, ik2d, mi, codes2, lengths, length: int,
                          k: int, t: int, V: int, wmax=None,
                          chunk: int = 2048, ki: int = 16,
                          interpret: bool = False):
    """Fused both-strand cascade with the plane-A prefilter computed by the
    sorted-set join instead of plane gathers. Planes are still used for the
    targeted B/C/D verification (a few positions per read). Verdict
    semantics identical to kernels.probe_cascade2_clean; join residuals are
    folded into AMBIG (sound: the caller's fallback is exact)."""
    assert k <= 32, f"streaming join keys on fa_lo only: k={k} > 32"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes_clean(codes2, lengths, length)
    wk = kernels.window_keys(codes, k, "both", wmax)
    ok = wk["ok"]
    mem = _membership_stream(ik2d, mi, wk, chunk, ki, interpret)
    resid_any = ((mem == RESIDUAL) & ok[:, None, :]).any(axis=(1, 2))
    mem_f = (mem[:, 0] == 1) & ok
    mem_r = (mem[:, 1] == 1) & ok
    tag_f, untag_f = kernels._strand_cascade(planes, wk, "f", k, t, V,
                                             memA=mem_f)
    tag_r, untag_r = kernels._strand_cascade(planes, wk, "r", k, t, V,
                                             memA=mem_r)
    tagged = tag_f | tag_r
    untagged = untag_f & untag_r & ~resid_any
    return jnp.where(tagged, jnp.int8(kernels.VERDICT_TAGGED),
                     jnp.where(untagged, jnp.int8(kernels.VERDICT_UNTAGGED),
                               jnp.int8(kernels.VERDICT_AMBIG)))


@functools.partial(jax.jit, static_argnames=(
    "k", "t", "V", "wmax", "chunk", "ki", "interpret"))
def probe_cascade2_stream_codes(planes, ik2d, mi, codes, k: int, t: int,
                                V: int, wmax=None, chunk: int = 2048,
                                ki: int = 16, interpret: bool = False):
    """probe_cascade2_stream for plain int32 code batches (CPU/tests)."""
    assert k <= 32, f"streaming join keys on fa_lo only: k={k} > 32"
    from commet_tpu.core import kernels
    wk = kernels.window_keys(codes, k, "both", wmax)
    ok = wk["ok"]
    mem = _membership_stream(ik2d, mi, wk, chunk, ki, interpret)
    resid_any = ((mem == RESIDUAL) & ok[:, None, :]).any(axis=(1, 2))
    mem_f = (mem[:, 0] == 1) & ok
    mem_r = (mem[:, 1] == 1) & ok
    tag_f, untag_f = kernels._strand_cascade(planes, wk, "f", k, t, V,
                                             memA=mem_f)
    tag_r, untag_r = kernels._strand_cascade(planes, wk, "r", k, t, V,
                                             memA=mem_r)
    tagged = tag_f | tag_r
    untagged = untag_f & untag_r & ~resid_any
    return jnp.where(tagged, jnp.int8(kernels.VERDICT_TAGGED),
                     jnp.where(untagged, jnp.int8(kernels.VERDICT_UNTAGGED),
                               jnp.int8(kernels.VERDICT_AMBIG)))
