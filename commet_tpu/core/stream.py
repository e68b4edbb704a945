"""Sorted-set membership streaming: the TPU-native replacement for the
reference's random-access Bloom probe (include/bloom_filter.h:124-131).

Why
---
The reference probes its bit-planes with one random byte load per k-mer per
plane; on TPU that lowers to gather descriptors and hits the measured
~65M descriptors/s wall (BENCH_NOTES.md). This module reformulates
membership as a *merge join of two sorted key sets*:

  - the index side is the sorted multiset of (keya, keyb) pairs fed into
    the planes, sorted by keya. Because (keya, keyb) IS the exact 2-bit
    k-mer code (include/hash_key.h:65-91), a pair-equality match is exact
    k-mer membership, which implies membership in all four reference
    planes (every plane was fed from this pair);
  - the query side is sorted once per batch (XLA TPU sort: ~5 ms/M keys),
    then a Pallas kernel streams aligned windows of the sorted index past
    each query chunk with sequential DMA (full HBM bandwidth, zero gather
    descriptors). The kernel is *banded*: both sides are sorted, so each
    128-entry index row only overlaps a narrow run of 128-query groups;
    non-overlapping (row, group) blocks are skipped with scalar
    predication, cutting the compare volume ~8x.

Per (window, strand) key the kernel returns one of four verdicts:
  0 NONMEM : keya provably absent from the index (window brackets it)
  1 CAND   : keya present, exact pair not seen in-window -- a potential
             cross-k-mer Bloom false positive (all 4 planes may still hit)
  2 CONF   : exact (keya, keyb) match -- all four planes hit, guaranteed
  3 RESID  : the streamed window could not bracket the key

Soundness: CONF implies reference-plane membership; NONMEM implies
non-membership; CAND/RESID windows are counted only in the upper greedy
bound. Reads whose tag decision depends on CAND/RESID windows come out
AMBIG and fall back to the exact gather probe, so final tags stay
bit-identical to the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.uint32(0xFFFFFFFF)
# the unsort packs (payload << 2 | verdict) into uint32: a batch's window-
# key volume must stay inside 30 payload bits (engine clamps batch sizes
# against this; see Engine._search_stream_only)
MAX_UNSORT_KEYS = 1 << 30
NONMEM = 0
CAND = 1
CONF = 2
RESIDUAL = 3  # join verdict: window did not bracket the query -> fall back


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# The banded join kernel
# --------------------------------------------------------------------------

def _join_kernel(mi_ref, ih_ref, *refs, ki: int, wide: bool):
    """One grid step: verdicts for CHUNK sorted query (keya, keyb) pairs
    against a 2*ki x 128 window of the index sorted by keya's LOW word
    (rows ih*ki .. ih*ki+2ki-1 of the a/b planes).

    Bracketing invariant (why NONMEM is exact): the flattened a_lo plane
    is globally ascending with all valid entries in the prefix [0, mi). If
    wmin <= qa_lo <= wmax (masked min/max of the window) then any entry
    with an equal a_lo outside the window forces an equal value at the
    window edge, i.e. every a_lo-candidate is inside the window -- so
    in-window (full-key) equality decides global membership even for
    k > 32, where the high key bits ride in packed side streams
    (``wide``: hib = a_hi << 8 | b_hi, <= 2 bits each for k <= 34).
    ih == 0 / covers_end extend coverage to the ends. CONF (pair
    equality) is sound unconditionally: a match is a match.
    """
    if wide:
        (q_ref, qb_ref, qh_ref, w0a_ref, w1a_ref, w0b_ref, w1b_ref,
         w0h_ref, w1h_ref, out_ref, acc_ref) = refs
    else:
        (q_ref, qb_ref, w0a_ref, w1a_ref, w0b_ref, w1b_ref,
         out_ref, acc_ref) = refs
        qh_ref = w0h_ref = w1h_ref = None
    g = pl.program_id(0)
    mi = mi_ref[0]
    ih = ih_ref[g]
    base = ih * (ki * 128)  # first flat index element of the window

    qa = q_ref[0]   # [1, C] uint32, ascending
    qb = qb_ref[0]  # [1, C] uint32, aligned payload
    qh = qh_ref[0] if wide else None  # [1, C] packed hi bits
    c = qa.shape[1]
    # order-preserving signed view (Mosaic has no unsigned reductions)
    bias = jnp.uint32(0x80000000)
    qs = (qa ^ bias).astype(jnp.int32)

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

    wmin0, wmax0 = minmax_half(w0a_ref, 0)
    wmin1, wmax1 = minmax_half(w1a_ref, 1)
    wmin = jnp.minimum(wmin0, wmin1)
    wmax = jnp.maximum(wmax0, wmax1)

    # accumulators: row 0 = full-keya match count, row 1 = exact pair
    # count, row 2 (wide only) = a_lo-only match count. (Zero only the
    # used rows -- the scratch persists across grid steps and a full
    # [8, C] clear per step costs real HBM-adjacent bandwidth.)
    nacc = 3 if wide else 2
    acc_ref[0:nacc, :] = jnp.zeros((nacc, c), jnp.int32)

    # banded scan: both sides are sorted, so a 128-entry index row can
    # only match queries when its value range overlaps the chunk's range;
    # the chunk spans ~1/3 of the window by construction (pick_chunk), so
    # most rows are skipped by the scalar predicate. Surviving rows do one
    # dense [128, C] compare (large vector op, pipelines well -- per-group
    # banding was measured 5x SLOWER from scalar overhead).
    qlo = (q_ref[0, 0, 0] ^ bias).astype(jnp.int32)
    qhi = (q_ref[0, 0, c - 1] ^ bias).astype(jnp.int32)
    for half, (refa, refb, refh) in (
            (0, (w0a_ref, w0b_ref, w0h_ref)),
            (1, (w1a_ref, w1b_ref, w1h_ref))):
        start0 = base + half * (ki * 128)
        for r in range(ki):
            # rows are sorted: min/max are the edge lanes (scalar loads)
            rlo = (refa[r, 0] ^ bias).astype(jnp.int32)
            rhi = (refa[r, 127] ^ bias).astype(jnp.int32)

            @pl.when((rhi >= qlo) & (rlo <= qhi))
            def _(refa=refa, refb=refb, refh=refh, r=r, start0=start0):
                rowa = (refa[pl.ds(r, 1), :] ^ bias).astype(jnp.int32)
                rta = rowa.reshape(128, 1)
                rtb = refb[pl.ds(r, 1), :].reshape(128, 1)
                vrow = (start0 + r * 128 + lanet) < mi  # [128, 1]
                eqlo = (rta == qs) & vrow  # [128, C] low-word match
                if wide:
                    # bracketing only covers the LOW word: an equal-a_lo
                    # run can straddle the window with different hi bits
                    # outside, so a_lo matches must stay visible (-> CAND)
                    # even when the full key mismatches in-window
                    acc_ref[2:3, :] += jnp.sum(
                        jnp.where(eqlo, 1, 0), axis=0, keepdims=True)
                    rth = refh[pl.ds(r, 1), :].reshape(128, 1)
                    eqa = eqlo & ((rth >> 8) == (qh >> 8))
                    eqc = eqa & (rtb == qb) \
                              & ((rth & 0xFF) == (qh & 0xFF))
                else:
                    eqa = eqlo
                    eqc = eqa & (rtb == qb)
                acc_ref[0:1, :] += jnp.sum(
                    jnp.where(eqa, 1, 0), axis=0, keepdims=True)
                acc_ref[1:2, :] += jnp.sum(
                    jnp.where(eqc, 1, 0), axis=0, keepdims=True)

    hit_a = acc_ref[0:1, :] > 0
    hit_c = acc_ref[1:2, :] > 0
    # wide: a_lo seen in-window but full key not -> the run may straddle
    # the window edge with matching hi bits outside; CAND, never NONMEM
    hit_lo = acc_ref[2:3, :] > 0 if wide else hit_a

    # fold the array-end relaxations into the scalar bounds (mixing scalar
    # i1 with vector i1 trips Mosaic relayouts)
    covers_end = (base + 2 * ki * 128) >= mi
    wmin_eff = jnp.where(ih == 0, int_min, wmin)
    wmax_eff = jnp.where(covers_end, int_max, wmax)
    covered = (qs >= wmin_eff) & (qs <= wmax_eff)
    # CONF(2) if the exact pair matched; else CAND(1) on a keya hit; else
    # NONMEM(0) when bracketing proves absence; else RESIDUAL(3).
    # Select in int32 (i1 masks of mixed bit-width groups don't relayout);
    # narrow to int8 only at the final store.
    verdict = jnp.where(
        hit_c, jnp.int32(CONF),
        jnp.where(hit_a | hit_lo, jnp.int32(CAND),
                  jnp.where(covered, jnp.int32(NONMEM),
                            jnp.int32(RESIDUAL))))
    out_ref[0] = verdict.astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "ki", "interpret"))
def join_membership(ika: jax.Array, ikb: jax.Array, mi: jax.Array,
                    qa_sorted: jax.Array, qb_sorted: jax.Array,
                    chunk: int = 2048, ki: int = 8,
                    interpret: bool = False, ihib=None,
                    qh_sorted=None) -> jax.Array:
    """Verdicts for every sorted query pair against the sorted index pairs.

    ika/ikb: [Ri, 128] uint32 keya/keyb planes, ascending by keya when
          flattened; entries at flat position >= mi are padding (SENTINEL).
          Ri must be a multiple of ki and >= 2*ki.
    mi:   scalar int32 array, number of valid index entries.
    qa_sorted/qb_sorted: [Mq] uint32, ascending by qa (Mq a multiple of
          ``chunk``; chunk a multiple of 128).

    Returns [Mq] int8 verdicts: NONMEM/CAND/CONF/RESIDUAL.
    """
    ri = ika.shape[0]
    assert ri % ki == 0 and ri >= 2 * ki, (ri, ki)
    assert chunk % 128 == 0, chunk
    n_half = ri // ki
    mq = qa_sorted.shape[0]
    assert mq % chunk == 0, (mq, chunk)
    g = mq // chunk

    wide = ihib is not None
    firsts = qa_sorted.reshape(g, chunk)[:, 0]
    pos = jnp.searchsorted(ika.reshape(-1), firsts).astype(jnp.int32)
    ih = jnp.clip(pos // (ki * 128), 0, n_half - 2)

    def qspec():
        return pl.BlockSpec((1, 1, chunk), lambda i, mi_r, ih_r: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(off):
        return pl.BlockSpec((ki, 128),
                            lambda i, mi_r, ih_r: (ih_r[i] + off, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qspec(), qspec()] + ([qspec()] if wide else []) + \
        [wspec(0), wspec(1), wspec(0), wspec(1)] + \
        ([wspec(0), wspec(1)] if wide else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, chunk), lambda i, mi_r, ih_r: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, chunk), jnp.int32)],
    )
    args = [mi.reshape(1).astype(jnp.int32), ih,
            qa_sorted.reshape(g, 1, chunk), qb_sorted.reshape(g, 1, chunk)]
    if wide:
        args.append(qh_sorted.reshape(g, 1, chunk))
    args += [ika, ika, ikb, ikb]
    if wide:
        args += [ihib, ihib]
    out = pl.pallas_call(
        functools.partial(_join_kernel, ki=ki, wide=wide),
        out_shape=jax.ShapeDtypeStruct((g, 1, chunk), jnp.int8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args)
    return out.reshape(-1)


def pick_chunk(mq: int, mi: int, ki: int = 8) -> int:
    """Query-chunk size so the expected index span per chunk stays well
    inside the 2*ki*128 window (span ~ chunk * mi/mq)."""
    window = 2 * ki * 128
    target = max(1, (window * mq) // (3 * max(mi, 1)))
    c = 1 << (target - 1).bit_length()
    return int(min(8192, max(512, c)))


# --------------------------------------------------------------------------
# Index-side helpers: collect sorted (keya, keyb) sets per partition
# --------------------------------------------------------------------------

def _index_chunk_from_wk(wk, k: int):
    ok = wk["ok"]
    keys = jnp.where(ok, wk["fa_lo"], SENTINEL).reshape(-1)
    keysb = jnp.where(ok, wk["fb_lo"], SENTINEL).reshape(-1)
    if k > 32:  # hi bits (<= 2 each for k <= 34) packed into one stream
        hib = (wk["fa_hi"] << 8) | wk["fb_hi"]
        hib = jnp.where(ok, hib, SENTINEL).reshape(-1)
    else:
        hib = None  # narrow keys: no hi stream (finalize ignores it)
    flags = jnp.where(ok, jnp.uint32(0), jnp.uint32(1)).reshape(-1)
    return keys, keysb, hib, flags, ok.sum(dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("length", "k", "wmax"))
def chunk_index_keys(codes2, valid, length: int, k: int, wmax=None):
    """Per-batch forward-strand (keya, keyb[, hi-bit]) values (uint32)
    with invalid windows mapped to SENTINEL, plus the count of valid
    windows. Feeds finalize_index_keys."""
    assert k <= 34, f"streaming join supports k <= 34, got {k}"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes(codes2, valid, length)
    wk = kernels.window_keys(codes, k, "fwd", wmax)
    return _index_chunk_from_wk(wk, k)


@functools.partial(jax.jit, static_argnames=("length", "k", "wmax"))
def chunk_index_keys_clean(codes2, lengths, length: int, k: int, wmax=None):
    """chunk_index_keys for N-free batches: validity is position < length,
    so only the 2-bit code plane + lengths travel over the (scarce)
    host->device link — 3x less transport than the validity-plane form."""
    assert k <= 34, f"streaming join supports k <= 34, got {k}"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes_clean(codes2, lengths, length)
    wk = kernels.window_keys(codes, k, "fwd", wmax)
    return _index_chunk_from_wk(wk, k)


@functools.partial(jax.jit, static_argnames=("k", "wmax"))
def chunk_index_keys_codes(codes, k: int, wmax=None):
    """chunk_index_keys for plain int32 codes batches (CPU path)."""
    assert k <= 34, f"streaming join supports k <= 34, got {k}"
    from commet_tpu.core import kernels
    wk = kernels.window_keys(codes, k, "fwd", wmax)
    return _index_chunk_from_wk(wk, k)


def finalize_index_keys(key_chunks, keyb_chunks, hib_chunks, flag_chunks,
                        counts, ki: int = 8, wide: bool = False):
    """Sort the collected (keya, keyb[, hib]) chunks into padded
    [Ri, 128] planes.

    Sort keys are (keya_lo, flag): valid keys sort before SENTINEL-flagged
    invalid windows even when a *real* keya equals 0xFFFFFFFF, so the
    first ``mi`` flattened entries are exactly the valid multiset. keyb
    (and for k > 32 the packed hi bits) ride as payload -- within-run
    order is irrelevant to the band compare, so sorting by the LOW word
    alone suffices even for wide keys. Returns (ika, ikb, ihib|None, mi).
    """
    keys = jnp.concatenate(key_chunks)
    keysb = jnp.concatenate(keyb_chunks)
    flags = jnp.concatenate(flag_chunks)
    mi = int(sum(int(c) for c in counts))
    ri = max(4 * ki, _round_up(_round_up(keys.shape[0], 128) // 128, 2 * ki))
    pad = ri * 128 - keys.shape[0]
    operands = [keys, flags, keysb]
    if wide:
        operands.append(jnp.concatenate(hib_chunks))
    if pad:
        operands = [
            jnp.concatenate([op, jnp.full((pad,), fill, jnp.uint32)])
            for op, fill in zip(operands,
                                (SENTINEL, np.uint32(1), SENTINEL,
                                 SENTINEL))]
    out = jax.lax.sort(operands, num_keys=2)
    ihib = out[3].reshape(ri, 128) if wide else None
    return (out[0].reshape(ri, 128), out[2].reshape(ri, 128), ihib,
            jnp.asarray(mi, jnp.int32))


class StreamIndex:
    """A partition's complete membership structure for the planeless
    stream mode: the (keya-sorted) join planes plus the four sorted value
    sets of the reference's planes A/B/C/D. Since the reference plane p
    contains exactly the set of key-p values fed into it (injective
    key->bit map, include/bloom_filter.h:63-70), sorted-set membership of
    all four derived keys IS the reference's 4-plane Bloom test --
    fallback verdicts need no bit planes at all."""

    __slots__ = ("ika", "ikb", "ihib", "mi", "sa", "sb", "sc", "sd")

    def __init__(self, ika, ikb, ihib, mi, sa, sb, sc, sd):
        self.ika, self.ikb, self.ihib, self.mi = ika, ikb, ihib, mi
        self.sa, self.sb, self.sc, self.sd = sa, sb, sc, sd


def _sorted_set(vals, flags):
    v, _ = jax.lax.sort([vals, flags], num_keys=2)
    return v


def finalize_index(key_chunks, keyb_chunks, hib_chunks, flag_chunks,
                   counts, ki: int = 8, wide: bool = False) -> StreamIndex:
    """finalize_index_keys + (for k <= 32) the four sorted plane-value
    sets. For wide keys (k in 33..34) the exact-fallback sets are skipped
    (values exceed 32-bit lanes); the caller keeps the bit planes for the
    fallback instead."""
    ika, ikb, ihib, mi = finalize_index_keys(
        key_chunks, keyb_chunks, hib_chunks, flag_chunks, counts, ki, wide)
    if wide:
        return StreamIndex(ika, ikb, ihib, mi, None, None, None, None)
    a = jnp.concatenate(key_chunks)
    b = jnp.concatenate(keyb_chunks)
    flags = jnp.concatenate(flag_chunks)
    invalid = flags == 1
    c = jnp.where(invalid, SENTINEL, a ^ b)
    d = jnp.where(invalid, SENTINEL, a | b)
    sa = ika.reshape(-1)  # already (keya, flag)-sorted
    return StreamIndex(ika, ikb, None, mi, sa,
                       _sorted_set(b, flags), _sorted_set(c, flags),
                       _sorted_set(d, flags))


def _in_sorted(arr, mi, q):
    """Membership of q (any shape, uint32) in the valid prefix [0, mi) of
    the ascending array ``arr`` (padded with SENTINEL; real SENTINEL
    values sort before padding, see finalize_index_keys)."""
    n = arr.shape[0]
    pos = jnp.searchsorted(arr, q).astype(jnp.int32)
    hit = jnp.take(arr, jnp.clip(pos, 0, n - 1), axis=0) == q
    return hit & (pos < mi)


@functools.partial(jax.jit, static_argnames=("length", "k", "t", "wmax"))
def probe_exact_sets(sa, sb, sc, sd, mi, codes2, valid, length: int,
                     k: int, t: int, wmax=None):
    """Exact reference-Bloom classification via the four sorted value
    sets (no bit planes): member = a in A and b in B and a^b in C and
    a|b in D per window; greedy non-overlap count per strand; tagged when
    either strand reaches t (search_reads.h:34-87 semantics). This is the
    stream mode's fallback for AMBIG reads -- bit-exact and plane-free."""
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes(codes2, valid, length)
    wk = kernels.window_keys(codes, k, "both", wmax)
    ok = wk["ok"]
    tagged = jnp.zeros(ok.shape[0], dtype=bool)
    for p in ("f", "r"):
        a = wk[p + "a_lo"]
        b = wk[p + "b_lo"]
        member = (_in_sorted(sa, mi, a) & _in_sorted(sb, mi, b)
                  & _in_sorted(sc, mi, a ^ b) & _in_sorted(sd, mi, a | b)
                  & ok)
        tagged = tagged | kernels.greedy_ge(member, k, t)
    return tagged


# --------------------------------------------------------------------------
# The streamed probe: gather-free exact verdicts via sort + banded join +
# unsort + greedy bounds. Plane gathers only happen in the caller's AMBIG
# fallback (rare: reads whose decision hangs on potential cross-k-mer
# Bloom false positives or unbracketed keys).
# --------------------------------------------------------------------------

def _membership_stream(ika, ikb, mi, wk, chunk: int, ki: int,
                       interpret: bool, ihib=None, k: int = 32):
    """Joined verdicts for every (read, strand, window) key pair.

    Returns mem [B, 2, W] int8 (NONMEM/CAND/CONF/RESIDUAL) in original
    window order. Two sorts realize the gather-free permutation: key-order
    for the join, then payload-order (= original order) to invert it.
    For k > 32 the packed hi bits ride as a fourth sort operand.
    """
    wide = ihib is not None
    ok = wk["ok"]
    b, w = ok.shape
    qa = jnp.where(ok, wk["fa_lo"], 0)
    ra = jnp.where(ok, wk["ra_lo"], 0)
    qb = jnp.where(ok, wk["fb_lo"], 0)
    rb = jnp.where(ok, wk["rb_lo"], 0)
    q = jnp.stack([qa, ra], axis=1).reshape(-1)   # [(b*2*w)]
    q2 = jnp.stack([qb, rb], axis=1).reshape(-1)
    operands = [q, q2]
    if wide:
        qh = (wk["fa_hi"] << 8) | wk["fb_hi"]
        rh = (wk["ra_hi"] << 8) | wk["rb_hi"]
        qh = jnp.where(ok, qh, 0)
        rh = jnp.where(ok, rh, 0)
        operands.append(jnp.stack([qh, rh], axis=1).reshape(-1))
    m = b * 2 * w
    mpad = _round_up(m, chunk)
    # the unsort packs the payload as (pay << 2) in uint32: the batch
    # geometry must keep payloads inside 30 bits (callers size batches so
    # this never binds; see Engine.stream_batch)
    assert mpad <= MAX_UNSORT_KEYS, (
        f"stream batch too large for the packed unsort: {mpad} window keys "
        f"> 2^30; reduce the query batch size")
    pay = jnp.arange(mpad, dtype=jnp.uint32)
    if mpad != m:
        operands = [jnp.concatenate(
            [op, jnp.full((mpad - m,), SENTINEL, jnp.uint32)])
            for op in operands]
    out = jax.lax.sort(operands + [pay], num_keys=1)
    if wide:
        sk, skb, skh, pay = out
        mem_s = join_membership(ika, ikb, mi, sk, skb, chunk, ki,
                                interpret, ihib=ihib, qh_sorted=skh)
    else:
        sk, skb, pay = out
        mem_s = join_membership(ika, ikb, mi, sk, skb, chunk, ki, interpret)
    packed = (pay << 2) | (mem_s.astype(jnp.uint32) & 3)
    mem = (jnp.sort(packed) & 3)[:m].reshape(b, 2, w).astype(jnp.int8)
    return mem


def _stream_verdict(wk, mem, k: int, t: int):
    """TAGGED/UNTAGGED/AMBIG from joined window verdicts, zero gathers.

    CONF windows are guaranteed reference-plane members; CAND/RESIDUAL may
    or may not be. greedy(conf) >= t proves tagged; greedy(conf|maybe) < t
    proves untagged; anything else is AMBIG for the exact fallback
    (same sandwich argument as kernels._strand_cascade)."""
    from commet_tpu.core import kernels
    ok = wk["ok"]
    tagged = None
    untagged = None
    for s in range(2):
        conf = (mem[:, s] == CONF) & ok
        maybe = ((mem[:, s] == CAND) | (mem[:, s] == RESIDUAL)) & ok
        tag_s = kernels.greedy_ge(conf, k, t)
        untag_s = ~kernels.greedy_ge(conf | maybe, k, t)
        tagged = tag_s if tagged is None else (tagged | tag_s)
        untagged = untag_s if untagged is None else (untagged & untag_s)
    return jnp.where(tagged, jnp.int8(kernels.VERDICT_TAGGED),
                     jnp.where(untagged, jnp.int8(kernels.VERDICT_UNTAGGED),
                               jnp.int8(kernels.VERDICT_AMBIG)))


def _check_wide(k, ihib):
    assert k <= 34, f"streaming join supports k <= 34, got {k}"
    assert (ihib is not None) == (k > 32), \
        "k > 32 requires the packed hi-bit index plane (and k <= 32 must " \
        "not pass one)"


# --------------------------------------------------------------------------
# Multi-index amortized probe: ONE query sort + ONE packed unsort serve S
# resident index partitions (the all-vs-all driver's step-0 schedule reuses
# each query set against every earlier index set, reference Commet.py:186-240
# -- the sort/unsort cost, the round-3 bottleneck, amortizes by S).
# --------------------------------------------------------------------------

def _multi_verdicts(wk, mems, k: int, t: int):
    """Batched TAGGED/UNTAGGED/AMBIG over S verdict planes: the greedy
    scans run once on [S*B, W] instead of S times on [B, W]."""
    from commet_tpu.core import kernels
    ok = wk["ok"]
    s, b, _, w = mems.shape
    okx = jnp.broadcast_to(ok[None], (s, b, w)).reshape(s * b, w)
    tagged = None
    untagged = None
    for st in range(2):
        mem = mems[:, :, st, :].reshape(s * b, w)
        conf = (mem == CONF) & okx
        maybe = ((mem == CAND) | (mem == RESIDUAL)) & okx
        tag_s = kernels.greedy_ge(conf, k, t)
        untag_s = ~kernels.greedy_ge(conf | maybe, k, t)
        tagged = tag_s if tagged is None else (tagged | tag_s)
        untagged = untag_s if untagged is None else (untagged & untag_s)
    v = jnp.where(tagged, jnp.int8(kernels.VERDICT_TAGGED),
                  jnp.where(untagged, jnp.int8(kernels.VERDICT_UNTAGGED),
                            jnp.int8(kernels.VERDICT_AMBIG)))
    return v.reshape(s, b)


def _membership_stream_multi(idxs, wk, chunk: int, ki: int,
                             interpret: bool):
    """Joined verdicts for every (index, read, strand, window) tuple from
    ONE sorted query stream. idxs: sequence of (ika, ikb, mi, ihib)
    4-tuples — ihib None for narrow keys (k <= 32), the packed hi-bit
    plane for wide keys (k = 33/34, the reference default).
    Returns mems [S, B, 2, W] int32.

    The unsort carries ceil(S/15) packed uint32 operands (15 x 2-bit
    verdicts each; the top 2 bits stay zero so the SENTINEL-keyed padding
    rows cannot alias a real payload's packed word). One 2-operand sort
    replaces S single-operand unsorts."""
    wide = idxs[0][3] is not None
    ok = wk["ok"]
    b, w = ok.shape
    qa = jnp.where(ok, wk["fa_lo"], 0)
    ra = jnp.where(ok, wk["ra_lo"], 0)
    qb = jnp.where(ok, wk["fb_lo"], 0)
    rb = jnp.where(ok, wk["rb_lo"], 0)
    q = jnp.stack([qa, ra], axis=1).reshape(-1)
    q2 = jnp.stack([qb, rb], axis=1).reshape(-1)
    operands = [q, q2]
    if wide:
        qh = jnp.where(ok, (wk["fa_hi"] << 8) | wk["fb_hi"], 0)
        rh = jnp.where(ok, (wk["ra_hi"] << 8) | wk["rb_hi"], 0)
        operands.append(jnp.stack([qh, rh], axis=1).reshape(-1))
    m = b * 2 * w
    mpad = _round_up(m, chunk)
    assert mpad <= MAX_UNSORT_KEYS, (
        f"stream batch too large for the packed unsort: {mpad} window keys "
        f"> 2^30; reduce the query batch size")
    pay = jnp.arange(mpad, dtype=jnp.uint32)
    if mpad != m:
        padv = jnp.full((mpad - m,), SENTINEL, jnp.uint32)
        operands = [jnp.concatenate([op, padv]) for op in operands]
    out = jax.lax.sort(operands + [pay], num_keys=1)
    if wide:
        sk, skb, skh, spay = out
    else:
        sk, skb, spay = out
        skh = None
    n_s = len(idxs)
    words = []
    for base in range(0, n_s, 15):
        packed = jnp.zeros(mpad, jnp.uint32)
        for off, (ika, ikb, mi, ihib) in enumerate(idxs[base : base + 15]):
            mem = join_membership(ika, ikb, mi, sk, skb, chunk, ki,
                                  interpret, ihib=ihib, qh_sorted=skh)
            packed = packed | (mem.astype(jnp.uint32) << (2 * off))
        words.append(packed)
    out = jax.lax.sort([spay] + words, num_keys=1)
    planes = []
    for wi, word in enumerate(out[1:]):
        vp = word[:m].reshape(1, b, 2, w).astype(jnp.int32)
        for off in range(min(15, n_s - 15 * wi)):
            planes.append((vp >> (2 * off)) & 3)
    return jnp.concatenate(planes, axis=0)  # [S, B, 2, W]


def _probe_multi_impl(ikas, ikbs, mis, codes, k, t, wmax, chunk, ki,
                      interpret, ihibs=None):
    from commet_tpu.core import kernels
    wk = kernels.window_keys(codes, k, "both", wmax)
    if ihibs is None:
        ihibs = (None,) * len(ikas)
    idxs = list(zip(ikas, ikbs, mis, ihibs))
    mems = _membership_stream_multi(idxs, wk, chunk, ki, interpret)
    return _multi_verdicts(wk, mems, k, t)


@functools.partial(jax.jit, static_argnames=(
    "length", "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_multi_stream_clean(ikas, ikbs, mis, codes2, lengths, length: int,
                             k: int, t: int, wmax=None, chunk: int = 2048,
                             ki: int = 8, interpret: bool = False,
                             ihibs=None):
    """Amortized S-index streamed probe for N-free batches (k <= 32):
    one query sort + one packed unsort serve every (index, partition) in
    ikas/ikbs/mis (tuples of join planes). Returns [S, B] int8 verdicts
    with the same semantics as probe_cascade2_stream per index."""
    assert k <= 34, f"multi-index streaming supports k <= 34, got {k}"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes_clean(codes2, lengths, length)
    return _probe_multi_impl(ikas, ikbs, mis, codes, k, t, wmax, chunk, ki,
                             interpret, ihibs)


@functools.partial(jax.jit, static_argnames=(
    "length", "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_multi_stream_packed(ikas, ikbs, mis, codes2, valid, length: int,
                              k: int, t: int, wmax=None, chunk: int = 2048,
                              ki: int = 8, interpret: bool = False,
                              ihibs=None):
    """probe_multi_stream_clean for dirty batches (full validity plane)."""
    assert k <= 34, f"multi-index streaming supports k <= 34, got {k}"
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes(codes2, valid, length)
    return _probe_multi_impl(ikas, ikbs, mis, codes, k, t, wmax, chunk, ki,
                             interpret, ihibs)


@functools.partial(jax.jit, static_argnames=(
    "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_multi_stream_codes(ikas, ikbs, mis, codes, k: int, t: int,
                             wmax=None, chunk: int = 2048, ki: int = 8,
                             interpret: bool = False, ihibs=None):
    """probe_multi_stream for plain int32 code batches (CPU/tests)."""
    assert k <= 34, f"multi-index streaming supports k <= 34, got {k}"
    return _probe_multi_impl(ikas, ikbs, mis, codes, k, t, wmax, chunk, ki,
                             interpret, ihibs)


@functools.partial(jax.jit, static_argnames=(
    "length", "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_cascade2_stream(ika, ikb, mi, codes2, lengths, length: int,
                          k: int, t: int, wmax=None,
                          chunk: int = 2048, ki: int = 8,
                          interpret: bool = False, ihib=None):
    """Fused both-strand streamed probe: exact TAGGED/UNTAGGED verdicts
    from the sorted join alone (no plane gathers); AMBIG rows are the
    caller's exact-fallback residue. Verdict semantics identical to
    kernels.probe_cascade2_clean."""
    _check_wide(k, ihib)
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes_clean(codes2, lengths, length)
    wk = kernels.window_keys(codes, k, "both", wmax)
    mem = _membership_stream(ika, ikb, mi, wk, chunk, ki, interpret,
                             ihib, k)
    return _stream_verdict(wk, mem, k, t)


@functools.partial(jax.jit, static_argnames=(
    "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_cascade2_stream_codes(ika, ikb, mi, codes, k: int, t: int,
                                wmax=None, chunk: int = 2048,
                                ki: int = 8, interpret: bool = False,
                                ihib=None):
    """probe_cascade2_stream for plain int32 code batches (CPU/tests)."""
    _check_wide(k, ihib)
    from commet_tpu.core import kernels
    wk = kernels.window_keys(codes, k, "both", wmax)
    mem = _membership_stream(ika, ikb, mi, wk, chunk, ki, interpret,
                             ihib, k)
    return _stream_verdict(wk, mem, k, t)


@functools.partial(jax.jit, static_argnames=(
    "length", "k", "t", "wmax", "chunk", "ki", "interpret"))
def probe_cascade2_stream_packed(ika, ikb, mi, codes2, valid, length: int,
                                 k: int, t: int, wmax=None,
                                 chunk: int = 2048, ki: int = 8,
                                 interpret: bool = False, ihib=None):
    """probe_cascade2_stream for dirty batches (reads with non-ACGT bases
    ship the full 1-bit validity plane; window_keys resets runs exactly
    like the reference's hash.clear())."""
    _check_wide(k, ihib)
    from commet_tpu.core import kernels
    codes = kernels.unpack_codes(codes2, valid, length)
    wk = kernels.window_keys(codes, k, "both", wmax)
    mem = _membership_stream(ika, ikb, mi, wk, chunk, ki, interpret,
                             ihib, k)
    return _stream_verdict(wk, mem, k, t)
