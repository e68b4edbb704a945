"""Device kernels: rolling k-mer keys, membership-plane build/probe, greedy
non-overlapping hit counting.

TPU-native design notes
-----------------------
The reference's "Bloom filter" (include/bloom_filter.h) maps each of 4
projection keys *injectively* to one bit (byte = key>>1, bit = parity x
plane), so it is exactly 4 independent set-membership bitmaps, not a lossy
Bloom filter. Any per-plane injective bit layout therefore yields
bit-identical classification results. Here each plane p is a dense bitmap of
2^k bits living in HBM as uint32 words; key value v maps to word v>>5, bit
v&31. Probing is a vectorized gather + bit-test ANDed across the 4 planes;
building is sort -> segmented-OR -> presence-filtered scatter-add, which is
mathematically a scatter-OR but safe for XLA's scatter-add lowering.

Key semantics (bit-exact vs reference include/hash_key.h:65-125):
  keya bit: G/T -> 1, keyb bit: C/T -> 1  => (keya,keyb) = 2-bit base code,
  keyc = keya XOR keyb, keyd = keya OR keyb (derived bitwise).
Forward keys append at LSB (left shift), reverse-complement keys prepend at
bit k-1 (right shift) while scanning the read left-to-right. Keys are
(hi, lo) uint32 pairs to support k > 32 without 64-bit lanes.

Search semantics (bit-exact vs reference include/search_reads.h:34-87):
non-overlapping hits counted greedily left-to-right (hash cleared after each
hit), forward strand first, reverse-complement only decides tagging when the
forward count is below t; an invalid (non-ACGT) base resets the window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID_CODE = 4


def plane_words(k: int) -> int:
    """uint32 words per membership plane (2^k bits)."""
    return max(1, 1 << (k - 5)) if k >= 5 else 1


def alloc_planes(k: int):
    """Allocate the 4 flat membership planes as one [4 * plane_words] array."""
    if k > 36:
        raise ValueError(f"k={k} > 36 unsupported on a single chip "
                         "(plane addressing exceeds 32-bit words)")
    return jnp.zeros(4 * plane_words(k), dtype=jnp.uint32)


# --------------------------------------------------------------------------
# Packed transport (host->device): 2-bit base codes + 1-bit validity.
# The tunneled host->device link is the scarce resource (~40 MB/s measured),
# so reads travel packed (~3.5x smaller than byte codes) and unpack on
# device with pure vector ops.
# --------------------------------------------------------------------------

def pack_codes_np(codes_u8: np.ndarray):
    """Host-side pack: [N, L] uint8 codes (0..3 valid, 4 invalid) ->
    (codes2 [N, ceil(L/16)] uint32, valid [N, ceil(L/32)] uint32)."""
    n, length = codes_u8.shape
    w16 = -(-length // 16)
    w32 = -(-length // 32)
    c = np.zeros((n, w16 * 16), dtype=np.uint32)
    c[:, :length] = np.where(codes_u8 < 4, codes_u8, 0).astype(np.uint32)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    codes2 = np.bitwise_or.reduce(c.reshape(n, w16, 16) << shifts, axis=2)
    v = np.zeros((n, w32 * 32), dtype=np.uint32)
    v[:, :length] = (codes_u8 < 4).astype(np.uint32)
    vshifts = np.arange(32, dtype=np.uint32)[None, None, :]
    valid = np.bitwise_or.reduce(v.reshape(n, w32, 32) << vshifts, axis=2)
    return codes2, valid


def unpack_codes(codes2: jax.Array, valid: jax.Array, length: int):
    """Device-side unpack back to [N, L] int32 codes (4 = invalid).
    Regular bit-slicing - reshapes and shifts only, no gathers."""
    n = codes2.shape[0]
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    c = ((codes2[:, :, None] >> shifts) & 3).reshape(n, -1)[:, :length]
    vshifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    v = ((valid[:, :, None] >> vshifts) & 1).reshape(n, -1)[:, :length]
    return jnp.where(v == 1, c, INVALID_CODE).astype(jnp.int32)


# --------------------------------------------------------------------------
# Rolling window keys
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "strand"))
def window_scan(codes: jax.Array, k: int, strand: str = "both"):
    """Compute per-position rolling keys for every window of length k.

    codes: [N, L] int32 with values 0..3 (A,C,G,T) or 4 (invalid).
    Returns dict of [N, L] arrays: fa/fb lo+hi forward keys, ra/rb lo+hi
    reverse-complement keys, and ok (bool: window of the k bases ending at
    this position is complete & fully valid). ``strand`` ('both'|'fwd'|'rc')
    drops the unused key carries for cheaper single-strand scans.
    """
    n, length = codes.shape
    codes_t = codes.T.astype(jnp.int32)  # [L, N]

    u32 = jnp.uint32
    # derive the zero carry from the data so the scan carry keeps the same
    # varying-axes type under shard_map (constant-folded by XLA otherwise)
    zero = (codes_t[0] * 0).astype(u32)
    hi_mask = u32((1 << (k - 32)) - 1) if k > 32 else u32(0)
    lo_mask = u32((1 << k) - 1) if k < 32 else u32(0xFFFFFFFF)

    do_fwd = strand in ("both", "fwd")
    do_rc = strand in ("both", "rc")
    fwd_names = ("fa_lo", "fa_hi", "fb_lo", "fb_hi")
    rc_names = ("ra_lo", "ra_hi", "rb_lo", "rb_hi")
    names = (fwd_names if do_fwd else ()) + (rc_names if do_rc else ())

    def step(carry, c):
        run = carry[-1]
        keys = dict(zip(names, carry[:-1]))
        valid = c < INVALID_CODE
        cc = jnp.where(valid, c, 0)
        new = {}
        if do_fwd:
            ba = ((cc >> 1) & 1).astype(u32)
            bb = (cc & 1).astype(u32)
            if k <= 32:
                new["fa_lo"] = ((keys["fa_lo"] << 1) | ba) & lo_mask
                new["fb_lo"] = ((keys["fb_lo"] << 1) | bb) & lo_mask
                new["fa_hi"] = keys["fa_hi"]
                new["fb_hi"] = keys["fb_hi"]
            else:
                new["fa_hi"] = ((keys["fa_hi"] << 1)
                                | (keys["fa_lo"] >> 31)) & hi_mask
                new["fb_hi"] = ((keys["fb_hi"] << 1)
                                | (keys["fb_lo"] >> 31)) & hi_mask
                new["fa_lo"] = keys["fa_lo"] << 1 | ba
                new["fb_lo"] = keys["fb_lo"] << 1 | bb
        if do_rc:
            comp = 3 - cc
            rba = ((comp >> 1) & 1).astype(u32)
            rbb = (comp & 1).astype(u32)
            if k <= 32:
                new["ra_lo"] = (keys["ra_lo"] >> 1) | (rba << (k - 1))
                new["rb_lo"] = (keys["rb_lo"] >> 1) | (rbb << (k - 1))
                new["ra_hi"] = keys["ra_hi"]
                new["rb_hi"] = keys["rb_hi"]
            else:
                new["ra_lo"] = (keys["ra_lo"] >> 1) | ((keys["ra_hi"] & 1) << 31)
                new["rb_lo"] = (keys["rb_lo"] >> 1) | ((keys["rb_hi"] & 1) << 31)
                new["ra_hi"] = (keys["ra_hi"] >> 1) | (rba << (k - 33))
                new["rb_hi"] = (keys["rb_hi"] >> 1) | (rbb << (k - 33))

        nrun = jnp.where(valid, run + 1, 0)
        carry = tuple(jnp.where(valid, new[nm], 0) for nm in names) + (nrun,)
        ok = nrun >= k
        out = carry[:-1] + (ok,)
        return carry, out

    init = (zero,) * len(names) + (zero.astype(jnp.int32),)
    _, outs = jax.lax.scan(step, init, codes_t)
    return {nm: o.T for nm, o in zip(names + ("ok",), outs)}  # each [N, L]


def _plane_addr(lo, hi, k: int):
    """key value -> (word index, bit mask) in its 2^k-bit plane."""
    if k <= 32:
        word = lo >> 5 if k >= 5 else jnp.zeros_like(lo)
    else:
        word = (lo >> 5) | (hi << 27)
    mask = jnp.uint32(1) << (lo & 31)
    return word, mask


def _four_plane_addrs(a_lo, a_hi, b_lo, b_hi, k: int):
    """Derive the 4 plane addresses from the a/b key pair
    (keyc = a^b, keyd = a|b, reference include/bloom_filter.h:37-43)."""
    c_lo, c_hi = a_lo ^ b_lo, a_hi ^ b_hi
    d_lo, d_hi = a_lo | b_lo, a_hi | b_hi
    words, masks = [], []
    for lo, hi in ((a_lo, a_hi), (b_lo, b_hi), (c_lo, c_hi), (d_lo, d_hi)):
        w, m = _plane_addr(lo, hi, k)
        words.append(w)
        masks.append(m)
    return jnp.stack(words), jnp.stack(masks)  # [4, ...]


# --------------------------------------------------------------------------
# Probe
# --------------------------------------------------------------------------

def _membership(planes, words, masks, k: int):
    """AND of the 4 plane bit-tests. planes: [4*W] uint32, words/masks [4,...]."""
    w = plane_words(k)
    offs = (jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(w)).reshape(
        (4,) + (1,) * (words.ndim - 1))
    flat_idx = words + offs
    got = jnp.take(planes, flat_idx.astype(jnp.int32), axis=0)
    hit = (got & masks) != 0
    return hit.all(axis=0)


def _greedy_count(member, ok, k: int, t: int):
    """Greedy left-to-right non-overlapping hit count, capped at t.

    Equivalent to the reference inner loop (search_reads.h:49-63): a hit at
    window-end i clears the hash so the next countable window ends >= i+k;
    count stops mattering at t (early exit there, cap here).
    """
    n, length = member.shape
    mem_t = member.T
    ok_t = ok.T

    def step(carry, x):
        cnt, allow = carry
        m, o, i = x
        hit = m & o & (i >= allow) & (cnt < t)
        cnt = cnt + hit.astype(jnp.int32)
        allow = jnp.where(hit, i + k, allow)
        return (cnt, allow), None

    idx = jnp.arange(length, dtype=jnp.int32)
    zero = mem_t[0].astype(jnp.int32) * 0  # data-derived for shard_map vma
    init = (zero, zero)
    (cnt, _), _ = jax.lax.scan(
        step, init,
        (mem_t, ok_t, idx))
    return cnt


def _strand_count(planes, s, prefix: str, k: int, t: int):
    """Membership + greedy count for one strand, probing only positions
    that can hold a complete window (>= k-1), which trims ~25% of the
    gathers at typical read lengths."""
    sl = slice(k - 1, None)
    ok = s["ok"][:, sl]
    words, masks = _four_plane_addrs(
        s[prefix + "a_lo"][:, sl], s[prefix + "a_hi"][:, sl],
        s[prefix + "b_lo"][:, sl], s[prefix + "b_hi"][:, sl], k)
    mem = _membership(planes, words, masks, k)
    return _greedy_count(mem & ok, ok, k, t)


@functools.partial(jax.jit, static_argnames=("k", "t"))
def search_batch(planes: jax.Array, codes: jax.Array, k: int, t: int):
    """Classify each read: does it share >= t non-overlapping k-mers with the
    indexed set (forward or reverse-complement strand)?

    Returns (tagged [N] bool, found_fwd [N] bool) - found_fwd only feeds
    logging parity.
    """
    s = window_scan(codes, k)
    cnt_f = _strand_count(planes, s, "f", k, t)
    found_f = cnt_f >= t
    cnt_r = _strand_count(planes, s, "r", k, t)
    tagged = found_f | (cnt_r >= t)
    return tagged, found_f


@functools.partial(jax.jit, static_argnames=("k", "t"))
def search_batch_fwd(planes: jax.Array, codes: jax.Array, k: int, t: int):
    """Forward-strand-only classification. The reference only consults the
    reverse strand when the forward scan failed (search_reads.h:64-83), so
    the streaming engine runs this pass on everything and the rc pass only
    on the fwd-untagged remainder (exact same final tags)."""
    s = window_scan(codes, k, strand="fwd")
    return _strand_count(planes, s, "f", k, t) >= t


@functools.partial(jax.jit, static_argnames=("k", "t"))
def search_batch_rc(planes: jax.Array, codes: jax.Array, k: int, t: int):
    """Reverse-complement-strand-only classification."""
    s = window_scan(codes, k, strand="rc")
    return _strand_count(planes, s, "r", k, t) >= t


@functools.partial(jax.jit, static_argnames=("length", "k", "t"))
def search_batch_fwd_packed(planes, codes2, valid, length: int, k: int,
                            t: int):
    codes = unpack_codes(codes2, valid, length)
    s = window_scan(codes, k, strand="fwd")
    return _strand_count(planes, s, "f", k, t) >= t


@functools.partial(jax.jit, static_argnames=("length", "k", "t"))
def search_batch_rc_packed(planes, codes2, valid, length: int, k: int,
                           t: int):
    codes = unpack_codes(codes2, valid, length)
    s = window_scan(codes, k, strand="rc")
    return _strand_count(planes, s, "r", k, t) >= t


# --------------------------------------------------------------------------
# Build (index)
# --------------------------------------------------------------------------

def _segmented_or_last(words, masks):
    """Given per-entry (word, mask) sorted by word, OR the masks of equal
    words together and return the combined mask on the LAST entry of each
    run (zeros elsewhere)."""

    def combine(left, right):
        wl, ml = left
        wr, mr = right
        merged = jnp.where(wl == wr, ml | mr, mr)
        return wr, merged

    _, or_masks = jax.lax.associative_scan(combine, (words, masks))
    is_last = jnp.concatenate([words[1:] != words[:-1],
                               jnp.ones((1,), dtype=bool)])
    return jnp.where(is_last, or_masks, 0)


@functools.partial(jax.jit, static_argnames=("length", "k"),
                   donate_argnums=(0,))
def build_chunk_packed(planes, codes2, valid, length: int, k: int):
    codes = unpack_codes(codes2, valid, length)
    return _build_chunk_impl(planes, codes, k)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def build_chunk(planes: jax.Array, codes: jax.Array, k: int):
    """Feed every complete forward-strand window of every read into the 4
    membership planes (reference include/index_reads.h:49-61 feeds all
    overlapping k-mers, forward only).

    Implementation: per plane, sort the (hi, lo) keys, segmented-OR the bit
    masks per word, drop bits already present in the plane (gather), then a
    collision-free scatter-add. Exactly equivalent to scatter-OR.
    """
    return _build_chunk_impl(planes, codes, k)


def _build_chunk_impl(planes: jax.Array, codes: jax.Array, k: int):
    s = window_scan(codes, k, strand="fwd")
    ok = s["ok"].reshape(-1)
    w = plane_words(k)

    a_lo, a_hi = s["fa_lo"].reshape(-1), s["fa_hi"].reshape(-1)
    b_lo, b_hi = s["fb_lo"].reshape(-1), s["fb_hi"].reshape(-1)
    plane_keys = (
        (a_lo, a_hi),
        (b_lo, b_hi),
        (a_lo ^ b_lo, a_hi ^ b_hi),
        (a_lo | b_lo, a_hi | b_hi),
    )
    for p, (lo, hi) in enumerate(plane_keys):
        word, mask = _plane_addr(lo, hi, k)
        # invalid windows -> out-of-range word, mask 0; sorts to the end
        word = jnp.where(ok, word, jnp.uint32(0xFFFFFFFF))
        mask = jnp.where(ok, mask, jnp.uint32(0))
        word, mask = jax.lax.sort((word, mask), num_keys=1)
        or_mask = _segmented_or_last(word, mask)
        word = jnp.minimum(word, jnp.uint32(w - 1))
        flat_idx = (word + jnp.uint32(p * w)).astype(jnp.int32)
        existing = jnp.take(planes, flat_idx, axis=0)
        add_mask = or_mask & ~existing
        planes = planes.at[flat_idx].add(add_mask, mode="drop",
                                         unique_indices=False)
    return planes


@functools.partial(jax.jit, static_argnames=("k",))
def count_kmers(codes: jax.Array, k: int):
    """Number of complete windows (indexable k-mers) per read - the quantity
    accumulated against max_kmer for partition boundaries
    (reference index_reads.h:55-58)."""
    codes_t = codes.T.astype(jnp.int32)

    def step(run, c):
        run = jnp.where(c < INVALID_CODE, run + 1, 0)
        return run, run >= k

    _, oks = jax.lax.scan(step, codes_t[0] * 0, codes_t)
    return oks.sum(axis=0, dtype=jnp.int32).T
