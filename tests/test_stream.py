"""Sorted-set join streaming probe (core/stream.py) vs the oracle and the
gather cascade. Pallas runs in interpreter mode on the CPU backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from commet_tpu.core import kernels, stream
from commet_tpu.io.reads import CODE_LUT

from oracle import index_reads, search_read

BASES = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)


def random_seqs(rng, n, lmin, lmax, n_frac=0.05):
    seqs = []
    for _ in range(n):
        ln = int(rng.integers(lmin, lmax + 1))
        probs = np.full(10, (1 - n_frac) / 8)
        probs[4] = probs[9] = n_frac / 2
        seqs.append(bytes(rng.choice(BASES, size=ln, p=probs)))
    return seqs


def encode(seqs, lpad):
    out = np.full((len(seqs), lpad), kernels.INVALID_CODE, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr = CODE_LUT[np.frombuffer(s, dtype=np.uint8)]
        out[i, : len(s)] = arr[:lpad]
    return out.astype(np.int32)


def implant(rng, idx_seqs, qry_seqs, k):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
            "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}
    for i in range(0, len(qry_seqs), 2):
        donor = idx_seqs[int(rng.integers(len(idx_seqs)))].decode()
        if len(donor) < k:
            continue
        start = int(rng.integers(0, len(donor) - k + 1))
        frag = donor[start : start + k]
        if rng.random() < 0.5:
            frag = "".join(comp[c] for c in reversed(frag))
        q = qry_seqs[i].decode()
        pos = int(rng.integers(0, max(1, len(q) - k + 1)))
        qry_seqs[i] = (q[:pos] + frag + q[pos + k :]).encode()


def build_all(idx_codes, k):
    """Planes + the sorted (keya, keyb) index planes from the same data."""
    planes = kernels.alloc_planes(k)
    planes = kernels.build_chunk(planes, jnp.asarray(idx_codes), k)
    ka, kb, hib, flags, cnt = stream.chunk_index_keys_codes(
        jnp.asarray(idx_codes), k)
    ika, ikb, ihib, mi = stream.finalize_index_keys(
        [ka], [kb], [hib], [flags], [int(cnt)], ki=2, wide=k > 32)
    return planes, ika, ikb, ihib, mi


def exact_key_sets(idx_codes, k):
    """keya set and (keya, keyb) pair set of the index's valid forward
    windows (numpy oracle for the join verdicts)."""
    wk = kernels.window_keys(jnp.asarray(idx_codes), k, "fwd")
    ok = np.asarray(wk["ok"]).reshape(-1)
    fa = np.asarray(wk["fa_lo"]).reshape(-1)[ok]
    fb = np.asarray(wk["fb_lo"]).reshape(-1)[ok]
    return set(fa.tolist()), set(zip(fa.tolist(), fb.tolist()))


@pytest.mark.parametrize("k", [15, 21, 31, 32])
@pytest.mark.parametrize("t", [1, 2, 3])
def test_join_membership_matches_plane_gather(k, t):
    rng = np.random.default_rng(99 + k * 10 + t)
    idx_seqs = random_seqs(rng, 25, k, 3 * k + 8)
    qry_seqs = random_seqs(rng, 40, k - 1, 3 * k + 8)
    implant(rng, idx_seqs, qry_seqs, k)
    lpad = max(max(len(s) for s in qry_seqs), k)
    idx_codes = encode(idx_seqs, max(max(len(s) for s in idx_seqs), k))
    planes, ika, ikb, ihib, mi = build_all(idx_codes, k)
    aset, pairset = exact_key_sets(idx_codes, k)

    codes = jnp.asarray(encode(qry_seqs, lpad))
    wk = kernels.window_keys(codes, k, "both")
    mem = stream._membership_stream(ika, ikb, mi, wk, chunk=512, ki=2,
                                    interpret=True, ihib=ihib, k=k)
    ok = np.asarray(wk["ok"])
    mem = np.asarray(mem)
    # exact plane-A membership for comparison (plane A stores exactly the
    # keya set: injective key->bit map)
    wA, mA = kernels._plane_addr(wk["fa_lo"], wk["fa_hi"], k)
    exp_f = np.asarray(kernels._test_plane(planes, 0, wA, mA, k)) & ok
    wA, mA = kernels._plane_addr(wk["ra_lo"], wk["ra_hi"], k)
    exp_r = np.asarray(kernels._test_plane(planes, 0, wA, mA, k)) & ok
    got_f, got_r = mem[:, 0], mem[:, 1]
    decided_f = got_f != stream.RESIDUAL
    decided_r = got_r != stream.RESIDUAL
    assert (decided_f & ok).any()
    # keya membership (CAND or CONF) must equal the plane-A gather verdict
    np.testing.assert_array_equal(
        (np.isin(got_f, (stream.CAND, stream.CONF))) & ok & decided_f,
        exp_f & decided_f)
    np.testing.assert_array_equal(
        (np.isin(got_r, (stream.CAND, stream.CONF))) & ok & decided_r,
        exp_r & decided_r)
    # CONF windows carry exact (keya, keyb) pairs of the index
    for strand, pref in ((0, "f"), (1, "r")):
        got = mem[:, strand]
        fa = np.asarray(wk[pref + "a_lo"])
        fb = np.asarray(wk[pref + "b_lo"])
        conf_pos = np.argwhere((got == stream.CONF) & ok)
        assert len(conf_pos) > 0 or strand == 1
        for r, c in conf_pos[:200]:
            assert (int(fa[r, c]), int(fb[r, c])) in pairset


@pytest.mark.parametrize("k", [15, 31, 32])
@pytest.mark.parametrize("t", [1, 2])
def test_stream_cascade_matches_oracle(k, t):
    rng = np.random.default_rng(4242 + k * 10 + t)
    idx_seqs = random_seqs(rng, 30, k, 3 * k + 10)
    qry_seqs = random_seqs(rng, 60, k - 2, 3 * k + 10)
    implant(rng, idx_seqs, qry_seqs, k)
    bloom = index_reads([s.decode() for s in idx_seqs], k)
    expected = np.array(
        [search_read(bloom, s.decode(), k, t) for s in qry_seqs])

    lpad = max(max(len(s) for s in qry_seqs), k)
    idx_codes = encode(idx_seqs, max(max(len(s) for s in idx_seqs), k))
    planes, ika, ikb, ihib, mi = build_all(idx_codes, k)
    codes = jnp.asarray(encode(qry_seqs, lpad))

    verdict = np.asarray(stream.probe_cascade2_stream_codes(
        ika, ikb, mi, codes, k, t, chunk=512, ki=2, interpret=True,
        ihib=ihib))
    tags = verdict == kernels.VERDICT_TAGGED
    amb = verdict == kernels.VERDICT_AMBIG
    # sound where decided; ambiguous rows must be resolvable by the
    # exact probe (and not contradict it)
    full, _ = kernels.search_batch(planes, codes, k, t)
    full = np.asarray(full)
    np.testing.assert_array_equal(tags[~amb], full[~amb])
    np.testing.assert_array_equal(np.where(amb, full, tags), expected)
    # the stream must decide the bulk of the reads on its own
    assert amb.mean() < 0.5


@pytest.mark.parametrize("k", [33, 34])
@pytest.mark.parametrize("t", [1, 2])
def test_wide_stream_matches_oracle(k, t):
    """k > 32: hi key bits ride packed side streams; verdicts must stay
    sound vs the reference oracle (no planes -- they'd be 4-8 GiB)."""
    rng = np.random.default_rng(7700 + k * 10 + t)
    idx_seqs = random_seqs(rng, 25, k, 3 * k + 12)
    qry_seqs = random_seqs(rng, 50, k - 2, 3 * k + 12)
    implant(rng, idx_seqs, qry_seqs, k)
    bloom = index_reads([s.decode() for s in idx_seqs], k)
    expected = np.array(
        [search_read(bloom, s.decode(), k, t) for s in qry_seqs])

    lpad = max(max(len(s) for s in qry_seqs), k)
    idx_codes = encode(idx_seqs, max(max(len(s) for s in idx_seqs), k))
    ka, kb, hib, flags, cnt = stream.chunk_index_keys_codes(
        jnp.asarray(idx_codes), k)
    ika, ikb, ihib, mi = stream.finalize_index_keys(
        [ka], [kb], [hib], [flags], [int(cnt)], ki=2, wide=True)
    assert ihib is not None
    codes = jnp.asarray(encode(qry_seqs, lpad))
    verdict = np.asarray(stream.probe_cascade2_stream_codes(
        ika, ikb, mi, codes, k, t, chunk=512, ki=2, interpret=True,
        ihib=ihib))
    tags = verdict == kernels.VERDICT_TAGGED
    amb = verdict == kernels.VERDICT_AMBIG
    np.testing.assert_array_equal(tags[~amb], expected[~amb])
    if t == 1:  # single implanted k-mers tag at t=1
        assert tags.any()
    assert amb.mean() < 0.5


def test_wide_straddling_run_never_nonmem():
    """Soundness regression (code-review finding): an equal-a_lo run that
    straddles the streamed window edge with DIFFERENT hi bits outside must
    never yield NONMEM for a query matching the outside part -- the index
    is sorted by the low word only, so bracketing covers a_lo, not the
    full wide key. The buggy kernel returned NONMEM here (silent wrong
    UNTAGGED at k=33)."""
    ri, ki = 8, 2  # window = 2*ki*128 = 512 of 1024 entries
    flat_lo = np.empty(1024, np.uint32)
    flat_lo[:500] = np.arange(500)
    flat_lo[500:531] = 500  # equal-lo run straddling the [0, 512) window
    flat_lo[531:] = np.arange(600, 600 + 1024 - 531)
    hib = np.zeros(1024, np.uint32)
    hib[512:531] = 0x0100  # hi bits differ OUTSIDE the window only
    ikb = np.full(1024, 7, np.uint32)
    ika = jnp.asarray(flat_lo.reshape(ri, 128))
    ikbj = jnp.asarray(ikb.reshape(ri, 128))
    ihib = jnp.asarray(hib.reshape(ri, 128))
    mi = jnp.asarray(1024, jnp.int32)

    qa = np.zeros(512, np.uint32)
    qa[-1] = 500  # sorted; first query 0 anchors the window at ih=0
    qb = np.full(512, 7, np.uint32)
    qh = np.zeros(512, np.uint32)
    qh[-1] = 0x0100  # matches only the out-of-window part of the run
    got = np.asarray(stream.join_membership(
        ika, ikbj, mi, jnp.asarray(qa), jnp.asarray(qb), chunk=512, ki=ki,
        interpret=True, ihib=ihib, qh_sorted=jnp.asarray(qh)))
    # the key IS in the index (positions 512..530); NONMEM would be wrong
    assert got[-1] in (stream.CAND, stream.RESIDUAL), got[-1]
    # and the in-window hi pattern still confirms exactly
    qh2 = np.zeros(512, np.uint32)
    got2 = np.asarray(stream.join_membership(
        ika, ikbj, mi, jnp.asarray(qa), jnp.asarray(qb), chunk=512, ki=ki,
        interpret=True, ihib=ihib, qh_sorted=jnp.asarray(qh2)))
    assert got2[-1] == stream.CONF


@pytest.mark.parametrize("k", [15, 31, 32])
def test_probe_exact_sets_matches_plane_probe(k):
    """probe_exact_sets (sorted-set membership of all four derived keys,
    the planeless fallback) must equal the full 4-plane gather probe."""
    t = 2
    rng = np.random.default_rng(808 + k)
    idx_seqs = random_seqs(rng, 30, k, 3 * k + 10)
    qry_seqs = random_seqs(rng, 80, k - 2, 3 * k + 10)
    implant(rng, idx_seqs, qry_seqs, k)
    lpad = max(max(len(s) for s in qry_seqs), k)
    idx_codes = encode(idx_seqs, max(max(len(s) for s in idx_seqs), k))

    planes = kernels.alloc_planes(k)
    planes = kernels.build_chunk(planes, jnp.asarray(idx_codes), k)
    ka, kb, hib, flags, cnt = stream.chunk_index_keys_codes(
        jnp.asarray(idx_codes), k)
    sx = stream.finalize_index([ka], [kb], [hib], [flags], [int(cnt)],
                               ki=2)

    qcodes = encode(qry_seqs, lpad).astype(np.uint8)
    c2, vd = kernels.pack_codes_np(qcodes)
    for tt in (1, 2):
        got = np.asarray(stream.probe_exact_sets(
            sx.sa, sx.sb, sx.sc, sx.sd, sx.mi, jnp.asarray(c2),
            jnp.asarray(vd), lpad, k, tt))
        want, _ = kernels.search_batch(planes,
                                       jnp.asarray(qcodes, jnp.int32),
                                       k, tt)
        np.testing.assert_array_equal(got, np.asarray(want))
        if tt == 1:  # single implanted k-mers: must tag at t=1
            assert got.any()


def test_finalize_index_keys_sentinel_ties():
    """A real keya equal to 0xFFFFFFFF must stay inside the valid prefix."""
    keys = jnp.asarray([5, 0xFFFFFFFF, 7], dtype=jnp.uint32)
    keysb = jnp.asarray([50, 51, 70], dtype=jnp.uint32)
    flags = jnp.asarray([0, 0, 0], dtype=jnp.uint32)
    ika, ikb, _ihib, mi = stream.finalize_index_keys(
        [keys], [keysb], None, [flags], [3], ki=2)
    flat = np.asarray(ika).reshape(-1)
    assert int(mi) == 3
    assert flat[2] == 0xFFFFFFFF  # sorted: 5, 7, real-0xFFFFFFFF, pads...
    qa = np.array(sorted([5, 6, 0xFFFFFFFF] + [0] * 509), dtype=np.uint32)
    qb = np.zeros(512, dtype=np.uint32)
    qb[qa == 5] = 50
    qb[qa == 0xFFFFFFFF] = 51
    got = np.asarray(stream.join_membership(
        ika, ikb, mi, jnp.asarray(qa), jnp.asarray(qb), chunk=512, ki=2,
        interpret=True))
    lookup = dict(zip(qa.tolist(), got.tolist()))
    assert lookup[5] == stream.CONF
    assert lookup[6] == stream.NONMEM
    assert lookup[0xFFFFFFFF] == stream.CONF
    # keya present but keyb mismatch -> CAND (possible cross-k-mer FP)
    qb2 = np.where(qa == 5, 999, qb).astype(np.uint32)
    got2 = np.asarray(stream.join_membership(
        ika, ikb, mi, jnp.asarray(qa), jnp.asarray(qb2), chunk=512, ki=2,
        interpret=True))
    assert dict(zip(qa.tolist(), got2.tolist()))[5] == stream.CAND


@pytest.mark.parametrize("k", [15, 32, 33])
@pytest.mark.parametrize("n_s", [1, 3, 17])
def test_probe_multi_matches_single(k, n_s):
    """The amortized multi-index probe (one sort + one packed unsort for S
    index partitions) must give exactly the per-index verdicts of the
    single-index probe at the same join geometry — including S > 15, which
    spans multiple packed unsort operands."""
    t = 2
    rng = np.random.default_rng(31000 + k * 100 + n_s)
    wide = k > 32
    idxs = []
    for s in range(n_s):
        idx_seqs = random_seqs(rng, 12, k, 3 * k + 8)
        idx_codes = encode(idx_seqs, max(max(len(x) for x in idx_seqs), k))
        ka, kb, hib, flags, cnt = stream.chunk_index_keys_codes(
            jnp.asarray(idx_codes), k)
        ika, ikb, ihib, mi = stream.finalize_index_keys(
            [ka], [kb], [hib], [flags], [int(cnt)], ki=2, wide=wide)
        idxs.append((ika, ikb, mi, idx_seqs, ihib))
    qry_seqs = random_seqs(rng, 40, k - 1, 3 * k + 8)
    implant(rng, idxs[0][3], qry_seqs, k)
    lpad = max(max(len(s) for s in qry_seqs), k)
    codes = jnp.asarray(encode(qry_seqs, lpad))

    got = np.asarray(stream.probe_multi_stream_codes(
        tuple(x[0] for x in idxs), tuple(x[1] for x in idxs),
        tuple(x[2] for x in idxs), codes, k, t, chunk=512, ki=2,
        interpret=True,
        ihibs=tuple(x[4] for x in idxs) if wide else None))
    assert got.shape == (n_s, len(qry_seqs))
    for s, (ika, ikb, mi, _seqs, ihib) in enumerate(idxs):
        want = np.asarray(stream.probe_cascade2_stream_codes(
            ika, ikb, mi, codes, k, t, chunk=512, ki=2, interpret=True,
            ihib=ihib))
        np.testing.assert_array_equal(got[s], want, err_msg=f"index {s}")


def test_probe_multi_packed_dirty_batch():
    """Dirty batches (internal N bases) through the packed multi probe."""
    k, t, n_s = 21, 2, 2
    rng = np.random.default_rng(555)
    idxs = []
    for s in range(n_s):
        idx_seqs = random_seqs(rng, 15, k, 3 * k + 8, n_frac=0.1)
        idx_codes = encode(idx_seqs, max(max(len(x) for x in idx_seqs), k))
        ka, kb, hib, flags, cnt = stream.chunk_index_keys_codes(
            jnp.asarray(idx_codes), k)
        ika, ikb, _hib, mi = stream.finalize_index_keys(
            [ka], [kb], None, [flags], [int(cnt)], ki=2)
        idxs.append((ika, ikb, mi))
    qry_seqs = random_seqs(rng, 30, k - 1, 3 * k + 8, n_frac=0.15)
    lpad = max(max(len(s) for s in qry_seqs), k)
    qcodes = encode(qry_seqs, lpad).astype(np.uint8)
    c2, vd = kernels.pack_codes_np(qcodes)
    got = np.asarray(stream.probe_multi_stream_packed(
        tuple(x[0] for x in idxs), tuple(x[1] for x in idxs),
        tuple(x[2] for x in idxs), jnp.asarray(c2), jnp.asarray(vd), lpad,
        k, t, chunk=512, ki=2, interpret=True))
    for s, (ika, ikb, mi) in enumerate(idxs):
        want = np.asarray(stream.probe_cascade2_stream_packed(
            ika, ikb, mi, jnp.asarray(c2), jnp.asarray(vd), lpad, k, t,
            chunk=512, ki=2, interpret=True))
        np.testing.assert_array_equal(got[s], want, err_msg=f"index {s}")


def test_join_membership_empty_index():
    keys = jnp.zeros((0,), jnp.uint32)
    flags = jnp.zeros((0,), jnp.uint32)
    ika, ikb, _ihib, mi = stream.finalize_index_keys(
        [keys], [keys], None, [flags], [0], ki=2)
    q = jnp.asarray(np.arange(512, dtype=np.uint32))
    got = np.asarray(stream.join_membership(ika, ikb, mi, q, q, chunk=512,
                                            ki=2, interpret=True))
    assert (got == stream.NONMEM).all()
