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
    """Planes + the sorted keya index set from the same batches."""
    planes = kernels.alloc_planes(k)
    planes = kernels.build_chunk(planes, jnp.asarray(idx_codes), k)
    keys, flags, cnt = stream.chunk_index_keys_codes(jnp.asarray(idx_codes), k)
    ik2d, mi = stream.finalize_index_keys([keys], [flags], [int(cnt)], ki=2)
    return planes, ik2d, mi


@pytest.mark.parametrize("k", [15, 21, 31, 32])
@pytest.mark.parametrize("t", [1, 2, 3])
def test_join_membership_matches_plane_gather(k, t):
    rng = np.random.default_rng(99 + k * 10 + t)
    idx_seqs = random_seqs(rng, 25, k, 3 * k + 8)
    qry_seqs = random_seqs(rng, 40, k - 1, 3 * k + 8)
    implant(rng, idx_seqs, qry_seqs, k)
    lpad = max(max(len(s) for s in qry_seqs), k)
    idx_codes = encode(idx_seqs, max(max(len(s) for s in idx_seqs), k))
    planes, ik2d, mi = build_all(idx_codes, k)

    codes = jnp.asarray(encode(qry_seqs, lpad))
    wk = kernels.window_keys(codes, k, "both")
    mem = stream._membership_stream(ik2d, mi, wk, chunk=512, ki=2,
                                    interpret=True)
    ok = np.asarray(wk["ok"])
    mem = np.asarray(mem)
    # exact plane-A membership for comparison
    wA, mA = kernels._plane_addr(wk["fa_lo"], wk["fa_hi"], k)
    exp_f = np.asarray(kernels._test_plane(planes, 0, wA, mA, k)) & ok
    wA, mA = kernels._plane_addr(wk["ra_lo"], wk["ra_hi"], k)
    exp_r = np.asarray(kernels._test_plane(planes, 0, wA, mA, k)) & ok
    got_f, got_r = mem[:, 0], mem[:, 1]
    # every non-residual verdict must agree; residuals allowed only rarely
    assert ((got_f != stream.RESIDUAL) & ok).any()
    np.testing.assert_array_equal((got_f == 1) & ok & (got_f != 2),
                                  exp_f & (got_f != 2))
    np.testing.assert_array_equal((got_r == 1) & ok & (got_r != 2),
                                  exp_r & (got_r != 2))


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
    planes, ik2d, mi = build_all(idx_codes, k)
    codes = jnp.asarray(encode(qry_seqs, lpad))

    for v in (1, 2, 4):
        verdict = np.asarray(stream.probe_cascade2_stream_codes(
            planes, ik2d, mi, codes, k, t, v, chunk=512, ki=2,
            interpret=True))
        tags = verdict == kernels.VERDICT_TAGGED
        amb = verdict == kernels.VERDICT_AMBIG
        # sound where decided; ambiguous rows must be resolvable by the
        # exact probe (and not contradict it)
        full, _ = kernels.search_batch(planes, codes, k, t)
        full = np.asarray(full)
        np.testing.assert_array_equal(tags[~amb], full[~amb])
        np.testing.assert_array_equal(np.where(amb, full, tags), expected)


def test_finalize_index_keys_sentinel_ties():
    """A real key equal to 0xFFFFFFFF must stay inside the valid prefix."""
    keys = jnp.asarray([5, 0xFFFFFFFF, 7], dtype=jnp.uint32)
    flags = jnp.asarray([0, 0, 0], dtype=jnp.uint32)
    ik2d, mi = stream.finalize_index_keys([keys], [flags], [3], ki=2)
    flat = np.asarray(ik2d).reshape(-1)
    assert int(mi) == 3
    assert flat[2] == 0xFFFFFFFF  # sorted: 5, 7, real-0xFFFFFFFF, pads...
    q = jnp.asarray(sorted([5, 6, 0xFFFFFFFF] + [0] * 509), dtype=jnp.uint32)
    got = np.asarray(stream.join_membership(ik2d, mi, q, chunk=512, ki=2,
                                            interpret=True))
    lookup = dict(zip(np.asarray(q).tolist(), got.tolist()))
    assert lookup[5] == 1 and lookup[6] == 0 and lookup[0xFFFFFFFF] == 1


def test_join_membership_empty_index():
    keys = jnp.zeros((0,), jnp.uint32)
    flags = jnp.zeros((0,), jnp.uint32)
    ik2d, mi = stream.finalize_index_keys([keys], [flags], [0], ki=2)
    q = jnp.asarray(sorted(np.arange(512, dtype=np.uint32)))
    got = np.asarray(stream.join_membership(ik2d, mi, q, chunk=512, ki=2,
                                            interpret=True))
    assert (got == 0).all()
