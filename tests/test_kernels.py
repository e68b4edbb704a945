"""Property tests: device kernels vs the literal C++-transcription oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from commet_tpu.core import kernels
from commet_tpu.io.reads import CODE_LUT

from oracle import BloomOracle, count_kmers_read, index_reads, search_read

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


@pytest.mark.parametrize("k", [8, 15, 21, 31, 32, 33])
@pytest.mark.parametrize("t", [1, 2, 3])
def test_search_matches_oracle(k, t):
    rng = np.random.default_rng(1234 + k * 10 + t)
    idx_seqs = random_seqs(rng, 30, k, 3 * k + 10)
    qry_seqs = random_seqs(rng, 60, k - 2, 3 * k + 10)
    # make half the queries contain real index k-mers (fwd and rc)
    for i in range(0, len(qry_seqs), 2):
        donor = idx_seqs[int(rng.integers(len(idx_seqs)))].decode()
        if len(donor) >= k:
            start = int(rng.integers(0, len(donor) - k + 1))
            frag = donor[start : start + k]
            if rng.random() < 0.5:
                comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
                        "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}
                frag = "".join(comp[c] for c in reversed(frag))
            q = qry_seqs[i].decode()
            pos = int(rng.integers(0, max(1, len(q) - k + 1)))
            qry_seqs[i] = (q[:pos] + frag + q[pos + k :]).encode()

    bloom = index_reads([s.decode() for s in idx_seqs], k)
    expected = np.array(
        [search_read(bloom, s.decode(), k, t) for s in qry_seqs])

    lpad = max(max(len(s) for s in qry_seqs), k)
    planes = kernels.alloc_planes(k)
    planes = kernels.build_chunk(planes, jnp.asarray(encode(idx_seqs, lpad)), k)
    qcodes = jnp.asarray(encode(qry_seqs, lpad))
    tagged, _ = kernels.search_batch(planes, qcodes, k, t)
    got = np.asarray(tagged)
    assert (got == expected).all(), np.nonzero(got != expected)
    # split-strand kernels must union to the same result
    f = np.asarray(kernels.search_batch_fwd(planes, qcodes, k, t))
    r = np.asarray(kernels.search_batch_rc(planes, qcodes, k, t))
    assert ((f | r) == expected).all()


@pytest.mark.parametrize("k", [8, 32, 33])
def test_count_kmers(k):
    rng = np.random.default_rng(99 + k)
    seqs = random_seqs(rng, 40, 1, 4 * k, n_frac=0.1)
    lpad = max(max(len(s) for s in seqs), k)
    got = np.asarray(kernels.count_kmers(jnp.asarray(encode(seqs, lpad)), k))
    expected = [count_kmers_read(s.decode(), k) for s in seqs]
    assert got.tolist() == expected


def test_build_is_scatter_or():
    """Building twice (duplicate feeds) must be idempotent."""
    k = 15
    rng = np.random.default_rng(7)
    seqs = random_seqs(rng, 20, k, 60)
    lpad = 60
    codes = jnp.asarray(encode(seqs, lpad))
    p1 = kernels.build_chunk(kernels.alloc_planes(k), codes, k)
    p1 = np.asarray(p1)
    p2 = kernels.build_chunk(jnp.asarray(p1), codes, k)
    assert (np.asarray(p2) == p1).all()
