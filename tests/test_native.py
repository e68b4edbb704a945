"""Native C++ IO layer vs pure-Python / device implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from commet_tpu.core import kernels
from commet_tpu.io.reads import CODE_LUT, parse_fasta, parse_fastq, _read_raw

native = pytest.importorskip("commet_tpu.native.parser")
if not native.available():  # pragma: no cover
    pytest.skip("native lib not built", allow_module_level=True)


@pytest.mark.parametrize("path", [
    "/root/reference/ABCDE_bench/A.fa",
    "/root/repo/tests/data/qb.fq",
    "/root/repo/tests/data/qa.fq.gz",
    "/root/repo/tests/data/B.fa.gz",
])
def test_native_parse_matches_python(path):
    d = native.parse_file(path)
    raw = _read_raw(path)
    seqs, _ = parse_fasta(raw) if d["format"] == "fasta" else parse_fastq(raw)
    assert d["n_reads"] == len(seqs)
    assert (d["lengths"] == np.array([len(s) for s in seqs])).all()
    flat = np.frombuffer(b"".join(seqs), dtype=np.uint8)
    assert (d["codes"] == CODE_LUT[flat]).all()
    # class counts
    for i in (0, len(seqs) // 2, len(seqs) - 1):
        s = CODE_LUT[np.frombuffer(seqs[i], dtype=np.uint8)]
        expected = np.bincount(s, minlength=5)[:5]
        assert (d["class_counts"][i] == expected).all()


@pytest.mark.parametrize("k", [15, 32, 33])
def test_native_build_matches_device(k):
    rng = np.random.default_rng(11)
    n, lpad = 48, 80
    codes = rng.integers(0, 4, size=(n, lpad)).astype(np.uint8)
    codes[rng.random(size=codes.shape) < 0.05] = 4
    dev = kernels.build_chunk(kernels.alloc_planes(k),
                              jnp.asarray(codes, jnp.int32), k)
    planes_np = np.zeros(4 * kernels.plane_words(k), dtype=np.uint32)
    offsets = np.arange(n + 1, dtype=np.int64) * lpad
    lengths = np.full(n, lpad, dtype=np.int32)
    native.build_planes_into(planes_np, codes.reshape(-1), offsets, lengths,
                             np.arange(n, dtype=np.int64), k)
    assert (planes_np == np.asarray(dev)).all()


def test_native_count_kmers():
    rng = np.random.default_rng(12)
    n, lpad, k = 32, 70, 21
    codes = rng.integers(0, 5, size=(n, lpad)).astype(np.uint8)
    offsets = np.arange(n + 1, dtype=np.int64) * lpad
    lengths = np.full(n, lpad, dtype=np.int32)
    got = native.count_kmers(codes.reshape(-1), offsets, lengths,
                             np.arange(n, dtype=np.int64), k)
    dev = np.asarray(kernels.count_kmers(jnp.asarray(codes, jnp.int32), k))
    assert (got == dev).all()
