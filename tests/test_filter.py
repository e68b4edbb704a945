"""filter_reads: byte-exact .bv outputs vs reference-generated goldens."""

import os

import pytest

from commet_tpu.cli import filter_reads as filter_cli

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unit")
ABCDE = "/root/reference/ABCDE_bench"


def _same_bytes(a, b):
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.parametrize("fa,args,golden", [
    ("A.fa", ["-l", "100", "-e", "1.9", "-n", "2"], "A_filtered.bv"),
    ("B.fa", ["-l", "0", "-e", "1.99"], "B_filtered_e.bv"),
    ("C.fa", ["-l", "0", "-e", "0", "-m", "100"], "C_filtered_m.bv"),
])
def test_filter_golden(tmp_path, monkeypatch, fa, args, golden):
    # run from the reference dir so input paths (hence .bv header comments)
    # match the golden run byte-for-byte
    monkeypatch.chdir("/root/reference")
    out = str(tmp_path / golden)
    rc = filter_cli.main([f"ABCDE_bench/{fa}", *args, "-o", out])
    assert rc == 0
    _same_bytes(out, os.path.join(GOLDEN, golden))


def test_filter_batch_device_matches_host():
    """Device-side class counting (kernels.class_counts_packed) + host
    Shannon epilogue must reproduce the pure-host filter exactly,
    including N-heavy and empty-read quirks."""
    import numpy as np

    from commet_tpu.core import filter as cf
    from commet_tpu.core import kernels

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)
    seqs = []
    for i in range(300):
        ln = int(rng.integers(20, 120))
        p = np.full(10, 0.092)
        p[4] = p[9] = 0.04 + (0.3 if i % 7 == 0 else 0)
        p = p / p.sum()
        seqs.append(bytes(rng.choice(bases, size=ln, p=p)))
    seqs[250] = b""  # first-empty-read quirk

    lpad = 128
    from commet_tpu.io.reads import CODE_LUT
    codes = np.full((len(seqs), lpad), kernels.INVALID_CODE, dtype=np.uint8)
    lengths = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        arr = CODE_LUT[np.frombuffer(s, dtype=np.uint8)]
        codes[i, : len(s)] = arr
        lengths[i] = len(s)
    c2, vd = kernels.pack_codes_np(codes)

    for kw in ({"min_size": 30, "min_shannon": 1.9},
               {"max_n": 2, "min_shannon": 1.2, "max_reads": 120},
               {"min_shannon": 1.99999}):
        keep_d, stats_d = cf.filter_batch_device(c2, vd, lengths, lpad, **kw)
        keep_h, stats_h = cf.filter_reads(seqs, **kw)
        np.testing.assert_array_equal(keep_d, keep_h, err_msg=str(kw))
        assert stats_d == stats_h, kw
