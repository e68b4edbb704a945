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
