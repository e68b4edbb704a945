"""bvop / extract_reads / generate_random_bv CLI goldens vs the reference
binaries' outputs."""

import os
import subprocess
import sys

import pytest

from commet_tpu.cli import bvop as bvop_cli
from commet_tpu.cli import extract_reads as extract_cli
from commet_tpu.cli import generate_random_bv as grbv_cli
from commet_tpu.io.bv import BitVector

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ABCDE_BV = os.path.join(GOLDEN, "abcde")
UNIT = os.path.join(GOLDEN, "unit")


def _same_bytes(a, b):
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.parametrize("op,flag,golden", [
    ("and", "-a", "and.bv"),
    ("or", "-o", "or.bv"),
    ("andnot", "-d", "andnot.bv"),
])
def test_bvop_binary_ops(tmp_path, monkeypatch, op, flag, golden):
    # golden runs used these exact operand paths (they appear in the output
    # comment), so reproduce them from the repo root
    monkeypatch.chdir("/root/repo")
    a = "tests/golden/abcde/A.fa_in_set2.bv"
    b = "tests/golden/abcde/A.fa_in_set3.bv"
    # regenerate comments identically: the golden was made with abs paths
    a_abs = os.path.join(ABCDE_BV, "A.fa_in_set2.bv")
    b_abs = os.path.join(ABCDE_BV, "A.fa_in_set3.bv")
    out = str(tmp_path / golden)
    rc = bvop_cli.main([a_abs, flag, b_abs, "-p", out])
    assert rc == 0
    _same_bytes(out, os.path.join(UNIT, golden))


def test_bvop_not(tmp_path):
    a_abs = os.path.join(ABCDE_BV, "A.fa_in_set2.bv")
    out = str(tmp_path / "not.bv")
    assert bvop_cli.main([a_abs, "-n", "-p", out]) == 0
    _same_bytes(out, os.path.join(UNIT, "not.bv"))


def test_bvop_info(capsys):
    a_abs = os.path.join(ABCDE_BV, "A.fa_in_set2.bv")
    assert bvop_cli.main([a_abs, "-i"]) == 0
    got = capsys.readouterr().out
    with open(os.path.join(UNIT, "info.txt")) as f:
        assert got == f.read()


def test_extract_reads_fasta(tmp_path):
    out = str(tmp_path / "B_in_set1.fa")
    rc = extract_cli.main(["/root/reference/ABCDE_bench/B.fa",
                           os.path.join(ABCDE_BV, "B.fa_in_set1.bv"),
                           "-o", out])
    assert rc == 0
    _same_bytes(out, os.path.join(UNIT, "B_in_set1.fa"))


def test_extract_reads_gz_roundtrip(tmp_path):
    """gz in -> gz out; content must be the selected records."""
    import gzip

    bv_path = str(tmp_path / "sel.bv")
    bv = BitVector(800)
    for i in range(0, 800, 3):
        bv.set(i)
    bv.write(bv_path)
    out = str(tmp_path / "sel.fq.gz")
    rc = extract_cli.main(["/root/repo/tests/data/qa.fq.gz", bv_path,
                           "-o", out])
    assert rc == 0
    with gzip.open(out, "rt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 4 * len(range(0, 800, 3))
    assert lines[0].startswith("@r0")


def test_generate_random_bv(tmp_path):
    out = str(tmp_path / "r.bv")
    rc = grbv_cli.main(["/root/reference/ABCDE_bench/A.fa", "25", out])
    assert rc == 0
    bv = BitVector.read(out)
    assert bv.size == 12000
    assert 0.15 < bv.nb_one() / 12000 < 0.35
    assert bv.comment == "25 % random reads kept"
