"""3-pass symmetric comparison goldens: `compare_reads` and
`index_and_search -f` must reproduce the Compareads false-positive
refinement byte-for-byte (reference src/compare_reads.cpp:240-333,
src/index_and_search.cpp:304-391)."""

import os

from commet_tpu.cli import compare_reads as cr_cli
from commet_tpu.cli import index_and_search as ias_cli

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unit")


def _same_bytes(a, b):
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read(), (a, b)


def _fofs(tmp_path):
    fof_a = tmp_path / "a.txt"
    fof_b = tmp_path / "b.txt"
    fof_a.write_text("A: ABCDE_bench/A.fa\n")
    fof_b.write_text("B: ABCDE_bench/B.fa\n")
    return str(fof_a), str(fof_b)


def test_compare_reads_golden(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/reference")
    fof_a, fof_b = _fofs(tmp_path)
    out = str(tmp_path / "out")
    rc = cr_cli.main(["-i", fof_a, "-s", fof_b, "-o", out, "-l", out,
                      "-k", "32", "-t", "2"])
    assert rc == 0
    _same_bytes(os.path.join(out, "A.fa_in_B.bv"),
                os.path.join(GOLDEN, "cr", "A.fa_in_B.bv"))
    _same_bytes(os.path.join(out, "B.fa_in_A.bv"),
                os.path.join(GOLDEN, "cr", "B.fa_in_A.bv"))


def test_ias_full_mode_golden(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/reference")
    fof_a, fof_b = _fofs(tmp_path)
    out = str(tmp_path / "out")
    rc = ias_cli.main(["-i", fof_a, "-s", fof_b, "-o", out, "-l", out,
                       "-k", "32", "-t", "2", "-f"])
    assert rc == 0
    _same_bytes(os.path.join(out, "A.fa_in_B.bv"),
                os.path.join(GOLDEN, "full", "A.fa_in_B.bv"))
    _same_bytes(os.path.join(out, "B.fa_in_A.bv"),
                os.path.join(GOLDEN, "full", "B.fa_in_A.bv"))
    # counters line of each pass log
    for log in ("A_in_B", "B_in_A"):
        with open(os.path.join(out, log + ".log")) as f:
            got = f.read().splitlines()[-1]
        with open(os.path.join(GOLDEN, "full", log + ".log.counters")) as f:
            want = f.read().splitlines()[0]
        assert got == want, log
