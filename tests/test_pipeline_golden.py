"""End-to-end pipeline goldens: the full all-vs-all driver must reproduce
the reference Commet.py run byte-for-byte (.bv files and the 3 CSV
matrices) on the reference's own acceptance datasets."""

import os
import shutil

import pytest

from commet_tpu.cli import commet as commet_cli

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _cmp_dirs(out_dir, golden_dir, names):
    for name in names:
        a = os.path.join(out_dir, name)
        b = os.path.join(golden_dir, name)
        with open(a, "rb") as f1, open(b, "rb") as f2:
            assert f1.read() == f2.read(), name


def test_py2_float_repr():
    """The reference driver is python 2: its CSV floats are CPython 2.7
    str(float) = %.12g with ADD_DOT_0 (12 significant digits). Cases below
    are documented CPython 2.7 outputs."""
    from commet_tpu.cli.commet import py2_str_float
    cases = [
        (100 * 4000 / 12000.0, "33.3333333333"),
        (100 * 5000 / 22000.0, "22.7272727273"),
        (100 * 14000 / 22000.0, "63.6363636364"),
        (100.0, "100.0"),
        (0.0, "0.0"),
        (0.35, "0.35"),
        (4.0, "4.0"),
        (1e16, "1e+16"),
        (0.008333333333333333, "0.00833333333333"),
        (3.3333333333333335e-06, "3.33333333333e-06"),
        (0.3570835409400432, "0.35708354094"),
    ]
    for v, want in cases:
        assert py2_str_float(v) == want, (v, want)


def test_abcde_pipeline(tmp_path, monkeypatch):
    """README smoke test: Commet.py ABCDE_bench/sets_config.txt -k 32
    (reference README:49-52)."""
    monkeypatch.chdir("/root/reference")
    out = str(tmp_path / "out") + "/"
    rc = commet_cli.main(["ABCDE_bench/sets_config.txt", "-k", "32",
                          "-o", out, "--no-plots"])
    assert rc == 0
    gold = os.path.join(GOLDEN, "abcde")
    names = [n for n in os.listdir(gold) if n.endswith(".bv")]
    assert len(names) == 12
    _cmp_dirs(out, gold, names)
    _cmp_dirs(out, gold, ["matrix_plain.csv", "matrix_percentage.csv",
                          "matrix_normalized.csv"])
    # per-pair log counter lines
    for logname in ("set2_in_set1", "set3_in_set1", "set3_in_set2",
                    "set1_in_set2", "set1_in_set3", "set2_in_set3"):
        with open(os.path.join(out, logname + ".log")) as f:
            got = f.read().splitlines()[-1]
        with open(os.path.join(gold, logname + ".log.counters")) as f:
            want = f.read().strip()
        assert got == want, logname


@pytest.mark.slow
def test_dissym_pipeline(tmp_path, monkeypatch):
    """test_dissymmetry at default k=33: asymmetric plain/percentage
    matrices, symmetric normalized matrix
    (reference doc/commet_user_guide.md:78-82)."""
    # the fof uses paths relative to the reference checkout (read-only is
    # fine: the driver only writes to out_dir)
    monkeypatch.chdir("/root/reference")
    fof = tmp_path / "fof.txt"
    fof.write_text("set1: test_dissymmetry/A.fa\n"
                   "set2: test_dissymmetry/B.fa\n"
                   "set3: test_dissymmetry/C.fa\n")
    out = str(tmp_path / "out") + "/"
    rc = commet_cli.main([str(fof), "-o", out, "--no-plots"])
    assert rc == 0
    gold = os.path.join(GOLDEN, "dissym")
    names = [n for n in os.listdir(gold) if n.endswith(".bv")]
    _cmp_dirs(out, gold, names)
    _cmp_dirs(out, gold, ["matrix_plain.csv", "matrix_percentage.csv",
                          "matrix_normalized.csv"])
