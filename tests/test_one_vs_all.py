"""one_vs_all mode: vector_plain/vector_percentage CSVs byte-identical to
the reference driver run (Commet.py:355-433)."""

import os

from commet_tpu.cli import commet as commet_cli

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "one_vs_all")


def test_one_vs_all_vectors(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/reference")
    out = str(tmp_path / "out") + "/"
    rc = commet_cli.main(["ABCDE_bench/sets_config.txt", "-k", "32",
                          "--one_vs_all", "-o", out, "--no-plots"])
    assert rc == 0
    for name in ("vector_plain.csv", "vector_percentage.csv"):
        with open(out + name, "rb") as f1, \
             open(os.path.join(GOLDEN, name), "rb") as f2:
            assert f1.read() == f2.read(), name
