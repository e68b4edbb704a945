"""CLI error contract: one-line stderr message + exit code 1 on bad
inputs, mirroring the reference binaries (include/fasta_file.h:55-57,
108-111) instead of Python tracebacks."""

import numpy as np

from commet_tpu.cli.util import guarded


def test_missing_read_file_exits_1(capsys):
    from commet_tpu.cli import index_and_search as ias
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fof = os.path.join(td, "i.txt")
        with open(fof, "w") as f:
            f.write("I: /nonexistent/reads.fa\n")
        rc = guarded(ias.main, ["-i", fof, "-s", fof, "-k", "15",
                                "-o", td, "-l", td])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Cannot open" in err and "reads.fa" in err
    assert "Traceback" not in err


def test_bv_size_mismatch_exits_1(tmp_path, capsys):
    from commet_tpu.cli import filter_reads as fr
    from commet_tpu.io.bv import BitVector

    fa = tmp_path / "a.fa"
    fa.write_text(">r0\nACGTACGTACGT\n>r1\nACGTACGTACGT\n")
    bad_bv = tmp_path / "bad.bv"
    BitVector(5, fill=True).write(str(bad_bv))

    from commet_tpu.io.reads import ReadSet

    def load(_argv):
        rs = ReadSet("A")
        rs.add_file(str(fa), str(bad_bv))
        return 0

    rc = guarded(load)
    assert rc == 1
    err = capsys.readouterr().err
    assert "not equal" in err


def test_bad_fof_missing_file(tmp_path, capsys):
    from commet_tpu.cli import commet as commet_cli

    fof = tmp_path / "fof.txt"
    fof.write_text("S0: /nope/x.fa\n")
    rc = guarded(commet_cli.main, [str(fof), "-o", str(tmp_path / "o"),
                                   "--no-plots"])
    assert rc == 1
    assert "Cannot open" in capsys.readouterr().err
