"""Fault injection + recovery at the driver level: a pair-comparison job
that crashes mid-pipeline fails the --jobs run (error propagation through
the JobGraph), and a plain re-run resumes from the .bv/marker state,
recomputing only what the crash left unfinished (the reference's implicit
SGE restartability, Commet.py re-run semantics, made testable)."""

import os

import numpy as np
import pytest

from commet_tpu.cli import commet as commet_cli
from commet_tpu.engine.engine import Engine

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_fasta(path, rng, n=60, length=90):
    with open(path, "wb") as f:
        for i in range(n):
            f.write(b">r%d\n%s\n" % (i, bytes(rng.choice(BASES, size=length))))


def setup_pipeline(tmp_path):
    rng = np.random.default_rng(13)
    fof = str(tmp_path / "fof.txt")
    with open(fof, "w") as f:
        for s in range(3):
            p = str(tmp_path / f"set{s}.fa")
            write_fasta(p, rng)
            f.write(f"set{s}: {p}\n")
    return fof, str(tmp_path / "out") + "/"


def test_crash_mid_pipeline_then_resume(tmp_path, monkeypatch):
    fof, out = setup_pipeline(tmp_path)

    real = Engine.index_and_search
    state = {"calls": 0}

    def flaky(self, index_set, query_sets, **kw):
        state["calls"] += 1
        if state["calls"] == 3:  # fault: third engine stage dies
            raise RuntimeError("injected fault: chip lost")
        return real(self, index_set, query_sets, **kw)

    monkeypatch.setattr(Engine, "index_and_search", flaky)
    with pytest.raises(RuntimeError, match="injected fault"):
        commet_cli.main([fof, "-k", "15", "--jobs", "2", "-o", out,
                         "--no-plots"])
    assert state["calls"] >= 3

    monkeypatch.setattr(Engine, "index_and_search", real)
    done_before = {f for f in os.listdir(out) if f.startswith(".job_")}
    assert done_before, "some stages must have completed before the fault"
    rc = commet_cli.main([fof, "-k", "15", "--jobs", "2", "-o", out,
                         "--no-plots"])
    assert rc == 0
    for m in ("matrix_plain.csv", "matrix_percentage.csv",
              "matrix_normalized.csv"):
        assert os.path.exists(out + m)
    # completed-before-crash stages kept their markers (were skipped)
    done_after = {f for f in os.listdir(out) if f.startswith(".job_")}
    assert done_before <= done_after
