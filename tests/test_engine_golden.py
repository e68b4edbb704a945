"""Engine-level golden tests: byte-exact result .bv's vs the reference
index_and_search binary, including fastq/gzip inputs and multi-partition
runs with the reference's dropped-read boundary quirk."""

import os

import pytest

from commet_tpu.cli import index_and_search as ias_cli
from util import ensure_refbuild, slice_fasta as _slice_fasta

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unit")
DATA = os.path.join(os.path.dirname(__file__), "data")


def _same_bytes(a, b):
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read(), (a, b)


def _counters(path):
    with open(path) as f:
        return f.read().splitlines()[-1]


def _golden_counters(path):
    with open(path) as f:
        return f.read().strip()


def run_ias(tmp_path, index_lines, search_lines, k, t):
    fof_i = tmp_path / "index.txt"
    fof_s = tmp_path / "search.txt"
    fof_i.write_text("\n".join(index_lines) + "\n")
    fof_s.write_text("\n".join(search_lines) + "\n")
    out = tmp_path / "out"
    rc = ias_cli.main(["-i", str(fof_i), "-s", str(fof_s),
                       "-o", str(out), "-l", str(out), "-k", str(k), "-t", str(t)])
    assert rc == 0
    return out


def test_bc_in_a_golden(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/reference")
    out = run_ias(tmp_path,
                  ["A: ABCDE_bench/A.fa"],
                  ["BC: ABCDE_bench/B.fa; ABCDE_bench/C.fa"],
                  k=32, t=2)
    _same_bytes(str(out / "B.fa_in_A.bv"), os.path.join(GOLDEN, "B.fa_in_A.bv"))
    _same_bytes(str(out / "C.fa_in_A.bv"), os.path.join(GOLDEN, "C.fa_in_A.bv"))
    assert _counters(str(out / "BC_in_A.log")) == \
        _golden_counters(os.path.join(GOLDEN, "BC_in_A.log.counters"))


def test_partitioned_k15_golden(tmp_path):
    """k=15 forces many max_kmer partitions (~96 kmers/read vs a 3814-kmer
    cap -> ~20 partitions at 800 reads); checks the dropped-read boundary
    semantics and found-read skipping across partitions. Sliced workload;
    the golden comes from the reference binary run live on the same data
    (full-size A-vs-B coverage lives in the slow marker set)."""
    import subprocess

    a_fa = str(tmp_path / "A800.fa")
    b_fa = str(tmp_path / "B500.fa")
    _slice_fasta("/root/reference/ABCDE_bench/A.fa", a_fa, 800)
    _slice_fasta("/root/reference/ABCDE_bench/B.fa", b_fa, 500)
    out = run_ias(tmp_path, [f"A: {a_fa}"], [f"B: {b_fa}"], k=15, t=2)

    ref_bin = ensure_refbuild()
    if ref_bin is None:
        pytest.skip("/root/reference not available")
    refout = str(tmp_path / "refout")
    subprocess.run([ref_bin, "-i", str(tmp_path / "index.txt"),
                    "-s", str(tmp_path / "search.txt"),
                    "-k", "15", "-t", "2", "-o", refout, "-l", refout],
                   check=True, capture_output=True)
    _same_bytes(str(out / "B500.fa_in_A.bv"),
                os.path.join(refout, "B500.fa_in_A.bv"))
    assert _counters(str(out / "B_in_A.log")) == \
        _counters(os.path.join(refout, "B_in_A.log"))


@pytest.mark.slow
def test_partitioned_k15_golden_full(tmp_path, monkeypatch):
    """Full-size A-vs-B k=15 partitioned golden (~300 partitions)."""
    monkeypatch.chdir("/root/reference")
    out = run_ias(tmp_path,
                  ["A: ABCDE_bench/A.fa"],
                  ["B: ABCDE_bench/B.fa"],
                  k=15, t=2)
    _same_bytes(str(out / "B.fa_in_A.bv"),
                os.path.join(GOLDEN, "part", "B.fa_in_A.bv"))
    assert _counters(str(out / "B_in_A.log")) == \
        _golden_counters(os.path.join(GOLDEN, "part", "B_in_A.log.counters"))


def test_fastq_gz_golden(tmp_path):
    out = run_ias(tmp_path,
                  [f"QA: {DATA}/qa.fq.gz"],
                  [f"QB: {DATA}/qb.fq"],
                  k=21, t=2)
    import glob
    got = glob.glob(str(out / "*_in_QA.bv"))
    assert len(got) == 1
    # payload comparison (header comment embeds the input path, which moved)
    from commet_tpu.io.bv import BitVector
    g = BitVector.read(got[0])
    e = BitVector.read(os.path.join(GOLDEN, "fq", "qb.fq_in_QA.bv"))
    assert g.size == e.size
    assert (g.data == e.data).all()
    assert _counters(str(out / "QB_in_QA.log")) == \
        _golden_counters(os.path.join(GOLDEN, "fq", "QB_in_QA.log.counters"))


def test_gz_fasta_index_golden(tmp_path):
    out = run_ias(tmp_path,
                  [f"BGZ: {DATA}/B.fa.gz"],
                  ["A: /root/reference/ABCDE_bench/A.fa"],
                  k=32, t=2)
    from commet_tpu.io.bv import BitVector
    g = BitVector.read(str(out / "A.fa_in_BGZ.bv"))
    e = BitVector.read(os.path.join(GOLDEN, "gz", "A.fa_in_BGZ.bv"))
    assert g.size == e.size
    assert (g.data == e.data).all()
