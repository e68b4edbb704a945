"""fof manifest parsers: C++ set_parser dialect + Commet.py driver dialect."""

from commet_tpu.io.fof import (driver_read_bvs, driver_read_files,
                               driver_set_names, parse_sets)


def test_parse_sets_reference_config(tmp_path):
    f = tmp_path / "fof.txt"
    f.write_text(" set1 : A.fa \nset2: B.fa; C.fa\nnoname.fa\n"
                 "set4: D.fa,D.bv; E.fa , E.bv\n")
    sets = parse_sets(str(f))
    # sorted like std::map; the tag keeps its spaces (set_parser.h:64-66) and
    # the no-colon line becomes SET3 (set_parser.h:67-69)
    assert list(sets) == [" set1 ", "SET3", "set2", "set4"]
    assert sets["SET3"] == [("noname.fa", "")]
    assert sets[" set1 "] == [("A.fa", "")]
    assert sets["set2"] == [("B.fa", ""), ("C.fa", "")]
    assert sets["set4"] == [("D.fa", "D.bv"), ("E.fa", "E.bv")]


def test_parse_sets_unnamed_gets_setn(tmp_path):
    f = tmp_path / "fof.txt"
    f.write_text("a.fa\nb.fa\n")
    sets = parse_sets(str(f))
    assert sets == {"SET1": [("a.fa", "")], "SET2": [("b.fa", "")]}


def test_driver_parsers(tmp_path):
    f = tmp_path / "fof.txt"
    f.write_text(" set1 : ABCDE_bench/A.fa \nset2: B.fa; C.fa\n\n")
    assert driver_set_names(str(f)) == ["set1", "set2"]
    assert driver_read_files(str(f)) == [["ABCDE_bench/A.fa"], ["B.fa", "C.fa"]]
    assert driver_read_bvs(str(f)) is None
    f2 = tmp_path / "fof2.txt"
    f2.write_text("set1: A.fa,A.bv\nset2: B.fa,B.bv; C.fa,C.bv\n")
    assert driver_read_bvs(str(f2)) == [["A.bv"], ["B.bv", "C.bv"]]
