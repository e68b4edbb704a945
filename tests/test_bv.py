"""BitVector codec: byte-exact round-trip against reference-produced .bv."""

import glob
import os

import numpy as np

from commet_tpu.io.bv import BitVector

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_roundtrip_golden_files():
    files = glob.glob(os.path.join(GOLDEN, "abcde", "*.bv"))
    assert files
    for path in files:
        bv = BitVector.read(path)
        out = path + ".roundtrip"
        try:
            bv.write(out)
            with open(path, "rb") as f1, open(out, "rb") as f2:
                assert f1.read() == f2.read(), path
        finally:
            os.unlink(out)


def test_popcount_matches_known():
    bv = BitVector.read(os.path.join(GOLDEN, "abcde", "A.fa.bv"))
    assert bv.size == 12000
    assert bv.nb_one() == 12000  # default run filters nothing
    bv2 = BitVector.read(os.path.join(GOLDEN, "abcde", "A.fa_in_set2.bv"))
    assert bv2.nb_one() == 4000  # matrix_plain.csv set1->set2


def test_ops():
    rng = np.random.default_rng(3)
    bits_a = rng.random(1003) < 0.5
    bits_b = rng.random(1003) < 0.5
    a = BitVector.from_bool_array(bits_a)
    b = BitVector.from_bool_array(bits_b)
    x = a.copy(); x.full_and(b)
    assert (x.as_bool_array() == (bits_a & bits_b)).all()
    x = a.copy(); x.full_or(b)
    assert (x.as_bool_array() == (bits_a | bits_b)).all()
    x = a.copy(); x.full_and_not(b)
    assert (x.as_bool_array() == (bits_a & ~bits_b)).all()
    x = a.copy(); x.full_not()
    assert (x.as_bool_array() == ~bits_a).all()
    assert a.nb_one() == int(bits_a.sum())


def test_set_many_preserves_padding():
    bv = BitVector(10)
    bv.full_not()  # padding bits now 1, like the reference's NOT
    before_pad = bv.data[1] & 0xFC
    bv.set_many(np.array([0, 3]))
    assert bv.data[1] & 0xFC == before_pad
