"""Round-4 lab notes: where does the realistic-fill pair time go?
k=28 @ max_kmer (31.25M k-mers, fill 11.6%) = a 4x-smaller clone of the
k=30 bench config. Phase-timed engine run on the TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from commet_tpu.config import enable_compile_cache

enable_compile_cache()

import jax

from commet_tpu.engine.engine import EncodedSet, Engine, max_kmer_for
from commet_tpu.io.reads import ReadSet

KF = int(sys.argv[1]) if len(sys.argv) > 1 else 28
T, L = 2, 110
N_QRY = 131_072


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


lut = np.frombuffer(b"ACGT", dtype=np.uint8)
rng = np.random.default_rng(5)
n_idx = max_kmer_for(KF) // (L - KF + 1)
log(f"k={KF} n_idx={n_idx} device={jax.devices()[0]}")

import os
import tempfile

workdir = tempfile.mkdtemp(prefix="fillprof_")
t0 = time.time()
idx_fa = os.path.join(workdir, "i.fa")
qry_fa = os.path.join(workdir, "q.fa")
donor = None
with open(idx_fa, "wb") as f:
    for s in range(0, n_idx, 250_000):
        cnt = min(250_000, n_idx - s)
        codes = rng.integers(0, 4, size=(cnt, L), dtype=np.int8)
        if donor is None:
            donor = codes[:4096].copy()
        seqs = lut[codes.astype(np.int64)]
        f.write(b"".join(b">r%d\n%s\n" % (s + i, seqs[i].tobytes())
                         for i in range(cnt)))
qcodes = rng.integers(0, 4, size=(N_QRY, L), dtype=np.int8)
half, frag = N_QRY // 2, 2 * KF
dn = donor[rng.integers(0, len(donor), size=half)]
ds = rng.integers(0, L - frag + 1, size=half)
qs = rng.integers(0, L - frag + 1, size=half)
rows = np.arange(half)[:, None]
qcodes[rows, qs[:, None] + np.arange(frag)] = dn[rows, ds[:, None] + np.arange(frag)]
with open(qry_fa, "wb") as f:
    seqs = lut[qcodes.astype(np.int64)]
    f.write(b"".join(b">r%d\n%s\n" % (i, seqs[i].tobytes())
                     for i in range(N_QRY)))
log(f"workload written {time.time()-t0:.1f}s")

for rep in range(2):
    t0 = time.time()
    rs_i = ReadSet("I")
    rs_i.add_file(idx_fa)
    rs_q = ReadSet("Q")
    rs_q.add_file(qry_fa)
    log(f"rep{rep} parse: {time.time()-t0:.1f}s")

    eng = Engine(k=KF, t=T, batch=16384)
    t0 = time.time()
    enc_i = EncodedSet(rs_i)
    elig = rs_i.eligible()
    log(f"rep{rep} encode index: {time.time()-t0:.1f}s")
    t0 = time.time()
    kc = eng.count_kmers(enc_i, elig)
    parts = eng.partitions(kc)
    log(f"rep{rep} count+partition: {time.time()-t0:.1f}s parts={len(parts)}")
    t0 = time.time()
    eng._stream_serving = False
    eng._verify_v = 12
    planes = eng.build_planes(None, enc_i, elig[parts[0]])
    jax.block_until_ready(planes)
    log(f"rep{rep} build planes: {time.time()-t0:.1f}s")
    t0 = time.time()
    enc_q = EncodedSet(rs_q)
    cand = rs_q.untagged_eligible()
    tags = eng._search_cascade(planes, enc_q, cand)
    log(f"rep{rep} cascade search: {time.time()-t0:.1f}s tagged={int(tags.sum())}")
    t0 = time.time()
    tags2 = eng._search_cascade(planes, enc_q, cand)
    log(f"rep{rep} cascade search (warm): {time.time()-t0:.1f}s")

import shutil

shutil.rmtree(workdir, ignore_errors=True)
