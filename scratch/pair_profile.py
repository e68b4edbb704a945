"""Engine pair warm-path profile: where does steady-state time go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from commet_tpu.config import enable_compile_cache
enable_compile_cache()

import jax

print("device:", jax.devices()[0], flush=True)

K, T, READ_LEN, N_INDEX, N_QUERY, BATCH = 32, 2, 110, 100_000, 131_072, 16_384
rng = np.random.default_rng(42)
index_codes = rng.integers(0, 4, size=(N_INDEX, READ_LEN), dtype=np.int8)
query = rng.integers(0, 4, size=(N_QUERY, READ_LEN), dtype=np.int8)
half, frag = N_QUERY // 2, 2 * K
donors = rng.integers(0, N_INDEX, size=half)
ds = rng.integers(0, READ_LEN - frag + 1, size=half)
qs = rng.integers(0, READ_LEN - frag + 1, size=half)
rows = np.arange(half)[:, None]
query[rows, qs[:, None] + np.arange(frag)] = \
    index_codes[donors[:, None], ds[:, None] + np.arange(frag)]

import tempfile
workdir = tempfile.mkdtemp(prefix="pairprof_")
lut = np.frombuffer(b"ACGT", dtype=np.uint8)
for name, codes in (("index", index_codes), ("query", query)):
    with open(os.path.join(workdir, name + ".fa"), "wb") as f:
        seqs = lut[codes.astype(np.int64)]
        for i in range(len(seqs)):
            f.write(b">r%d\n" % i + seqs[i].tobytes() + b"\n")

from commet_tpu.engine.engine import Engine
from commet_tpu.io.reads import ReadSet

for rep in range(2):
    t_all = time.time()
    t0 = time.time()
    rs_i = ReadSet("I")
    rs_i.add_file(os.path.join(workdir, "index.fa"))
    rs_q = ReadSet("Q")
    rs_q.add_file(os.path.join(workdir, "query.fa"))
    t_parse = time.time() - t0
    t0 = time.time()
    eng = Engine(k=K, t=T, batch=BATCH)
    t_init = time.time() - t0
    c = eng.index_and_search(rs_i, [rs_q], save=False)
    t_total = time.time() - t_all
    ct = c["Q"]
    print(f"rep{rep}: total {t_total:.2f}s parse {t_parse:.2f}s "
          f"engine-init {t_init:.2f}s index {ct['index_time']:.2f}s "
          f"search {ct['search_time']:.2f}s shared {ct['shared']}",
          flush=True)

# drill into one more search with finer timers
import commet_tpu.engine.engine as E

enc_q = E.EncodedSet(rs_q)
rs_q2 = ReadSet("Q2")
rs_q2.add_file(os.path.join(workdir, "query.fa"))
cand = rs_q2.untagged_eligible()
t0 = time.time()
enc_i = E.EncodedSet(rs_i)
elig = rs_i.eligible()
kc = eng.count_kmers(enc_i, elig)
print(f"count_kmers: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
planes = eng.build_planes(None, enc_i, elig)
jax.block_until_ready(planes)
np.asarray(planes[:1])
print(f"build_planes(+keys): {time.time()-t0:.2f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    tags = eng.search_set(planes, enc_q, cand)
    print(f"search_set: {time.time()-t0:.2f}s tagged={tags.sum()}",
          flush=True)
import shutil
shutil.rmtree(workdir, ignore_errors=True)
