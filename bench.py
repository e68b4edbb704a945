"""Headline benchmark: query-read classification throughput (k=32 membership
probe, t=2) on one chip, vs the measured single-core C++ reference.

Baseline protocol (BASELINE.md): the reference index_and_search compiled
with -O3 (gcc) searching a synthetic 110bp workload, single thread; its
search-phase reads/s is recorded below (measured on this machine; see
tests/golden + PROGRESS notes).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N/base}
"""

import json
import time

import numpy as np

# Measured single-core C++ reference throughput for the same workload shape
# (k=32, t=2, 110bp reads, ~50% positive rate). See bench_baseline.py for the
# measurement script.
BASELINE_READS_PER_SEC = 119_000.0

K = 32
T = 2
READ_LEN = 110
N_INDEX = 100_000
N_QUERY = 262_144
BATCH = 8_192


def synth_reads(rng, n, length):
    return rng.integers(0, 4, size=(n, length), dtype=np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from commet_tpu.core import kernels

    rng = np.random.default_rng(42)
    index_codes = synth_reads(rng, N_INDEX, READ_LEN)
    query = synth_reads(rng, N_QUERY, READ_LEN)
    # implant index k-mers in half the queries so the workload mixes hits
    # and misses like a real comparison
    half = N_QUERY // 2
    donors = rng.integers(0, N_INDEX, size=half)
    starts = rng.integers(0, READ_LEN - K + 1, size=half)
    for i in range(half):
        s = starts[i]
        query[i, s : s + K] = index_codes[donors[i], s : s + K]

    lpad = -(-READ_LEN // 32) * 32
    pad = np.full((N_INDEX, lpad - READ_LEN), 4, dtype=np.int32)
    index_codes = np.concatenate([index_codes, pad], axis=1)
    qpad = np.full((N_QUERY, lpad - READ_LEN), 4, dtype=np.int32)
    query = np.concatenate([query, qpad], axis=1)

    planes = kernels.alloc_planes(K)
    t0 = time.time()
    for s in range(0, N_INDEX, BATCH):
        planes = kernels.build_chunk(planes,
                                     jnp.asarray(index_codes[s : s + BATCH]), K)
    jax.block_until_ready(planes)
    build_time = time.time() - t0

    qbatches = [jnp.asarray(query[s : s + BATCH])
                for s in range(0, N_QUERY, BATCH)]
    # warmup / compile
    tagged, _ = kernels.search_batch(planes, qbatches[0], K, T)
    jax.block_until_ready(tagged)

    t0 = time.time()
    outs = []
    for qb in qbatches:
        tagged, _ = kernels.search_batch(planes, qb, K, T)
        outs.append(tagged)
    jax.block_until_ready(outs)
    dt = time.time() - t0
    reads_per_sec = N_QUERY / dt

    n_tagged = int(sum(np.asarray(o).sum() for o in outs))
    result = {
        "metric": "query_reads_per_sec_chip_k32_probe",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
        "extra": {
            "build_time_s": round(build_time, 3),
            "search_time_s": round(dt, 3),
            "n_query": N_QUERY,
            "tagged": n_tagged,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
