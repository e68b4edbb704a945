"""commet-tpu: a TPU-native read-set comparison engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of COMMET
(pierrepeterlongo/commet): de novo, reference-free, all-vs-all comparison of
NGS read sets via shared-k-mer read classification.

Architecture (TPU-first):
  - Host data layer (`commet_tpu.io`, `commet_tpu.native`): fasta/fastq/gz
    parsing into packed 2-bit batches, the reference-compatible `.bv`
    bit-vector codec and file-of-files manifests.
  - Device kernel core (`commet_tpu.core`): rolling 4-projection k-mer keys,
    dense per-plane membership bitmaps in HBM (the TPU equivalent of the
    reference's 4-bit-plane Bloom filter, reference include/bloom_filter.h),
    vectorized greedy non-overlapping hit counting, read-filter kernels,
    bit-vector algebra.
  - Engine (`commet_tpu.engine`): partitioned index->search streaming with
    bit-exact reference semantics (reference src/index_and_search.cpp), the
    3-pass pair refinement, and the all-vs-all driver.
  - Parallel layer (`commet_tpu.parallel`): jax.sharding Mesh execution -
    query batches data-parallel, membership planes sharded across chips,
    psum-merged results.
"""

__version__ = "0.1.0"

from commet_tpu.io.bv import BitVector  # noqa: F401
