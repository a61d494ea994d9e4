"""Device engine: batched JAX/Pallas classify pipeline for TPU.

Stage kernels (each parity-tested against engine/gold):
  - u64ops/hash64: 64-bit ops emulated on uint32 pairs (TPUs have no
    native int64; explicit pairs keep the hot hash loops on the VPU)
  - islands: e-kmer rolling + low-complexity filter + 2-hash existence
    probe over HBM bit tables, batched over (reads, positions)
  - fm: FM rank over a checkpointed 4-bit block layout + batched backward
    MEM search (lax.while_loop over extension steps, whole batch per step)
"""
