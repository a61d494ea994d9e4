"""Microbenchmark: cost per gathered element of the candidate gather
mechanisms on this chip (through the axon relay).

The round-3 analysis pinned XLA's gather at 9-13 ns/element inside a
program.  The rescore VM performs O(10^8) gathered elements per 2048-read
batch, so that rate owns the wall.  This measures the alternatives:

  a. XLA per-lane gather               table[rows, idx]      (status quo)
  b. one-hot matmul gather (MXU)       dot_general bf16
  c. compare-count "searchsorted"      sum(table < q)        (VPU)
  d. Pallas kernel: same compare-count with the table in VMEM

Each timing perturbs the inputs per repetition (the axon relay memoizes
(executable, inputs) -> outputs) and chains R repeats with a data
dependence inside one jitted fori_loop so call overhead amortizes.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512   # lanes
K = 1152   # per-lane table rows (read 9-mer table scale)
P = 176    # queries per lane (probes per window)
R = 16     # op repeats inside the program

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 1 << 18, (B, K)), jnp.int32)
tsort = jnp.sort(table, axis=1)
qidx = jnp.asarray(rng.integers(0, K, (B, P)), jnp.int32)
qval = jnp.asarray(rng.integers(0, 1 << 18, (B, P)), jnp.int32)
rows = jnp.arange(B, dtype=jnp.int32)[:, None]


def timeit(name, fn, *args, elems):
    jax.block_until_ready(fn(*args))  # compile
    walls = []
    for rep in range(3):
        pargs = [a + (rep + 1) if i == 0 else a for i, a in enumerate(args)]
        jax.block_until_ready(pargs[0])
        t0 = time.time()
        jax.block_until_ready(fn(*pargs))
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"{name:34s} {w*1e3:9.2f} ms  {w/(elems*R)*1e9:8.3f} ns/elem"
          f"  ({elems*R/1e6:.1f} M elems)", flush=True)


@jax.jit
def xla_gather(qidx, table):
    def body(i, acc_q):
        acc, q = acc_q
        v = table[rows, q % K]
        return acc + v, q + 1
    acc, _ = jax.lax.fori_loop(
        0, R, body, (jnp.zeros((B, P), jnp.int32), qidx))
    return acc


@jax.jit
def onehot_mxu(qidx, table):
    ks = jnp.arange(K, dtype=jnp.int32)
    tb = table.astype(jnp.bfloat16)

    def body(i, acc_q):
        acc, q = acc_q
        oh = (q[:, :, None] % K == ks[None, None, :]).astype(jnp.bfloat16)
        v = jnp.einsum('bpk,bk->bp', oh, tb,
                       preferred_element_type=jnp.float32)
        return acc + v, q + 1
    acc, _ = jax.lax.fori_loop(
        0, R, body, (jnp.zeros((B, P), jnp.float32), qidx))
    return acc


@jax.jit
def cmp_count(qval, tsort):
    def body(i, acc_q):
        acc, q = acc_q
        cnt = jnp.sum(tsort[:, None, :] < q[:, :, None], axis=2,
                      dtype=jnp.int32)
        return acc + cnt, q + 1
    acc, _ = jax.lax.fori_loop(
        0, R, body, (jnp.zeros((B, P), jnp.int32), qval))
    return acc


def pallas_cc():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def cc_kernel(q_ref, t_ref, o_ref):
        t = t_ref[:]

        def body(i, acc_q):
            acc, q = acc_q
            cnt = jnp.sum((t[:, None, :] < q[:, :, None]), axis=2,
                          dtype=jnp.int32)
            return acc + cnt, q + 1
        acc, _ = jax.lax.fori_loop(
            0, R, body, (jnp.zeros((B, P), jnp.int32), q_ref[:]))
        o_ref[:] = acc

    @jax.jit
    def cc_pallas(qval, tsort):
        return pl.pallas_call(
            cc_kernel,
            out_shape=jax.ShapeDtypeStruct((B, P), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(qval, tsort)

    timeit("pallas compare-count (VMEM)", cc_pallas, qval, tsort,
           elems=B * P * K)


which = sys.argv[2] if len(sys.argv) > 2 else "all"
print(f"B={B} K={K} P={P} R={R} platform={jax.devices()[0].platform}",
      flush=True)
if which in ("all", "gather"):
    timeit("xla gather", xla_gather, qidx, table, elems=B * P)
if which in ("all", "mxu"):
    timeit("onehot matmul (MXU)", onehot_mxu, qidx, table, elems=B * P * K)
if which in ("all", "cmp"):
    timeit("compare-count (VPU)", cmp_count, qval, tsort, elems=B * P * K)
if which in ("all", "pallas"):
    try:
        pallas_cc()
    except Exception as e:
        print("pallas FAILED:", type(e).__name__, str(e)[:300])
