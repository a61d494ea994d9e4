"""Gather cost law on this chip: ns per gathered ROW vs row width.

If XLA gathers rows at ~constant descriptor cost, wide-row gathers make
the window fetch (consecutive bytes per lane) ~100x cheaper than
per-element gathers.  Also probes dtype sensitivity and a Pallas
compare-count with a blocked grid (VMEM-resident table).
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 16
N = 16384          # rows gathered per rep
rng = np.random.default_rng(0)


def timeit(name, fn, *args, elems):
    jax.block_until_ready(fn(*args))
    walls = []
    for rep in range(3):
        pargs = [a + (rep + 1) if i == 0 else a for i, a in enumerate(args)]
        jax.block_until_ready(pargs[0])
        t0 = time.time()
        jax.block_until_ready(fn(*pargs))
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"{name:40s} {w*1e3:9.2f} ms  {w/(N*R)*1e9:8.2f} ns/row "
          f" {w/(elems*R)*1e9:7.3f} ns/elem", flush=True)


def row_gather_case(width, dtype):
    M = (1 << 22) // max(1, width)   # ~4M elements total
    table = jnp.asarray(
        rng.integers(0, 100, (M, width)), dtype)
    idx = jnp.asarray(rng.integers(0, M, (N,)), jnp.int32)

    @jax.jit
    def f(idx, table):
        def body(i, acc_q):
            acc, q = acc_q
            v = table[q % M]              # (N, width) row gather
            return acc + v.astype(jnp.int32).sum(axis=1), q + 1
        acc, _ = jax.lax.fori_loop(
            0, R, body, (jnp.zeros((N,), jnp.int32), idx))
        return acc

    timeit(f"row gather w={width} {np.dtype(dtype).name}", f, idx, table,
           elems=N * width)


for w in (1, 8, 32, 128, 256):
    row_gather_case(w, jnp.int8)
row_gather_case(128, jnp.int32)

# ---- Pallas blocked compare-count -------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, P = 512, 1152, 176
BB = 8                                   # lanes per grid step
table = jnp.asarray(rng.integers(0, 1 << 18, (B, K)), jnp.int32)
qval = jnp.asarray(rng.integers(0, 1 << 18, (B, P)), jnp.int32)


def cc_kernel(q_ref, t_ref, o_ref):
    t = t_ref[:]                          # (BB, K)

    def body(i, acc_q):
        acc, q = acc_q
        cnt = jnp.sum((t[:, None, :] < q[:, :, None]), axis=2,
                      dtype=jnp.int32)
        return acc + cnt, q + 1
    acc, _ = jax.lax.fori_loop(
        0, R, body, (jnp.zeros((BB, P), jnp.int32), q_ref[:]))
    o_ref[:] = acc


@jax.jit
def cc_pallas(qval, table):
    return pl.pallas_call(
        cc_kernel,
        grid=(B // BB,),
        out_shape=jax.ShapeDtypeStruct((B, P), jnp.int32),
        in_specs=[pl.BlockSpec((BB, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(qval, table)


try:
    jax.block_until_ready(cc_pallas(qval, table))
    walls = []
    for rep in range(3):
        q2 = qval + rep + 1
        jax.block_until_ready(q2)
        t0 = time.time()
        jax.block_until_ready(cc_pallas(q2, table))
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"{'pallas blocked compare-count':40s} {w*1e3:9.2f} ms "
          f" {w/(B*P*K*R)*1e9:7.4f} ns/elem", flush=True)
except Exception as e:
    print("pallas FAILED:", type(e).__name__, str(e)[:500])
