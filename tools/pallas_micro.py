"""Microbenchmarks for the Pallas TPU primitives the engine needs.

Mosaic constraints found on first contact (kept for the record):
  - gathers must be 2D (row gathers of a 2D operand)
  - VMEM block shapes want the last two dims divisible by (8, 128)
  - 1D refs / 1D DMAs crash the remote compiler; keep everything 2D

Measures, through the axon relay (timing anchored by a scalar download):
  1. row gather from a VMEM-resident (K, 128) table
  2. element gather via take_along_axis on a (8, K) table
  3. scalar-indexed dynamic-slice loads in a sequential fori_loop
  4. grid-step overhead
  5. HBM->VMEM DMA latency/bandwidth for small rows

These set the speed-of-light budget for a per-read rescore kernel
(reference analogue: the gather-bound phases of src/cly.c:2335-2849).
Usage: python3 tools/pallas_micro.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)


def bench(fn, *args, reps=5, label=""):
    out = jax.block_until_ready(fn(*args))
    walls = []
    for r in range(reps):
        a0 = args[0]
        pert = (a0.at[(0,) * a0.ndim].add(r + 1),) + args[1:]
        jax.block_until_ready(pert[0])
        t0 = time.time()
        o = fn(*pert)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]  # anchor completion
        walls.append(time.time() - t0)
    print(f"{label}: {min(walls)*1e3:.3f} ms  (reps {sorted(round(w*1e3,2) for w in walls)})")
    return min(walls)


KR = 4096          # table rows
RW = 128           # row width
GN = 256           # gathered rows per rep
REPK = 20


# ---- 1. row gather from VMEM (K, 128) --------------------------------------
def rowgather_kernel(tab_ref, idx_ref, o_ref):
    tab = tab_ref[:]
    acc = jnp.zeros((GN, RW), jnp.int32)
    for r in range(REPK):
        ii = (idx_ref[:] + r) & (KR - 1)
        acc = acc + jnp.take(tab, ii[:, 0], axis=0)
    o_ref[:] = acc


@jax.jit
def rowgather(tab, idx):
    return pl.pallas_call(
        rowgather_kernel,
        out_shape=jax.ShapeDtypeStruct((GN, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


rng = np.random.default_rng(0)
tab = jnp.asarray(rng.integers(0, 1 << 20, (KR, RW)), jnp.int32)
idxc = jnp.asarray(rng.integers(0, KR, (GN, 128)), jnp.int32)
try:
    w = bench(rowgather, tab, idxc, label=f"vmem ROW gather {GN}rows x{REPK}")
    n = GN * REPK
    print(f"   -> {w / n * 1e9:.1f} ns/row ({w / (n * RW) * 1e9:.3f} ns/elem)")
except Exception as e:
    print("row gather FAILED:", repr(e).split(chr(10))[0][:200])


# ---- 2. element gather via take_along_axis ---------------------------------
EK = 4096
EB, EN = 8, 512    # (8, 512) indices into (8, EK)


def egather_kernel(tab_ref, idx_ref, o_ref):
    tab = tab_ref[:]
    acc = jnp.zeros((EB, EN), jnp.int32)
    for r in range(REPK):
        ii = (idx_ref[:] + r) & (EK - 1)
        acc = acc + jnp.take_along_axis(tab, ii, axis=1)
    o_ref[:] = acc


@jax.jit
def egather(tab, idx):
    return pl.pallas_call(
        egather_kernel,
        out_shape=jax.ShapeDtypeStruct((EB, EN), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


tab2 = jnp.asarray(rng.integers(0, 1 << 20, (EB, EK)), jnp.int32)
idx2 = jnp.asarray(rng.integers(0, EK, (EB, EN)), jnp.int32)
try:
    w = bench(egather, tab2, idx2, label=f"vmem ELEM gather ({EB}x{EN})x{REPK}")
    n = EB * EN * REPK
    print(f"   -> {w / n * 1e9:.3f} ns/element")
except Exception as e:
    print("elem gather FAILED:", repr(e).split(chr(10))[0][:200])


# ---- 3. scalar dynamic-slice loads in a loop --------------------------------
LOOPN = 4096


def dynslice_kernel(tab_ref, start_ref, o_ref):
    def body(i, acc):
        off = (start_ref[0] + i * 7) & (KR - 9)
        return acc + tab_ref[pl.ds(off, 8), :]
    o_ref[:] = jax.lax.fori_loop(0, LOOPN, body,
                                 jnp.zeros((8, RW), jnp.int32))


@jax.jit
def dynslice(tab, start):
    return pl.pallas_call(
        dynslice_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, start)


start = jnp.zeros((1,), jnp.int32)
try:
    w = bench(dynslice, tab, start, label=f"vmem dyn-slice loop x{LOOPN} (8x{RW})")
    print(f"   -> {w / LOOPN * 1e9:.1f} ns/iteration")
except Exception as e:
    print("dynslice FAILED:", repr(e).split(chr(10))[0][:200])


# ---- 4. grid-step overhead ---------------------------------------------------
GS = 2048


def grid_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + pl.program_id(0)


@jax.jit
def gridstep(x):
    return pl.pallas_call(
        grid_kernel,
        out_shape=jax.ShapeDtypeStruct((GS * 8, 128), jnp.int32),
        grid=(GS,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


x = jnp.zeros((GS * 8, 128), jnp.int32)
try:
    w = bench(gridstep, x, label=f"grid of {GS} tiny programs")
    print(f"   -> {w / GS * 1e9:.1f} ns/program")
except Exception as e:
    print("gridstep FAILED:", repr(e).split(chr(10))[0][:200])


# ---- 5. HBM->VMEM DMA in a loop ---------------------------------------------
HBROWS = 1 << 15   # (32768, 128) i32 = 16 MB
DMAN = 1024
DR = 8             # rows per DMA: (8, 128) i32 = 4 KB


def dma_kernel(hbm_ref, start_ref, o_ref):
    def body(scratch, sem):
        def step(i, acc):
            off = ((start_ref[0] + i * 37) * DR) & (HBROWS - DR - 1)
            cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(off, DR), :],
                                       scratch, sem)
            cp.start()
            cp.wait()
            return acc + scratch[:]
        o_ref[:] = jax.lax.fori_loop(0, DMAN, step,
                                     jnp.zeros((DR, RW), jnp.int32))
    pl.run_scoped(body, pltpu.VMEM((DR, RW), jnp.int32),
                  pltpu.SemaphoreType.DMA(()))


@jax.jit
def dmaloop(hbm, start):
    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((DR, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(hbm, start)


hbm = jnp.zeros((HBROWS, RW), jnp.int32)
try:
    w = bench(dmaloop, hbm, start, label=f"HBM DMA loop x{DMAN} ({DR*RW*4} B each, serial)")
    print(f"   -> {w / DMAN * 1e9:.0f} ns/DMA")
except Exception as e:
    print("dma FAILED:", repr(e).split(chr(10))[0][:200])
