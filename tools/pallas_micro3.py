"""Third-round Pallas microbenchmarks with a floor-corrected harness.

Harness rules learned the hard way (rounds 1-2):
  - the axon relay costs ~30 ms per synchronized call: every kernel must
    do >> 30 ms of work or the number is the floor, not the kernel;
  - download ONE scalar (jnp indexing on device, then np.asarray of the
    scalar) — np.asarray(output) ships the whole array at ~10 MB/s;
  - perturb inputs on device (.at[].add) to defeat relay memoization.

Usage: python3 tools/pallas_micro3.py
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

FLOOR = None


def bench(fn, *args, reps=4, label="", n=1):
    global FLOOR
    jax.block_until_ready(fn(*args))
    walls = []
    for r in range(reps):
        a0 = args[0]
        pert = (a0.at[(0,) * a0.ndim].add(r + 1),) + args[1:]
        jax.block_until_ready(pert[0])
        t0 = time.time()
        o = fn(*pert)
        first = jax.tree.leaves(o)[0]
        anchor = first[(0,) * first.ndim]      # device-side scalar
        float(np.asarray(anchor))              # one-scalar download
        walls.append(time.time() - t0)
    w = min(walls)
    corr = w - (FLOOR if FLOOR is not None else 0)
    print(f"{label}: {w*1e3:.1f} ms (floor-corr {corr*1e3:.1f}) -> "
          f"{corr/n*1e9:.2f} ns/unit  (reps {sorted(round(x*1e3,1) for x in walls)})")
    return w


# ---- 0. floor: empty-ish kernel ---------------------------------------------
def empty_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


@jax.jit
def emptyk(x):
    return pl.pallas_call(
        empty_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x8 = jnp.zeros((8, 128), jnp.int32)
FLOOR = bench(emptyk, x8, reps=6, label="relay floor (empty kernel)")
FLOOR = None or FLOOR  # keep measured value
f = FLOOR
FLOOR = 0
FLOOR = f

KR, RW = 4096, 128
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.integers(0, 1 << 20, (KR, RW)), jnp.int32)
s = jnp.zeros((1,), jnp.int32)

# ---- 1. dyn-slice loads, big N ------------------------------------------------
for nm, N, sl in (("aligned (8,128)", 1 << 23, 8),
                  ("row (1,128)", 1 << 23, 1)):
    def mk(sl):
        def k(tab_ref, s_ref, o_ref):
            def body(i, acc):
                off = (s_ref[0] + i * 7) & (KR - 9)
                return acc + tab_ref[pl.ds(off, sl), :].astype(jnp.int32)[0:1, :]
            o_ref[:] = jax.lax.fori_loop(
                0, N, body, jnp.zeros((1, RW), jnp.int32))
        return k

    @jax.jit
    def run(tab, s, _k=mk(sl)):
        return pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((1, RW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, s)

    bench(run, tab, s, label=f"dyn-slice {nm} x{N}", n=N)


# ---- 2. per-lane sublane gather (take_along_axis axis=0) ----------------------
GK = 32   # gatherable sublanes
GR = 1 << 21


def lgather_kernel(tab_ref, idx_ref, o_ref):
    tab = tab_ref[:]          # (GK, 128)
    def body(i, acc):
        ii = (idx_ref[:] + i) % GK   # (8, 128)
        return acc + jnp.take_along_axis(tab, ii, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, GR, body, jnp.zeros((8, RW), jnp.int32))


@jax.jit
def lgather(tab, idx):
    return pl.pallas_call(
        lgather_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


tabg = jnp.asarray(rng.integers(0, 1 << 20, (GK, RW)), jnp.int32)
idxg = jnp.asarray(rng.integers(0, GK, (8, RW)), jnp.int32)
try:
    bench(lgather, tabg, idxg, label=f"sublane gather (8x128 from {GK}x128) x{GR}",
          n=GR * 8 * RW)
except Exception as e:
    print("sublane gather FAILED:", repr(e).split(chr(10))[0][:160])


# ---- 3. row gather via take_along_axis(idx[:,None]) ---------------------------
RGN = 256
RGR = 1 << 13


def rgather_kernel(tab_ref, idx_ref, o_ref):
    tab = tab_ref[:]
    def body(i, acc):
        ii = (idx_ref[:] + i) & (KR - 1)   # (RGN, 128)
        return acc + jnp.take_along_axis(tab, ii, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, RGR, body,
                                 jnp.zeros((RGN, RW), jnp.int32))


@jax.jit
def rgather(tab, idx):
    return pl.pallas_call(
        rgather_kernel,
        out_shape=jax.ShapeDtypeStruct((RGN, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


idxr = jnp.asarray(rng.integers(0, KR, (RGN, RW)), jnp.int32)
try:
    bench(rgather, tab, idxr, label=f"row-set gather ({RGN}x128 from {KR}x128) x{RGR}",
          n=RGR * RGN * RW)
except Exception as e:
    print("row-set gather FAILED:", repr(e).split(chr(10))[0][:160])


# ---- 4. grid-step overhead (tiny blocks, scalar anchor) ------------------------
GS = 1 << 15


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


xg = jnp.zeros((GS * 8, 128), jnp.int32)
bench(gridstep, xg, label=f"grid of {GS} tiny programs", n=GS)


# ---- 5. serial HBM DMA ---------------------------------------------------------
HBROWS = 1 << 15
DMAN = 1 << 15
DR = 8


def dma_kernel(hbm_ref, s_ref, o_ref):
    def body(scratch, sem):
        def step(i, acc):
            off = ((s_ref[0] + i * 37) * DR) & (HBROWS - DR - 1)
            cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(off, DR), :],
                                       scratch, sem)
            cp.start()
            cp.wait()
            return acc + scratch[0:1, :]
        o_ref[:] = jax.lax.fori_loop(0, DMAN, step,
                                     jnp.zeros((1, RW), jnp.int32))
    pl.run_scoped(body, pltpu.VMEM((DR, RW), jnp.int32),
                  pltpu.SemaphoreType.DMA(()))


@jax.jit
def dmaloop(hbm, s):
    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((1, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(hbm, s)


hbm = jnp.zeros((HBROWS, RW), jnp.int32)
bench(dmaloop, hbm, s, label=f"serial HBM DMA x{DMAN} ({DR*RW*4} B)", n=DMAN)
