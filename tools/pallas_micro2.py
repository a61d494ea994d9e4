"""Second-round Pallas microbenchmarks: isolate WHERE the overhead lives.

pallas_micro.py round 1 measured 6.5 us/dyn-slice-iteration, 99 us/grid
program, 27 us/DMA — 10-100x over hardware expectations. This isolates:
  a. pure scalar fori_loop (no memory) — scalar-core loop cost
  b. aligned vs misaligned dynamic-slice loads
  c. fori_loop of N tiny steps inside ONE program vs a grid of N programs
  d. vector work throughput (big elementwise reduce) as a sanity anchor
Usage: python3 tools/pallas_micro2.py
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


def bench(fn, *args, reps=5, label="", n=1):
    jax.block_until_ready(fn(*args))
    walls = []
    for r in range(reps):
        a0 = args[0]
        pert = (a0.at[(0,) * a0.ndim].add(r + 1),) + args[1:]
        jax.block_until_ready(pert[0])
        t0 = time.time()
        o = fn(*pert)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"{label}: {w*1e3:.3f} ms -> {w/n*1e9:.1f} ns/unit "
          f"(reps {sorted(round(x*1e3,2) for x in walls)[:4]})")
    return w


KR, RW = 4096, 128
LOOPN = 1 << 21


# ---- a. pure scalar loop ----------------------------------------------------
def scalar_kernel(s_ref, o_ref):
    def body(i, acc):
        return acc + ((s_ref[0] + i * 7) & 1023)
    tot = jax.lax.fori_loop(0, LOOPN, body, jnp.int32(0))
    o_ref[:] = jnp.full((8, 128), tot, jnp.int32)


@jax.jit
def scalarloop(s):
    return pl.pallas_call(
        scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s)


s = jnp.zeros((1,), jnp.int32)
bench(scalarloop, s, label=f"pure scalar fori_loop x{LOOPN}", n=LOOPN)


# ---- b. aligned dynamic-slice loads ----------------------------------------
def dynal_kernel(tab_ref, s_ref, o_ref):
    def body(i, acc):
        off = ((s_ref[0] + i) * 8) & (KR - 9)
        return acc + tab_ref[pl.ds(off, 8), :]
    o_ref[:] = jax.lax.fori_loop(0, LOOPN // 4, body,
                                 jnp.zeros((8, RW), jnp.int32))


@jax.jit
def dynal(tab, s):
    return pl.pallas_call(
        dynal_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, s)


rng = np.random.default_rng(0)
tab = jnp.asarray(rng.integers(0, 1 << 20, (KR, RW)), jnp.int32)
bench(dynal, tab, s, label=f"ALIGNED dyn-slice loop x{LOOPN//4} (8x{RW})",
      n=LOOPN // 4)


# ---- b2. single-row (1, RW) dynamic loads -----------------------------------
def dynrow_kernel(tab_ref, s_ref, o_ref):
    def body(i, acc):
        off = (s_ref[0] + i * 7) & (KR - 2)
        return acc + tab_ref[pl.ds(off, 1), :]
    o_ref[:] = jax.lax.fori_loop(0, LOOPN // 4, body,
                                 jnp.zeros((1, RW), jnp.int32))


@jax.jit
def dynrow(tab, s):
    return pl.pallas_call(
        dynrow_kernel,
        out_shape=jax.ShapeDtypeStruct((1, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, s)


bench(dynrow, tab, s, label=f"single-row dyn load loop x{LOOPN//4} (1x{RW})",
      n=LOOPN // 4)


# ---- c. fori_loop of tiny vector steps in ONE program ------------------------
def onep_kernel(x_ref, o_ref):
    def body(i, acc):
        return acc * 3 + i
    o_ref[:] = x_ref[:] + jax.lax.fori_loop(
        0, 1 << 19, body, jnp.zeros((8, 128), jnp.int32))


@jax.jit
def oneprog(x):
    return pl.pallas_call(
        onep_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x8 = jnp.zeros((8, RW), jnp.int32)
bench(oneprog, x8, label="one program, fori_loop x512k tiny vector step",
      n=1 << 19)


# ---- d. vector throughput anchor ---------------------------------------------
VB = 512  # (VB*8, 128) i32 = 2 MB


def vec_kernel(x_ref, o_ref):
    acc = jnp.zeros((8, 128), jnp.int32)
    v = x_ref[:]
    for r in range(256):
        acc = acc + jnp.sum((v ^ (v >> (r + 1))).reshape(VB, 8, 128), axis=0)
    o_ref[:] = acc


@jax.jit
def vecwork(x):
    return pl.pallas_call(
        vec_kernel,
        out_shape=jax.ShapeDtypeStruct((8, RW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


xv = jnp.asarray(rng.integers(0, 1 << 20, (VB * 8, 128)), jnp.int32)
n_elem = VB * 8 * 128 * 256 * 3  # 256 passes x (xor, shift, add-reduce)
bench(vecwork, xv, label="vector anchor (12.6M elem ops)", n=n_elem)
