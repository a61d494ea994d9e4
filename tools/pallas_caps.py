"""Mosaic capability probes: which primitives lower on this toolchain.

Each probe compiles + runs a tiny kernel and checks the result, printing
OK/FAIL. No timing (see pallas_micro3.py for costs).
Usage: python3 tools/pallas_caps.py
"""
import sys

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/desamba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


def probe(name, fn, *args, check=None):
    try:
        out = np.asarray(jax.block_until_ready(fn(*args)))
        if check is not None and not check(out):
            print(f"{name}: WRONG RESULT")
        else:
            print(f"{name}: OK")
    except Exception as e:
        msg = repr(e).split(chr(10))[0][:140]
        print(f"{name}: FAIL {msg}")


def call(k, out_shape, *specs):
    def f(*args):
        return pl.pallas_call(
            k, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=s) for s in specs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*args)
    return jax.jit(f)


V, S = pltpu.VMEM, pltpu.SMEM

# 1. sublane gather: take_along_axis axis=0, tab (8,128), idx (8,128)
tab8 = jnp.asarray(rng.integers(0, 100, (8, 128)), jnp.int32)
idx8 = jnp.asarray(rng.integers(0, 8, (8, 128)), jnp.int32)


def k_sub(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=0)


probe("take_along_axis axis=0 (8,128) from (8,128)",
      call(k_sub, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, V),
      tab8, idx8,
      check=lambda o: (o == np.take_along_axis(np.asarray(tab8),
                                               np.asarray(idx8), 0)).all())

# 1b. bigger table (32,128)
tab32 = jnp.asarray(rng.integers(0, 100, (32, 128)), jnp.int32)
idx32 = jnp.asarray(rng.integers(0, 32, (8, 128)), jnp.int32)
probe("take_along_axis axis=0 (8,128) from (32,128)",
      call(k_sub, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, V),
      tab32, idx32,
      check=lambda o: (o == np.take_along_axis(np.asarray(tab32),
                                               np.asarray(idx32), 0)).all())

# 1c. lane gather: axis=1
idxl = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)


def k_lane(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=1)


probe("take_along_axis axis=1 (8,128) from (8,128)",
      call(k_lane, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, V),
      tab8, idxl,
      check=lambda o: (o == np.take_along_axis(np.asarray(tab8),
                                               np.asarray(idxl), 1)).all())

# 2. dynamic roll (lane axis) via pltpu.roll
sh = jnp.asarray([5], jnp.int32)


def k_roll(t, s, o):
    o[:] = pltpu.roll(t[:], s[0], 1)


probe("pltpu.roll dynamic shift axis=1",
      call(k_roll, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, S),
      tab8, sh,
      check=lambda o: (o == np.roll(np.asarray(tab8), 5, 1)).all())


def k_roll0(t, s, o):
    o[:] = pltpu.roll(t[:], s[0], 0)


probe("pltpu.roll dynamic shift axis=0",
      call(k_roll0, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, S),
      tab8, sh,
      check=lambda o: (o == np.roll(np.asarray(tab8), 5, 0)).all())

# 3. lane-dim dynamic slice
big = jnp.asarray(rng.integers(0, 100, (8, 512)), jnp.int32)
off = jnp.asarray([37], jnp.int32)


def k_lds(t, s, o):
    o[:] = t[:, pl.ds(s[0], 128)]


probe("lane-dim dynamic slice (8, 512)[:, o:o+128]",
      call(k_lds, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, S),
      big, off,
      check=lambda o: (o == np.asarray(big)[:, 37:165]).all())

# 4. dynamic_slice both dims
def k_2d(t, s, o):
    o[:] = jax.lax.dynamic_slice(t[:], (s[0], s[1]), (8, 128))


off2 = jnp.asarray([3, 37], jnp.int32)
big2 = jnp.asarray(rng.integers(0, 100, (64, 512)), jnp.int32)
probe("dynamic_slice both dims (64,512)->(8,128)",
      call(k_2d, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, S),
      big2, off2,
      check=lambda o: (o == np.asarray(big2)[3:11, 37:165]).all())

# 5. uint32 ops + popcount-ish
u = jnp.asarray(rng.integers(0, 1 << 32, (8, 128), dtype=np.uint64)
                .astype(np.uint32))


def k_u32(t, o):
    v = t[:]
    v = v ^ (v >> jnp.uint32(7))
    v = v * jnp.uint32(0x9E3779B1)
    o[:] = (v >> jnp.uint32(16)).astype(jnp.int32)


probe("uint32 mul/xor/shift",
      call(k_u32, jax.ShapeDtypeStruct((8, 128), jnp.int32), V), u)

# 6. scalar SMEM output write
def k_smem_out(t, o):
    o[0] = jnp.sum(t[:])


def f_smem(t):
    return pl.pallas_call(
        k_smem_out, out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V)],
        out_specs=pl.BlockSpec(memory_space=S))(t)


probe("SMEM (1,) output", jax.jit(f_smem), tab8,
      check=lambda o: o[0] == np.asarray(tab8).sum())

# 7. while_loop with scalar state + vector reads
def k_while(t, o):
    def cond(c):
        return c[0] < 8

    def body(c):
        i, acc = c
        return i + 1, acc + jnp.sum(t[pl.ds(i, 1), :])

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    o[:] = jnp.full((8, 128), acc, jnp.int32)


probe("while_loop scalar state + row reads",
      call(k_while, jax.ShapeDtypeStruct((8, 128), jnp.int32), V), tab8,
      check=lambda o: o[0, 0] == np.asarray(tab8).sum())

# 8. int8/uint8 VMEM arrays
b8 = jnp.asarray(rng.integers(0, 4, (32, 128)), jnp.uint8)


def k_u8(t, o):
    o[:] = t[:].astype(jnp.int32)[:8] + 1


probe("uint8 VMEM load + cast",
      call(k_u8, jax.ShapeDtypeStruct((8, 128), jnp.int32), V), b8)

# 9. 1D iota-free broadcasted ops & argmax along lanes
def k_argmax(t, o):
    m = jnp.max(t[:], axis=1, keepdims=True)
    am = jnp.argmax(t[:], axis=1).astype(jnp.int32)[:, None]
    o[:] = jnp.broadcast_to(m + am, (8, 128))


probe("max/argmax along lanes",
      call(k_argmax, jax.ShapeDtypeStruct((8, 128), jnp.int32), V), tab8)

# 10. scatter-ish: dynamic single-row write o[pl.ds(i,1), :] = v
def k_dynw(t, s, o):
    o[:] = jnp.zeros((8, 128), jnp.int32)
    o[pl.ds(s[0], 1), :] = t[pl.ds(0, 1), :]


probe("dynamic row write o[i] = v",
      call(k_dynw, jax.ShapeDtypeStruct((8, 128), jnp.int32), V, S),
      tab8, jnp.asarray([3], jnp.int32),
      check=lambda o: (o[3] == np.asarray(tab8)[0]).all())

# 11. cumsum along lanes
def k_cumsum(t, o):
    o[:] = jnp.cumsum(t[:], axis=1)


probe("cumsum along lanes",
      call(k_cumsum, jax.ShapeDtypeStruct((8, 128), jnp.int32), V), tab8)

# 12. (1,1) scalar in SMEM as 2D
def k_s2(t, s, o):
    o[:] = t[:] + s[0, 0]


def f_s2(t, s):
    return pl.pallas_call(
        k_s2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V),
                  pl.BlockSpec((1, 1), memory_space=S)],
        out_specs=pl.BlockSpec(memory_space=V))(t, s)


probe("(1,1) SMEM scalar block", jax.jit(f_s2), tab8,
      jnp.asarray([[7]], jnp.int32))
