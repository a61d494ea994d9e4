"""Interpret-mode unit tests for the Pallas vector primitives
(engine/device/plops.py) — semantics only; TPU lowering is covered by
tools/pallas_caps.py probes."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desamba_tpu.engine.device import plops as po


def run1(kernel, out_shape, *args):
    return np.asarray(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(*out_shape),
        interpret=True)(*args))


def test_bcast_extract_setlane():
    rng = np.random.default_rng(0)
    v = rng.integers(-100, 100, (4, 128)).astype(np.int32)

    def k(v_ref, o_ref):
        x = v_ref[:]
        b = po.bcast_lane(x, 37)
        s = po.extract(x, 5)
        s2 = po.extract_rc(x, 2, 9)
        y = po.set_lane(x, 3, jnp.int32(555))
        o_ref[:] = b + 0 * y
        o_ref[0, 0] = s
        o_ref[0, 1] = s2
        o_ref[1, :] = y[1]
        o_ref[3, :] = po.set_lane(x, 7, jnp.int32(-9))[3]

    out = run1(k, ((4, 128), jnp.int32), jnp.asarray(v))
    assert out[2, 50] == v[2, 37]
    assert out[0, 0] == v[0, 5]
    assert out[0, 1] == v[2, 9]
    assert out[3, 7] == -9 and out[3, 6] == v[3, 6]


def test_unsigned_helpers():
    a = np.array([[0, -1, 5, -100] + [0] * 124], np.int32)
    b = np.array([[1, 3, 5, 7] + [0] * 124], np.int32)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = po.ult(a_ref[:], b_ref[:]).astype(jnp.int32)
        o_ref[0, 10] = po.umax_reduce(a_ref[:])

    out = run1(k, ((1, 128), jnp.int32), jnp.asarray(a), jnp.asarray(b))
    exp = (a.astype(np.uint32) < b.astype(np.uint32)).astype(np.int32)
    assert (out[0, :4] == exp[0, :4]).all()
    assert np.uint32(out[0, 10]) == a.astype(np.uint32).max()


def test_roll_flat():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1000, (2, 128)).astype(np.int32)

    def k(v_ref, o_ref):
        o_ref[:] = po.roll_flat(v_ref[:], 37, rows_out=1)

    out = run1(k, ((1, 128), jnp.int32), jnp.asarray(v))
    flat = v.reshape(-1)
    assert (out[0] == flat[37 : 37 + 128]).all()


def test_gather_rows_table():
    rng = np.random.default_rng(2)
    tab = rng.integers(0, 1 << 20, (16, 128)).astype(np.int32)
    idx = rng.integers(0, 16 * 128, (4, 128)).astype(np.int32)

    def k(t_ref, i_ref, o_ref):
        o_ref[:] = po.gather_rows_table(
            lambda r: t_ref[r : r + 1, :], 16, i_ref[:])

    out = run1(k, ((4, 128), jnp.int32), jnp.asarray(tab), jnp.asarray(idx))
    assert (out == tab.reshape(-1)[idx]).all()


def test_prefix_sum_colmajor():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 5, (4, 128)).astype(np.int32)

    def k(v_ref, o_ref):
        o_ref[:] = po.prefix_sum_colmajor(v_ref[:])

    out = run1(k, ((4, 128), jnp.int32), jnp.asarray(v))
    flat_cm = v.T.reshape(-1)          # column-major order
    exp = np.cumsum(flat_cm).reshape(128, 4).T
    assert (out == exp).all()


def test_reverse_colmajor():
    rng = np.random.default_rng(4)
    v = rng.integers(0, 100, (4, 128)).astype(np.int32)

    def k(v_ref, o_ref):
        o_ref[:] = po.reverse_colmajor(v_ref[:])

    out = run1(k, ((4, 128), jnp.int32), jnp.asarray(v))
    exp = v.T.reshape(-1)[::-1].reshape(128, 4).T
    assert (out == exp).all()


def test_popc32():
    rng = np.random.default_rng(5)
    v = rng.integers(0, 1 << 32, (1, 128), dtype=np.uint64).astype(np.uint32)

    def k(v_ref, o_ref):
        o_ref[:] = po.popc32(v_ref[:])

    out = run1(k, ((1, 128), jnp.int32), jnp.asarray(v))
    exp = np.array([bin(int(x)).count("1") for x in v[0]], np.int32)
    assert (out[0] == exp).all()
