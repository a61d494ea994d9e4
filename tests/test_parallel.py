"""Mesh sharding correctness: the dp x idx sharded seeding step must equal
the single-device step bit for bit (existence probes answered by address-
range owners and psum-merged; reads sharded over dp)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_sharded_seed_step_matches_single_device(small_my_index):
    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    from desamba_tpu.engine.device.arrays import DeviceIndex
    from desamba_tpu.engine.device.pipeline import index_args, seed_wave_step
    from desamba_tpu.engine.gold.mapseed import get_ref
    from desamba_tpu.parallel import make_mesh, shard_index, sharded_seed_step

    idx = small_my_index
    dix = DeviceIndex.build(idx)
    rng = np.random.default_rng(13)
    B, L = 8, 512
    total = int(idx.ref_off[-1] + idx.ref_len[-1])
    codes = np.zeros((B, L), np.uint8)
    for i in range(B):
        st = int(rng.integers(0, total - L))
        seq = get_ref(idx.ref_bin, st, L, True).copy()
        pos = rng.integers(0, L, size=L // 10)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=len(pos))) % 4
        codes[i] = seq
    lens = np.full((B,), L, np.int32)

    single = seed_wave_step(
        *index_args(dix), jnp.asarray(codes), jnp.asarray(lens),
        l_ek=idx.len_e_kmer, single_base_max=idx.single_base_max,
        mask_bits=dix.mask_bits, n_probes=4)

    mesh = make_mesh(2, 2)
    placed = shard_index(mesh, dix)
    step = sharded_seed_step(mesh, placed, idx.len_e_kmer,
                             idx.single_base_max, dix.mask_bits, n_probes=4)
    sharded = step(jnp.asarray(codes), jnp.asarray(lens))
    for a, b in zip(single, sharded):
        assert np.array_equal(np.asarray(a), np.asarray(b))
