"""Multi-host mesh layout: the ``idx`` axis must never cross a process
(ICI-only index merges), ``dp`` spans processes (DCN carries only the
read stream). Simulated with fake device handles; the real-device path
is exercised on the virtual CPU mesh."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


class FakeDev:
    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def test_host_mesh_keeps_idx_within_process():
    from desamba_tpu.parallel.distributed import host_mesh

    devs = [FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    mesh = host_mesh(n_idx=4, devices=devs)
    assert mesh.devices.shape == (2, 4)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    mesh2 = host_mesh(n_idx=2, devices=devs)
    assert mesh2.devices.shape == (4, 2)
    for row in mesh2.devices:
        assert len({d.process_index for d in row}) == 1
    # dp-major order interleaves hosts' dp groups contiguously
    assert [d.process_index for d in mesh2.devices[:, 0]] == [0, 0, 1, 1]


def test_host_mesh_rejects_bad_split():
    from desamba_tpu.parallel.distributed import host_mesh

    devs = [FakeDev(0, i) for i in range(4)]
    with pytest.raises(ValueError):
        host_mesh(n_idx=3, devices=devs)


def test_host_mesh_real_devices_single_process():
    from desamba_tpu.parallel.distributed import host_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = host_mesh(n_idx=2)
    assert mesh.axis_names == ("dp", "idx")
    assert mesh.devices.shape[1] == 2
    assert mesh.devices.size == len(jax.devices()) // 2 * 2


def test_initialize_noop_without_coordinator(monkeypatch):
    from desamba_tpu.parallel import distributed

    monkeypatch.delenv("DESAMBA_COORDINATOR", raising=False)
    assert distributed.initialize() is False
