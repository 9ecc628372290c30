"""Multi-host entry points (parallel/distributed.py).

A real multi-host cluster cannot run here (single process); these tests
cover everything testable in one process: the init wrapper forwards its
arguments, the per-process assembly arithmetic is exact, and the
global-array feeding paths produce bitwise the arrays ``device_put`` would
— in a single-process mesh both modes must degenerate to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from torchrecsys_tpu.parallel import (
    batch_sharding,
    init_distributed,
    make_global_array,
    make_mesh,
    put_sharded,
)
from torchrecsys_tpu.parallel.distributed import process_row_range


def test_init_distributed_forwards_args(monkeypatch):
    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None, local_device_ids=None):
        calls.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    init_distributed("host0:8476", 2, 1)
    assert calls == {
        "coordinator_address": "host0:8476",
        "num_processes": 2,
        "process_id": 1,
        "local_device_ids": None,
    }


def test_process_row_range_single_process():
    # single process owns everything, whatever the shard count
    assert process_row_range(1024, 8) == (0, 1024)


def test_process_row_range_multi_process_arithmetic(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pid, expected in [(0, (0, 512)), (1, (512, 1024))]:
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        assert process_row_range(1024, 8) == expected
    with pytest.raises(ValueError, match="not divisible"):
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        process_row_range(1024, 8)


def test_make_global_array_full_mode_equals_device_put():
    mesh = make_mesh(data=4, model=2)
    sh = batch_sharding(mesh)
    x = np.arange(64, dtype=np.int32)
    a = make_global_array(x, sh)
    b = jax.device_put(x, sh)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_global_array_local_rows_mode():
    """Single process == all rows local; the process_local_data path must
    reproduce device_put exactly."""
    mesh = make_mesh(data=4, model=2)
    sh = batch_sharding(mesh)
    x = np.arange(128, dtype=np.int32).reshape(64, 2)
    start, stop = process_row_range(64, 4)
    a = make_global_array(x[start:stop], sh, global_shape=(64, 2))
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(jax.device_put(x, sh))
    )


def test_put_sharded_routes_by_process_count(monkeypatch):
    mesh = make_mesh(data=4, model=2)
    sh = batch_sharding(mesh)
    arrays = {"u": np.arange(32, dtype=np.int32), "i": np.ones(32, np.float32)}
    single = put_sharded(arrays, sh)
    # pretend to be host 0 of 2: the multi-process path (callback-assembled
    # shards) must produce the same global arrays in this 1-process mesh
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    multi = put_sharded(arrays, sh)
    for k in arrays:
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]))
        assert multi[k].sharding.is_equivalent_to(single[k].sharding, 1)


def test_streaming_uses_put_sharded(monkeypatch):
    """SuperBatchStream feeds through put_sharded, so multi-process feeding
    is automatic."""
    from torchrecsys_tpu.train.streaming import SuperBatchStream

    mesh = make_mesh(data=4, model=2)
    sh = batch_sharding(mesh)
    arrays = {"user_id": np.arange(64, dtype=np.int32)}
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    stream = SuperBatchStream(arrays, superbatch_size=32, sharding=sh)
    chunks = list(stream.epoch())
    assert len(chunks) == 2
    got = np.sort(np.concatenate([np.asarray(c["user_id"]) for c in chunks]))
    np.testing.assert_array_equal(got, arrays["user_id"])
