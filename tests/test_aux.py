"""Aux-subsystem tests: write_data, profiling hook, logging, example script."""

import json
import os

import numpy as np

from tests.conftest import make_interactions
from torchrecsys_tpu import RecSys
from torchrecsys_tpu.data import prepare_data


def test_write_data(tmp_path):
    """Reference parity: ProcessData.write_data dumps config.json + meta.csv
    (dataset.py:307-316) — but actually works here."""
    data = make_interactions(n_users=20, n_items=10, n=200, metadata=True)
    store = prepare_data(data, "user_id", "item_id", metadata_id_col=["category_ids"])
    store.write_data(str(tmp_path))
    cfg = json.loads((tmp_path / "config.json").read_text())
    assert cfg["num_users"] == 20 and cfg["num_items"] == 10
    lines = (tmp_path / "meta.csv").read_text().strip().splitlines()
    assert len(lines) == 11  # header + one row per item
    assert lines[0].startswith("item_row,raw_item_id,category_ids")


def test_profile_epochs_smoke(tmp_path):
    """Reference test analog: profiler smoke run
    (tests/test_model_and_features.py:219-226)."""
    rs = RecSys(make_interactions(n=500), n_factors=8)
    rs.fit(epochs=2, batch_size=128, profile_epochs=1, verbose=False)
    # a jax.profiler trace was captured under the default dir
    trace_root = "/tmp/torchrecsys_tpu_trace"
    assert os.path.isdir(trace_root)
    found = any(
        f.endswith((".trace.json.gz", ".xplane.pb"))
        for _, _, files in os.walk(trace_root)
        for f in files
    )
    assert found, "no profiler trace artifact written"


def test_logging_replaces_prints():
    import logging

    from torchrecsys_tpu.utils.logging import get_logger

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture()
    logger = get_logger("torchrecsys_tpu.train")
    logger.addHandler(handler)
    try:
        rs = RecSys(make_interactions(n=500), n_factors=8)
        rs.fit(epochs=1, batch_size=128, verbose=True)
        assert any(m.startswith("epoch 0: loss=") for m in records)
        records.clear()
        rs.fit(epochs=1, batch_size=128, verbose=False)
        assert not any("epoch" in m for m in records)
    finally:
        logger.removeHandler(handler)


def test_quickstart_example_runs():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "quickstart", os.path.join(os.path.dirname(__file__), "..", "examples", "quickstart.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    data = mod.synthetic_interactions(n_users=50, n_items=40, n=2000)
    assert len(data["user_id"]) == 2000
    # structured preference: on-pref rate far above uniform
    # (we just check it builds and the RecSys ctor accepts it)
    from torchrecsys_tpu import RecSys

    rs = RecSys(data, item_id_col="product_id", metadata_id_col=["category_ids"], n_factors=8)
    losses = rs.fit(epochs=1, batch_size=256, verbose=False)
    assert np.isfinite(losses).all()


def test_op_summary_parses_trace(tmp_path):
    """The xplane wire-format reader digests a real jax.profiler trace and
    the per-op table renders (reference parity: in-terminal op digest,
    model.py:268-269)."""
    import jax
    import jax.numpy as jnp

    from torchrecsys_tpu.utils.profiling import op_summary
    from torchrecsys_tpu.utils.xplane import latest_trace_file, read_planes

    d = str(tmp_path / "trace")
    with jax.profiler.trace(d):
        x = jnp.ones((256, 256))
        for _ in range(3):
            x = jnp.tanh(x @ x)
        x.block_until_ready()
    path = latest_trace_file(d)
    assert path is not None
    planes = read_planes(path)
    assert planes and any(p.lines for p in planes)
    # every event's metadata id resolves through some plane's name table
    table = op_summary(d, row_limit=5)
    assert "op" in table and "failed to parse" not in table, table[:400]


def test_all_examples_parse():
    """Every example must at least compile — a misplaced sys.path shim
    above `from __future__` broke multihost_train.py once (round 5)."""
    import pathlib
    import py_compile

    ex_dir = pathlib.Path(__file__).parent.parent / "examples"
    files = sorted(ex_dir.glob("*.py"))
    assert files, "no examples found"
    for f in files:
        py_compile.compile(str(f), doraise=True)
