"""Exact-parity tests: the fused Pallas train step (ops/fused_pairwise.py)
against the generic XLA step it replaces.

Both paths implement identical math (same loss, same rowwise-adagrad
fused-layout semantics, same per-step negative-sampling keys), so epoch
losses and post-epoch tables must agree to f32 tolerance. On CPU the kernel
runs in Pallas interpret mode (the trainer selects this automatically off
TPU)."""

import dataclasses

import jax
import numpy as np
import pytest

from torchrecsys_tpu.config import ModelConfig, TrainConfig
from torchrecsys_tpu.data import prepare_data
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train import Trainer


def _store(n=700, n_users=50, n_items=40, dynamic=True, seed=0):
    r = np.random.default_rng(seed)
    data = {
        "user_id": r.integers(0, n_users, n),
        "item_id": r.integers(0, n_items, n),
    }
    return prepare_data(
        data, "user_id", "item_id", dynamic_neg_sampling=dynamic
    )


def _run_epochs(store, net, cfg, epochs=2):
    model = build_model(store.schema, ModelConfig(net_type=net, n_factors=16))
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, losses = trainer.fit(state, store, epochs=epochs, verbose=False)
    return trainer, state, losses


@pytest.mark.parametrize("net", ["linear", "fm"])
@pytest.mark.parametrize("loss", ["hinge", "bpr"])
def test_pallas_epoch_matches_xla(net, loss):
    # batch 128 divides 560 train rows? 700*0.8=560 -> remainder batch too
    store = _store()
    cfg = TrainConfig(
        batch_size=128, learning_rate=0.05, dynamic_neg_sampling=True,
        loss=loss, seed=3,
    )
    t_pl, s_pl, l_pl = _run_epochs(store, net, cfg)
    assert t_pl._pallas_pairwise(), "kernel path should apply here"
    t_x, s_x, l_x = _run_epochs(
        store, net, dataclasses.replace(cfg, pallas_step=False)
    )
    assert not t_x._pallas_pairwise()
    np.testing.assert_allclose(l_pl, l_x, rtol=1e-5, atol=1e-6)
    for name in s_x["tables"]:
        np.testing.assert_allclose(
            np.asarray(s_pl["tables"][name]), np.asarray(s_x["tables"][name]),
            rtol=1e-5, atol=1e-6, err_msg=f"table {name}",
        )
        np.testing.assert_allclose(
            np.asarray(s_pl["emb_opt"][name]["acc"]),
            np.asarray(s_x["emb_opt"][name]["acc"]),
            rtol=1e-5, atol=1e-6, err_msg=f"acc {name}",
        )


def test_pallas_epoch_static_negatives_and_logistic():
    store = _store(dynamic=False)
    cfg = TrainConfig(batch_size=64, learning_rate=0.02, loss="logistic")
    t_pl, s_pl, l_pl = _run_epochs(store, "linear", cfg)
    assert t_pl._pallas_pairwise()
    _, s_x, l_x = _run_epochs(
        store, "linear", dataclasses.replace(cfg, pallas_step=False)
    )
    np.testing.assert_allclose(l_pl, l_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_pl["tables"]["user"]), np.asarray(s_x["tables"]["user"]),
        rtol=1e-5, atol=1e-6,
    )


def test_pallas_kernel_inapplicable_with_metadata():
    r = np.random.default_rng(0)
    n = 300
    items = r.integers(0, 20, n)
    data = {
        "user_id": r.integers(0, 30, n),
        "item_id": items,
        "cat": np.asarray([[int(i % 5)] for i in items], dtype=object),
    }
    store = prepare_data(data, "user_id", "item_id", metadata_id_col=["cat"])
    model = build_model(store.schema, ModelConfig(net_type="linear", n_factors=8))
    trainer = Trainer(model, TrainConfig(batch_size=64))
    assert not trainer._pallas_pairwise()  # falls back to the XLA step
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, losses = trainer.fit(state, store, epochs=1, verbose=False)
    assert np.isfinite(losses[0])


def test_pallas_kernel_inapplicable_for_mlp():
    store = _store(n=200)
    model = build_model(store.schema, ModelConfig(net_type="mlp", n_factors=8,
                                                  hidden_layers=(16,)))
    trainer = Trainer(model, TrainConfig(batch_size=64))
    assert not trainer._pallas_pairwise()


def test_pack_unpack_roundtrip():
    from torchrecsys_tpu.ops.fused_pairwise import pack_side, unpack_side

    r = np.random.default_rng(1)
    vec = r.normal(size=(64, 17)).astype(np.float32)  # (R, D+1), D=16
    bias = r.normal(size=(64, 2)).astype(np.float32)
    packed = pack_side(jax.numpy.asarray(vec), jax.numpy.asarray(bias))
    assert packed.shape == (64, 128)
    v2, b2 = unpack_side(packed, 16)
    np.testing.assert_array_equal(np.asarray(v2), vec)
    np.testing.assert_array_equal(np.asarray(b2), bias)
    np.testing.assert_array_equal(np.asarray(packed[:, 19:]), 0.0)
