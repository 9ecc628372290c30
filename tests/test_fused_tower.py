"""Parity tests for the fused Pallas MLP tower (ops/fused_tower.py).

The kernels run in interpret mode off-TPU (``pallas_tower=True`` forces
them on); parity vs the plain XLA tower is to float-reassociation
tolerance — the kernel computes the same bf16/f32 dtype chain but reduces
in a different order, so exact bitwise equality is not the contract
(unlike ops/fused_pairwise.py, which is closed-form and bit-exact).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrecsys_tpu.config import DataSchema, ModelConfig, TrainConfig
from torchrecsys_tpu.data import prepare_data
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train import Trainer

R = 512  # fused_tower.TILE — one tile; rows must divide the tile


def _model(pallas_tower, hidden=(64, 32)):
    schema = DataSchema(num_users=40, num_items=30)
    return build_model(
        schema,
        ModelConfig(
            net_type="mlp",
            n_factors=8,
            hidden_layers=hidden,
            use_batch_norm=True,
            compute_dtype="bfloat16",
            pallas_tower=pallas_tower,
        ),
    )


def _rows_batch(key, n=R, d=8):
    ku, ki = jax.random.split(key)
    rows = {
        "user": jax.random.normal(ku, (n, d), jnp.float32),
        "item": jax.random.normal(ki, (n, d), jnp.float32),
    }
    batch = {
        "user_id": jnp.zeros((n,), jnp.int32),
        "item_id": jnp.zeros((n,), jnp.int32),
    }
    return rows, batch


def test_applicability_gate():
    from torchrecsys_tpu.ops.fused_tower import tower_applicable

    m = _model(True)
    assert tower_applicable(m.cfg, R)
    assert not tower_applicable(m.cfg, R + 8)  # non-tile rows
    off = dataclasses.replace(m.cfg, pallas_tower=False)
    assert not tower_applicable(off, R)
    no_bn = dataclasses.replace(m.cfg, use_batch_norm=False)
    assert not tower_applicable(no_bn, R)


def test_forward_parity():
    m_pl, m_x = _model(True), _model(False)
    params, state = m_pl.init(jax.random.PRNGKey(0))
    rows, batch = _rows_batch(jax.random.PRNGKey(1))
    s_pl, st_pl = m_pl.score_rows(params["dense"], state, rows, batch, train=True)
    s_x, st_x = m_x.score_rows(params["dense"], state, rows, batch, train=True)
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_x), rtol=0, atol=5e-2
    )
    for a, b in zip(st_pl["bn"], st_x["bn"]):
        np.testing.assert_allclose(
            np.asarray(a["mean"]), np.asarray(b["mean"]), rtol=0, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(a["var"]), np.asarray(b["var"]), rtol=2e-2, atol=2e-3
        )


def test_gradient_parity():
    """Kernel grads vs the XLA bf16 tower, judged against the legitimate
    implementation-noise floor: the distance between the XLA bf16 tower and
    the SAME tower in f32 compute. Two correct bf16 towers differ by
    reduction order and ReLU-threshold mask flips (measured ~5-15% in
    gradient Frobenius norm); a formula bug would give O(1) error and
    exceed the floor by a wide margin."""
    m_pl, m_x = _model(True), _model(False)
    schema = m_x.schema
    m_f32 = build_model(
        schema,
        dataclasses.replace(m_x.cfg, compute_dtype="float32",
                            pallas_tower=False),
    )
    params, state = m_pl.init(jax.random.PRNGKey(0))
    rows, batch = _rows_batch(jax.random.PRNGKey(1))
    b = R // 2

    def gradof(model):
        def loss(rows_, dense_):
            s, _ = model.score_rows(dense_, state, rows_, batch, train=True)
            return jnp.mean(jnp.maximum(s[b:] - s[:b] + 1.0, 0.0))

        return jax.grad(loss, argnums=(0, 1))(rows, params["dense"])

    g_pl, g_x, g_f = gradof(m_pl), gradof(m_x), gradof(m_f32)
    flat_pl, tree_pl = jax.tree_util.tree_flatten(g_pl)
    flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
    flat_f, _ = jax.tree_util.tree_flatten(g_f)
    assert tree_pl == tree_x
    for a, b_, c in zip(flat_pl, flat_x, flat_f):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        c = np.asarray(c, np.float32)
        dist = np.linalg.norm(a - b_) / max(np.linalg.norm(b_), 1e-6)
        floor = np.linalg.norm(b_ - c) / max(np.linalg.norm(c), 1e-6)
        assert dist < max(1.5 * floor, 0.02), (a.shape, dist, floor)


def test_end_to_end_training_parity():
    """Tiny fit: fused-tower losses track the XLA tower's losses and the
    model learns (loss decreases)."""
    r = np.random.default_rng(0)
    n = 2048
    users = r.integers(0, 40, n)
    items = np.where(users % 2 == 0, r.integers(0, 15, n) * 2,
                     r.integers(0, 15, n) * 2 + 1)
    losses = {}
    for pallas_tower in (True, False):
        store = prepare_data(
            {"user_id": users, "item_id": items}, "user_id", "item_id"
        )
        model = build_model(
            store.schema,
            ModelConfig(net_type="mlp", n_factors=8, hidden_layers=(64,),
                        use_batch_norm=True, compute_dtype="bfloat16",
                        pallas_tower=pallas_tower),
        )
        # batch 256 -> paired rows 512 = one tile
        tr = Trainer(model, TrainConfig(batch_size=256, learning_rate=0.05,
                                        drop_remainder=True))
        st = tr.init_state(jax.random.PRNGKey(0))
        st, ls = tr.fit(st, store, epochs=4, verbose=False)
        losses[pallas_tower] = ls
    assert losses[True][-1] < losses[True][0]  # learns
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.08)


def test_empty_hidden_layers_not_applicable():
    """hidden_layers=() has nothing to fuse; the fused path would apply the
    zeroed input bnvec in the head and emit constant scores."""
    from torchrecsys_tpu.ops.fused_tower import tower_applicable

    m = _model(True, hidden=())
    assert not tower_applicable(m.cfg, R)
