"""SASRec self-attentive sequence model (models/sasrec.py) — a
beyond-reference model family sharing the LSTM's history/data plane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_interactions
from torchrecsys_tpu import RecSys
from torchrecsys_tpu.config import ModelConfig, TrainConfig
from torchrecsys_tpu.data import prepare_data
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train import Trainer


def _fitted(n=1500, epochs=1):
    store = prepare_data(
        make_interactions(n_users=40, n_items=25, n=n, seed=4),
        "user_id", "item_id", dynamic_neg_sampling=True,
    )
    model = build_model(
        store.schema,
        ModelConfig(net_type="sasrec", n_factors=8, history_len=5,
                    sasrec_blocks=2, sasrec_heads=2),
    )
    tr = Trainer(model, TrainConfig(batch_size=128, dynamic_neg_sampling=True,
                                    learning_rate=0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    state, losses = tr.fit(state, store, epochs=epochs, verbose=False)
    params = {"tables": state["tables"], "dense": state["dense"]}
    return model, params, state, tr, store, losses


def test_training_reduces_loss():
    from tests.test_train import make_learnable_interactions

    store = prepare_data(
        make_learnable_interactions(n=4000), "user_id", "item_id",
        dynamic_neg_sampling=True,
    )
    model = build_model(
        store.schema, ModelConfig(net_type="sasrec", n_factors=8, history_len=6)
    )
    tr = Trainer(model, TrainConfig(batch_size=256, dynamic_neg_sampling=True,
                                    learning_rate=0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    state, losses = tr.fit(state, store, epochs=4, verbose=False)
    assert losses[-1] < losses[0]
    out = tr.evaluate(state, store, verbose=False)
    assert out["auc"] > 0.55


def test_candidate_hidden_from_history():
    """Leakage control: scoring item X must not let X attend to itself in
    the history — same contract as the LSTM."""
    model, params, state, tr, store, _ = _fitted()
    feat = tr.feature_tables(store)
    # pick a user whose history contains item 3
    hist = np.asarray(feat["hist_ids"])
    mask = np.asarray(feat["hist_mask"])
    u = next(
        int(r) for r in range(hist.shape[0])
        if (hist[r][mask[r]] == 3).any() and mask[r].sum() >= 2
    )
    batch = {
        "user_id": jnp.asarray([u, u], jnp.int32),
        "item_id": jnp.asarray([3, 3], jnp.int32),
        "hist_ids": jnp.asarray(hist[[u, u]]),
        "hist_mask": jnp.asarray(mask[[u, u]]),
    }
    # manually pre-masking the candidate must give the SAME score as the
    # model's own leakage masking (i.e. the model already hides it)
    pre = np.asarray(mask[u] & (hist[u] != 3))
    batch2 = dict(batch, hist_mask=jnp.asarray(np.stack([pre, pre])))
    s1, _ = model.score(params, state["model_state"], batch, train=False)
    s2, _ = model.score(params, state["model_state"], batch2, train=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_fused_predict_equals_manual_encode_once():
    from torchrecsys_tpu.eval.predict import catalog_topk

    model, params, state, tr, store, _ = _fitted()
    feat = tr.feature_tables(store)
    users = jnp.arange(10, dtype=jnp.int32)
    n = store.schema.num_items
    scores, ids = catalog_topk(model, params, state["model_state"], users, n,
                               feat, top_k=6)
    h = model.encode_users(params, feat, users).astype(jnp.float32)
    iv = params["tables"]["item"][:n].astype(jnp.float32)
    ib = params["tables"]["item_bias"][:n, 0].astype(jnp.float32)
    dense = np.asarray(h @ iv.T + ib[None, :])
    exp = np.argsort(-dense, axis=1, kind="stable")[:, :6]
    np.testing.assert_array_equal(np.asarray(ids), exp)


def test_sharded_predict_matches_single_device():
    from torchrecsys_tpu.eval.predict import catalog_topk
    from torchrecsys_tpu.parallel import make_mesh

    model, params, state, tr, store, _ = _fitted()
    feat = tr.feature_tables(store)
    users = jnp.arange(8, dtype=jnp.int32)
    n = store.schema.num_items
    s0, i0 = catalog_topk(model, params, state["model_state"], users, n, feat, top_k=5)
    mesh = make_mesh(data=2, model=4)
    s1, i1 = catalog_topk(model, params, state["model_state"], users, n, feat,
                          top_k=5, mesh=mesh)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_facade_end_to_end(tmp_path):
    data = make_interactions(n_users=50, n_items=30, n=2000, seed=2)
    rs = RecSys(data, item_id_col="item_id", net_type="sasrec", n_factors=8,
                history_len=6)
    losses = rs.fit(epochs=2, batch_size=256, verbose=False)
    assert np.isfinite(losses).all()
    metrics = rs.evaluate(eval_metrics=["loss", "auc"], verbose=False)
    assert 0.0 <= metrics["auc"] <= 1.0
    top = rs.predict(user_id=0, top_k=5)
    assert top.shape == (5,) and len(set(top.tolist())) == 5
    sim = rs.similar_items(data["item_id"][0], top_k=4)
    assert sim.shape == (4,)
    d = str(tmp_path / "ck")
    rs.save(d)
    rs2 = RecSys.load(d)
    assert rs2.model_cfg.net_type == "sasrec"


def test_empty_history_encodes_to_zero():
    model, params, state, tr, store, _ = _fitted()
    feat = {
        "hist_ids": jnp.zeros((1, 5), jnp.int32),
        "hist_mask": jnp.zeros((1, 5), bool),
    }
    h = model.encode_users(params, feat, jnp.asarray([0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(h), 0.0)


@pytest.mark.parametrize("net_type", ["lstm", "sasrec"])
def test_cold_load_predict_uses_checkpointed_history(net_type, tmp_path):
    """Sequence models' histories derive from the train split, which a cold
    RecSys.load does not have — they must ride the checkpoint, and cold
    predict must equal warm predict exactly."""
    data = make_interactions(n_users=40, n_items=25, n=1500, seed=6)
    rs = RecSys(data, item_id_col="item_id", net_type=net_type, n_factors=8,
                history_len=5)
    rs.fit(epochs=1, batch_size=256, verbose=False)
    warm = rs.predict(user_id=[0, 1, 2], top_k=6)
    d = str(tmp_path / "ck")
    rs.save(d)
    cold = RecSys.load(d)
    np.testing.assert_array_equal(cold.predict(user_id=[0, 1, 2], top_k=6), warm)
    # and the histories are genuinely non-trivial (different users differ)
    h = cold.store.user_history(5)
    assert h[1].any()


def test_heads_must_divide_factors():
    from torchrecsys_tpu.config import DataSchema

    with pytest.raises(ValueError, match="divisible"):
        build_model(
            DataSchema(num_users=10, num_items=10),
            ModelConfig(net_type="sasrec", n_factors=8, sasrec_heads=3),
        )
