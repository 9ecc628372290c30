"""Model-zoo unit tests: shapes, init statistics, math parity properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrecsys_tpu.config import DataSchema, ModelConfig
from torchrecsys_tpu.models import MODEL_REGISTRY, EASE, build_model

SCHEMA = DataSchema(num_users=30, num_items=20)
SCHEMA_META = DataSchema(
    num_users=30,
    num_items=20,
    metadata_names=("cat",),
    metadata_vocab_sizes=(7,),
    metadata_width=2,
)


def make_batch(schema, b=16, seed=0):
    r = np.random.default_rng(seed)
    batch = {
        "user_id": jnp.asarray(r.integers(0, schema.num_users, b), jnp.int32),
        "item_id": jnp.asarray(r.integers(0, schema.num_items, b), jnp.int32),
    }
    batch["hist_ids"] = jnp.asarray(r.integers(0, schema.num_items, (b, 4)), jnp.int32)
    batch["hist_mask"] = jnp.asarray(r.integers(0, 2, (b, 4)) > 0)
    if schema.num_metadata_features:
        f, w = schema.num_metadata_features, schema.metadata_width
        batch["meta_ids"] = jnp.asarray(
            r.integers(0, schema.metadata_vocab_sizes[0], (b, f, w)), jnp.int32
        )
        batch["meta_mask"] = jnp.asarray(r.integers(0, 2, (b, f, w)) > 0)
    return batch


@pytest.mark.parametrize("net_type", sorted(MODEL_REGISTRY))
@pytest.mark.parametrize("schema", [SCHEMA, SCHEMA_META], ids=["plain", "meta"])
def test_score_shape_and_dtype(net_type, schema):
    model = build_model(schema, ModelConfig(net_type=net_type, n_factors=8))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(schema)
    scores, _ = model.score(params, state, batch)
    assert scores.shape == (16,)
    assert scores.dtype == jnp.float32
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("net_type", sorted(MODEL_REGISTRY))
def test_score_equals_score_rows(net_type):
    """The gather/score_rows split must agree with the direct score path."""
    model = build_model(SCHEMA_META, ModelConfig(net_type=net_type, n_factors=8))
    params, state = model.init(jax.random.PRNGKey(1))
    batch = make_batch(SCHEMA_META, seed=3)
    direct, _ = model.score(params, state, batch)
    rows = model.gather_rows(params["tables"], batch)
    via_rows, _ = model.score_rows(params["dense"], state, rows, batch, train=False)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_rows), rtol=1e-6)


def test_scaled_embedding_init_statistics():
    """ScaledEmbedding ~ N(0, 1/dim) — init_embeddings.py:43-50."""
    schema = DataSchema(num_users=2000, num_items=2000)
    model = build_model(schema, ModelConfig(net_type="linear", n_factors=64))
    params, _ = model.init(jax.random.PRNGKey(0))
    t = np.asarray(params["tables"]["user"])
    assert abs(t.mean()) < 1e-3
    np.testing.assert_allclose(t.std(), 1.0 / 64, rtol=0.05)
    # ZeroEmbedding biases start at exactly zero — init_embeddings.py:90-97
    assert (np.asarray(params["tables"]["user_bias"]) == 0).all()


def test_linear_math_manual():
    """score = <u, i> + b_u + b_i (linear.py:78), checked by hand."""
    model = build_model(SCHEMA, ModelConfig(net_type="linear", n_factors=4))
    params, state = model.init(jax.random.PRNGKey(0))
    t = params["tables"]
    batch = {
        "user_id": jnp.asarray([2], jnp.int32),
        "item_id": jnp.asarray([5], jnp.int32),
    }
    scores, _ = model.score(params, state, batch)
    expect = (
        np.asarray(t["user"])[2] @ np.asarray(t["item"])[5]
        + np.asarray(t["user_bias"])[2, 0]
        + np.asarray(t["item_bias"])[5, 0]
    )
    np.testing.assert_allclose(np.asarray(scores)[0], expect, rtol=1e-6)


def test_fm_sigmoid_bounds_and_toggle():
    """FM scores live in (0,1) with the reference's sigmoid (fm.py:99)
    and are unbounded without it."""
    m_sig = build_model(SCHEMA, ModelConfig(net_type="fm", n_factors=8))
    m_raw = build_model(SCHEMA, ModelConfig(net_type="fm", n_factors=8, fm_sigmoid=False))
    params, state = m_sig.init(jax.random.PRNGKey(0))
    batch = make_batch(SCHEMA)
    s_sig, _ = m_sig.score(params, state, batch)
    s_raw, _ = m_raw.score(params, state, batch)
    s_sig, s_raw = np.asarray(s_sig), np.asarray(s_raw)
    assert (s_sig > 0).all() and (s_sig < 1).all()
    np.testing.assert_allclose(1 / (1 + np.exp(-s_raw)), s_sig, rtol=1e-5)


def test_mlp_configurable_layers():
    """hidden_layers / use_batch_norm honored (reference never forwards
    them from its facade — SURVEY §2.4)."""
    cfg = ModelConfig(net_type="mlp", n_factors=8, hidden_layers=(32, 16), use_batch_norm=False)
    model = build_model(SCHEMA, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert [l["w"].shape for l in params["dense"]["layers"]] == [(16, 32), (32, 16)]
    assert "bn" not in params["dense"]
    assert state == {}
    cfg_bn = ModelConfig(net_type="mlp", n_factors=8, hidden_layers=(32, 16))
    model_bn = build_model(SCHEMA, cfg_bn)
    params_bn, state_bn = model_bn.init(jax.random.PRNGKey(0))
    assert len(params_bn["dense"]["bn"]) == 2
    assert state_bn["bn"][0]["mean"].shape == (32,)


def test_mlp_bn_train_updates_running_stats():
    model = build_model(SCHEMA, ModelConfig(net_type="mlp", n_factors=8, hidden_layers=(16,)))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(SCHEMA)
    _, new_state = model.score(params, state, batch, train=True)
    assert not np.allclose(
        np.asarray(new_state["bn"][0]["mean"]), np.asarray(state["bn"][0]["mean"])
    )
    # eval mode leaves state untouched
    _, same_state = model.score(params, state, batch, train=False)
    assert same_state is state


def test_unknown_net_type_raises():
    """Unlike the reference's AttributeError trap (model.py:162-168)."""
    with pytest.raises(ValueError, match="unknown net_type"):
        build_model(SCHEMA, ModelConfig(net_type="transformer"))


class TestEASE:
    def test_fit_and_predict(self):
        users = np.asarray([0, 0, 1, 1, 2, 2, 3], np.int32)
        items = np.asarray([0, 1, 1, 2, 2, 3, 0], np.int32)
        ease = EASE(num_users=4, num_items=4, lam=1.0).fit(users, items)
        assert ease.b.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(jnp.diag(ease.b)), 0.0, atol=1e-6)
        top = ease.predict(0, top_k=2)
        assert top.shape == (2,)
        # seen items excluded by default
        assert 0 not in top and 1 not in top

    def test_similarity(self):
        users = np.asarray([0, 0, 1, 1], np.int32)
        items = np.asarray([0, 1, 0, 1], np.int32)
        ease = EASE(num_users=2, num_items=3, lam=0.5).fit(users, items)
        sim = ease.get_similarity(0, top_k=2)
        assert sim[0] == 1  # item 1 always co-occurs with item 0


class TestEASEChunkedAndIncremental:
    def test_chunked_gram_matches_single_chunk(self):
        """The user-chunked Gram accumulation (no dense X ever materialized,
        VERDICT r4 weak #2) must equal the one-chunk solve exactly."""
        r = np.random.default_rng(0)
        users = r.integers(0, 50, 400).astype(np.int32)
        items = r.integers(0, 20, 400).astype(np.int32)
        small = EASE(50, 20, lam=2.0).fit(users, items, user_chunk=7)
        big = EASE(50, 20, lam=2.0).fit(users, items, user_chunk=50)
        np.testing.assert_allclose(
            np.asarray(small.b), np.asarray(big.b), rtol=1e-5, atol=1e-6
        )

    def test_refit_is_idempotent_and_merging(self):
        """X is binary: re-presenting rows is a no-op; fit() merges with the
        interactions the instance already holds (the cold-load update_data
        contract, ADVICE r4)."""
        u1 = np.asarray([0, 1, 2], np.int32)
        i1 = np.asarray([0, 1, 2], np.int32)
        u2 = np.asarray([3, 3], np.int32)
        i2 = np.asarray([0, 3], np.int32)
        merged = EASE(4, 4, lam=1.0).fit(
            np.concatenate([u1, u2]), np.concatenate([i1, i2])
        )
        inc = EASE(4, 4, lam=1.0).fit(u1, i1)
        inc.fit(u2, i2)  # merges with the prior CSR
        np.testing.assert_allclose(
            np.asarray(inc.b), np.asarray(merged.b), rtol=1e-5, atol=1e-6
        )
        assert inc.nnz == merged.nnz == 5


def test_ease_cold_load_update_data_keeps_original_interactions(tmp_path):
    """ADVICE r4: update_data on a COLD-loaded EASE used to re-solve over
    only the new increment, silently dropping all original training data.
    Now the checkpointed CSR merges with the increment."""
    from torchrecsys_tpu import RecSys

    r = np.random.default_rng(1)
    base = {
        "user_id": r.integers(0, 30, 300),
        "item_id": r.integers(0, 15, 300),
    }
    inc = {"user_id": np.asarray([100] * 4), "item_id": np.asarray([0, 1, 2, 3])}

    rs = RecSys(dict(base), n_factors=8, net_type="ease", split_ratio=1.0)
    rs.fit(verbose=False)
    d = str(tmp_path / "ease_cold")
    rs.save(d)

    cold = RecSys.load(d)
    cold.update_data(dict(inc), split_ratio=1.0)
    cold.fit(verbose=False)

    # warm twin: same base + increment in one process
    warm = RecSys(dict(base), n_factors=8, net_type="ease", split_ratio=1.0)
    warm.fit(verbose=False)
    warm.update_data(dict(inc), split_ratio=1.0)
    warm.fit(verbose=False)
    np.testing.assert_allclose(
        np.asarray(cold.ease.b), np.asarray(warm.ease.b), rtol=1e-5, atol=1e-6
    )
    # and the original users still get recommendations from original signal
    assert cold.ease.nnz == warm.ease.nnz


def test_ease_iterative_solve_matches_exact():
    """The matmul-only Newton-Schulz inverse (the TPU path beyond ~8K items,
    where LU/Cholesky custom-calls exceed their VMEM panel limit) must match
    the exact solve."""
    r = np.random.default_rng(2)
    users = r.integers(0, 60, 500).astype(np.int32)
    items = r.integers(0, 25, 500).astype(np.int32)
    exact = EASE(60, 25, lam=10.0).fit(users, items, solve="exact")
    it = EASE(60, 25, lam=10.0).fit(users, items, solve="iterative")
    np.testing.assert_allclose(
        np.asarray(it.b), np.asarray(exact.b), rtol=1e-3, atol=1e-4
    )
