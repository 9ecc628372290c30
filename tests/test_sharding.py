"""SPMD tests on a virtual 8-device CPU mesh.

The reference has nothing distributed to test (SURVEY §2.10/§4); these tests
establish the arithmetic contract the TPU build must keep: sharded execution
produces the same numbers as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_interactions
from torchrecsys_tpu.config import ModelConfig, TrainConfig
from torchrecsys_tpu.data import prepare_data
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.parallel import batch_sharding, make_mesh
from torchrecsys_tpu.train import Trainer


@pytest.fixture(scope="module")
def store():
    return prepare_data(
        make_interactions(n_users=64, n_items=48, n=2048),
        "user_id",
        "item_id",
        dynamic_neg_sampling=True,
    )


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize(
    "data,model", [(8, 1), (4, 2), (2, 4), (1, 8)], ids=lambda x: str(x)
)
def test_mesh_shapes(data, model):
    mesh = make_mesh(data=data, model=model)
    assert mesh.shape == {"data": data, "model": model}


def test_mesh_infers_missing_axis():
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(model=3)


def _run_steps(store, mesh, steps=3, net_type="mlp"):
    model = build_model(
        store.schema,
        ModelConfig(net_type=net_type, n_factors=8, hidden_layers=(16, 8)),
    )
    cfg = TrainConfig(batch_size=256, dynamic_neg_sampling=True, learning_rate=0.05)
    trainer = Trainer(model, cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(steps):
        batch = {
            "user_id": jnp.asarray(store.train_users[i * 256 : (i + 1) * 256]),
            "pos_item_id": jnp.asarray(store.train_items[i * 256 : (i + 1) * 256]),
        }
        if mesh is not None:
            batch = jax.device_put(batch, batch_sharding(mesh))
        state, loss = step(state, batch, None)
        losses.append(float(loss))
    return state, losses


@pytest.mark.parametrize("axes", [(8, 1), (4, 2), (1, 8)], ids=lambda x: str(x))
def test_sharded_training_matches_single_device(store, axes):
    """Same arithmetic on any mesh split — dp grads / row-sharded tables /
    synced BN must not change the numbers (within fp tolerance)."""
    state_ref, losses_ref = _run_steps(store, mesh=None)
    mesh = make_mesh(data=axes[0], model=axes[1])
    state_sh, losses_sh = _run_steps(store, mesh=mesh)
    np.testing.assert_allclose(losses_sh, losses_ref, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(state_sh["tables"]["item"]),
        np.asarray(state_ref["tables"]["item"]),
        atol=2e-5,
    )


def test_table_shards_are_row_splits(store):
    mesh = make_mesh(data=2, model=4)
    model = build_model(store.schema, ModelConfig(net_type="linear", n_factors=8))
    trainer = Trainer(model, TrainConfig(batch_size=128), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    table = state["tables"]["user"]
    sharding = table.sharding
    assert sharding.spec == jax.sharding.PartitionSpec("model", None)
    # each addressable shard covers all columns, a slice of rows
    shard = table.addressable_shards[0]
    assert shard.data.shape[1] == table.shape[1]
    assert shard.data.shape[0] < table.shape[0]


class TestExplicitLookup:
    """parallel/embedding.py: explicit shard_map lookup/update must equal the
    dense single-device ops exactly."""

    def _table_and_ids(self, rows=128, d=16, nb=64):
        r = np.random.default_rng(0)
        table = jnp.asarray(r.normal(size=(rows, d)), jnp.float32)
        ids = jnp.asarray(r.integers(0, rows, nb), jnp.int32)
        return table, ids

    @pytest.mark.parametrize("model_axis", [2, 4, 8])
    def test_lookup_matches_dense(self, model_axis):
        from torchrecsys_tpu.parallel.embedding import sharded_lookup

        mesh = make_mesh(model=model_axis)
        table, ids = self._table_and_ids()
        table_sh = jax.device_put(
            table, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
        )
        out = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))(table_sh, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(ids)])

    def test_lookup_2d_ids(self):
        from torchrecsys_tpu.parallel.embedding import sharded_lookup

        mesh = make_mesh(model=4)
        table, _ = self._table_and_ids()
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (8, 3)), jnp.int32)
        out = sharded_lookup(table, ids, mesh)
        assert out.shape == (8, 3, 16)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(ids)])

    @pytest.mark.parametrize("model_axis", [2, 8])
    def test_scatter_add_matches_dense(self, model_axis):
        from torchrecsys_tpu.parallel.embedding import sharded_scatter_add

        mesh = make_mesh(model=model_axis)
        table, ids = self._table_and_ids()
        r = np.random.default_rng(2)
        upd = jnp.asarray(r.normal(size=(ids.shape[0], 16)), jnp.float32)
        table_sh = jax.device_put(
            table, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
        )
        out = jax.jit(lambda t, i, u: sharded_scatter_add(t, i, u, mesh))(table_sh, ids, upd)
        expect = np.asarray(table).copy()
        np.add.at(expect, np.asarray(ids), np.asarray(upd))  # duplicate-safe
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    def test_lookup_grad_flows(self):
        """d(loss)/d(table) through the explicit lookup equals the dense path."""
        from torchrecsys_tpu.parallel.embedding import sharded_lookup

        mesh = make_mesh(model=4)
        table, ids = self._table_and_ids(rows=64, d=8, nb=16)
        table_sh = jax.device_put(
            table, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
        )
        g_sh = jax.grad(lambda t: jnp.sum(sharded_lookup(t, ids, mesh) ** 2))(table_sh)
        g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-6)


def test_full_epoch_on_mesh(store):
    mesh = make_mesh(data=4, model=2)
    model = build_model(
        store.schema, ModelConfig(net_type="mlp", n_factors=8, hidden_layers=(16,))
    )
    cfg = TrainConfig(batch_size=256, dynamic_neg_sampling=True, learning_rate=0.05)
    trainer = Trainer(model, cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, losses = trainer.fit(state, store, epochs=2, verbose=False)
    assert np.isfinite(losses).all()
    metrics = trainer.evaluate(state, store, verbose=False)
    assert 0.0 <= metrics["auc"] <= 1.0


class TestShardedCatalogTopk:
    """SURVEY §7 hard part (c): per-shard score+top-k over the 'model' axis
    + cross-shard k-way merge equals the single-device result exactly."""

    def _model_params(self, net_type, with_meta=False):
        from torchrecsys_tpu.config import DataSchema

        schema = DataSchema(
            num_users=50,
            num_items=37,
            **(
                dict(
                    metadata_names=("cat",),
                    metadata_vocab_sizes=(7,),
                    metadata_width=2,
                )
                if with_meta
                else {}
            ),
        )
        model = build_model(schema, ModelConfig(net_type=net_type, n_factors=8))
        params, state = model.init(jax.random.PRNGKey(0))
        feat = None
        if with_meta:
            r = np.random.default_rng(0)
            feat = {
                "meta_ids": jnp.asarray(r.integers(0, 7, (37, 1, 2)), jnp.int32),
                "meta_mask": jnp.asarray(r.random((37, 1, 2)) < 0.8),
            }
        return model, params, state, feat

    @pytest.mark.parametrize("net_type", ["linear", "fm"])
    @pytest.mark.parametrize(
        "axes", [(8, 1), (4, 2), (1, 8)], ids=lambda x: str(x)
    )
    def test_matches_single_device(self, net_type, axes):
        from torchrecsys_tpu.eval.predict import catalog_topk

        model, params, state, feat = self._model_params(net_type)
        users = jnp.arange(16, dtype=jnp.int32)
        s0, i0 = catalog_topk(model, params, state, users, 37, feat, top_k=5)
        mesh = make_mesh(data=axes[0], model=axes[1])
        s1, i1 = catalog_topk(
            model, params, state, users, 37, feat, top_k=5, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_metadata_composite_vectors_shard(self):
        """The item-side composite q (item + metadata sums) shards too."""
        from torchrecsys_tpu.eval.predict import catalog_topk

        model, params, state, feat = self._model_params("linear", with_meta=True)
        users = jnp.arange(8, dtype=jnp.int32)
        s0, i0 = catalog_topk(model, params, state, users, 37, feat, top_k=4)
        mesh = make_mesh(model=4)
        s1, i1 = catalog_topk(
            model, params, state, users, 37, feat, top_k=4, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_k_larger_than_shard(self):
        """k > rows-per-shard: local top-k clamps to the shard size and the
        merge still reconstructs the exact global top-k."""
        from torchrecsys_tpu.eval.predict import catalog_topk

        model, params, state, _ = self._model_params("linear")
        users = jnp.arange(4, dtype=jnp.int32)
        # 37 items over 8 shards -> 5 rows/shard < k=12
        s0, i0 = catalog_topk(model, params, state, users, 37, top_k=12)
        mesh = make_mesh(model=8)
        s1, i1 = catalog_topk(
            model, params, state, users, 37, top_k=12, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_generic_model_data_sharded(self):
        """Non-linearizable models (MLP) shard the user batch over 'data';
        a user count that doesn't divide the axis is padded and sliced."""
        from torchrecsys_tpu.eval.predict import catalog_topk

        model, params, state, _ = self._model_params("mlp")
        users = jnp.arange(13, dtype=jnp.int32)
        s0, i0 = catalog_topk(model, params, state, users, 37, top_k=5)
        mesh = make_mesh(model=2)
        s1, i1 = catalog_topk(
            model, params, state, users, 37, top_k=5, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_ranking_eval_on_sharded_state(self, store):
        """ranking_eval with a mesh equals the single-device metrics."""
        from torchrecsys_tpu.eval.predict import ranking_eval

        model = build_model(store.schema, ModelConfig(net_type="linear", n_factors=8))
        cfg = TrainConfig(batch_size=256, dynamic_neg_sampling=True)
        mesh = make_mesh(model=2)
        tr = Trainer(model, cfg, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, _ = tr.fit(state, store, epochs=1, verbose=False)
        params = {"tables": state["tables"], "dense": state["dense"]}
        kw = dict(ks=(5,))
        m0 = ranking_eval(
            model, params, state["model_state"], store.test_users,
            store.test_items, store.schema.num_items, **kw,
        )
        m1 = ranking_eval(
            model, params, state["model_state"], store.test_users,
            store.test_items, store.schema.num_items, mesh=mesh, **kw,
        )
        assert m0 == m1


@pytest.mark.parametrize("net_type", ["lstm", "sasrec"])
@pytest.mark.parametrize("axes", [(4, 2), (1, 8)], ids=lambda x: str(x))
def test_sequence_models_sharded_epoch_matches_single_device(store, net_type, axes):
    """Sequence models (history gathers, attention/LSTM dense towers,
    positional tables) train identically on a mesh — full jitted epochs."""
    def run(mesh):
        model = build_model(
            store.schema,
            ModelConfig(net_type=net_type, n_factors=8, history_len=5),
        )
        cfg = TrainConfig(batch_size=256, dynamic_neg_sampling=True,
                          learning_rate=0.05, seed=5)
        tr = Trainer(model, cfg, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, losses = tr.fit(state, store, epochs=2, verbose=False)
        return state, losses

    s_ref, l_ref = run(None)
    s_sh, l_sh = run(make_mesh(data=axes[0], model=axes[1]))
    np.testing.assert_allclose(l_sh, l_ref, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_sh["tables"]["item"]),
        np.asarray(s_ref["tables"]["item"]),
        atol=2e-5,
    )


@pytest.mark.parametrize("axes", [(8, 1), (4, 2), (1, 8)], ids=str)
def test_sharded_exclude_seen_mask_matches_single_device(axes):
    """The seen-mask shards with the catalog along 'model' (_MASK_TILE-
    aligned shard boundaries keep each slice self-contained): masked
    sharded predict must equal masked single-device predict."""
    from torchrecsys_tpu.config import DataSchema, ModelConfig
    from torchrecsys_tpu.eval.predict import catalog_topk
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.ops.dot_topk import pack_seen_mask
    from torchrecsys_tpu.parallel import make_mesh

    schema = DataSchema(num_users=40, num_items=700)
    model = build_model(schema, ModelConfig(net_type="linear", n_factors=8))
    params, state = model.init(jax.random.PRNGKey(2))
    r = np.random.default_rng(0)
    users = jnp.arange(16, dtype=jnp.int32)
    seen = [np.unique(r.integers(0, 700, 60)) for _ in range(16)]
    mask = jnp.asarray(pack_seen_mask(seen, 700))
    s_ref, i_ref = catalog_topk(
        model, params, state, users, 700, top_k=12, seen_mask=mask
    )
    mesh = make_mesh(data=axes[0], model=axes[1])
    s_m, i_m = catalog_topk(
        model, params, state, users, 700, top_k=12, mesh=mesh, seen_mask=mask
    )
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(s_m), np.asarray(s_ref), rtol=1e-6, atol=1e-7
    )
    for u in range(16):
        assert not (set(np.asarray(i_m)[u].tolist()) & set(seen[u].tolist()))
