"""Data-plane tests.

Covers the reference's data-processing test intents
(tests/test_model_and_features.py:52-131) plus the defects the reference
suite could not pass (SURVEY §2.9 #3-5: scalar metadata, multi-column
metadata, string-serialized metadata).
"""

import numpy as np
import pytest

from tests.conftest import make_interactions
from torchrecsys_tpu.data import IdEncoder, prepare_data
from torchrecsys_tpu.data.metadata import MetadataTable, parse_metadata_cell
from torchrecsys_tpu.data.sampling import sample_negatives, sample_negatives_np


class TestIdEncoder:
    def test_roundtrip_noncontiguous_ints(self):
        enc = IdEncoder()
        raw = [100, 7, 100, 42, 7]
        idx = enc.encode(raw)
        assert idx.dtype == np.int32
        assert enc.vocab_size == 3
        assert enc.decode(idx) == raw

    def test_string_ids(self):
        enc = IdEncoder()
        idx = enc.encode(["a", "b", "a"])
        assert list(idx) == [0, 1, 0]

    def test_frozen_rejects_unknown(self):
        enc = IdEncoder.from_values([1, 2]).freeze()
        with pytest.raises(KeyError):
            enc.encode([3])


class TestMetadataParsing:
    def test_scalar_cell(self):
        # reference wipes scalars to [] (dataset.py:193) — fixed here
        assert parse_metadata_cell(3) == [3]

    def test_list_cell(self):
        assert parse_metadata_cell([3, 7]) == [3, 7]

    def test_string_serialized_cell(self):
        # the only format the reference accepts (dataset.py:190-197)
        assert parse_metadata_cell("[3, 7]") == [3, 7]

    def test_none_and_nan(self):
        assert parse_metadata_cell(None) == []
        assert parse_metadata_cell(float("nan")) == []


class TestPrepareData:
    def test_static_negatives_present(self, interactions):
        store = prepare_data(interactions, "user_id", "item_id")
        assert store.train_neg_items is not None
        assert store.test_neg_items is not None
        assert store.train_neg_items.shape == store.train_items.shape
        assert (store.train_neg_items >= 0).all()
        assert (store.train_neg_items < store.schema.num_items).all()

    def test_dynamic_mode_has_no_static_negatives(self, interactions):
        store = prepare_data(
            interactions, "user_id", "item_id", dynamic_neg_sampling=True
        )
        assert store.train_neg_items is None
        assert "neg_item_id" not in store.train_arrays()

    def test_split_ratio(self, interactions):
        store = prepare_data(interactions, "user_id", "item_id", split_ratio=0.8)
        assert store.num_train == 800
        assert store.num_test == 200

    def test_split_deterministic(self, interactions):
        s1 = prepare_data(interactions, "user_id", "item_id", seed=7)
        s2 = prepare_data(interactions, "user_id", "item_id", seed=7)
        np.testing.assert_array_equal(s1.train_users, s2.train_users)
        np.testing.assert_array_equal(s1.train_items, s2.train_items)

    def test_list_metadata(self, interactions_meta):
        store = prepare_data(
            interactions_meta, "user_id", "item_id", metadata_id_col=["category_ids"]
        )
        assert store.schema.metadata_names == ("category_ids",)
        assert store.metadata.width == 2
        assert store.metadata.ids.shape == (store.schema.num_items, 1, 2)
        assert store.metadata.mask.all()  # every item has 2 categories

    def test_scalar_metadata(self):
        # SURVEY §2.9 #3: the reference crashes on scalar metadata
        data = make_interactions(metadata=True, scalar_meta=True)
        store = prepare_data(
            data, "user_id", "item_id", metadata_id_col=["category_ids"]
        )
        assert store.metadata.width == 1
        assert store.metadata.mask.all()

    def test_multiple_metadata_columns_different_widths(self):
        # SURVEY §2.9 #5: the reference crashes stacking unequal pad widths
        data = make_interactions(metadata=True)
        items = data["item_id"]
        data["tags"] = np.asarray(
            [[int(i % 5)] if i % 2 else [int(i % 5), 1, 2] for i in items],
            dtype=object,
        )
        store = prepare_data(
            data, "user_id", "item_id", metadata_id_col=["category_ids", "tags"]
        )
        assert store.metadata.num_features == 2
        assert store.metadata.width == 3  # shared max width
        # category feature has exactly 2 valid slots everywhere
        assert (store.metadata.mask[:, 0, :].sum(-1) == 2).all()

    def test_string_serialized_metadata(self):
        data = make_interactions(metadata=True)
        data["category_ids"] = np.asarray(
            [str(list(c)) for c in data["category_ids"]], dtype=object
        )
        store = prepare_data(
            data, "user_id", "item_id", metadata_id_col=["category_ids"]
        )
        assert store.metadata.width == 2

    def test_noncontiguous_raw_ids(self):
        data = make_interactions()
        data["user_id"] = data["user_id"] * 1000 + 5  # sparse raw ids
        store = prepare_data(data, "user_id", "item_id")
        assert store.train_users.max() < store.schema.num_users
        # decoding returns the raw ids
        raw = store.user_encoder.decode([0])
        assert raw[0] % 1000 == 5


class TestNegativeSampling:
    def test_jax_no_collisions(self):
        import jax
        import jax.numpy as jnp

        pos = jnp.arange(100, dtype=jnp.int32) % 10
        neg = sample_negatives(jax.random.PRNGKey(0), pos, 10, avoid_collisions=True)
        assert (np.asarray(neg) != np.asarray(pos)).all()
        assert (np.asarray(neg) >= 0).all() and (np.asarray(neg) < 10).all()

    def test_jax_uniform_over_catalog_minus_pos(self):
        import jax
        import jax.numpy as jnp

        # collision-free draws must still cover every non-positive id
        pos = jnp.zeros(20000, dtype=jnp.int32)
        neg = np.asarray(
            sample_negatives(jax.random.PRNGKey(1), pos, 5, avoid_collisions=True)
        )
        counts = np.bincount(neg, minlength=5)
        assert counts[0] == 0
        assert (counts[1:] > 3000).all()  # ~5000 each

    def test_np_matches_contract(self, rng):
        pos = np.arange(1000, dtype=np.int32) % 7
        neg = sample_negatives_np(rng, pos, 7, avoid_collisions=True)
        assert (neg != pos).all()


def test_user_history_vectorized_matches_naive():
    """Vectorized user_history == the obvious per-user Python build."""
    r = np.random.default_rng(3)
    data = {
        "user_id": r.integers(0, 20, 300),
        "item_id": r.integers(0, 50, 300),
    }
    store = prepare_data(data, "user_id", "item_id", split_ratio=0.9)
    for length in (1, 3, 8):
        ids, mask = store.user_history(length)
        naive = [[] for _ in range(store.schema.num_users)]
        for u, i in zip(store.train_users, store.train_items):
            naive[u].append(i)
        for u, h in enumerate(naive):
            h = h[-length:]
            np.testing.assert_array_equal(ids[u, : len(h)], h)
            assert int(mask[u].sum()) == len(h)
            assert not mask[u, len(h) :].any()


def test_public_batch_iterator():
    """InteractionStore.batches — the public FastDataLoader surface
    (reference dataset.py:319-458): covers every row exactly once, short
    final batch unless drop_remainder."""
    from tests.conftest import make_interactions

    store = prepare_data(make_interactions(n=100), "user_id", "item_id")
    batches = list(store.batches(32, seed=1))
    assert [b["user_id"].shape[0] for b in batches] == [32, 32, 16]
    assert set(batches[0]) == {"user_id", "pos_item_id", "neg_item_id"}
    got = np.sort(np.concatenate([b["user_id"] for b in batches]))
    np.testing.assert_array_equal(got, np.sort(store.train_users))
    dropped = list(store.batches(32, drop_remainder=True))
    assert [b["user_id"].shape[0] for b in dropped] == [32, 32]
    unshuffled = list(store.batches(32, shuffle=False, split="test"))
    np.testing.assert_array_equal(
        np.concatenate([b["user_id"] for b in unshuffled]), store.test_users
    )


def test_extend_store_history_merge_matches_naive():
    """The vectorized checkpointed-history merge in extend_store equals the
    obvious per-user Python merge (VERDICT r4 weak #5)."""
    from torchrecsys_tpu.data.interactions import extend_store

    r = np.random.default_rng(11)
    base = {
        "user_id": r.integers(0, 12, 150),
        "item_id": r.integers(0, 30, 150),
    }
    for length in (1, 4, 16):
        store = prepare_data(base, "user_id", "item_id", split_ratio=0.9)
        o_ids, o_mask = store.user_history(length)
        store.history_override = (o_ids.copy(), o_mask.copy())
        new = {
            "user_id": r.integers(0, 15, 60),  # some users are brand new
            "item_id": r.integers(0, 35, 60),
        }
        ext = extend_store(store, dict(new), "user_id", "item_id",
                           split_ratio=0.8, seed=7)
        h_ids, h_mask = ext.history_override
        # naive: old valid items + this user's new TRAIN items, keep last L
        n_old = store.num_train
        tr_u = ext.train_users[n_old:]
        tr_i = ext.train_items[n_old:]
        for u in range(ext.schema.num_users):
            old = (o_ids[u][o_mask[u]].tolist()
                   if u < o_ids.shape[0] else [])
            combined = (old + tr_i[tr_u == u].tolist())[-length:]
            np.testing.assert_array_equal(
                h_ids[u, : len(combined)], combined, err_msg=f"user {u}"
            )
            assert int(h_mask[u].sum()) == len(combined)
            assert not h_mask[u, len(combined):].any()
