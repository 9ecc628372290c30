"""K-negative training, WARP/adaptive-hinge losses, popularity-weighted
sampling, and NDCG — all beyond-reference capabilities (the reference trains
only 1-uniform-negative hinge, torchrecsys/helper/loss.py:5-8,
dataset.py:56-64/435-454)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_interactions
from tests.test_train import make_learnable_interactions
from torchrecsys_tpu import RecSys
from torchrecsys_tpu.config import ModelConfig, TrainConfig
from torchrecsys_tpu.data import prepare_data
from torchrecsys_tpu.data.sampling import (
    alias_table,
    popularity_cdf,
    sample_negatives_alias,
    sample_negatives_weighted,
)
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train import Trainer, get_loss, get_per_row_loss
from torchrecsys_tpu.train.losses import (
    adaptive_hinge_per_row,
    bpr_per_row,
    hinge_per_row,
    make_warp_per_row,
)


class TestLossShapes:
    """Every loss accepts neg (B,) or (K, B); K=1 agrees with the 1-D form,
    and mean(per_row) == loss."""

    def setup_method(self):
        r = np.random.default_rng(1)
        self.pos = jnp.asarray(r.normal(size=16), jnp.float32)
        self.negK = jnp.asarray(r.normal(size=(5, 16)), jnp.float32)

    @pytest.mark.parametrize("name", ["hinge", "bpr", "logistic", "adaptive_hinge"])
    def test_k1_matches_1d(self, name):
        f = get_per_row_loss(name)
        one = self.negK[0]
        np.testing.assert_allclose(
            np.asarray(f(self.pos, one, 1.0)),
            np.asarray(f(self.pos, one[None, :], 1.0)),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("name", ["hinge", "bpr", "logistic", "adaptive_hinge", "warp"])
    def test_mean_per_row_is_loss(self, name):
        pr = get_per_row_loss(name, num_items=100)
        lf = get_loss(name, num_items=100)
        np.testing.assert_allclose(
            float(jnp.mean(pr(self.pos, self.negK, 1.0))),
            float(lf(self.pos, self.negK, 1.0)),
            rtol=1e-6,
        )

    def test_hinge_k_is_mean_over_draws(self):
        # mean over K of the per-draw reference hinge (helper/loss.py:7)
        per_draw = jnp.stack(
            [hinge_per_row(self.pos, self.negK[k], 1.0) for k in range(5)]
        )
        np.testing.assert_allclose(
            np.asarray(hinge_per_row(self.pos, self.negK, 1.0)),
            np.asarray(jnp.mean(per_draw, axis=0)),
            rtol=1e-6,
        )

    def test_adaptive_hinge_uses_max_negative(self):
        expect = jnp.maximum(jnp.max(self.negK, axis=0) - self.pos + 1.0, 0.0)
        np.testing.assert_allclose(
            np.asarray(adaptive_hinge_per_row(self.pos, self.negK, 1.0)),
            np.asarray(expect),
            rtol=1e-6,
        )

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError, match="unknown loss"):
            get_per_row_loss("nope")
        with pytest.raises(ValueError, match="num_items"):
            get_per_row_loss("warp")


class TestWarp:
    def test_no_violators_zero_loss(self):
        f = make_warp_per_row(1000)
        pos = jnp.asarray([5.0, 5.0])
        neg = jnp.zeros((4, 2), jnp.float32)  # all margin-satisfied
        np.testing.assert_array_equal(np.asarray(f(pos, neg, 1.0)), [0.0, 0.0])

    def test_rank_weight_hand_computed(self):
        # N=101, K=4, margin 1. Row: pos=0; negs [2, -5, 0.5, -5]:
        # violators are draws 0 and 2 (neg + 1 > 0) -> rank = floor(100*2/4)
        # = 50, weight = log(51); first violator is draw 0 (score 2),
        # hinge = 2 - 0 + 1 = 3.
        f = make_warp_per_row(101)
        pos = jnp.asarray([0.0])
        neg = jnp.asarray([[2.0], [-5.0], [0.5], [-5.0]])
        np.testing.assert_allclose(
            float(f(pos, neg, 1.0)[0]), np.log(51.0) * 3.0, rtol=1e-6
        )

    def test_more_violators_heavier_weight(self):
        f = make_warp_per_row(1000)
        pos = jnp.asarray([0.0])
        few = jnp.asarray([[0.5], [-9.0], [-9.0], [-9.0]])
        many = jnp.asarray([[0.5], [0.5], [0.5], [0.5]])
        assert float(f(pos, many, 1.0)[0]) > float(f(pos, few, 1.0)[0])


class TestPopularitySampling:
    def test_cdf_shape_and_monotone(self):
        items = np.asarray([0, 0, 0, 1, 2, 2])
        cdf = popularity_cdf(items, 4, alpha=1.0)
        assert cdf.shape == (4,)
        assert np.all(np.diff(cdf) >= 0)
        np.testing.assert_allclose(cdf[-1], 1.0, atol=1e-6)
        # item 3 never seen -> zero mass
        np.testing.assert_allclose(cdf[3] - cdf[2], 0.0, atol=1e-7)

    def test_empirical_distribution_matches(self):
        items = np.repeat(np.arange(8), np.arange(1, 9))  # count(i) = i+1
        cdf = jnp.asarray(popularity_cdf(items, 8, alpha=1.0))
        pos = jnp.full((20000,), 7, jnp.int32)
        neg = np.asarray(
            sample_negatives_weighted(
                jax.random.PRNGKey(0), pos, cdf, avoid_collisions=False
            )
        )
        freq = np.bincount(neg, minlength=8) / len(neg)
        expect = np.arange(1, 9) / 36.0
        np.testing.assert_allclose(freq, expect, atol=0.02)

    def test_avoid_collisions(self):
        items = np.repeat(np.arange(4), 5)
        cdf = jnp.asarray(popularity_cdf(items, 4, alpha=0.75))
        pos = jnp.asarray(np.random.default_rng(0).integers(0, 4, 5000), jnp.int32)
        neg = np.asarray(
            sample_negatives_weighted(jax.random.PRNGKey(1), pos, cdf, True)
        )
        assert not np.any(neg == np.asarray(pos))
        assert np.all((neg >= 0) & (neg < 4))

    def test_alias_table_encodes_exact_distribution(self):
        """Per-item mass in the alias table equals the target distribution
        exactly: p(i) = (prob[i] + sum_{j: alias[j]=i} (1-prob[j])) / N."""
        items = np.repeat(np.arange(8), np.arange(1, 9))
        prob, alias, fb = alias_table(items, 8, alpha=1.0)
        n = 8
        mass = prob.astype(np.float64).copy()
        np.add.at(mass, alias, 1.0 - prob.astype(np.float64))
        np.testing.assert_allclose(mass / n, np.arange(1, 9) / 36.0, atol=1e-6)
        assert fb[0] == 7 and fb[1] == 6  # most popular two

    def test_alias_sampling_matches_cdf_distribution(self):
        """The O(1)-per-draw alias path (the train step's) is distribution-
        identical to the inverse-CDF reference implementation."""
        items = np.repeat(np.arange(8), np.arange(1, 9))
        prob, alias, fb = alias_table(items, 8, alpha=0.75)
        pos = jnp.full((20000,), 7, jnp.int32)
        neg = np.asarray(
            sample_negatives_alias(
                jax.random.PRNGKey(0), pos, jnp.asarray(prob),
                jnp.asarray(alias), jnp.asarray(fb), avoid_collisions=False,
            )
        )
        w = np.arange(1, 9.0) ** 0.75
        expect = w / w.sum()
        freq = np.bincount(neg, minlength=8) / len(neg)
        np.testing.assert_allclose(freq, expect, atol=0.02)

    def test_alias_avoid_collisions_and_zero_count(self):
        items = np.repeat(np.arange(3), 5)  # item 3 never interacted
        prob, alias, fb = alias_table(items, 4, alpha=0.75)
        pos = jnp.asarray(np.random.default_rng(0).integers(0, 3, 5000), jnp.int32)
        neg = np.asarray(
            sample_negatives_alias(
                jax.random.PRNGKey(1), pos, jnp.asarray(prob),
                jnp.asarray(alias), jnp.asarray(fb), True,
            )
        )
        assert not np.any(neg == np.asarray(pos))
        # zero-mass item never drawn — including the double-collision
        # residue, which escapes to the most popular item != pos
        assert not np.any(neg == 3)


class TestTrainerMultiNeg:
    def _trainer(self, net_type="linear", **cfg_kw):
        data = make_learnable_interactions()
        store = prepare_data(
            data, "user_id", "item_id", dynamic_neg_sampling=True
        )
        model = build_model(
            store.schema,
            ModelConfig(net_type=net_type, n_factors=16, hidden_layers=(32,)),
        )
        cfg_kw.setdefault("learning_rate", 0.05)
        cfg = TrainConfig(
            batch_size=256, dynamic_neg_sampling=True, **cfg_kw,
        )
        return Trainer(model, cfg), store

    def test_paired_side_layout(self):
        trainer, _ = self._trainer(num_negatives=3, loss="adaptive_hinge")
        user = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([10, 11], jnp.int32)
        neg = jnp.asarray([[20, 21], [30, 31], [40, 41]], jnp.int32)  # (K, B)
        side = trainer._paired_side(user, pos, neg, None)
        np.testing.assert_array_equal(
            np.asarray(side["item_id"]), [10, 11, 20, 21, 30, 31, 40, 41]
        )
        np.testing.assert_array_equal(
            np.asarray(side["user_id"]), [1, 2, 1, 2, 1, 2, 1, 2]
        )
        assert side["_pair_b"] == 2

    @pytest.mark.parametrize(
        "net_type,loss",
        [("linear", "adaptive_hinge"), ("mlp", "warp"), ("lstm", "warp"),
         ("sasrec", "adaptive_hinge"), ("fm", "bpr"), ("neucf", "warp")],
    )
    def test_k_negative_training_learns(self, net_type, loss):
        trainer, store = self._trainer(
            net_type=net_type, num_negatives=4, loss=loss,
            learning_rate=0.05 if net_type != "sasrec" else 0.005,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = trainer.fit(state, store, epochs=6, verbose=False)
        assert np.isfinite(losses).all()
        metrics = trainer.evaluate(state, store, verbose=False)
        assert metrics["auc"] > 0.62, f"auc={metrics['auc']}"

    def test_warp_beats_or_matches_single_hinge_on_ranking(self):
        """WARP's rank weighting should at minimum keep pairwise AUC in
        family with plain hinge on the learnable blocks."""
        t_h, store = self._trainer(loss="hinge")
        s = t_h.init_state(jax.random.PRNGKey(0))
        s, _ = t_h.fit(s, store, epochs=6, verbose=False)
        auc_h = t_h.evaluate(s, store, verbose=False)["auc"]
        t_w, store_w = self._trainer(loss="warp", num_negatives=8)
        sw = t_w.init_state(jax.random.PRNGKey(0))
        sw, _ = t_w.fit(sw, store_w, epochs=6, verbose=False)
        auc_w = t_w.evaluate(sw, store_w, verbose=False)["auc"]
        assert auc_w > auc_h - 0.05, (auc_w, auc_h)

    def test_popularity_training_runs(self):
        trainer, store = self._trainer(
            neg_sampling="popularity", popularity_alpha=0.5
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = trainer.fit(state, store, epochs=3, verbose=False)
        assert np.isfinite(losses).all()
        m = trainer.evaluate(state, store, verbose=False)
        assert np.isfinite(m["loss"]) and np.isfinite(m["auc"])

    def test_static_negatives_ignored_under_k(self):
        """A store built with STATIC negatives still trains with K>1 —
        in-step sampling takes over, the stored column is dropped."""
        data = make_learnable_interactions()
        store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=False)
        assert store.train_neg_items is not None
        model = build_model(store.schema, ModelConfig(n_factors=16))
        trainer = Trainer(
            model,
            TrainConfig(batch_size=256, num_negatives=3, loss="adaptive_hinge"),
        )
        dev = trainer._device_train_data(store)
        assert "neg_item_id" not in dev
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = trainer.fit(state, store, epochs=2, verbose=False)
        assert np.isfinite(losses).all()

    def test_kernel_not_applicable_for_k(self):
        from torchrecsys_tpu.ops.fused_pairwise import pairwise_kernel_applicable

        t1, _ = self._trainer(num_negatives=1)
        tk, _ = self._trainer(num_negatives=4, loss="adaptive_hinge")
        tp, _ = self._trainer(neg_sampling="popularity")
        assert pairwise_kernel_applicable(t1.model, t1.cfg, None)
        assert not pairwise_kernel_applicable(tk.model, tk.cfg, None)
        # popularity with K=1 composes with the kernel (draw is outside it)
        assert pairwise_kernel_applicable(tp.model, tp.cfg, None)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="num_negatives"):
            self._trainer(num_negatives=0)
        with pytest.raises(ValueError, match="neg_sampling"):
            self._trainer(neg_sampling="unigram")


class TestMeshParity:
    def test_warp_k_popularity_epoch_matches_unsharded(self):
        """The (1+K)-block side, WARP loss, and in-step CDF draw reproduce
        single-device numbers on a (4,2) data×model mesh (same property the
        driver's dryrun checks at every split)."""
        from torchrecsys_tpu.parallel import make_mesh

        data = make_learnable_interactions()
        store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=True)
        cfg = TrainConfig(
            batch_size=256, learning_rate=0.05, dynamic_neg_sampling=True,
            loss="warp", num_negatives=3, neg_sampling="popularity", seed=7,
        )

        def run(mesh):
            model = build_model(store.schema, ModelConfig(n_factors=16))
            trainer = Trainer(model, cfg, mesh=mesh)
            state = trainer.init_state(jax.random.PRNGKey(0))
            state, losses = trainer.fit(state, store, epochs=2, verbose=False)
            return losses, np.asarray(state["tables"]["item"])

        ref_losses, ref_item = run(None)
        mesh = make_mesh(jax.devices()[:8], model=2)
        m_losses, m_item = run(mesh)
        np.testing.assert_allclose(m_losses, ref_losses, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(m_item, ref_item, rtol=2e-4, atol=1e-5)


class TestApiSurface:
    def test_fit_warp_and_ndcg(self):
        data = make_learnable_interactions()
        m = RecSys(data, "user_id", "item_id", n_factors=16,
                   dynamic_neg_sampling=True)
        m.fit(epochs=6, batch_size=256, learning_rate=0.05, loss="warp",
              num_negatives=8, verbose=False)
        out = m.evaluate(
            eval_metrics=("auc", "ndcg@10", "recall@10"), verbose=False
        )
        assert out["auc"] > 0.62
        assert 0.0 <= out["ndcg@10"] <= 1.0
        # binary-gain NDCG is lower-bounded by hit-quality: any hit yields
        # positive gain, so learnable data must produce a nonzero value
        assert out["ndcg@10"] > 0.0

    def test_bad_metric_still_rejected(self):
        data = make_interactions()
        m = RecSys(data, "user_id", "item_id", n_factors=8)
        m.fit(epochs=1, verbose=False)
        with pytest.raises(ValueError, match="unknown eval metric"):
            m.evaluate(eval_metrics=("ndgc@10",), verbose=False)

    def test_ease_ndcg(self):
        data = make_learnable_interactions()
        m = RecSys(data, "user_id", "item_id", net_type="ease")
        m.fit(verbose=False)
        out = m.evaluate(eval_metrics=("ndcg@10",), verbose=False)
        assert 0.0 < out["ndcg@10"] <= 1.0


class TestNdcgExact:
    def test_hand_computed(self):
        from torchrecsys_tpu.eval.predict import topk_ranking_metrics

        # one user, test items {7, 3}; top-4 = [5, 7, 1, 3]
        # hits at ranks 1 and 3 -> DCG = 1/log2(3) + 1/log2(5)
        # IDCG(2 rows) = 1/log2(2) + 1/log2(3)
        topk = np.asarray([[5, 7, 1, 3]])
        inv = np.asarray([0, 0])
        test_items = np.asarray([7, 3])
        out = topk_ranking_metrics(topk, inv, test_items, 1, (4,), 10)
        dcg = 1 / np.log2(3) + 1 / np.log2(5)
        idcg = 1.0 + 1 / np.log2(3)
        np.testing.assert_allclose(out["ndcg@4"], dcg / idcg, rtol=1e-9)
        np.testing.assert_allclose(out["recall@4"], 1.0)
        np.testing.assert_allclose(out["hit_rate@4"], 1.0)

    def test_perfect_ranking_is_one(self):
        from torchrecsys_tpu.eval.predict import topk_ranking_metrics

        topk = np.asarray([[7, 3, 1, 5]])
        inv = np.asarray([0, 0])
        out = topk_ranking_metrics(topk, inv, np.asarray([7, 3]), 1, (4,), 10)
        np.testing.assert_allclose(out["ndcg@4"], 1.0, rtol=1e-9)


class TestReviewRegressions:
    """Round-5 code-review findings (confirmed bugs), pinned."""

    def test_ndcg_duplicate_test_rows_capped(self):
        """Duplicate (user, item) test rows must not push NDCG past 1.0:
        DCG counts distinct hits, IDCG packs distinct items."""
        from torchrecsys_tpu.eval.predict import topk_ranking_metrics

        topk = np.asarray([[5, 1, 2]])
        inv = np.asarray([0, 0])
        test_items = np.asarray([5, 5])  # the same pair twice
        out = topk_ranking_metrics(topk, inv, test_items, 1, (3,), 10)
        np.testing.assert_allclose(out["ndcg@3"], 1.0, rtol=1e-9)
        # recall stays per-row (duplicates cancel): 2 hits / 2 rows
        np.testing.assert_allclose(out["recall@3"], 1.0)

    def test_warp_eval_loss_uses_train_k(self):
        """Eval loss draws the train config's K negatives — warp's graded
        rank estimate, not the degenerate 0-or-log(N) 1-draw weight (the
        pre-fix behavior forced num=1)."""
        data = make_learnable_interactions()
        store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=True)
        model = build_model(store.schema, ModelConfig(n_factors=16))
        t = Trainer(model, TrainConfig(
            batch_size=256, dynamic_neg_sampling=True, loss="warp",
            num_negatives=8, seed=3))
        state = t.init_state(jax.random.PRNGKey(0))
        drawn = []
        orig = t._sample_negs

        def spy(rng, step, pos, feat, num=None):
            out = orig(rng, step, pos, feat, num)
            drawn.append(out.shape)
            return out

        t._sample_negs = spy
        out = t.evaluate(state, store, verbose=False)
        assert np.isfinite(out["loss"]) and np.isfinite(out["auc"])
        # the eval body sampled the full (K, b) block, not a single draw
        assert drawn and all(len(s) == 2 and s[0] == 8 for s in drawn), drawn
