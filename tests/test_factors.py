"""Factor-vector export for external ANN serving (item_vectors /
user_vectors) — no reference analog (its only scorer is predict,
model.py:341-452)."""

import numpy as np
import pytest

from tests.conftest import make_interactions
from torchrecsys_tpu import RecSys


@pytest.mark.parametrize(
    "net,kw",
    [
        ("linear", {}),
        ("fm", {}),  # sigmoid transform is monotonic — ordering preserved
        ("lstm", {}),
        ("sasrec", {}),
    ],
)
def test_ann_ranking_matches_predict(net, kw):
    """Ranking by exported [vec, bias] vs query [u, 1] (the MIPS
    augmentation) must reproduce predict()'s top-k exactly."""
    data = make_interactions(metadata=(net in ("linear", "fm")))
    m = RecSys(
        data, "user_id", "item_id", net_type=net, n_factors=16,
        metadata_id_col=["category_ids"] if net in ("linear", "fm") else None,
        dynamic_neg_sampling=True, **kw,
    )
    m.fit(epochs=2, batch_size=256, verbose=False)
    iv, ib = m.item_vectors()
    assert iv.shape == (m.config["num_items"], 16)
    assert ib.shape == (m.config["num_items"],)
    users = [0, 3, 7]
    uv, uc = m.user_vectors(users)
    scores = uv @ iv.T + ib[None, :]  # MIPS: [u,1]·[q,b]
    ann_top = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    pred = m.predict(users, top_k=5, return_raw_ids=False)
    np.testing.assert_array_equal(ann_top, np.asarray(pred))


def test_all_users_export_and_unknown_id():
    data = make_interactions()
    m = RecSys(data, "user_id", "item_id", n_factors=8)
    m.fit(epochs=1, verbose=False)
    uv, uc = m.user_vectors()
    assert uv.shape == (m.config["num_users"], 8)
    assert uc.shape == (m.config["num_users"],)
    with pytest.raises(KeyError, match="unknown user_id"):
        m.user_vectors([999999])


def test_refusals():
    data = make_interactions()
    m = RecSys(data, "user_id", "item_id", net_type="mlp", n_factors=8,
               hidden_layers=(16,))
    m.fit(epochs=1, verbose=False)
    with pytest.raises(ValueError, match="does not factorize"):
        m.item_vectors()
    e = RecSys(data, "user_id", "item_id", net_type="ease")
    e.fit(verbose=False)
    with pytest.raises(ValueError, match="no factor vectors"):
        e.item_vectors()
    f = RecSys(data, "user_id", "item_id", n_factors=8)
    with pytest.raises(RuntimeError, match="requires a trained model"):
        f.item_vectors()
