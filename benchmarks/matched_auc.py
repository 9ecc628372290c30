"""Matched-AUC comparison: the import-patched reference vs this framework on
the SAME structured dataset (the benchmarks/scale_10m.py generator — also
inlined in bench.py — at CPU-feasible scale).

The round-1 headline (207x examples/s) was a throughput claim only; this
script anchors it on quality: both frameworks train an MLP [1024,128]+BN
n_factors=80 with hinge loss and static uniform negatives on identical
interactions, and both report converged pairwise AUC = mean(pos > neg)
(reference Metrics.auc_score, torchrecsys/evaluate/metrics.py:23-31; here
eval/metrics.pairwise_auc — same definition).

The reference at HEAD does not import (SURVEY §2.9 #1); this script copies it
to a temp dir and applies ONLY the missing `from typing import List` line to
collaborative/mlp.py before importing. The reference MLP trains only with
SGD (sparse embedding grads + dense tower grads, SURVEY §2.9 #2).

Run: python benchmarks/matched_auc.py [--epochs 15]
Prints one JSON line: {"reference_auc": ..., "framework_auc": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_USERS, N_ITEMS, N_ROWS = 3_000, 1_000, 100_000


def structured_interactions(n_users, n_items, n, seed=0):
    """Same generator as benchmarks/scale_10m.py (block-preference signal)."""
    r = np.random.default_rng(seed)
    blocks = 8
    users = r.integers(0, n_users, n).astype(np.int64)
    on_block = r.random(n) < 0.7
    u_block = users % blocks
    rand_items = r.integers(0, n_items, n)
    block_items = (rand_items // blocks) * blocks + u_block
    items = np.where(on_block, block_items % n_items, rand_items)
    return users, items.astype(np.int64)


def patched_reference_dir() -> str:
    """Copy /root/reference to a temp dir with the one-line import fix.

    The copy is re-made whenever the source tree looks newer (max mtime of
    its .py files) than the cached copy, so a changed /root/reference can
    never be silently benchmarked from a stale snapshot."""
    src_root = "/root/reference/torchrecsys"
    src_mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, files in os.walk(src_root)
        for f in files
        if f.endswith(".py")
    )
    dst = os.path.join(tempfile.gettempdir(), "torchrecsys_ref_patched")
    stamp = os.path.join(dst, ".src_mtime")
    cached = None
    if os.path.isfile(stamp):
        with open(stamp) as f:
            cached = f.read().strip()
    if cached != repr(src_mtime):
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(dst, exist_ok=True)
        shutil.copytree(
            src_root, os.path.join(dst, "torchrecsys"), dirs_exist_ok=True
        )
        mlp = os.path.join(dst, "torchrecsys", "collaborative", "mlp.py")
        with open(mlp) as f:
            src = f.read()
        if "from typing import" not in src:
            with open(mlp, "w") as f:
                f.write("from typing import List\n" + src)
        with open(stamp, "w") as f:
            f.write(repr(src_mtime))
    return dst


def run_reference(users, items, epochs: int, batch: int, lr: float,
                  net: str = "mlp") -> dict:
    import pandas as pd
    import torch

    sys.path.insert(0, patched_reference_dir())
    from torchrecsys.model import TorchRecSys
    from torchrecsys.evaluate.metrics import Metrics
    from torchrecsys.dataset.dataset import FastDataLoader

    df = pd.DataFrame({"user_id": users, "item_id": items})
    torch.manual_seed(0)
    np.random.seed(0)
    model = TorchRecSys(
        dataset=df,
        user_id_col="user_id",
        item_id_col="item_id",
        n_factors=80,
        net_type=net,
        dynamic_neg_sampling=False,
    )
    if net == "mlp":
        # the only stock optimizer that accepts the MLP's mixed sparse+dense
        # grads (SURVEY §2.9 #2)
        opt = torch.optim.SGD(model.net.parameters(), lr=lr)
    else:
        # all-sparse models (linear/fm): SparseAdam is the reference's best
        opt = torch.optim.SparseAdam(model.net.parameters(), lr=lr)
    t0 = time.perf_counter()
    model.fit(optimizer=opt, epochs=epochs, batch_size=batch)
    fit_s = time.perf_counter() - t0

    # evaluate() only prints (model.py:335-336); recompute its exact per-batch
    # mean AUC (Metrics.auc_score, metrics.py:23-31) so we get a return value.
    model.net.eval()
    measures = Metrics()
    loader = FastDataLoader(
        data=model.data_processor.test_data,
        batch_size=batch,
        shuffle=False,
        dynamic_neg_sampling=False,
        n_items=model.n_items,
        item_to_metadata_map=model.data_processor.item_to_metadata_map,
        metadata_id_cols=model.metadata_name,
    )
    aucs = []
    with torch.no_grad():
        for b in loader:
            pos, neg = model.forward(net=model.net, batch=b)
            aucs.append(float(measures.auc_score(pos.float(), neg.float())))
    return {"auc": sum(aucs) / len(aucs), "fit_s": fit_s}


def run_framework(users, items, epochs: int, batch: int, lr: float,
                  net: str = "mlp") -> dict:
    import jax

    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    store = prepare_data(
        {"user_id": users, "item_id": items},
        "user_id",
        "item_id",
        dynamic_neg_sampling=False,
    )
    model = build_model(
        store.schema,
        ModelConfig(
            net_type=net,
            n_factors=80,
            hidden_layers=(1024, 128),
            use_batch_norm=True,
            compute_dtype="bfloat16",
        ),
    )
    cfg = TrainConfig(batch_size=batch, learning_rate=lr, loss="hinge")
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=epochs, verbose=False)
    jax.block_until_ready(state["tables"])
    fit_s = time.perf_counter() - t0
    out = trainer.evaluate(state, store, verbose=False)
    return {"auc": out["auc"], "fit_s": fit_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ref_lr", type=float, default=0.05)
    ap.add_argument("--fw_lr", type=float, default=0.05)
    ap.add_argument(
        "--net",
        choices=["mlp", "linear", "fm", "neucf", "lstm", "sasrec"],
        default="mlp",
    )
    ap.add_argument("--skip", choices=["reference", "framework"], default=None)
    args = ap.parse_args()

    users, items = structured_interactions(N_USERS, N_ITEMS, N_ROWS)
    out = {"net": args.net, "epochs": args.epochs, "batch": args.batch}
    if args.skip != "framework":
        fw = run_framework(users, items, args.epochs, args.batch, args.fw_lr,
                           net=args.net)
        out["framework_auc"] = round(fw["auc"], 4)
        out["framework_fit_s"] = round(fw["fit_s"], 2)
    if args.skip != "reference":
        # net_type='neucf'/'lstm' CRASH in the reference (un-raised
        # NotImplementedError -> AttributeError, model.py:162-168, SURVEY
        # §2.9 #6) — record the crash rather than an AUC so the row is
        # honest about what the reference can do.
        try:
            ref = run_reference(users, items, args.epochs, args.batch,
                                args.ref_lr, net=args.net)
            out["reference_auc"] = round(ref["auc"], 4)
            out["reference_fit_s"] = round(ref["fit_s"], 2)
        except Exception as e:  # noqa: BLE001 - reference defect surface
            if args.net not in ("neucf", "lstm", "sasrec"):
                raise
            out["reference_auc"] = None
            out["reference_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
