"""Driver benchmark: one JSON line per metric (VERDICT r2 task #2).

Metrics, in print order:

1. ``mlp_10m_train_examples_per_sec`` — the BASELINE.md north star: MLP
   [1024,128]+BN two-tower training throughput on 10M interactions, one
   chip, vs the reference's ~38K examples/s
   (torchrecsys/model.py:274-285 + mlp.py:88-114, measured on the 2-vCPU
   host; throughput is model-compute-bound, so the 100K-row and 10M-row
   workloads run at the same examples/s).
2. ``linear_10m_pallas_step_speedup_vs_xla`` — the fused Pallas pairwise
   train kernel (ops/fused_pairwise.py) vs the XLA step it replaces, same
   10M workload with a Linear model. ``vs_baseline`` is the speedup.
3. ``linear_10m_pallas_train_examples_per_sec`` — absolute Linear
   throughput with the kernel, vs the reference Linear's ~274K ex/s.
4. ``mlp_10m_step_us`` / ``mlp_10m_mfu_pct`` — headroom metrics derived
   from #1 (VERDICT r3 weak #7): microseconds per 8192-pair step, and
   model-FLOP utilization against the v5e's ~197 bf16 TFLOP/s peak
   (FLOPs counted analytically: 3x the forward tower matmuls over 2B
   rows/step — see _mlp_model_flops_per_example). ``vs_baseline`` is the
   ratio to round 3 (866.6 us/step, 17.0% MFU) so a step-time regression
   is attributable, not a diffuse ex/s change.
5. ``predict_qps_linear_1k`` — batched full-catalog top-k queries/s at the
   reference's 1K-item scale, vs its ~770 q/s (model.py:341-452 loop,
   BASELINE.md).
6. ``predict_qps_linear_1m`` — the same at a 1M-item catalog via the fused
   Pallas score+top-k kernel (ops/dot_topk.py); no reference counterpart
   survives at this scale (its per-chunk pandas predict would take minutes
   per query), so ``vs_baseline`` extrapolates against 770 q/s.
7. ``predict_qps_linear_1m_sharded`` / ``predict_qps_linear_1m_amp`` — the same through the model-axis-
   sharded catalog scorer (eval/predict.py:_sharded_catalog_topk) on a
   trivial (1,1) mesh: proves the sharded serving path costs ~nothing on
   one chip (``vs_baseline`` = ratio to the unsharded #6 run).
8. ``predict_qps_lstm_100k`` / ``predict_qps_sasrec_100k`` — sequence-model
   full-catalog predict at a 100K catalog via the encode-once linearized
   path (VERDICT r3 weak #2: the generic path was O(U*N*L));
   ``vs_baseline`` extrapolates against 770 q/s.
9. ``neucf_10m_train_examples_per_sec`` / ``fm_10m_...`` / ``lstm_10m_...``
   / ``sasrec_10m_...`` — train throughput for every remaining net in the
   zoo on the same 10M workload (VERDICT r4 missing #3). NeuCF/LSTM/SASRec
   compare against the reference MLP's ~38K ex/s (their reference
   counterparts crash or don't exist, SURVEY §2.9 #6); FM against its own
   ~216K ex/s.
10. ``linear_10m_amp_pallas_train_examples_per_sec`` — the fused kernel's
   bf16 AMP variant (use_amp no longer forfeits the kernel).
11. ``linear_meta_10m_pallas_step_speedup_vs_xla`` / ``..._examples_per_sec``
   — the metadata-bearing fused kernel (composite-row design) vs the XLA
   step, with a scalar item category feature on the 10M workload.

Workload for 1-4/9 (BASELINE.json north star): 100K users x 100K items, 10M
interactions with learnable block structure, dynamic uniform negatives,
hinge loss, batch 8192. MLP adds [1024,128]+BN and bfloat16 compute.
Steady-state epochs after one warmup (compile) epoch.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: cold XLA compiles over the TPU tunnel can take
# minutes; cache them across bench invocations.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_MLP_EXAMPLES_PER_SEC = 38_000.0
BASELINE_LINEAR_EXAMPLES_PER_SEC = 274_000.0
BASELINE_FM_EXAMPLES_PER_SEC = 216_000.0
BASELINE_PREDICT_QPS_1K = 770.0
# round-3 headroom reference points (BENCH_r03: 9.45M ex/s at batch 8192)
R3_STEP_US = 866.6
R3_MFU_PCT = 17.0
V5E_BF16_FLOPS = 197e12

N_USERS, N_ITEMS, N_INTERACTIONS = 100_000, 100_000, 10_000_000
BATCH = int(os.environ.get("BENCH_BATCH", 8192))
TIMED_EPOCHS = 3


def _mlp_model_flops_per_example(n_factors=80, hidden=(1024, 128)) -> float:
    """Analytic model FLOPs per training example: the tower matmuls over the
    2 rows (pos|neg) each example contributes, x3 for fwd + input-grad +
    weight-grad. Embedding gathers/scatters and BN are excluded — this is
    the numerator MFU conventionally counts."""
    widths = [2 * n_factors, *hidden, 1]
    fwd_per_row = 2.0 * sum(a * b for a, b in zip(widths[:-1], widths[1:]))
    return 3.0 * 2.0 * fwd_per_row


def structured_interactions(n_users: int, n_items: int, n: int, seed: int = 0):
    """Block-preference data: user block b prefers item block b (8 blocks,
    70% on-block) — learnable signal so the measured epochs train a real
    task (AUC ~0.8 at convergence, benchmarks/scale_10m.py)."""
    r = np.random.default_rng(seed)
    blocks = 8
    users = r.integers(0, n_users, n).astype(np.int64)
    on_block = r.random(n) < 0.7
    u_block = users % blocks
    rand_items = r.integers(0, n_items, n)
    block_items = (rand_items // blocks) * blocks + u_block
    items = np.where(on_block, block_items % n_items, rand_items)
    return {"user_id": users, "item_id": items.astype(np.int64)}


def emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 2),
            }
        ),
        flush=True,
    )


def train_throughput(trainer, store, state) -> float:
    """Steady-state examples/s over TIMED_EPOCHS after a compile epoch.
    Counts each epoch as exactly ``num_train`` examples — the mask-padded
    remainder batch's filler rows are duplicates, not new examples."""
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)
    jax.block_until_ready(state["tables"])
    examples = TIMED_EPOCHS * store.num_train
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=TIMED_EPOCHS, verbose=False)
    jax.block_until_ready(state["tables"])
    return examples / (time.perf_counter() - t0)


def bench_mlp_north_star(store) -> None:
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    model = build_model(
        store.schema,
        ModelConfig(
            net_type="mlp",
            n_factors=80,
            hidden_layers=(1024, 128),
            use_batch_norm=True,
            compute_dtype="bfloat16",
        ),
    )
    cfg = TrainConfig(
        batch_size=BATCH,
        learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss="hinge",
    )
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    eps = train_throughput(trainer, store, state)
    emit(
        "mlp_10m_train_examples_per_sec",
        eps,
        "examples/s",
        eps / BASELINE_MLP_EXAMPLES_PER_SEC,
    )
    step_us = BATCH / eps * 1e6
    mfu_pct = eps * _mlp_model_flops_per_example() / V5E_BF16_FLOPS * 100.0
    emit("mlp_10m_step_us", step_us, "us/step (batch 8192)", R3_STEP_US / step_us)
    emit("mlp_10m_mfu_pct", mfu_pct, "% of v5e bf16 peak", mfu_pct / R3_MFU_PCT)


def bench_linear_pallas_vs_xla(store) -> None:
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    model = build_model(store.schema, ModelConfig(net_type="linear", n_factors=80))
    cfg = TrainConfig(
        batch_size=BATCH,
        learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss="hinge",
    )
    t_pl = Trainer(model, cfg)
    eps_pl = train_throughput(t_pl, store, t_pl.init_state(jax.random.PRNGKey(0)))
    t_x = Trainer(model, dataclasses.replace(cfg, pallas_step=False))
    eps_x = train_throughput(t_x, store, t_x.init_state(jax.random.PRNGKey(0)))
    emit(
        "linear_10m_pallas_step_speedup_vs_xla",
        eps_pl / eps_x,
        "x (pallas examples/s over xla examples/s)",
        eps_pl / eps_x,
    )
    emit(
        "linear_10m_pallas_train_examples_per_sec",
        eps_pl,
        "examples/s",
        eps_pl / BASELINE_LINEAR_EXAMPLES_PER_SEC,
    )


def bench_predict_qps(n_users: int, n_items: int, batch_users: int, name: str,
                      vs_baseline_scale: float, net_type: str = "linear",
                      mesh=None, emit_result: bool = True,
                      compute_dtype: str = "float32",
                      approx_recall=None, exclude_seen: bool = False) -> float:
    from torchrecsys_tpu.config import DataSchema, ModelConfig
    from torchrecsys_tpu.eval.predict import catalog_topk
    from torchrecsys_tpu.models import build_model

    schema = DataSchema(num_users=n_users, num_items=n_items)
    model = build_model(
        schema,
        ModelConfig(net_type=net_type, n_factors=80, compute_dtype=compute_dtype),
    )
    params, state = model.init(jax.random.PRNGKey(0))
    user_ids = jnp.arange(batch_users, dtype=jnp.int32) % n_users
    seen_mask = None
    if exclude_seen:
        # realistic per-user seen sets (20-500 items, one 5000-item heavy
        # user) packed into the device-side bitmask (VERDICT r4 #5)
        from torchrecsys_tpu.ops.dot_topk import pack_seen_mask

        rs = np.random.default_rng(0)
        seen = [
            np.unique(rs.integers(0, n_items, int(x)))
            for x in rs.integers(20, 500, batch_users)
        ]
        seen[0] = np.unique(rs.integers(0, n_items, 5000))
        seen_mask = jnp.asarray(pack_seen_mask(seen, n_items))
    feat = None
    if getattr(model, "needs_history", False):
        r = np.random.default_rng(0)
        hl = model.cfg.history_len
        feat = {
            "hist_ids": jnp.asarray(
                r.integers(0, n_items, (n_users, hl)), jnp.int32
            ),
            "hist_mask": jnp.ones((n_users, hl), bool),
        }

    def run():
        return catalog_topk(
            model, params, state, user_ids, n_items, feat, top_k=10,
            mesh=mesh, approx_recall=approx_recall, seen_mask=seen_mask,
        )

    scores, _ = run()
    _ = np.asarray(scores)  # drain compile + warmup
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        scores, _ = run()
    _ = np.asarray(scores)  # single honest D2H sync
    qps = batch_users / ((time.perf_counter() - t0) / reps)
    if emit_result:
        emit(name, qps, "users/s (full-catalog top-10)", qps / vs_baseline_scale)
    return qps


def bench_train_line(store, net: str, name: str, baseline: float,
                     compute_dtype: str = "float32", epochs: int = 1,
                     model_kw=None, pallas_step="auto", loss: str = "hinge",
                     num_negatives: int = 1,
                     neg_sampling: str = "uniform",
                     batch: int = None) -> float:
    """One warmup + ``epochs`` timed epochs of ``net`` on the 10M workload."""
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    model = build_model(
        store.schema,
        ModelConfig(
            net_type=net, n_factors=80, compute_dtype=compute_dtype,
            **(model_kw or {}),
        ),
    )
    cfg = TrainConfig(
        batch_size=batch or BATCH, learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss=loss, num_negatives=num_negatives, neg_sampling=neg_sampling,
        pallas_step=pallas_step,
    )
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)
    jax.block_until_ready(state["tables"])
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=epochs, verbose=False)
    jax.block_until_ready(state["tables"])
    eps = epochs * store.num_train / (time.perf_counter() - t0)
    emit(name, eps, "examples/s", eps / baseline)
    return eps


def bench_meta_pallas_vs_xla(store_meta) -> None:
    """The metadata-bearing fused kernel (VERDICT r4 #1) vs the XLA step,
    on the 10M workload with a scalar item category feature — metadata is
    the reference's signature capability (linear.py:74-75)."""
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    model = build_model(
        store_meta.schema, ModelConfig(net_type="linear", n_factors=80)
    )
    cfg = TrainConfig(
        batch_size=BATCH, learning_rate=0.05, dynamic_neg_sampling=True,
        loss="hinge",
    )
    t_pl = Trainer(model, cfg)
    eps_pl = train_throughput(
        t_pl, store_meta, t_pl.init_state(jax.random.PRNGKey(0))
    )
    t_x = Trainer(model, dataclasses.replace(cfg, pallas_step=False))
    eps_x = train_throughput(
        t_x, store_meta, t_x.init_state(jax.random.PRNGKey(0))
    )
    emit(
        "linear_meta_10m_pallas_step_speedup_vs_xla",
        eps_pl / eps_x,
        "x (pallas examples/s over xla examples/s, metadata-bearing)",
        eps_pl / eps_x,
    )
    emit(
        "linear_meta_10m_pallas_train_examples_per_sec",
        eps_pl,
        "examples/s",
        eps_pl / BASELINE_LINEAR_EXAMPLES_PER_SEC,
    )


def main() -> None:
    from torchrecsys_tpu.data import prepare_data

    data = structured_interactions(N_USERS, N_ITEMS, N_INTERACTIONS)
    store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=True)

    bench_mlp_north_star(store)
    bench_linear_pallas_vs_xla(store)
    # train-throughput coverage for every remaining trainable net on the
    # SAME 10M workload (VERDICT r4 missing #3): NeuCF/LSTM/SASRec compare
    # against the reference MLP's 38K ex/s (their reference counterparts
    # crash or don't exist — SURVEY §2.9 #6), FM against its own 216K ex/s.
    bench_train_line(store, "neucf", "neucf_10m_train_examples_per_sec",
                     BASELINE_MLP_EXAMPLES_PER_SEC, compute_dtype="bfloat16")
    bench_train_line(store, "fm", "fm_10m_train_examples_per_sec",
                     BASELINE_FM_EXAMPLES_PER_SEC)
    bench_train_line(store, "lstm", "lstm_10m_train_examples_per_sec",
                     BASELINE_MLP_EXAMPLES_PER_SEC, compute_dtype="bfloat16")
    bench_train_line(store, "sasrec", "sasrec_10m_train_examples_per_sec",
                     BASELINE_MLP_EXAMPLES_PER_SEC, compute_dtype="bfloat16")
    # round-5 training stack in one line: 8-negative WARP (LightFM's loss,
    # batched rank estimate) with popularity-weighted in-step sampling —
    # the XLA step scores 9 candidate blocks per row, so examples/s is
    # expected well below the 1-negative kernel line but must stay >> ref
    bench_train_line(store, "linear",
                     "linear_10m_warp8_popularity_train_examples_per_sec",
                     BASELINE_LINEAR_EXAMPLES_PER_SEC, loss="warp",
                     num_negatives=8, neg_sampling="popularity")
    # in-batch sampled softmax (two-tower retrieval objective): each
    # example scores B candidates via one BxB MXU matmul. The fused
    # flash-style CE kernel (ops/softmax_ce.py) keeps the B^2 logits in
    # VMEM — 2.0x the XLA formulation at the B=4096 optimum (4095
    # logQ-corrected negatives per example), 3.2x at B=8192
    bench_train_line(store, "linear",
                     "linear_10m_sampled_softmax_train_examples_per_sec",
                     BASELINE_LINEAR_EXAMPLES_PER_SEC,
                     loss="sampled_softmax", batch=4096)
    # the AMP kernel variant (VERDICT r4 missing #2): use_amp configs now
    # run the fused step instead of silently forfeiting the 2.4x
    bench_train_line(store, "linear",
                     "linear_10m_amp_pallas_train_examples_per_sec",
                     BASELINE_LINEAR_EXAMPLES_PER_SEC,
                     compute_dtype="bfloat16", epochs=TIMED_EPOCHS)
    # metadata-bearing kernel (VERDICT r4 missing #1): scalar item category
    data_meta = dict(data)
    data_meta["cat"] = (data["item_id"] % 97).astype(np.int32)
    store_meta = prepare_data(
        data_meta, "user_id", "item_id", metadata_id_col=["cat"],
        dynamic_neg_sampling=True,
    )
    bench_meta_pallas_vs_xla(store_meta)
    del store_meta
    bench_predict_qps(3_000, 1_000, 4096, "predict_qps_linear_1k",
                      BASELINE_PREDICT_QPS_1K)
    qps_1m = bench_predict_qps(100_000, 1_000_000, 256, "predict_qps_linear_1m",
                               BASELINE_PREDICT_QPS_1K)
    from torchrecsys_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    bench_predict_qps(100_000, 1_000_000, 256, "predict_qps_linear_1m_sharded",
                      qps_1m, mesh=mesh)
    # amp models stream the item matrix in bf16 (half the HBM bytes, f32
    # score accumulation) — vs_baseline = ratio to the f32 run above
    bench_predict_qps(100_000, 1_000_000, 256, "predict_qps_linear_1m_amp",
                      qps_1m, compute_dtype="bfloat16")
    # hardware approximate top-k (lax.approx_max_k, recall_target 0.95 —
    # measured recall 0.98 at this shape); vs_baseline = speedup over exact
    bench_predict_qps(100_000, 1_000_000, 256, "predict_qps_linear_1m_approx",
                      qps_1m, approx_recall=0.95)
    # device-side exclude_seen (packed bitmask in the kernel, VERDICT r4
    # #5); vs_baseline = ratio to the plain 1M run — the target is ~1.0
    bench_predict_qps(100_000, 1_000_000, 256,
                      "predict_qps_linear_1m_exclude_seen", qps_1m,
                      exclude_seen=True)
    # 1024-user batches: at a 100K catalog a 256-user call runs ~2-3 ms,
    # where per-call dispatch over the TPU tunnel dominates run-to-run
    # variance; 4x the batch amortizes it (QPS is per-user either way)
    bench_predict_qps(100_000, 100_000, 1024, "predict_qps_lstm_100k",
                      BASELINE_PREDICT_QPS_1K, net_type="lstm")
    bench_predict_qps(100_000, 100_000, 1024, "predict_qps_sasrec_100k",
                      BASELINE_PREDICT_QPS_1K, net_type="sasrec")


if __name__ == "__main__":
    main()
