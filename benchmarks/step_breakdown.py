"""Scan-level breakdown of the north-star MLP step (companion to
ablate_step.py; see benchmarks/PROFILE.md for conclusions).

Times ``lax.scan`` programs of K REAL ``Trainer._step_impl`` steps with one
piece disabled at a time, so all numbers share the epoch's compilation/fusion
context (per-call dispatch over the axon tunnel costs ~50 us, so op-at-a-time
microbenchmarks only measure the dispatch floor). Also times the epoch's
shuffle program alone, giving:

    epoch ~= shuffle + n_steps * step

Run: python benchmarks/step_breakdown.py [--steps 200]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from torchrecsys_tpu.config import DataSchema, ModelConfig, TrainConfig
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train import Trainer
from torchrecsys_tpu.train.optim import augment_tables
from torchrecsys_tpu.utils.permute import random_permutation


def _sync(out):
    """Force a REAL device->host round trip. On the axon-tunneled TPU,
    jax.block_until_ready returns before execution finishes (executions
    queue up behind it); pulling a scalar to the host is the only true
    barrier."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)  # drain compile + warmup queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)  # executions are strictly ordered; syncing the last drains all
    return (time.perf_counter() - t0) / iters


class AblatedTrainer(Trainer):
    """Real trainer with step pieces switchable off (benchmark-only)."""

    ablate: str = ""

    def _step_impl(self, state, batch, feat, fused):
        if self.ablate == "fwd_only":
            # forward + loss only — no grads, no updates. Keep the loss as
            # the scan output so XLA cannot DCE the forward.
            model, cfg = self.model, self.cfg
            batch = {k: v for k, v in batch.items() if k != "_w"}
            user, pos = batch["user_id"], batch["pos_item_id"]
            b = pos.shape[0]
            if "neg_item_id" in batch:
                neg = batch["neg_item_id"]
            else:
                from torchrecsys_tpu.data.sampling import sample_negatives

                k_neg = jax.random.fold_in(state["rng"], state["step"])
                neg = sample_negatives(
                    k_neg, pos, model.schema.num_items, cfg.avoid_collisions
                )
            side = self._paired_side(user, pos, neg, feat)
            gmap = model.gathers(side)
            rows = {
                k: jnp.take(state["tables"][t], ids, axis=0)[..., :-1]
                for k, (t, ids) in gmap.items()
            }
            scores, _ = model.score_rows(
                state["dense"], state["model_state"], rows, side, train=True
            )
            loss = self.loss_fn(scores[:b], scores[b:], cfg.margin)
            return dict(state, step=state["step"] + 1), loss
        if self.ablate == "no_scatter":
            # full fwd+bwd+optimizer math, but embedding deltas are reduced
            # to a scalar folded into the loss instead of scattered into the
            # tables (keeps the backward alive, removes only the scatters).
            new_state, loss = super()._step_impl(state, batch, feat, fused)
            keep = sum(
                jnp.sum(t[:1, :1]) for t in new_state["tables"].values()
            )
            out = dict(new_state, tables=state["tables"])
            return out, loss + 0.0 * keep
        return super()._step_impl(state, batch, feat, fused)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=100_000)
    args = ap.parse_args()
    K, B = args.steps, args.batch

    schema = DataSchema(num_users=args.users, num_items=args.items)
    key = jax.random.PRNGKey(0)
    batches = {
        "user_id": jax.random.randint(key, (K, B), 0, args.users, jnp.int32),
        "pos_item_id": jax.random.randint(key, (K, B), 0, args.items, jnp.int32),
    }

    def scan_time(tag, ablate="", bn=True, dtype="bfloat16", w=False):
        model = build_model(
            schema,
            ModelConfig(net_type="mlp", n_factors=80, hidden_layers=(1024, 128),
                        use_batch_norm=bn, compute_dtype=dtype),
        )
        cfg = TrainConfig(batch_size=B, learning_rate=0.05,
                          dynamic_neg_sampling=True, loss="hinge")
        tr = AblatedTrainer(model, cfg)
        tr.ablate = ablate
        state = tr.init_state(jax.random.PRNGKey(0))
        state = dict(
            state,
            tables=augment_tables(state["tables"], state["emb_opt"]),
            emb_opt={name: {} for name in state["emb_opt"]},
        )
        bt = dict(batches)
        if w:
            bt["_w"] = jnp.ones((K, B), jnp.float32)

        @jax.jit
        def prog(state, bt):
            def body(st, b):
                return tr._step_impl(st, b, None, fused=True)

            return jax.lax.scan(body, state, bt)

        dt = timeit(prog, state, bt) / K
        print(f"{tag:46s}: {dt*1e6:9.1f} us/step  ({B/dt/1e6:6.1f} M ex/s)")
        return dt

    print(f"== scan of {K} REAL steps (B={B}) ==")
    full = scan_time("full step (bn, bf16, dyn-neg)")
    scan_time("  + per-row weights (_w path)", w=True)
    scan_time("  - scatter updates", ablate="no_scatter")
    scan_time("  - backward (fwd+loss only)", ablate="fwd_only")
    scan_time("  - batch-norm", bn=False)
    scan_time("  - bf16 (f32 compute)", dtype="float32")

    # epoch fixed costs: shuffle program alone at 10M rows
    n = 10_000_000
    packed = jax.random.randint(key, (n, 2), 0, args.users, jnp.int32)

    @jax.jit
    def shuffle(packed, k):
        perm = random_permutation(k, n)
        return jnp.take(packed, perm, axis=0)

    t_sh = timeit(shuffle, packed, key, iters=5)
    nsteps = n // B
    print(f"\nepoch shuffle (Feistel perm + 2D gather, 10M rows): {t_sh*1e3:.1f} ms"
          f"  = {t_sh/nsteps*1e6:.1f} us/step amortized")
    print(f"predicted epoch: {(t_sh + nsteps*full):.3f} s"
          f"  ({n/(t_sh + nsteps*full)/1e6:.2f} M ex/s)")


if __name__ == "__main__":
    main()
