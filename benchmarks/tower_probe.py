"""Isolated XLA cost of the MLP tower fwd+bwd at north-star shapes.

x (16384, 160) bf16 -> Linear(1024)+BN+ReLU -> Linear(128)+BN+ReLU ->
Linear(1) -> pairwise hinge -> grads wrt x and all dense params.

This bounds the headroom of a fused Pallas tower kernel: matmul roofline at
these shapes is ~147 us fwd+bwd on a v5e; activation traffic (z1 = 33 MB
bf16) adds ~40 us per unavoidable HBM pass. If XLA already lands near
~250 us there is little to win; at 400+ us a flash-style fused tower pays.

Run: python benchmarks/tower_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from torchrecsys_tpu.config import DataSchema, ModelConfig
from torchrecsys_tpu.models import build_model

K = 200
B = 8192
R = 2 * B


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    schema = DataSchema(num_users=100, num_items=100)
    model = build_model(
        schema,
        ModelConfig(net_type="mlp", n_factors=80, hidden_layers=(1024, 128),
                    use_batch_norm=True, compute_dtype="bfloat16"),
    )
    params, mstate = model.init(jax.random.PRNGKey(0))
    dense = params["dense"]
    key = jax.random.PRNGKey(1)
    rows = {
        "user": jax.random.normal(key, (R, 80), jnp.float32),
        "item": jax.random.normal(key, (R, 80), jnp.float32),
    }
    batch = {"user_id": jnp.zeros((R,), jnp.int32),
             "item_id": jnp.zeros((R,), jnp.int32)}

    def loss_fn(rows_, dense_):
        scores, st = model.score_rows(dense_, mstate, rows_, batch, train=True)
        l = jnp.mean(jnp.maximum(scores[B:] - scores[:B] + 1.0, 0.0))
        return l, st

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    # the carry perturbs the inputs each iteration — otherwise XLA hoists
    # the whole loop-invariant computation out of the scan and measures ~0
    @jax.jit
    def prog_full(rows, dense):
        def body(c, _):
            r = {k: v + c for k, v in rows.items()}
            (l, st), (gr, gd) = grad_fn(r, dense)
            upd = sum(jnp.sum(x) for x in jax.tree.leaves((gr, gd)))
            return 1e-20 * (l + upd), ()

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    @jax.jit
    def prog_fwd(rows, dense):
        def body(c, _):
            r = {k: v + c for k, v in rows.items()}
            l, _ = loss_fn(r, dense)
            return 1e-20 * l, ()

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    dt_f = timeit(prog_fwd, rows, dense) / K
    print(f"tower fwd+loss only     : {dt_f*1e6:8.1f} us/step")
    dt = timeit(prog_full, rows, dense) / K
    print(f"tower fwd+bwd (x+params): {dt*1e6:8.1f} us/step")
    print(f"implied bwd             : {(dt-dt_f)*1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
