"""Fused Pallas MLP tower layer: [BN -> ReLU ->] matmul (+bias) with the
next layer's batch statistics accumulated in the matmul epilogue.

Motivation (benchmarks/PROFILE.md, benchmarks/step_breakdown2.py): in the
north-star MLP train step the XLA tower costs ~318 us fwd+bwd, of which
~175 us is batch-norm *batch statistics* — XLA materializes the (2B, 1024)
bf16 activation and re-reads it for the mean/E[x^2] reductions (and again
for their backward terms). Here each layer is ONE Pallas kernel per
direction:

  forward:  tile-wise  h = relu(bn(z_prev)) ; z = h @ W + b ; and the
            per-column sums Σz, Σz² accumulate in VMEM while z is still
            on-chip — the statistics never cost an extra HBM pass.
  backward: tile-wise recompute of h from z_prev (cheaper than stashing h),
            dW = hᵀ@dz accumulated in VMEM across the grid, dh = dz@Wᵀ,
            and ALL batch-norm backward reductions (dβ, dγ, and the
            cotangents of the input statistics) fused into the same pass.

The layer is a ``jax.custom_vjp`` over the *bf16-cast* parameters, so the
surrounding JAX graph (param casts, mean/var/inv computation from the
returned sums, the output head, the loss) differentiates normally and the
composition reproduces XLA autograd semantics up to float reassociation
(parity tested with tolerances in tests/test_fused_tower.py).

Used by models/mlp.py when ``ModelConfig.pallas_tower`` enables it (bf16
compute, batch-norm on, row count divisible by the tile). Reference being
replaced: the torch tower at torchrecsys/collaborative/mlp.py:88-114.

**Measured outcome (TPU v5e, north-star shapes, benchmarks/PROFILE.md):**
in isolation these kernels TIE the XLA tower (318 vs 317 us fwd+bwd at
2B=16384 rows, TILE=2048) — both sit at the shared floor set by the
(2B, 1024) activation's HBM passes plus the MXU time. Inside the full
train step the kernels LOSE ~125 us/step: the opaque custom_vjp boundary
stops XLA from fusing tower ops with the surrounding gathers, scatters and
loss. ``pallas_tower`` therefore defaults to False; the kernels and their
parity tests are kept for shapes where the tradeoff flips (deeper/wider
towers where per-layer stats fusion dominates the lost graph fusion).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

TILE = int(os.environ.get("TPU_TOWER_TILE", 512))
# rows per grid step; bf16 sublane tile is 16 so any 16k works


def _row_spec(t, d):
    return pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _vec_spec(d, dtype_rows=1):
    return pl.BlockSpec((dtype_rows, d), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _bn_relu(x, mean, inv, scale, bias):
    """Exactly models/mlp.py's normalize path on bf16-cast vectors."""
    xhat = (x - mean) * inv
    return jax.nn.relu(xhat * scale + bias), xhat


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(in_ref, w_ref, b_ref, bn_ref, z_ref, s_ref, ss_ref, *, has_bn):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        ss_ref[:] = jnp.zeros_like(ss_ref)

    h = in_ref[:]
    if has_bn:
        h, _ = _bn_relu(
            h, bn_ref[0:1, :], bn_ref[1:2, :], bn_ref[2:3, :], bn_ref[3:4, :]
        )
    z = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    ) + b_ref[0:1, :]
    z_ref[:] = z
    # batch statistics in the epilogue: Σz and Σ(z²) with f32 accumulation,
    # squares computed in bf16 — the exact dtype chain of models/mlp.py's
    # jnp.mean(x, dtype=f32) / jnp.mean(lax.square(x), dtype=f32)
    s_ref[:] += jnp.sum(z.astype(jnp.float32), axis=0, keepdims=True)
    ss_ref[:] += jnp.sum(
        jax.lax.square(z).astype(jnp.float32), axis=0, keepdims=True
    )


def _fwd_call(x, w_bf, b_bf, bn_bf, *, has_bn, interpret):
    r, din = x.shape
    dout = w_bf.shape[1]
    if bn_bf is None:
        bn_bf = jnp.zeros((4, din), jnp.bfloat16)
    kernel = functools.partial(_fwd_kernel, has_bn=has_bn)
    z, s, ss = pl.pallas_call(
        kernel,
        grid=(r // TILE,),
        in_specs=[
            _row_spec(TILE, din),
            pl.BlockSpec((din, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec_spec(dout),
            pl.BlockSpec((4, din), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(_row_spec(TILE, dout), _vec_spec(dout), _vec_spec(dout)),
        out_shape=(
            jax.ShapeDtypeStruct((r, dout), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # bytes: bf16 (2 B) x read + z write + w read, f32 (4 B) s/ss out
            flops=2 * r * din * dout,
            bytes_accessed=2 * (r * din + r * dout + din * dout)
            + 4 * (2 * dout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_bf, b_bf.reshape(1, dout), bn_bf)
    return z, s[0], ss[0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    in_ref, z_ref, dz_ref, w_ref, bn_ref, dstat_ref,
    din_ref, dw_ref, db_ref, dbn_ref,
    *, has_bn,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dbn_ref[:] = jnp.zeros_like(dbn_ref)

    x = in_ref[:]
    if has_bn:
        mean, inv = bn_ref[0:1, :], bn_ref[1:2, :]
        scale, bias = bn_ref[2:3, :], bn_ref[3:4, :]
        h, xhat = _bn_relu(x, mean, inv, scale, bias)
    else:
        h = x
    # cotangent of z including the statistics outputs: s = Σ z.astype(f32)
    # and ss = Σ square(z).astype(f32)
    z = z_ref[:].astype(jnp.float32)
    ds, dss = dstat_ref[0:1, :], dstat_ref[1:2, :]
    dz = (dz_ref[:].astype(jnp.float32) + ds + 2.0 * z * dss).astype(
        jnp.bfloat16
    )
    dw_ref[:] += jax.lax.dot_general(
        h, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_ref[:] += jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dz, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    if has_bn:
        y = xhat * scale + bias
        # mask comparison in f32: Mosaic rejects bf16 compares on some
        # targets ("Target does not support this comparison"); the f32
        # cast is exact for bf16 values so the mask is unchanged
        mask = y.astype(jnp.float32) > 0.0
        dy = jnp.where(mask, dh, jnp.zeros_like(dh)).astype(jnp.float32)
        xhat32 = xhat.astype(jnp.float32)
        scale32 = scale.astype(jnp.float32)
        inv32 = inv.astype(jnp.float32)
        # rows of dbn_ref: dscale, dbias, dmean, dinv (all f32 reductions)
        dbn_ref[0:1, :] += jnp.sum(dy * xhat32, axis=0, keepdims=True)
        dbn_ref[1:2, :] += jnp.sum(dy, axis=0, keepdims=True)
        dbn_ref[2:3, :] += jnp.sum(-dy * scale32 * inv32, axis=0, keepdims=True)
        dbn_ref[3:4, :] += jnp.sum(
            dy * scale32 * (x.astype(jnp.float32) - bn_ref[0:1, :].astype(jnp.float32)),
            axis=0, keepdims=True,
        )
        din_ref[:] = (dy * scale32 * inv32).astype(jnp.bfloat16)
    else:
        din_ref[:] = dh


def _bwd_call(x, z, dz, w_bf, bn_bf, ds, dss, *, has_bn, interpret):
    r, din = x.shape
    dout = w_bf.shape[1]
    if bn_bf is None:
        bn_bf = jnp.zeros((4, din), jnp.bfloat16)
    dstat = jnp.stack([ds, dss]).astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, has_bn=has_bn)
    din_g, dw, db, dbn = pl.pallas_call(
        kernel,
        grid=(r // TILE,),
        in_specs=[
            _row_spec(TILE, din),
            _row_spec(TILE, dout),
            _row_spec(TILE, dout),
            pl.BlockSpec((din, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, din), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            _row_spec(TILE, din),
            pl.BlockSpec((din, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec_spec(dout),
            pl.BlockSpec((4, din), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, din), jnp.bfloat16),
            jax.ShapeDtypeStruct((din, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
            jax.ShapeDtypeStruct((4, din), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # bytes: bf16 (2 B) x/z/dz/w reads + din_g write, f32 (4 B)
            # dw/db/dbn outputs
            flops=4 * r * din * dout,
            bytes_accessed=2 * (2 * r * din + 2 * r * dout + din * dout)
            + 4 * (din * dout + dout + 4 * din),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, z, dz, w_bf, bn_bf, dstat)
    return din_g, dw, db, dbn


# ---------------------------------------------------------------------------
# custom-vjp layer
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_layer(x, w_bf, b_bf, bn_bf, has_bn: bool, interpret: bool):
    """One tower layer: ``z = relu(bn(x)) @ W + b`` (bn optional) plus the
    per-column sums ``(Σz, Σz²)`` of the OUTPUT — the next layer's batch
    statistics — accumulated in the matmul epilogue.

    Differentiable in ``x``, ``w_bf`` (bf16), ``b_bf`` ((Dout,) bf16) and
    ``bn_bf`` (stacked (4, Din) bf16 rows: mean, inv, scale, bias — pass
    zeros when ``has_bn`` is False).
    Returns ``(z (R, Dout) bf16, s (Dout,) f32, ss (Dout,) f32)``.
    """
    z, s, ss = _fwd_call(
        x, w_bf, b_bf, bn_bf, has_bn=has_bn, interpret=interpret
    )
    return z, s, ss


def _fl_fwd(x, w_bf, b_bf, bn_bf, has_bn, interpret):
    z, s, ss = _fwd_call(x, w_bf, b_bf, bn_bf, has_bn=has_bn, interpret=interpret)
    return (z, s, ss), (x, z, w_bf, bn_bf)


def _fl_bwd(has_bn, interpret, res, cot):
    x, z, w_bf, bn_bf = res
    dz, ds, dss = cot
    din, dw, db, dbn = _bwd_call(
        x, z, dz, w_bf, bn_bf, ds, dss, has_bn=has_bn, interpret=interpret
    )
    # dbn rows from the kernel: dscale, dbias, dmean, dinv -> repack to
    # bn_bf's (mean, inv, scale, bias) layout
    dbn_bf = jnp.stack([dbn[2], dbn[3], dbn[0], dbn[1]]).astype(jnp.bfloat16)
    return (
        din,
        dw.astype(jnp.bfloat16),
        db.astype(jnp.bfloat16)[0],
        dbn_bf,
    )


fused_layer.defvjp(_fl_fwd, _fl_bwd)


def tower_applicable(cfg, rows: int) -> bool:
    """models/mlp.py gate: enabled (opt-in — see ModelConfig.pallas_tower's
    measured-tie note), bf16 compute, batch-norm on, tile-divisible rows.

    Only the exact ``True``/``False`` singletons are accepted: a config-file
    string like ``"false"`` or ``"auto"`` is truthy and would silently enable
    the (slower at the measured shapes — and extremely slow in interpret mode
    off-TPU) fused tower, so anything else raises — the same loud-footgun
    policy as ``TrainConfig.pallas_step`` (train/trainer.py)."""
    mode = getattr(cfg, "pallas_tower", False)
    if mode is False:
        return False
    if mode is not True:
        raise ValueError(
            f"ModelConfig.pallas_tower must be True or False; got {mode!r}"
        )
    # an empty tower has no hidden layers to fuse — the layer loop would
    # never run and the head would normalize with the zeroed input bnvec
    return (
        cfg.use_batch_norm
        and len(cfg.hidden_layers) > 0
        and rows % TILE == 0
    )


def tower_interpret() -> bool:
    return jax.default_backend() != "tpu"
