"""Fused in-batch sampled-softmax cross-entropy — Pallas TPU kernel.

The XLA lowering of the (B, B)-logit CE (train/trainer.py:
_inbatch_softmax_rows) materializes the logit matrix in HBM and walks it
several times: matmul write, mask pass, max pass, exp+sum pass, then the
backward's softmax recompute and two more matmuls — measured ~820 µs of a
~1.14 ms step at B=2048 on v5e while the matmul itself costs 27 µs. This
kernel streams row tiles flash-attention-style instead:

- forward: one pass per (TR, B) tile — MXU matmul straight into VMEM,
  duplicate-positive masking, row max/log-sum-exp, and the diagonal label
  extracted in the same pass; only the (B,) per-row losses and the (B,)
  LSE residual ever reach HBM.
- backward: recomputes the tile's logits from (h, v) (cheaper than
  storing B² floats), forms ``g · (softmax − onehot)`` in VMEM, and
  accumulates dh per tile plus dv/dvb across the sequential grid.

Semantics match `_inbatch_softmax_rows` exactly (same masking, same logQ
column correction via the precomputed ``vbq = vb − logq[pos]``), with one
deliberate difference: the kernel's matmuls run at f32 MXU precision
(``preferred_element_type``), where XLA's default matmul is bf16 — the
kernel is the MORE precise of the two, so parity tests carry a bf16-scale
tolerance.

Applicability (checked by :func:`softmax_kernel_applicable`): single
device (under a mesh the opaque kernel would force GSPMD to de-shard the
batch — the XLA path shards cleanly instead), D ≤ 128, B divisible by the
row tile. Everything else takes the XLA formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = -1e30


def _row_tile(b: int) -> int:
    # Measured on v5e (fwd+bwd, D=80): B=2048 prefers TR=128, larger
    # batches TR=256; TR=512's (512, B) tiles thrash VMEM (OOM at B=8192).
    prefs = (128, 256, 64) if b <= 2048 else (256, 128, 64)
    for tr in prefs:
        if b % tr == 0 and b >= tr:
            return tr
    return 0


def softmax_kernel_applicable(b: int, d: int, mesh) -> bool:
    return mesh is None and d <= LANES and _row_tile(b) > 0


def _fwd_kernel(h_ref, v_ref, vbq_ref, pos_row_ref, pos_col_ref,
                loss_ref, lse_ref, label_ref, *, tr: int):
    i = pl.program_id(0)
    s = jax.lax.dot_general(
        h_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TR, B)
    s = s + vbq_ref[:]  # (1, B) broadcast: vb - logq[pos]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tr
    dup = (pos_col_ref[:] == pos_row_ref[:]) & (col != row_g)
    s = jnp.where(dup, _NEG, s)
    label = jnp.sum(jnp.where(col == row_g, s, 0.0), axis=1, keepdims=True)
    m = jnp.max(s, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    loss_ref[:] = lse - label
    lse_ref[:] = lse
    label_ref[:] = label


def _bwd_kernel(h_ref, v_ref, vbq_ref, pos_row_ref, pos_col_ref,
                lse_ref, g_ref, dh_ref, dv_ref, dvb_ref, *, tr: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dvb_ref[:] = jnp.zeros_like(dvb_ref)

    s = jax.lax.dot_general(
        h_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + vbq_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tr
    dup = (pos_col_ref[:] == pos_row_ref[:]) & (col != row_g)
    s = jnp.where(dup, _NEG, s)
    p = jnp.exp(s - lse_ref[:])  # softmax rows; masked entries -> 0
    dlog = g_ref[:] * (p - jnp.where(col == row_g, 1.0, 0.0))  # (TR, B)
    dh_ref[:] = jax.lax.dot_general(
        dlog, v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[:] += jax.lax.dot_general(
        dlog, h_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvb_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)


def _pad_d(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[1]
    if d == LANES:
        return x
    return jnp.pad(x, ((0, 0), (0, LANES - d)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def inbatch_softmax_ce(h, v, vbq, pos, interpret=False):
    """(B,) per-row in-batch softmax CE. ``vbq = item_bias - logq[pos]``.

    Gradients flow to h, v, vbq (d vbq = column sums of dlogits; the
    caller's autograd routes it on to the bias table and, through the
    ``-logq`` term's stop-grad table lookup, nowhere else)."""
    loss, _, _ = _fwd(h, v, vbq, pos, interpret)
    return loss


def _call_fwd(h, v, vbq, pos, interpret):
    b, d = h.shape
    tr = _row_tile(b)
    hp, vp = _pad_d(h.astype(jnp.float32)), _pad_d(v.astype(jnp.float32))
    vbq2 = vbq.astype(jnp.float32).reshape(1, b)
    pos_col = pos.reshape(1, b)
    pos_row = pos.reshape(b, 1)
    loss, lse, label = pl.pallas_call(
        functools.partial(_fwd_kernel, tr=tr),
        grid=(b // tr,),
        in_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(hp, vp, vbq2, pos_row, pos_col)
    return loss[:, 0], lse, label


def _fwd(h, v, vbq, pos, interpret):
    return _call_fwd(h, v, vbq, pos, interpret)


def _vjp_fwd(h, v, vbq, pos, interpret):
    loss, lse, _ = _call_fwd(h, v, vbq, pos, interpret)
    return loss, (h, v, vbq, pos, lse)


def _vjp_bwd(interpret, res, g):
    h, v, vbq, pos, lse = res
    b, d = h.shape
    tr = _row_tile(b)
    hp, vp = _pad_d(h.astype(jnp.float32)), _pad_d(v.astype(jnp.float32))
    vbq2 = vbq.astype(jnp.float32).reshape(1, b)
    pos_col = pos.reshape(1, b)
    pos_row = pos.reshape(b, 1)
    g2 = g.astype(jnp.float32).reshape(b, 1)
    dh, dv, dvb = pl.pallas_call(
        functools.partial(_bwd_kernel, tr=tr),
        grid=(b // tr,),
        in_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        interpret=interpret,
    )(hp, vp, vbq2, pos_row, pos_col, lse, g2)
    dh = dh[:, :d].astype(h.dtype)
    dv = dv[:, :d].astype(v.dtype)
    dvb = dvb[0].astype(vbq.dtype)
    return dh, dv, dvb, None


inbatch_softmax_ce.defvjp(_vjp_fwd, _vjp_bwd)
