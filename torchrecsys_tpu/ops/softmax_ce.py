"""Fused in-batch sampled-softmax cross-entropy — Pallas TPU kernel.

The XLA lowering of the (B, B)-logit CE (train/trainer.py:
_inbatch_softmax_rows) materializes the logit matrix in HBM and walks it
several times: matmul write, mask pass, max pass, exp+sum pass, then the
backward's softmax recompute and two more matmuls — measured ~820 µs of a
~1.14 ms step at B=2048 on v5e while the matmul itself costs 27 µs. This
kernel streams row tiles flash-attention-style instead:

- forward: one pass per (TR, BC) tile — MXU matmul straight into VMEM,
  duplicate-positive masking, row max/log-sum-exp, and the diagonal label
  extracted in the same pass; only the per-row losses and the LSE
  residual ever reach HBM.
- backward: recomputes the tile's logits from (h, v) (cheaper than
  storing B² floats), forms ``g · (softmax − onehot)`` in VMEM, and
  accumulates dh per tile plus dv/dvb across the sequential grid.

Rows and columns are independent: single-device calls score B local rows
against the same B columns; the data-parallel wrapper
(:func:`inbatch_softmax_ce_dp`) all-gathers the column side over the
``data`` axis inside ``shard_map`` so each shard scores its local rows
against the GLOBAL batch — exactly the XLA path's GSPMD semantics, with
the per-shard VMEM win kept (grads flow back through the all-gather as a
reduce-scatter, courtesy of autodiff through ``shard_map``).

Semantics match `_inbatch_softmax_rows` exactly (same masking, same logQ
column correction via the precomputed ``vbq = vb − logq[pos]``), with one
deliberate difference: the kernel's matmuls run at f32 MXU precision
(``preferred_element_type``), where XLA's default matmul is bf16 — the
kernel is the MORE precise of the two, so parity tests carry a bf16-scale
tolerance.

Applicability (checked by :func:`softmax_kernel_applicable`): D ≤ 128 and
the (local) row count divisible by the row tile. Everything else takes
the XLA formulation. Measured end-to-end (1M-row linear, identical
losses): B=2048 1.87M → 2.57M ex/s, B=4096 1.63M → 3.25M, B=8192
0.93M → 3.01M (benchmarks/PROFILE.md).
"""

from __future__ import annotations

import functools

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


def softmax_kernel_applicable(b_rows: int, d: int) -> bool:
    return d <= LANES and _row_tile(b_rows) > 0


def _fwd_kernel(h_ref, v_ref, vbq_ref, pos_row_ref, pos_col_ref, off_ref,
                loss_ref, lse_ref, *, tr: int):
    i = pl.program_id(0)
    s = jax.lax.dot_general(
        h_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TR, BC)
    s = s + vbq_ref[:]  # (1, BC) broadcast: vb - logq[pos]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # off = this shard's global row offset (0 single-device): columns span
    # the GLOBAL batch, rows may be a local shard — the diagonal and the
    # duplicate mask compare GLOBAL indices
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tr + off_ref[0]
    )
    dup = (pos_col_ref[:] == pos_row_ref[:]) & (col != row_g)
    s = jnp.where(dup, _NEG, s)
    label = jnp.sum(jnp.where(col == row_g, s, 0.0), axis=1, keepdims=True)
    m = jnp.max(s, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    loss_ref[:] = lse - label
    lse_ref[:] = lse


def _bwd_kernel(h_ref, v_ref, vbq_ref, pos_row_ref, pos_col_ref, off_ref,
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
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tr + off_ref[0]
    )
    dup = (pos_col_ref[:] == pos_row_ref[:]) & (col != row_g)
    s = jnp.where(dup, _NEG, s)
    p = jnp.exp(s - lse_ref[:])  # softmax rows; masked entries -> 0
    dlog = g_ref[:] * (p - jnp.where(col == row_g, 1.0, 0.0))  # (TR, BC)
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


def _prep(h, v, vbq, pos_row, pos_col, off):
    br = h.shape[0]
    bc = v.shape[0]
    return (
        _pad_d(h.astype(jnp.float32)),
        _pad_d(v.astype(jnp.float32)),
        vbq.astype(jnp.float32).reshape(1, bc),
        pos_row.reshape(br, 1),
        pos_col.reshape(1, bc),
        jnp.asarray(off, jnp.int32).reshape(1),
    )


def _call_fwd(h, v, vbq, pos_row, pos_col, off, interpret):
    br, bc = h.shape[0], v.shape[0]
    tr = _row_tile(br)
    hp, vp, vbq2, pr, pc, off1 = _prep(h, v, vbq, pos_row, pos_col, off)
    loss, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, tr=tr),
        grid=(br // tr,),
        in_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((br, 1), jnp.float32),
            jax.ShapeDtypeStruct((br, 1), jnp.float32),
        ],
        interpret=interpret,
    )(hp, vp, vbq2, pr, pc, off1)
    return loss[:, 0], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ce(h, v, vbq, pos_row, pos_col, off, interpret):
    loss, _ = _call_fwd(h, v, vbq, pos_row, pos_col, off, interpret)
    return loss


def _ce_fwd(h, v, vbq, pos_row, pos_col, off, interpret):
    loss, lse = _call_fwd(h, v, vbq, pos_row, pos_col, off, interpret)
    return loss, (h, v, vbq, pos_row, pos_col, off, lse)


def _ce_bwd(interpret, res, g):
    h, v, vbq, pos_row, pos_col, off, lse = res
    br, bc, d = h.shape[0], v.shape[0], h.shape[1]
    tr = _row_tile(br)
    hp, vp, vbq2, pr, pc, off1 = _prep(h, v, vbq, pos_row, pos_col, off)
    g2 = g.astype(jnp.float32).reshape(br, 1)
    dh, dv, dvb = pl.pallas_call(
        functools.partial(_bwd_kernel, tr=tr),
        grid=(br // tr,),
        in_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((br, LANES), jnp.float32),
            jax.ShapeDtypeStruct((bc, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, bc), jnp.float32),
        ],
        interpret=interpret,
    )(hp, vp, vbq2, pr, pc, off1, lse, g2)
    return (
        dh[:, :d].astype(h.dtype),
        dv[:, :d].astype(v.dtype),
        dvb[0].astype(vbq.dtype),
        None,
        None,
        None,
    )


_ce.defvjp(_ce_fwd, _ce_bwd)


def inbatch_softmax_ce(h, v, vbq, pos, interpret=False):
    """(B,) per-row in-batch softmax CE, single device.

    ``vbq = item_bias - logq[pos]``. Gradients flow to h, v, vbq (d vbq =
    column sums of dlogits; the caller's autograd routes it on to the bias
    table)."""
    return _ce(h, v, vbq, pos, pos, jnp.zeros((), jnp.int32), interpret)


def inbatch_softmax_ce_dp(mesh, h, v, vbq, pos, interpret=False):
    """Data-parallel wrapper: per shard, local rows vs the GLOBAL batch.

    Called INSIDE the jitted step on 'data'-sharded (B, D) activations;
    ``shard_map`` pins the decomposition so GSPMD cannot de-shard around
    the opaque kernel call. Row offsets come from ``axis_index`` so the
    diagonal/duplicate masks see global indices — semantics identical to
    the single-device call on the unsharded batch."""
    from jax.sharding import PartitionSpec as P

    from torchrecsys_tpu.parallel.sharding import shard_map_norep

    def body(h_l, v_l, vbq_l, pos_l):
        v_g = jax.lax.all_gather(v_l, "data", tiled=True)
        vbq_g = jax.lax.all_gather(vbq_l, "data", tiled=True)
        pos_g = jax.lax.all_gather(pos_l, "data", tiled=True)
        off = jax.lax.axis_index("data") * h_l.shape[0]
        return _ce(h_l, v_g, vbq_g, pos_l, pos_g, off, interpret)

    return shard_map_norep(
        body,
        mesh,
        (P("data"), P("data"), P("data"), P("data")),
        P("data"),
    )(h, v, vbq, pos)
