"""Fused full-catalog score + top-k Pallas TPU kernel.

Reference analog: ``TorchRecSys.predict`` scores the catalog in host-side
chunks and full-sorts all scores (torchrecsys/model.py:341-452). The
XLA-level replacement already streams chunks with a running ``lax.top_k``
merge (torchrecsys_tpu/eval/predict.py); this kernel goes one level lower
and fuses the score matmul with the top-k selection **inside VMEM**: the
(U, N) score matrix never exists in HBM — each (U_tile, N_tile) score block
is produced on the MXU and immediately folded into a running (U_tile, k)
top-k in VMEM scratch. HBM traffic is exactly one stream of the item matrix
plus the (U, k) result: the speed-of-light lower bound for this op.

``jax.lax.top_k`` has no Mosaic lowering, so selection is k unrolled
(max, argmax, mask) passes over the VMEM-resident candidates — O(k * N_tile)
VPU work per tile, negligible next to the matmul for k <= ~128.

Applicability: any model whose score is ``dot(user_vec, item_vec) +
item_bias + user_const`` with a monotonic output transform — Linear exactly
(linear.py:78) and FM after algebraic reduction (its pairwise term
``0.5(|Σv|² − Σ|v|²)`` collapses to ``u·q + const_item`` with
``q = v_item + Σ v_meta``; the sigmoid (fm.py:99) is monotonic so ranking is
unchanged). See ``RecModel.linearized_catalog``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(np.finfo(np.float32).min)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# per-user seen-item masks (device-side exclude_seen, VERDICT r4 #5)
#
# A user's seen set rides as PACKED BITS — (U, n_pad/32) int32, 3% of the
# equivalent byte mask's HBM stream — laid out so the kernels can expand a
# tile's worth with ONE pltpu.repeat + vector shift: within each
# _MASK_TILE-item tile, item j lives in word (j % W), bit (j // W), with
# W = _MASK_TILE/32 words per tile (pltpu.repeat is a TILE repeat — lane l
# of the repeated block holds word l % W — so the strided layout makes
# lane j's word exactly the one holding its bit).
# ---------------------------------------------------------------------------

_MASK_TILE = 4096  # masked kernels always run this item-tile size


def pack_seen_mask(seen_lists, n: int) -> np.ndarray:
    """Per-user seen item-row lists -> (U, n_pad/32) int32 packed mask in
    the kernel's strided layout (host-side numpy, vectorized)."""
    w = _MASK_TILE // 32
    n_pad = _round_up(max(n, 1), _MASK_TILE)
    out = np.zeros((len(seen_lists), n_pad // 32), np.uint32)
    lens = [len(s) for s in seen_lists]
    if sum(lens):
        uu = np.repeat(np.arange(len(seen_lists)), lens)
        gg = np.concatenate([np.asarray(s, np.int64) for s in seen_lists])
        j = gg % _MASK_TILE
        word = (gg // _MASK_TILE) * w + (j % w)
        bit = (j // w).astype(np.uint32)
        np.bitwise_or.at(out, (uu, word), np.uint32(1) << bit)
    return out.view(np.int32)


def mask_bits_for_items(mask: jnp.ndarray, item_ids: jnp.ndarray) -> jnp.ndarray:
    """(U, n_pad/32) packed mask x (C,) item rows -> (U, C) bool (XLA-side
    decode of the strided layout, for the non-kernel scorers)."""
    w = _MASK_TILE // 32
    j = item_ids % _MASK_TILE
    word = (item_ids // _MASK_TILE) * w + (j % w)
    bit = (j // w).astype(jnp.int32)
    words = jnp.take(mask, word, axis=1)  # (U, C)
    return (jax.lax.shift_right_logical(words, bit[None, :]) & 1) != 0


def _mask_tile_bits(mask_block: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """In-kernel decode: (u_t, W) packed words of ONE tile -> (u_t, n_tile)
    0/1 ints. ``col`` is the lane iota of the tile."""
    w = mask_block.shape[1]
    rep = pltpu.repeat(mask_block, col.shape[1] // w, axis=1)
    return jax.lax.shift_right_logical(rep, col // w) & 1


def _first_argmax(vals: jnp.ndarray, col: jnp.ndarray, m: jnp.ndarray):
    """Column of the FIRST (lowest-index) maximum of each row.

    ``jnp.argmax`` must not be used here: Mosaic's TPU lowering resolves
    ties to the LAST maximal index (verified empirically on v5e; interpret
    mode and XLA pick the first), which silently breaks the kernel's
    exact-equality contract with ``jax.lax.top_k`` whenever two candidate
    scores collide in f32 — at 1M-item catalogs that happens routinely.
    min-of-columns-where-equal pins the XLA tie rule on every backend.
    """
    big = jnp.int32(np.iinfo(np.int32).max)
    return jnp.min(jnp.where(vals == m[:, None], col, big), axis=1)


def _select_topk(c_vals: jnp.ndarray, c_ids: jnp.ndarray, k: int):
    """Top-k of each row of (U, C) candidates via k unrolled max passes.

    Gather-free: the winning id is extracted with a one-hot reduction, and
    the winner is masked out with a one-hot ``where`` — both plain VPU ops
    that lower in Mosaic. Ties resolve to the lowest candidate column
    (:func:`_first_argmax`), matching ``jax.lax.top_k``.
    """
    u, c = c_vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (u, c), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (u, k), 1)
    out_v = jnp.full((u, k), _NEG_INF, jnp.float32)
    out_i = jnp.zeros((u, k), jnp.int32)
    for slot in range(k):
        m = jnp.max(c_vals, axis=1)
        a = _first_argmax(c_vals, col, m)
        onehot = col == a[:, None]
        sel_id = jnp.sum(jnp.where(onehot, c_ids, 0), axis=1)
        out_v = jnp.where(out_col == slot, m[:, None], out_v)
        out_i = jnp.where(out_col == slot, sel_id[:, None], out_i)
        c_vals = jnp.where(onehot, _NEG_INF, c_vals)
    return out_v, out_i


def _dot_topk_kernel(
    u_ref,  # (U_T, D) user vectors
    it_ref,  # (N_T, D) item-tile vectors
    bias_ref,  # (1, N_T) item-tile bias
    # [mask_ref (U_T, N_T/32) when use_mask], then:
    # vals_out (U_T, k), ids_out, vals_scr, ids_scr
    *refs,
    k: int,
    n_tile: int,
    use_mask: bool = False,
):
    if use_mask:
        mask_ref, vals_out, ids_out, vals_scr, ids_scr = refs
    else:
        vals_out, ids_out, vals_scr, ids_scr = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        vals_scr[:] = jnp.full(vals_scr.shape, _NEG_INF, jnp.float32)
        ids_scr[:] = jnp.zeros(ids_scr.shape, jnp.int32)

    # MXU: (U_T, D) x (D, N_T) score block, accumulated in f32.
    s = jax.lax.dot_general(
        u_ref[:],
        it_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0, :][None, :]
    u_t = s.shape[0]
    if use_mask:
        mcol = jax.lax.broadcasted_iota(jnp.int32, (u_t, n_tile), 1)
        s = jnp.where(_mask_tile_bits(mask_ref[:], mcol) != 0, _NEG_INF, s)

    # Per-tile top-k straight from argmax: the tile's candidate ids are
    # j*n_tile + lane, so the winning id IS the argmax — no (U_T, N_T)
    # id plane to materialize and no one-hot extraction reduce per pass
    # (each pass over the tile is max + argmax + mask-out, 3 O(N_T) ops
    # instead of 5; measured 12.5 -> 7.3 ms at (256 users, 1M items,
    # k=10) together with the 8192/64 tile shape).
    col = jax.lax.broadcasted_iota(jnp.int32, (u_t, n_tile), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (u_t, k), 1)
    tv = jnp.full((u_t, k), _NEG_INF, jnp.float32)
    ti = jnp.zeros((u_t, k), jnp.int32)
    for slot in range(k):
        m = jnp.max(s, axis=1)
        a = _first_argmax(s, col, m)  # lowest-index ties (see its docstring)
        tv = jnp.where(out_col == slot, m[:, None], tv)
        ti = jnp.where(out_col == slot, (j * n_tile + a)[:, None], ti)
        s = jnp.where(col == a[:, None], _NEG_INF, s)

    # Merge the tile's top-k with the running top-k — 2k candidates, the
    # gather-free one-hot selection is negligible at this width. Carry
    # candidates come first so ties prefer the earlier (lower-id) tile,
    # matching jax.lax.top_k's lowest-index tie rule.
    c_vals = jnp.concatenate([vals_scr[:], tv], axis=1)
    c_ids = jnp.concatenate([ids_scr[:], ti], axis=1)
    out_v, out_i = _select_topk(c_vals, c_ids, k)
    vals_scr[:] = out_v
    ids_scr[:] = out_i
    vals_out[:] = out_v
    ids_out[:] = out_i


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_tile", "u_tile"))
def dot_topk_pallas(
    user_vecs: jnp.ndarray,  # (U, D)
    item_vecs: jnp.ndarray,  # (N, D)
    item_bias: jnp.ndarray,  # (N,)
    k: int,
    interpret: bool = False,
    n_tile: int = 4096,
    u_tile: int = 128,
    seen_mask: Optional[jnp.ndarray] = None,  # (U, n_pad/32) pack_seen_mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(U, k) top-k scores + item indices of ``user_vecs @ item_vecs.T +
    item_bias``, descending.

    Tile defaults from measured sweeps on v5e at (U=256, N=1M, D=80).
    Round 3 (old concat-selection kernel, k=10): 512 → 37.3 ms/batch,
    2048 → 14.8, 4096 → 12.5. Round 4 rewrote the selection — per-tile
    top-k straight from first-index-of-max (no (U, N) id plane, no one-hot
    extraction reduce) then a 2k-wide merge — and re-swept: k=10
    4096/128 → 11.4, 8192/128 → **10.3** (the new default; 22.6K → 24.8K
    users/s end-to-end); k=32 4096/128 → 22.0 (vs 27.6 before); k=64
    4096/128 → 42.8. 16384-item tiles exceed VMEM at every u_tile."""
    u, d = user_vecs.shape
    n = item_vecs.shape[0]
    k = min(k, n)

    # The vector dtype is honored: bf16 inputs (use_amp models) stream the
    # item matrix at half the HBM bytes and run the MXU in bf16; scores
    # still accumulate in f32 (preferred_element_type below), so the
    # selection path is unchanged. bf16 tiles need 16-row sublane alignment.
    vdt = jnp.promote_types(user_vecs.dtype, item_vecs.dtype)
    if vdt not in (jnp.float32, jnp.bfloat16):
        vdt = jnp.float32
    row_align = 16 if vdt == jnp.bfloat16 else 8

    use_mask = seen_mask is not None
    if use_mask:
        n_tile = _MASK_TILE  # the packed-mask layout is tied to this tile
    u_t = min(_round_up(u, row_align), u_tile)
    u_pad = _round_up(u, u_t)
    d_pad = _round_up(d, 128)
    # masked runs keep the FULL mask tile even for small catalogs — the
    # packed layout's word/bit arithmetic assumes _MASK_TILE-item tiles
    n_t = n_tile if use_mask else min(_round_up(n, 128), n_tile)
    n_pad = _round_up(n, n_t)

    uv = jnp.zeros((u_pad, d_pad), vdt).at[:u, :d].set(
        user_vecs.astype(vdt)
    )
    iv = jnp.zeros((n_pad, d_pad), vdt).at[:n, :d].set(
        item_vecs.astype(vdt)
    )
    # padded items get -inf bias so they never win
    ib = jnp.full((1, n_pad), _NEG_INF, jnp.float32).at[0, :n].set(
        item_bias.astype(jnp.float32)
    )

    grid = (u_pad // u_t, n_pad // n_t)
    in_specs = [
        pl.BlockSpec((u_t, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_t, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [uv, iv, ib]
    if use_mask:
        mw = n_pad // 32
        if seen_mask.shape != (u, mw):
            raise ValueError(
                f"seen_mask shape {seen_mask.shape} != ({u}, {mw}) — build it "
                f"with pack_seen_mask(seen_lists, n={n})"
            )
        mk = jnp.zeros((u_pad, mw), jnp.int32).at[:u].set(seen_mask)
        in_specs.append(
            pl.BlockSpec(
                (u_t, n_t // 32), lambda i, j: (i, j), memory_space=pltpu.VMEM
            )
        )
        args.append(mk)
    kernel = functools.partial(
        _dot_topk_kernel, k=k, n_tile=n_t, use_mask=use_mask
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((u_t, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u_t, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_t, k), jnp.float32),
            pltpu.VMEM((u_t, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * u_pad * n_pad * d_pad,
            bytes_accessed=(u_pad * d_pad + n_pad * d_pad) * vdt.itemsize
            + u_pad * k * 2 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return vals[:u], ids[:u]


def dot_topk_xla(
    user_vecs: jnp.ndarray,
    item_vecs: jnp.ndarray,
    item_bias: jnp.ndarray,
    k: int,
    seen_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA reference implementation (also the non-TPU fallback).

    Like the kernel, the vector dtype is honored (bf16 stays bf16 on the
    MXU) with f32 score accumulation."""
    n = item_vecs.shape[0]
    k = min(k, n)
    vdt = jnp.promote_types(user_vecs.dtype, item_vecs.dtype)
    if vdt not in (jnp.float32, jnp.bfloat16):
        vdt = jnp.float32
    scores = jax.lax.dot_general(
        user_vecs.astype(vdt),
        item_vecs.astype(vdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + item_bias.astype(jnp.float32)[None, :]
    if seen_mask is not None:
        bits = mask_bits_for_items(seen_mask, jnp.arange(n, dtype=jnp.int32))
        scores = jnp.where(bits, _NEG_INF, scores)
    return jax.lax.top_k(scores, k)


# Dispatch boundaries, measured on v5e at (256 users, 1M items, D=80),
# ms/batch (round 5; one queued-drain sync per timing loop):
#
#   k        10     32     64     128    256    512
#   unrolled 10.3   21.8   42.7   (fails to compile)
#   thresh   12.9   13.3   13.5   13.9   19.5   30.0
#   XLA      14.5   31.8   57.2   108.6  210.7  418.0
#
# The unrolled per-slot kernel wins only at small k (its 8192-item tiles
# amortize better); the threshold kernel is nearly flat in k — its pop
# count is k*ln(N/k), not k*N/n_tile — and beats XLA's full sort 2.4-13.9x
# everywhere above. Beyond 1024 the scratch pool stops paying and XLA
# takes over.
_PALLAS_UNROLLED_MAX_K = 16
_PALLAS_THRESH_MAX_K = 1024


def _first_argmin(vals: jnp.ndarray, col: jnp.ndarray):
    """Column of the FIRST (lowest-index) minimum of each row (the Mosaic
    argmin tie rule is as unreliable as argmax's — see _first_argmax)."""
    m = jnp.min(vals, axis=1)
    big = jnp.int32(np.iinfo(np.int32).max)
    return jnp.min(jnp.where(vals == m[:, None], col, big), axis=1), m


def _dot_topk_threshold_kernel(
    u_ref,  # (U_T, D) user vectors
    it_ref,  # (N_T, D) item-tile vectors
    bias_ref,  # (1, N_T) item-tile bias
    # [mask_ref (U_T, N_T/32) when use_mask], then:
    # vals_out (U_T, k) UNSORTED, ids_out, vals_scr, ids_scr
    *refs,
    k: int,
    n_tile: int,
    use_mask: bool = False,
):
    """Large-k (k > 64) score + top-k: threshold early-exit selection.

    The unrolled per-slot loop costs k full passes over every tile and its
    Mosaic instruction count grows with k (it stops compiling at k=128).
    This kernel instead keeps the running top-k as an UNSORTED candidate
    pool and, per tile, pops candidates only while the tile still contains
    a score above the pool's minimum (the running k-th value). Processing a
    randomly-ordered catalog, the expected number of pops over the WHOLE
    catalog is k*ln(N/k) + k (the classic running-top-k update count), vs
    the unrolled loop's k*(N/n_tile) — two orders of magnitude fewer passes
    at (1M items, k=128). Pops for the U_T users in a tile run in parallel
    (one loop iteration services every user that still improves), so a
    tile's iteration count is the MAX pops over its users, concentrated in
    the first tiles while the pool warms up.

    The pool is returned unsorted; the wrapper orders it by (value desc,
    item id asc). Values are exactly the true top-k scores; when several
    items TIE exactly at the k-th value, which of them enters the pool may
    differ from jax.lax.top_k's lowest-index rule (the strict ``>``
    threshold admits the first-seen maximal candidates) — a measure-zero
    event for f32 dot scores, documented rather than paid for.
    """
    if use_mask:
        mask_ref, vals_out, ids_out, vals_scr, ids_scr = refs
    else:
        vals_out, ids_out, vals_scr, ids_scr = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        vals_scr[:] = jnp.full(vals_scr.shape, _NEG_INF, jnp.float32)
        ids_scr[:] = jnp.zeros(ids_scr.shape, jnp.int32)

    s = jax.lax.dot_general(
        u_ref[:],
        it_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0, :][None, :]
    u_t = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (u_t, n_tile), 1)
    if use_mask:
        s = jnp.where(_mask_tile_bits(mask_ref[:], col) != 0, _NEG_INF, s)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (u_t, k), 1)

    def cond(carry):
        _, _, _, again = carry
        return again

    def body(carry):
        s, vals, ids, _ = carry
        m = jnp.max(s, axis=1)
        a = _first_argmax(s, col, m)  # lowest item id among tile maxima
        slot, tau = _first_argmin(vals, kcol)
        improve = (m > tau)[:, None]  # (U_T, 1)
        hit_slot = kcol == slot[:, None]
        vals = jnp.where(improve & hit_slot, m[:, None], vals)
        ids = jnp.where(improve & hit_slot, (j * n_tile + a)[:, None], ids)
        s = jnp.where(improve & (col == a[:, None]), _NEG_INF, s)
        return s, vals, ids, jnp.any(improve)

    _, vals, ids, _ = jax.lax.while_loop(
        cond, body, (s, vals_scr[:], ids_scr[:], jnp.bool_(True))
    )
    vals_scr[:] = vals
    ids_scr[:] = ids
    vals_out[:] = vals
    ids_out[:] = ids


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_tile", "u_tile"))
def dot_topk_pallas_thresh(
    user_vecs: jnp.ndarray,  # (U, D)
    item_vecs: jnp.ndarray,  # (N, D)
    item_bias: jnp.ndarray,  # (N,)
    k: int,
    interpret: bool = False,
    n_tile: int = 4096,
    u_tile: int = 128,
    seen_mask: Optional[jnp.ndarray] = None,  # (U, n_pad/32) pack_seen_mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Threshold-kernel variant of :func:`dot_topk_pallas` for k > 64.
    Same contract (descending scores, ids; lowest-id tie order in the final
    ordering) — see the kernel docstring for the k-th-value tie caveat."""
    u, d = user_vecs.shape
    n = item_vecs.shape[0]
    k = min(k, n)
    use_mask = seen_mask is not None
    if use_mask:
        n_tile = _MASK_TILE  # the packed-mask layout is tied to this tile

    vdt = jnp.promote_types(user_vecs.dtype, item_vecs.dtype)
    if vdt not in (jnp.float32, jnp.bfloat16):
        vdt = jnp.float32
    row_align = 16 if vdt == jnp.bfloat16 else 8

    u_t = min(_round_up(u, row_align), u_tile)
    u_pad = _round_up(u, u_t)
    d_pad = _round_up(d, 128)
    n_t = n_tile if use_mask else min(_round_up(n, 128), n_tile)
    n_pad = _round_up(n, n_t)
    k_pad = _round_up(k, 128)  # lane-aligned scratch

    uv = jnp.zeros((u_pad, d_pad), vdt).at[:u, :d].set(user_vecs.astype(vdt))
    iv = jnp.zeros((n_pad, d_pad), vdt).at[:n, :d].set(item_vecs.astype(vdt))
    ib = jnp.full((1, n_pad), _NEG_INF, jnp.float32).at[0, :n].set(
        item_bias.astype(jnp.float32)
    )

    grid = (u_pad // u_t, n_pad // n_t)
    in_specs = [
        pl.BlockSpec((u_t, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_t, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [uv, iv, ib]
    if use_mask:
        mw = n_pad // 32
        if seen_mask.shape != (u, mw):
            raise ValueError(
                f"seen_mask shape {seen_mask.shape} != ({u}, {mw}) — build it "
                f"with pack_seen_mask(seen_lists, n={n})"
            )
        mk = jnp.zeros((u_pad, mw), jnp.int32).at[:u].set(seen_mask)
        in_specs.append(
            pl.BlockSpec(
                (u_t, n_t // 32), lambda i, j: (i, j), memory_space=pltpu.VMEM
            )
        )
        args.append(mk)
    kernel = functools.partial(
        _dot_topk_threshold_kernel, k=k_pad, n_tile=n_t, use_mask=use_mask
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((u_t, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u_t, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_t, k_pad), jnp.float32),
            pltpu.VMEM((u_t, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * u_pad * n_pad * d_pad,
            bytes_accessed=(u_pad * d_pad + n_pad * d_pad) * vdt.itemsize
            + u_pad * k_pad * 2 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    # order the unsorted pool: value desc, item id asc (lax.top_k's rule)
    order = jnp.lexsort((ids[:u], -vals[:u]))[:, :k]
    return (
        jnp.take_along_axis(vals[:u], order, axis=1),
        jnp.take_along_axis(ids[:u], order, axis=1),
    )


def dot_topk_approx(
    user_vecs: jnp.ndarray,
    item_vecs: jnp.ndarray,
    item_bias: jnp.ndarray,
    k: int,
    recall_target: float = 0.95,
    seen_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate score+top-k via the TPU's HARDWARE PartialReduce op
    (``jax.lax.approx_max_k``).

    Measured at (256 users, 1M items, k=10) on v5e: **3.1 ms/batch, 82K
    users/s — 3.3x the exact Pallas kernel** — at measured recall 0.98
    (recall_target 0.95) / 0.994 (0.99). The returned scores are the true
    scores of the selected items, sorted descending; "approximate" means
    a few true top-k members may be missed, per ``recall_target``. The
    score matrix materializes in HBM (the op is bandwidth-bound: U*N*4
    bytes per chunk), so large user batches are processed in chunks that
    cap the live score block at ~2 GB; on non-TPU backends approx_max_k
    degenerates to exact top-k.
    """
    n = item_vecs.shape[0]
    u = user_vecs.shape[0]
    k = min(k, n)
    vdt = jnp.promote_types(user_vecs.dtype, item_vecs.dtype)
    if vdt not in (jnp.float32, jnp.bfloat16):
        vdt = jnp.float32

    def run(uv_chunk, mask_chunk):
        scores = jax.lax.dot_general(
            uv_chunk.astype(vdt),
            item_vecs.astype(vdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + item_bias.astype(jnp.float32)[None, :]
        if mask_chunk is not None:
            bits = mask_bits_for_items(
                mask_chunk, jnp.arange(n, dtype=jnp.int32)
            )
            scores = jnp.where(bits, _NEG_INF, scores)
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)

    u_chunk = max(8, int(2e9 / (n * 4)))
    if u <= u_chunk:
        return run(user_vecs, seen_mask)
    vals, ids = [], []
    for s in range(0, u, u_chunk):
        v, i = run(
            user_vecs[s : s + u_chunk],
            None if seen_mask is None else seen_mask[s : s + u_chunk],
        )
        vals.append(v)
        ids.append(i)
    return jnp.concatenate(vals, axis=0), jnp.concatenate(ids, axis=0)


def dot_topk(
    user_vecs: jnp.ndarray,
    item_vecs: jnp.ndarray,
    item_bias: jnp.ndarray,
    k: int,
    approx_recall: Optional[float] = None,
    seen_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused score+top-k: Pallas kernel on TPU (serving-typical k), XLA
    fallback elsewhere and for very large k. ``approx_recall`` switches to
    the hardware approximate path (:func:`dot_topk_approx`) — ~3x faster
    at 1M-item catalogs for a bounded recall loss. ``seen_mask``
    (:func:`pack_seen_mask`) excludes each user's seen items inside the
    scorer — the device-side exclude_seen path (VERDICT r4 #5): masked
    scores are _NEG_INF and never selected."""
    if approx_recall is not None:
        return dot_topk_approx(
            user_vecs, item_vecs, item_bias, k, recall_target=approx_recall,
            seen_mask=seen_mask,
        )
    if jax.default_backend() == "tpu" and k <= _PALLAS_UNROLLED_MAX_K:
        # masked calls run the 4096 tile (the packed-mask layout's tile)
        n_tile = 4096 if seen_mask is not None else 8192
        return dot_topk_pallas(
            user_vecs, item_vecs, item_bias, k, n_tile=n_tile,
            seen_mask=seen_mask,
        )
    if jax.default_backend() == "tpu" and k <= _PALLAS_THRESH_MAX_K:
        # threshold early-exit kernel (VERDICT r4 #4): nearly flat in k —
        # 13.5/13.9/19.5/30.0 ms at k=64/128/256/512 vs XLA's full sort at
        # 57/109/211/418 ms (table above). Note: when several items tie
        # EXACTLY at the k-th value, which of them is returned may differ
        # from lax.top_k's lowest-index rule (kernel docstring).
        return dot_topk_pallas_thresh(
            user_vecs, item_vecs, item_bias, k, seen_mask=seen_mask
        )
    return dot_topk_xla(user_vecs, item_vecs, item_bias, k, seen_mask=seen_mask)
