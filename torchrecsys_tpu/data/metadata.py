"""Item metadata (side features) as fixed-width multi-hot buckets.

The reference pipeline only works when every metadata cell is a
string-serialized Python list (``"[3, 7]"``); scalars are silently wiped to
``[]`` (torchrecsys/dataset/dataset.py:193,197), ragged lists are padded with
id 0 which collides with real category 0 (dataset.py:283, no padding_idx), and
multiple columns with different pad widths crash ``torch.stack``
(dataset.py:287). All three defects (SURVEY §2.9 #3-5) are fixed here:

- cells may be scalars, Python lists/tuples/ndarrays, or string-serialized
  lists — all parsed uniformly;
- every feature is encoded to its own contiguous vocab and padded to one
  shared static width with an explicit boolean mask (TPU-friendly: static
  shapes, no ragged tensors);
- the pad slot never aliases a real category because masking — not a magic
  id — removes padding from every reduction.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from torchrecsys_tpu.data.encoder import IdEncoder


def parse_metadata_cell(cell: Any) -> List[Any]:
    """Normalize one metadata cell to a list of raw category ids.

    Accepts scalars (``3``), sequences (``[3, 7]``), numpy arrays, and
    string-serialized lists (``"[3, 7]"`` — the only format the reference
    accepts, dataset.py:190-197). Returns a list of hashable ids.
    """
    if cell is None:
        return []
    if isinstance(cell, str):
        s = cell.strip()
        if s.startswith("[") or s.startswith("("):
            try:
                cell = ast.literal_eval(s)
            except (ValueError, SyntaxError):
                return [cell]
        else:
            return [cell]
    if isinstance(cell, np.ndarray):
        return list(cell.tolist())
    if isinstance(cell, (list, tuple)):
        return list(cell)
    if isinstance(cell, float) and np.isnan(cell):
        return []
    return [cell]


def parse_metadata_column(
    cells: Sequence[Any],
    encoder: Optional[IdEncoder] = None,
) -> Tuple[List[List[int]], IdEncoder]:
    """Parse + encode a whole metadata column to lists of contiguous ids."""
    enc = encoder if encoder is not None else IdEncoder()
    out: List[List[int]] = []
    for cell in cells:
        raw = parse_metadata_cell(cell)
        enc.fit(raw)
        out.append([enc.encode_one(v) for v in raw])
    return out, enc


def _select_cells(cells: Sequence[Any], idx: np.ndarray) -> Any:
    """cells[idx] preserving the column's dtype for the native fast path."""
    arr = np.asarray(cells) if not isinstance(cells, np.ndarray) else cells
    return arr[idx]


def _cells_to_lists(cells: Any) -> Tuple[List[List[int]], IdEncoder]:
    """Parse + encode a batch of metadata cells into id lists.

    Fast path: fixed-width string columns parse in C++
    (native.parse_int_lists) and encode via vectorized np.unique. Fallback:
    per-cell Python parse (handles scalars, Python lists, mixed objects).
    """
    arr = np.asarray(cells)
    if arr.dtype.kind == "O":
        sample = next((v for v in arr[: min(len(arr), 16)] if v is not None), None)
        if isinstance(sample, str):
            try:
                arr = arr.astype("U")
            except (ValueError, TypeError):
                pass
    if arr.dtype.kind in "US":
        from torchrecsys_tpu import native

        out = native.parse_int_lists(arr)
        if out is not None:
            values, offsets = out
            uniq, inv = np.unique(values, return_inverse=True)
            enc = IdEncoder()
            enc._to_raw = [int(u) for u in uniq]
            enc._to_index = {int(u): i for i, u in enumerate(uniq)}
            inv = inv.astype(np.int32)
            lists = [
                inv[offsets[i] : offsets[i + 1]].tolist()
                for i in range(len(arr))
            ]
            return lists, enc
    return parse_metadata_column(list(cells))


class MetadataTable:
    """Per-item metadata, laid out as dense ``(num_items, F, W)`` buckets.

    ``ids[i, f, :]`` are the encoded category ids of feature ``f`` for item
    row ``i``; ``mask[i, f, :]`` flags the valid slots. A single gather
    ``ids[item_batch]`` produces the whole metadata tensor for a batch — there
    is no per-batch re-padding (the reference re-pads per batch in its dynamic
    sampler, dataset.py:375-411) and no host-side join in the hot path
    (the reference merges pandas frames per predict chunk, model.py:391-397).
    """

    def __init__(
        self,
        ids: np.ndarray,  # (num_items, F, W) int32
        mask: np.ndarray,  # (num_items, F, W) bool
        names: Tuple[str, ...],
        encoders: Tuple[IdEncoder, ...],
    ) -> None:
        assert ids.ndim == 3 and ids.shape == mask.shape
        self.ids = ids
        self.mask = mask
        self.names = names
        self.encoders = encoders

    @property
    def num_items(self) -> int:
        return self.ids.shape[0]

    @property
    def num_features(self) -> int:
        return self.ids.shape[1]

    @property
    def width(self) -> int:
        return self.ids.shape[2]

    @property
    def vocab_sizes(self) -> Tuple[int, ...]:
        return tuple(len(e) for e in self.encoders)

    @classmethod
    def build(
        cls,
        item_rows: np.ndarray,  # (N,) encoded item row per interaction
        num_items: int,
        columns: Dict[str, Sequence[Any]],  # metadata col name -> N cells
        width: Optional[int] = None,
    ) -> "MetadataTable":
        """Build the item->metadata map from interaction-aligned columns.

        Reference analog: ``item_to_metadata_map`` built via ``iterrows``
        (dataset.py:217-230). The first occurrence of each item defines its
        metadata (items have static side features, as in the reference).
        Only each item's first row is parsed — O(num_items), not
        O(num_interactions) — and string columns go through the native C++
        parser (native/ingest.cpp) instead of ast.literal_eval.
        """
        names = tuple(columns.keys())
        # first occurrence of each item in the interaction log
        uniq_items, first_idx = np.unique(item_rows, return_index=True)
        per_col: List[Tuple[List[List[int]], IdEncoder]] = []
        for name in names:
            cells = _select_cells(columns[name], first_idx)
            lists, enc = _cells_to_lists(cells)
            per_col.append((lists, enc))
        max_len = 1
        for lists, _ in per_col:
            for lst in lists:
                if len(lst) > max_len:
                    max_len = len(lst)
        w = width if width is not None else max_len
        ids = np.zeros((num_items, len(names), w), dtype=np.int32)
        mask = np.zeros((num_items, len(names), w), dtype=bool)
        for f, (lists, _) in enumerate(per_col):
            for it, lst in zip(uniq_items, lists):
                k = min(len(lst), w)
                if k:
                    ids[it, f, :k] = lst[:k]
                    mask[it, f, :k] = True
        return cls(ids, mask, names, tuple(e for _, e in per_col))

    def gather(self, item_batch: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(B,) item rows -> ((B, F, W) ids, (B, F, W) mask)."""
        return self.ids[item_batch], self.mask[item_batch]

    def extend(
        self,
        item_rows: np.ndarray,  # (N,) encoded item rows of the NEW interactions
        num_items_new: int,
        columns: Dict[str, Sequence[Any]],  # name -> N interaction-aligned cells
    ) -> "MetadataTable":
        """Grow the table to ``num_items_new`` rows (incremental training).

        Rows for items the table already knows keep their existing metadata
        untouched (items have static side features — first occurrence
        defines them, same as :meth:`build`); rows for NEW items parse from
        their first occurrence in the new interactions, encoding through
        the EXISTING per-feature encoders, which extend in place for unseen
        category ids (new contiguous vocab rows — trained metadata
        embedding rows keep their indices). Lists longer than the fixed
        width clip, exactly like a ``width=``-constrained build.
        """
        if set(columns.keys()) != set(self.names):
            raise ValueError(
                f"metadata columns {sorted(columns)} do not match the "
                f"store's features {sorted(self.names)}"
            )
        old_n = self.num_items
        f_n, w = self.num_features, self.width
        ids = np.zeros((num_items_new, f_n, w), dtype=np.int32)
        mask = np.zeros((num_items_new, f_n, w), dtype=bool)
        ids[:old_n] = self.ids
        mask[:old_n] = self.mask
        uniq_items, first_idx = np.unique(item_rows, return_index=True)
        new_sel = uniq_items >= old_n
        uniq_new, first_new = uniq_items[new_sel], first_idx[new_sel]
        for f, name in enumerate(self.names):
            cells = _select_cells(columns[name], first_new)
            lists, _ = parse_metadata_column(list(cells), encoder=self.encoders[f])
            for it, lst in zip(uniq_new, lists):
                k = min(len(lst), w)
                if k:
                    ids[it, f, :k] = lst[:k]
                    mask[it, f, :k] = True
        return MetadataTable(ids, mask, self.names, self.encoders)

    @classmethod
    def empty(cls, num_items: int) -> "MetadataTable":
        return cls(
            np.zeros((num_items, 0, 0), dtype=np.int32),
            np.zeros((num_items, 0, 0), dtype=bool),
            (),
            (),
        )
