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
        (dataset.py:217-230). Here the first occurrence of each item defines
        its metadata (items are assumed to have static side features, as in
        the reference).
        """
        names = tuple(columns.keys())
        encoders = tuple(IdEncoder() for _ in names)
        per_item: List[List[List[int]]] = [
            [[] for _ in names] for _ in range(num_items)
        ]
        seen = np.zeros(num_items, dtype=bool)
        cols = [columns[n] for n in names]
        for n_idx, (enc, cells) in enumerate(zip(encoders, cols)):
            seen[:] = False
            for row, cell in zip(item_rows, cells):
                if seen[row]:
                    continue
                seen[row] = True
                raw = parse_metadata_cell(cell)
                enc.fit(raw)
                per_item[row][n_idx] = [enc.encode_one(v) for v in raw]
        max_len = 1
        for item in per_item:
            for lst in item:
                if len(lst) > max_len:
                    max_len = len(lst)
        w = width if width is not None else max_len
        ids = np.zeros((num_items, len(names), w), dtype=np.int32)
        mask = np.zeros((num_items, len(names), w), dtype=bool)
        for i, item in enumerate(per_item):
            for f, lst in enumerate(item):
                k = min(len(lst), w)
                if k:
                    ids[i, f, :k] = lst[:k]
                    mask[i, f, :k] = True
        return cls(ids, mask, names, encoders)

    def gather(self, item_batch: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(B,) item rows -> ((B, F, W) ids, (B, F, W) mask)."""
        return self.ids[item_batch], self.mask[item_batch]

    @classmethod
    def empty(cls, num_items: int) -> "MetadataTable":
        return cls(
            np.zeros((num_items, 0, 0), dtype=np.int32),
            np.zeros((num_items, 0, 0), dtype=bool),
            (),
            (),
        )
