"""Explicit id <-> row encoding.

The reference has no id encoding at all: raw column values are used directly
as embedding rows and counted with ``nunique()``
(reference: torchrecsys/dataset/dataset.py:30-31), which silently corrupts or
crashes on non-contiguous ids. Here every raw id (int, string, anything
hashable) is mapped to a dense contiguous row index, and predictions can be
decoded back to raw ids.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Sequence

import numpy as np


class IdEncoder:
    """Bidirectional mapping raw id -> contiguous int32 row index."""

    def __init__(self) -> None:
        self._to_index: Dict[Any, int] = {}
        self._to_raw: List[Any] = []
        self._frozen = False

    def __len__(self) -> int:
        return len(self._to_raw)

    @property
    def vocab_size(self) -> int:
        return len(self._to_raw)

    def freeze(self) -> "IdEncoder":
        self._frozen = True
        return self

    @property
    def frozen(self) -> bool:
        return self._frozen

    def thaw(self) -> "IdEncoder":
        """Re-allow vocab growth (incremental training on a cold-loaded
        store — ``RecSys.update_data`` thaws around the extension and
        re-freezes after)."""
        self._frozen = False
        return self

    def fit(self, values: Iterable[Any]) -> "IdEncoder":
        for v in values:
            if v not in self._to_index:
                if self._frozen:
                    raise KeyError(f"unknown id {v!r} (encoder is frozen)")
                self._to_index[v] = len(self._to_raw)
                self._to_raw.append(v)
        return self

    def encode(self, values: Sequence[Any]) -> np.ndarray:
        """Encode a sequence of raw ids to int32 row indices (fits new ids
        unless frozen)."""
        if not self._frozen:
            self.fit(values)
        out = np.empty(len(values), dtype=np.int32)
        to_index = self._to_index
        for i, v in enumerate(values):
            out[i] = to_index[v]
        return out

    def encode_one(self, value: Any) -> int:
        try:
            return self._to_index[value]
        except KeyError:
            sample = ", ".join(repr(v) for v in self._to_raw[:5])
            raise KeyError(
                f"unknown id {value!r}: not among the {len(self._to_raw)} raw "
                f"ids this encoder was built from (e.g. {sample}). Ids are "
                "matched by exact value and type — an int 3 does not match a "
                "string '3'."
            ) from None

    def decode(self, indices: Sequence[int]) -> List[Any]:
        to_raw = self._to_raw
        return [to_raw[int(i)] for i in indices]

    def decode_one(self, index: int) -> Any:
        return self._to_raw[int(index)]

    def __contains__(self, value: Any) -> bool:
        return value in self._to_index

    @classmethod
    def from_values(cls, values: Iterable[Any]) -> "IdEncoder":
        return cls().fit(values)

    # -- serialization (checkpointing) ----------------------------------
    def to_list(self) -> List[Any]:
        """The vocabulary in row order — sufficient to rebuild the encoder."""
        return list(self._to_raw)

    @classmethod
    def from_list(cls, raw: List[Any]) -> "IdEncoder":
        enc = cls()
        enc._to_raw = list(raw)
        enc._to_index = {v: i for i, v in enumerate(raw)}
        return enc


def encode_column(values: Sequence[Any]) -> "tuple[np.ndarray, IdEncoder]":
    """Convenience: build an encoder over ``values`` and encode them.

    Fast paths, in order: vectorized numpy for integer columns (the common
    MovieLens-style case); the native C++ string-hash encoder
    (torchrecsys_tpu/native/ingest.cpp) for string/bytes columns; the generic
    Python dict path for anything else.
    """
    arr = np.asarray(values)
    if arr.dtype.kind == "O":
        sample = next((v for v in arr[: min(len(arr), 16)] if v is not None), None)
        if isinstance(sample, str):
            try:
                arr = arr.astype("U")
            except (ValueError, TypeError):
                pass
    if arr.dtype.kind in "iu":
        uniq, inv = np.unique(arr, return_inverse=True)
        enc = IdEncoder()
        enc._to_raw = [int(u) for u in uniq]
        enc._to_index = {int(u): i for i, u in enumerate(uniq)}
        return inv.astype(np.int32), enc
    if arr.dtype.kind in "US":
        from torchrecsys_tpu import native

        out = native.encode_strings(arr)
        if out is not None:
            codes, first = out
            raw = arr[first].tolist()
            enc = IdEncoder()
            enc._to_raw = raw
            enc._to_index = {v: i for i, v in enumerate(raw)}
            return codes, enc
    enc = IdEncoder()
    return enc.encode(list(values)), enc
