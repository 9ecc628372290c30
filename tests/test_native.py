"""Native C++ ingest kernel tests: equivalence with the pure-Python paths."""

import numpy as np
import pytest

from torchrecsys_tpu import native
from torchrecsys_tpu.data.encoder import IdEncoder, encode_column
from torchrecsys_tpu.data.metadata import MetadataTable, _cells_to_lists

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest library unavailable (no g++)"
)


class TestEncodeStrings:
    def test_matches_python_dict_encoder(self):
        r = np.random.default_rng(0)
        raw = [f"user_{i}" for i in r.integers(0, 500, 5000)]
        codes_native, enc_native = encode_column(np.asarray(raw, dtype="U"))
        enc_py = IdEncoder()
        codes_py = enc_py.encode(raw)
        # same partition into ids (first-occurrence order must match too)
        np.testing.assert_array_equal(codes_native, codes_py)
        assert enc_native._to_raw == enc_py._to_raw

    def test_bytes_dtype(self):
        arr = np.asarray([b"a", b"bb", b"a", b"ccc"], dtype="S")
        out = native.encode_strings(arr)
        assert out is not None
        codes, first = out
        np.testing.assert_array_equal(codes, [0, 1, 0, 2])
        np.testing.assert_array_equal(first, [0, 1, 3])

    def test_unicode_values(self):
        arr = np.asarray(["café", "λ", "café"], dtype="U")
        out = native.encode_strings(arr)
        assert out is not None
        codes, first = out
        np.testing.assert_array_equal(codes, [0, 1, 0])

    def test_object_column_routes_to_native(self):
        codes, enc = encode_column(np.asarray(["x", "y", "x"], dtype=object))
        np.testing.assert_array_equal(codes, [0, 1, 0])
        assert enc.decode([0, 1]) == ["x", "y"]


class TestParseIntLists:
    def test_matches_python_parser(self):
        cells = ["[3, 7]", "[1]", "[]", "12", "[5,6,7]", "[-2, 0]"]
        arr = np.asarray(cells, dtype="U")
        out = native.parse_int_lists(arr)
        assert out is not None
        values, offsets = out
        got = [values[offsets[i] : offsets[i + 1]].tolist() for i in range(len(cells))]
        assert got == [[3, 7], [1], [], [12], [5, 6, 7], [-2, 0]]

    def test_malformed_falls_back(self):
        arr = np.asarray(["[3, 7]", "banana"], dtype="U")
        assert native.parse_int_lists(arr) is None
        # and the high-level path still works via Python parsing
        lists, enc = _cells_to_lists(arr)
        assert len(lists) == 2

    def test_cells_to_lists_native_equals_python(self):
        cells = [f"[{i % 9}, {i % 4}]" for i in range(2000)]
        lists_nat, enc_nat = _cells_to_lists(np.asarray(cells, dtype="U"))
        lists_py, enc_py = _cells_to_lists(np.asarray(cells, dtype=object).astype(object))
        # same decoded raw values per row
        decoded_nat = [[enc_nat.decode_one(v) for v in row] for row in lists_nat]
        decoded_py = [[enc_py.decode_one(v) for v in row] for row in lists_py]
        assert decoded_nat == decoded_py

    def test_metadata_table_with_string_column(self):
        items = np.asarray([0, 1, 2, 0, 1], np.int32)
        col = np.asarray(["[1, 2]", "[3]", "7", "[9, 9]", "[0]"], dtype="U")
        # first occurrence wins: item0 -> [1,2], item1 -> [3], item2 -> [7]
        t = MetadataTable.build(items, 3, {"cat": col})
        decoded = [
            [t.encoders[0].decode_one(v) for v, m in zip(t.ids[i, 0], t.mask[i, 0]) if m]
            for i in range(3)
        ]
        assert decoded == [[1, 2], [3], [7]]


def test_string_ids_end_to_end():
    """RecSys with string user/item ids exercises the native encoder."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from torchrecsys_tpu import RecSys

    r = np.random.default_rng(0)
    data = {
        "user_id": np.asarray([f"u{v}" for v in r.integers(0, 50, 2000)], dtype="U"),
        "item_id": np.asarray([f"i{v}" for v in r.integers(0, 30, 2000)], dtype="U"),
    }
    rs = RecSys(data, item_id_col="item_id", n_factors=8)
    rs.fit(epochs=1, batch_size=256, verbose=False)
    top = rs.predict(user_id="u3", top_k=5)
    assert all(t.startswith("i") for t in top.tolist())


def test_alias_build_matches_python_loop():
    """C++ Vose (trs_alias_build) encodes the same per-item mass as the
    Python loop fallback (the PAIRINGS may differ — stack orders differ —
    but the distribution both tables encode must be identical)."""
    from torchrecsys_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    r = np.random.default_rng(3)
    n = 257
    counts = r.integers(0, 50, n).astype(np.float64)
    counts[5] = 0.0  # a zero-mass item
    w = counts**0.75
    scaled = w / w.sum() * n

    prob_c, alias_c = native.alias_build(scaled.copy())

    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int64)
    sc = scaled.copy()
    small = [i for i in range(n) if sc[i] < 1.0]
    large = [i for i in range(n) if sc[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = sc[s]
        alias[s] = l
        sc[l] -= 1.0 - sc[s]
        (small if sc[l] < 1.0 else large).append(l)

    def mass(p, a):
        m = p.astype(np.float64).copy()
        np.add.at(m, a, 1.0 - p.astype(np.float64))
        return m / n

    np.testing.assert_allclose(mass(prob_c, alias_c), mass(prob, alias), atol=1e-6)
    np.testing.assert_allclose(mass(prob_c, alias_c), w / w.sum(), atol=1e-6)
    assert mass(prob_c, alias_c)[5] < 1e-12
