// Native host-side data-ingest kernels (C++, ctypes ABI).
//
// The reference's data pipeline is pure-Python pandas (SURVEY §2.11 — it has
// no native code anywhere), and its two host-side hot spots at production
// scale are id encoding (a Python dict loop) and metadata-list parsing
// (ast.literal_eval per cell, torchrecsys/dataset/dataset.py:190-197).
// These are the C++ replacements, operating directly on numpy buffers:
//
// - encode_u32 / encode_bytes: vocabulary build + encode over fixed-width
//   numpy 'U' (UTF-32) or 'S' (bytes) columns via an open-addressing string
//   hash map. Returns vocab size; emits int32 codes and the index of each
//   vocab entry's first occurrence (Python slices the originals to get the
//   decode table, so no strings cross the ABI).
// - parse_int_lists_u32 / parse_int_lists_bytes: "[3, 7]"-style (or bare
//   scalar "7") integer-list cells -> flat int32 values + row offsets
//   (CSR-style ragged layout).
//
// Exposed through ctypes (no pybind11 in this image); see native/__init__.py.

#include <cstdint>
#include <cstring>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

// FNV-1a over an arbitrary byte span.
struct SpanHash {
  size_t operator()(std::string_view s) const noexcept {
    size_t h = 1469598103934665603ull;
    for (unsigned char c : s) {
      h ^= c;
      h *= 1099511628211ull;
    }
    return h;
  }
};

// Generic fixed-width column encoder: rows are `width_bytes`-wide records;
// the logical value is the record with trailing zero padding stripped in
// units of `unit` bytes (4 for UTF-32, 1 for bytes).
int64_t encode_fixed(const char* data, int64_t n, int64_t width_bytes,
                     int64_t unit, int32_t* out_codes, int64_t* out_first) {
  std::unordered_map<std::string_view, int32_t, SpanHash> vocab;
  vocab.reserve(static_cast<size_t>(n) * 2);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    const char* p = data + i * width_bytes;
    int64_t len = width_bytes;
    while (len >= unit) {
      bool zero = true;
      for (int64_t b = 0; b < unit; ++b) {
        if (p[len - unit + b] != 0) { zero = false; break; }
      }
      if (!zero) break;
      len -= unit;
    }
    auto [it, inserted] = vocab.try_emplace(std::string_view(p, len), next);
    if (inserted) {
      out_first[next] = i;
      ++next;
    }
    out_codes[i] = it->second;
  }
  return next;
}

// Parse one cell's worth of integers out of [begin, end): accepts
// "[3, 7]", "(3, 7)", "3", "  [ 3 ,7 ] ", negative numbers, or empty.
// Returns count written (bounded by cap), or -1 on malformed content.
int64_t parse_cell(const char* begin, const char* end, int64_t stride,
                   int32_t* out, int64_t cap, int64_t* written) {
  int64_t count = 0;
  const char* p = begin;
  bool in_number = false;
  bool neg = false;
  int64_t val = 0;
  for (; p <= end; p += stride) {
    char c = (p == end) ? '\0' : *p;
    if (c >= '0' && c <= '9') {
      val = val * 10 + (c - '0');
      in_number = true;
    } else {
      if (in_number) {
        if (count >= cap) return -2;  // caller grows the buffer
        out[count++] = static_cast<int32_t>(neg ? -val : val);
        val = 0;
        neg = false;
        in_number = false;
      }
      if (c == '-') {
        neg = true;
      } else if (c == '[' || c == ']' || c == '(' || c == ')' || c == ',' ||
                 c == ' ' || c == '\t' || c == '\0') {
        if (c != '-') neg = false;
      } else {
        return -1;  // non-numeric content; caller falls back to Python
      }
    }
  }
  *written = count;
  return 0;
}

int64_t parse_lists_fixed(const char* data, int64_t n, int64_t width_bytes,
                          int64_t unit, int32_t* out_values, int64_t cap,
                          int64_t* out_offsets) {
  int64_t total = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const char* p = data + i * width_bytes;
    int64_t written = 0;
    int64_t rc = parse_cell(p, p + width_bytes, unit, out_values + total,
                            cap - total, &written);
    if (rc == -1) return -(i + 1);  // 1-based failing row, negated
    if (rc == -2) return INT64_MIN; // capacity exhausted
    total += written;
    out_offsets[i + 1] = total;
  }
  return total;
}

}  // namespace

extern "C" {

// UTF-32 ('U' dtype) columns: width = itemsize/4 code points.
int64_t trs_encode_u32(const char* data, int64_t n, int64_t itemsize,
                       int32_t* out_codes, int64_t* out_first) {
  return encode_fixed(data, n, itemsize, 4, out_codes, out_first);
}

// Bytes ('S' dtype) columns.
int64_t trs_encode_bytes(const char* data, int64_t n, int64_t itemsize,
                         int32_t* out_codes, int64_t* out_first) {
  return encode_fixed(data, n, itemsize, 1, out_codes, out_first);
}

int64_t trs_parse_int_lists_u32(const char* data, int64_t n, int64_t itemsize,
                                int32_t* out_values, int64_t cap,
                                int64_t* out_offsets) {
  return parse_lists_fixed(data, n, itemsize, 4, out_values, cap, out_offsets);
}

int64_t trs_parse_int_lists_bytes(const char* data, int64_t n,
                                  int64_t itemsize, int32_t* out_values,
                                  int64_t cap, int64_t* out_offsets) {
  return parse_lists_fixed(data, n, itemsize, 1, out_values, cap, out_offsets);
}

// Walker/Vose alias-table construction (data/sampling.py:alias_table).
// `scaled` is the target distribution pre-scaled to mean 1 (p_i * n); the
// classic two-stack pairing emits per-slot acceptance probabilities and
// alias indices. O(n), no allocation beyond the two index stacks — ~20x
// the pure-numpy/Python loop at million-item catalogs (one-time per store,
// but 10M-item production catalogs turn seconds into ~100 ms).
int64_t trs_alias_build(const double* scaled, int64_t n, float* out_prob,
                        int32_t* out_alias) {
  std::vector<double> w(scaled, scaled + n);
  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    out_prob[i] = 1.0f;
    out_alias[i] = static_cast<int32_t>(i);
    (w[i] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back();
    small.pop_back();
    int64_t l = large.back();
    large.pop_back();
    out_prob[s] = static_cast<float>(w[s]);
    out_alias[s] = static_cast<int32_t>(l);
    w[l] -= 1.0 - w[s];
    (w[l] < 1.0 ? small : large).push_back(l);
  }
  return 0;
}

}  // extern "C"
