// Native host-side ops for rapiddoc_tpu.
//
// The reference leans on third-party native code (onnxruntime, pdfium,
// opencv) for its hot host paths; this library provides the framework's
// own native kernels for the host-side hot loops that stay in Python
// otherwise: PNG/TIFF predictor defiltering (PDF Flate streams), pairwise
// IoU, and greedy NMS. Built with `make -C native`, loaded via ctypes
// (rapiddoc_tpu/utils/native.py), with pure-Python fallbacks.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// PNG predictor defilter (PDF 1.7 §7.4.4.4). data: rows of
// (1 filter byte + row_len bytes). out: rows of row_len bytes.
// Returns number of rows processed.
int png_defilter(const uint8_t* data, int64_t data_len, int row_len,
                 int bpp, uint8_t* out) {
  const int stride = row_len + 1;
  const int nrows = static_cast<int>(data_len / stride);
  std::vector<uint8_t> prev(row_len, 0);
  for (int r = 0; r < nrows; ++r) {
    const uint8_t* src = data + static_cast<int64_t>(r) * stride;
    uint8_t ftype = src[0];
    uint8_t* row = out + static_cast<int64_t>(r) * row_len;
    std::memcpy(row, src + 1, row_len);
    switch (ftype) {
      case 0:
        break;
      case 1:  // Sub
        for (int i = bpp; i < row_len; ++i) row[i] += row[i - bpp];
        break;
      case 2:  // Up
        for (int i = 0; i < row_len; ++i) row[i] += prev[i];
        break;
      case 3:  // Average
        for (int i = 0; i < row_len; ++i) {
          int left = i >= bpp ? row[i - bpp] : 0;
          row[i] += static_cast<uint8_t>((left + prev[i]) >> 1);
        }
        break;
      case 4:  // Paeth
        for (int i = 0; i < row_len; ++i) {
          int a = i >= bpp ? row[i - bpp] : 0;
          int b = prev[i];
          int c = i >= bpp ? prev[i - bpp] : 0;
          int p = a + b - c;
          int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          row[i] += static_cast<uint8_t>(pred);
        }
        break;
      default:
        break;
    }
    std::memcpy(prev.data(), row, row_len);
  }
  return nrows;
}

// TIFF predictor 2 (horizontal differencing), 8-bit components, in place.
void tiff_defilter(uint8_t* data, int64_t data_len, int row_len, int bpp) {
  for (int64_t r = 0; r + row_len <= data_len; r += row_len) {
    uint8_t* row = data + r;
    for (int i = bpp; i < row_len; ++i) row[i] += row[i - bpp];
  }
}

// Pairwise IoU: a (n x 4), b (m x 4) xyxy -> out (n x m).
void iou_matrix(const double* a, int n, const double* b, int m, double* out) {
  for (int i = 0; i < n; ++i) {
    const double ax0 = a[i * 4], ay0 = a[i * 4 + 1];
    const double ax1 = a[i * 4 + 2], ay1 = a[i * 4 + 3];
    const double area_a =
        std::max(0.0, ax1 - ax0) * std::max(0.0, ay1 - ay0);
    for (int j = 0; j < m; ++j) {
      const double bx0 = b[j * 4], by0 = b[j * 4 + 1];
      const double bx1 = b[j * 4 + 2], by1 = b[j * 4 + 3];
      const double ix = std::min(ax1, bx1) - std::max(ax0, bx0);
      const double iy = std::min(ay1, by1) - std::max(ay0, by0);
      const double inter = std::max(0.0, ix) * std::max(0.0, iy);
      const double area_b =
          std::max(0.0, bx1 - bx0) * std::max(0.0, by1 - by0);
      const double uni = area_a + area_b - inter;
      out[static_cast<int64_t>(i) * m + j] = uni > 0 ? inter / uni : 0.0;
    }
  }
}

// Greedy NMS. boxes (n x 4), scores (n). keep: output indices (caller
// allocates n ints). Returns kept count.
int nms(const double* boxes, const double* scores, int n,
        double iou_threshold, int* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int x, int y) { return scores[x] > scores[y]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[kept++] = i;
    const double ax0 = boxes[i * 4], ay0 = boxes[i * 4 + 1];
    const double ax1 = boxes[i * 4 + 2], ay1 = boxes[i * 4 + 3];
    const double area_a =
        std::max(0.0, ax1 - ax0) * std::max(0.0, ay1 - ay0);
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const double bx0 = boxes[j * 4], by0 = boxes[j * 4 + 1];
      const double bx1 = boxes[j * 4 + 2], by1 = boxes[j * 4 + 3];
      const double ix = std::min(ax1, bx1) - std::max(ax0, bx0);
      const double iy = std::min(ay1, by1) - std::max(ay0, by0);
      const double inter = std::max(0.0, ix) * std::max(0.0, iy);
      const double area_b =
          std::max(0.0, bx1 - bx0) * std::max(0.0, by1 - by0);
      const double uni = area_a + area_b - inter;
      if (uni > 0 && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// Levenshtein distance over uint32 code points (unicode-safe).
// Used by the TEDS metric and the quality-eval harness, where cell/body
// texts make the O(n*m) DP the hot loop.
int64_t levenshtein_u32(const uint32_t* a, int64_t na,
                        const uint32_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

}  // extern "C"
