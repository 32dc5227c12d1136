// Native IO kernels for pygemma_tpu, exposed through a C ABI for ctypes.
//
// Role parity with the reference's native IO layer:
//   * decode_bed: multithreaded PLINK .bed 2-bit decoder (the reference uses
//     pysnptools for this, experiments/wtccc/run_pygemma.py:381-400).
//   * read_filtered_matrix: stream a huge whitespace-separated ASCII matrix
//     keeping only rows/cols in a sampled index set, without materializing
//     the rest -- the design point of the reference's Rcpp matrix_reader
//     (experiments/benchmarks/matrix_reader.cpp:29-101), rebuilt for the
//     C ABI with O(1) memory per line.
//
// Build: see pygemma_tpu/native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// Decode selected SNP columns of a .bed file into a float32 (n, p_sel)
// sample-major matrix.  snp_idx holds p_sel indices into the SNP-major file.
// Returns 0 on success.
int pygemma_decode_bed(const char* path,
                       int64_t n_samples,
                       int64_t bytes_per_snp,
                       const int64_t* snp_idx,
                       int64_t p_sel,
                       int count_a1,
                       int n_threads,
                       float* out /* (n_samples, p_sel), row-major */) {
  FILE* probe = fopen(path, "rb");
  if (!probe) return 1;
  fclose(probe);

  // 256 -> 4 dosage lookup table, built once.
  static thread_local float table_a1[256][4];
  float table[256][4];
  const float nanv = std::nanf("");
  for (int byte = 0; byte < 256; ++byte) {
    for (int k = 0; k < 4; ++k) {
      int code = (byte >> (2 * k)) & 0b11;
      float v;
      switch (code) {
        case 0b00: v = count_a1 ? 2.0f : 0.0f; break;
        case 0b01: v = nanv; break;
        case 0b10: v = 1.0f; break;
        default:   v = count_a1 ? 0.0f : 2.0f; break;
      }
      table[byte][k] = v;
    }
  }
  (void)table_a1;

  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = (int)std::min<int64_t>(n_threads, std::max<int64_t>(1, p_sel));

  std::vector<std::thread> workers;
  std::vector<int> errs(n_threads, 0);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      FILE* f = fopen(path, "rb");
      if (!f) { errs[t] = 1; return; }
      std::vector<uint8_t> buf(bytes_per_snp);
      for (int64_t j = t; j < p_sel; j += n_threads) {
        int64_t off = 3 + snp_idx[j] * bytes_per_snp;
        if (fseek(f, (long)off, SEEK_SET) != 0) { errs[t] = 2; break; }
        if (fread(buf.data(), 1, bytes_per_snp, f) != (size_t)bytes_per_snp) {
          errs[t] = 3; break;
        }
        for (int64_t i = 0; i < n_samples; ++i) {
          uint8_t byte = buf[i >> 2];
          out[i * p_sel + j] = table[byte][i & 3];
        }
      }
      fclose(f);
    });
  }
  for (auto& w : workers) w.join();
  for (int e : errs) if (e) return e;
  return 0;
}

// Stream a whitespace-separated ASCII matrix, keeping only entries whose row
// AND column index appear in idx (sorted ascending).  out is (k, k)
// row-major where k = n_idx.  Never materializes a full row beyond one
// line's worth of text scanning.  Returns 0 on success.
int pygemma_read_filtered_matrix(const char* path,
                                 const int64_t* idx,
                                 int64_t n_idx,
                                 float* out /* (n_idx, n_idx) */) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  std::vector<int64_t> wanted(idx, idx + n_idx);  // sorted ascending assumed
  int64_t row = 0;        // current matrix row
  int64_t wrow = 0;       // next wanted-row cursor
  const size_t CHUNK = 1 << 20;
  std::vector<char> buf(CHUNK + 1);
  std::string carry;      // partial line across chunk boundaries

  auto process_line = [&](const char* line, size_t len) {
    if (wrow < n_idx && row == wanted[wrow]) {
      // scan columns, picking only wanted ones
      int64_t col = 0, wcol = 0;
      const char* p = line;
      const char* end = line + len;
      while (p < end && wcol < n_idx) {
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p >= end) break;
        if (col == wanted[wcol]) {
          out[wrow * n_idx + wcol] = strtof(p, nullptr);
          ++wcol;
        }
        while (p < end && *p != ' ' && *p != '\t') ++p;
        ++col;
      }
      ++wrow;
    }
    ++row;
  };

  size_t got;
  while ((got = fread(buf.data(), 1, CHUNK, f)) > 0) {
    size_t start = 0;
    for (size_t i = 0; i < got; ++i) {
      if (buf[i] == '\n') {
        if (!carry.empty()) {
          carry.append(&buf[start], i - start);
          process_line(carry.data(), carry.size());
          carry.clear();
        } else {
          process_line(&buf[start], i - start);
        }
        start = i + 1;
        if (wrow >= n_idx) { fclose(f); return 0; }
      }
    }
    carry.append(&buf[start], got - start);
  }
  if (!carry.empty()) process_line(carry.data(), carry.size());
  fclose(f);
  return (wrow == n_idx) ? 0 : 4;
}

}  // extern "C"
