// Host-side boundary codec for mi_fieldcalc_tpu.
//
// The TPU framework's compute path is JAX/Pallas; the native layer that
// remains host-work is the numpy boundary: decoding sentinel-encoded grids
// (miutil::UNDEF = 1e35, reference FieldDefined.cc:34) into (values, mask)
// pairs, re-encoding results, and computing the tri-state definedness
// summary (checkDefined, FieldDefined.cc:41-70) without shipping the array
// to the accelerator.  These scans are memory-bound; numpy needs 3-4
// passes (isnan, !=, where, sum) where one fused C++ pass suffices.
//
// Threading mirrors the reference's size-adaptive OpenMP harness
// (openmp_tools.cc:38-69): 1 thread under 1e3 points, 2 under 1e4,
// 4 under 1e5, 8 above, capped by std::thread::hardware_concurrency and
// the MF_NATIVE_THREADS env var (the reference honors OMP_NUM_THREADS).
//
// Exposed as a plain C ABI consumed via ctypes (mi_fieldcalc_tpu/native.py);
// no pybind11 dependency.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

int num_threads(int64_t loop_size) {
  // reference thresholds: openmp_tools.cc:58-65
  int n = 8;
  if (loop_size < 1000)
    n = 1;
  else if (loop_size <= 10000)
    n = 2;
  else if (loop_size <= 100000)
    n = 4;
  unsigned hw = std::thread::hardware_concurrency();
  if (hw > 0 && n > static_cast<int>(hw)) n = static_cast<int>(hw);
  if (const char* env = std::getenv("MF_NATIVE_THREADS")) {
    int cap = std::atoi(env);
    if (cap > 0 && n > cap) n = cap;
  }
  return n < 1 ? 1 : n;
}

// Run fn(begin, end) over [0, n) split across size-adaptive threads.
template <typename Fn>
void parallel_for(int64_t n, Fn&& fn) {
  int nt = num_threads(n);
  if (nt <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nt - 1);
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 1; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n ? b + chunk : n;
    if (b >= e) break;
    pool.emplace_back([&fn, b, e] { fn(b, e); });
  }
  fn(0, chunk < n ? chunk : n);
  for (auto& th : pool) th.join();
}

inline bool is_defined(float v, float undef) {
  // fieldcalc::is_defined (FieldCalculations.h:42-45)
  return !std::isnan(v) && v != undef;
}

}  // namespace

extern "C" {

int mf_native_abi_version() { return 2; }

// Decode: out[i] = defined ? v[i] : fill; mask[i] = defined.  `out` may
// alias `v` (in-place sanitize).  Returns the number of defined points.
int64_t mf_decode(const float* v, int64_t n, float undef, float fill,
                  float* out, uint8_t* mask) {
  std::atomic<int64_t> n_def{0};
  parallel_for(n, [&](int64_t b, int64_t e) {
    int64_t local = 0;
    for (int64_t i = b; i < e; ++i) {
      bool d = is_defined(v[i], undef);
      mask[i] = d ? 1 : 0;
      out[i] = d ? v[i] : fill;
      local += d;
    }
    n_def.fetch_add(local, std::memory_order_relaxed);
  });
  return n_def.load();
}

// Encode: out[i] = mask[i] ? v[i] : undef.  `out` may alias `v`.
void mf_encode(const float* v, const uint8_t* mask, int64_t n, float undef,
               float* out) {
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) out[i] = mask[i] ? v[i] : undef;
  });
}

// checkDefined(const float*, n) (FieldDefined.cc:41-57) without touching
// any output: returns the defined count for the tri-state summary.
int64_t mf_count_defined(const float* v, int64_t n, float undef) {
  std::atomic<int64_t> n_def{0};
  parallel_for(n, [&](int64_t b, int64_t e) {
    int64_t local = 0;
    for (int64_t i = b; i < e; ++i) local += is_defined(v[i], undef);
    n_def.fetch_add(local, std::memory_order_relaxed);
  });
  return n_def.load();
}

// Fused decode + canonical padded layout (ABI v2).  Reads a contiguous
// sentinel array [lead, ny, nx] and writes [lead, ny_p, nx_p] values +
// mask in one pass: logical points decode as mf_decode, dead rows/lanes
// get `fill` with mask 0, so the result device_puts straight into the
// tile-aligned production layout (mi_fieldcalc_tpu/layout.py) with no
// separate numpy pad pass.  Returns the defined count over the logical
// points only (the tri-state summary ignores padding).
int64_t mf_decode_pad(const float* v, int64_t lead, int64_t ny, int64_t nx,
                      int64_t ny_p, int64_t nx_p, float undef, float fill,
                      float* out, uint8_t* mask) {
  std::atomic<int64_t> n_def{0};
  parallel_for(lead * ny_p, [&](int64_t b, int64_t e) {
    int64_t local = 0;
    for (int64_t row = b; row < e; ++row) {
      int64_t l = row / ny_p, r = row % ny_p;
      float* ov = out + row * nx_p;
      uint8_t* om = mask + row * nx_p;
      if (r < ny) {
        const float* sv = v + (l * ny + r) * nx;
        for (int64_t i = 0; i < nx; ++i) {
          bool d = is_defined(sv[i], undef);
          om[i] = d ? 1 : 0;
          ov[i] = d ? sv[i] : fill;
          local += d;
        }
        for (int64_t i = nx; i < nx_p; ++i) { om[i] = 0; ov[i] = fill; }
      } else {
        for (int64_t i = 0; i < nx_p; ++i) { om[i] = 0; ov[i] = fill; }
      }
    }
    n_def.fetch_add(local, std::memory_order_relaxed);
  });
  return n_def.load();
}

// Trim + encode dual (ABI v2): padded device results [lead, ny_p, nx_p]
// (values + mask) back to the logical [lead, ny, nx] sentinel array in
// one pass — the host boundary for production pipelines that keep grids
// padded on device and only trim when handing arrays back to callers.
void mf_encode_trim(const float* v, const uint8_t* mask, int64_t lead,
                    int64_t ny, int64_t nx, int64_t ny_p, int64_t nx_p,
                    float undef, float* out) {
  parallel_for(lead * ny, [&](int64_t b, int64_t e) {
    for (int64_t row = b; row < e; ++row) {
      int64_t l = row / ny, r = row % ny;
      const float* sv = v + (l * ny_p + r) * nx_p;
      const uint8_t* sm = mask + (l * ny_p + r) * nx_p;
      float* ov = out + row * nx;
      for (int64_t i = 0; i < nx; ++i) ov[i] = sm[i] ? sv[i] : undef;
    }
  });
}

// Defined count over a mask array (checkDefined(n_undefined, n) dual).
int64_t mf_count_mask(const uint8_t* mask, int64_t n) {
  std::atomic<int64_t> n_def{0};
  parallel_for(n, [&](int64_t b, int64_t e) {
    int64_t local = 0;
    for (int64_t i = b; i < e; ++i) local += mask[i] != 0;
    n_def.fetch_add(local, std::memory_order_relaxed);
  });
  return n_def.load();
}

}  // extern "C"
