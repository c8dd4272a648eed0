// ThreadSanitizer driver: exercises the threaded codec paths
// (quantize/coder slot pipeline, BufPool recycling, batch coders) under
// -fsanitize=thread. Two fields encode concurrently from caller
// threads while each encode runs its own worker pool.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {
uint64_t wrn_encode_field_nc(const double*, uint64_t, uint64_t, uint64_t,
                             int, int, int, int, const double*, double*,
                             double*, double*, uint8_t*, uint8_t*,
                             double*, double*, uint64_t*, uint8_t*, int);
void wrn_decode_field(double*, uint64_t, uint64_t, uint64_t, double,
                      uint8_t, uint8_t, uint64_t, const double*,
                      const double*, const uint64_t*, const uint8_t*,
                      int);
}

static int run_one(int seed, int coder) {
  const uint64_t N = 40;
  const uint64_t n = N * N * N;
  std::vector<double> fld(n);
  for (uint64_t k = 0; k < n; ++k)
    fld[k] = 10.0 * std::sin((double)(k % 97) / 9.7 + seed) *
             std::cos((double)(k / 97) / 31.0);
  double cutoff[1] = {1e-12};
  double tolabs, midval, halfspan;
  uint8_t wlev, nlay;
  std::vector<double> deps(8), minv(8);
  std::vector<uint64_t> lens(8);
  std::vector<uint8_t> data(8 * n);
  uint64_t ntot = wrn_encode_field_nc(
      fld.data(), N, N, N, 1, 1, 1, 1, cutoff, &tolabs, &midval,
      &halfspan, &wlev, &nlay, deps.data(), minv.data(), lens.data(),
      data.data(), coder);
  if (!ntot || !nlay) return 1;
  std::vector<double> rec(n);
  wrn_decode_field(rec.data(), N, N, N, midval, wlev, nlay, ntot,
                   deps.data(), minv.data(), lens.data(), data.data(),
                   coder);
  double mx = 0, err = 0;
  for (uint64_t k = 0; k < n; ++k) {
    mx = std::fabs(fld[k]) > mx ? std::fabs(fld[k]) : mx;
    double d = std::fabs(rec[k] - fld[k]);
    err = d > err ? d : err;
  }
  return err <= 1.3e-12 * mx ? 0 : 2;
}

// Corruption fuzz: decoders guarantee no crash / no out-of-bounds on
// arbitrary input (garbage output is fine — decode_plane's
// no-integrity-check contract). Byte flips + truncations under the
// sanitizer pin that promise.
static uint32_t xs = 0x12345u;
static uint32_t xrand() {
  xs ^= xs << 13;
  xs ^= xs >> 17;
  xs ^= xs << 5;
  return xs;
}

static void fuzz_decode(int coder) {
  const uint64_t N = 24;
  const uint64_t n = N * N * N;
  std::vector<double> fld(n);
  for (uint64_t k = 0; k < n; ++k)
    fld[k] = std::sin((double)k / 7.0) + 0.3 * std::cos((double)k / 3.1);
  double cutoff[1] = {1e-6};
  double tolabs, midval, halfspan;
  uint8_t wlev, nlay;
  std::vector<double> deps(8), minv(8);
  std::vector<uint64_t> lens(8);
  std::vector<uint8_t> data(8 * std::max<uint64_t>(n, 1024));
  uint64_t ntot = wrn_encode_field_nc(
      fld.data(), N, N, N, 1, 1, 1, 1, cutoff, &tolabs, &midval,
      &halfspan, &wlev, &nlay, deps.data(), minv.data(), lens.data(),
      data.data(), coder);
  std::vector<double> rec(n);
  for (int trial = 0; trial < 40; ++trial) {
    std::vector<uint8_t> corrupt(data.begin(), data.begin() + ntot);
    int flips = 1 + (xrand() % 16);
    for (int f = 0; f < flips; ++f)
      corrupt[xrand() % ntot] ^= (uint8_t)(1u << (xrand() % 8));
    // occasional truncation: zero the tail (lens stay as-is — the
    // decoder must tolerate streams shorter than advertised)
    if (trial % 5 == 4) {
      uint64_t cut = ntot / 2 + (xrand() % (ntot / 2));
      corrupt.resize(cut);
      corrupt.resize(ntot, 0);
    }
    wrn_decode_field(rec.data(), N, N, N, midval, wlev, nlay, ntot,
                     deps.data(), minv.data(), lens.data(),
                     corrupt.data(), coder);
  }
}

int main() {
  int rc[4] = {0, 0, 0, 0};
  // concurrent encodes from caller threads x both coders: exercises
  // BufPool's shared free-list and each encode's internal worker pool
  std::thread t0([&] { rc[0] = run_one(1, 0); });
  std::thread t1([&] { rc[1] = run_one(2, 1); });
  rc[2] = run_one(3, 0);
  t0.join();
  t1.join();
  rc[3] = run_one(4, 1);
  fuzz_decode(0);
  fuzz_decode(1);
  int bad = rc[0] + rc[1] + rc[2] + rc[3];
  printf(bad ? "FAIL %d %d %d %d\n" : "PASS\n", rc[0], rc[1], rc[2],
         rc[3]);
  return bad ? 1 : 0;
}
