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
  int bad = rc[0] + rc[1] + rc[2] + rc[3];
  printf(bad ? "FAIL %d %d %d %d\n" : "PASS\n", rc[0], rc[1], rc[2],
         rc[3]);
  return bad ? 1 : 0;
}
