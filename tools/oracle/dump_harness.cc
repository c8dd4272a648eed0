// dump_harness.cc — test oracle harness around the *reference* WaveRange
// library (linked from objects compiled out of /root/reference; no reference
// source is vendored here). Used only by the golden tests to produce
// bit-exact expected outputs for waveletcdf97_3d / encoding_wrap /
// decoding_wrap / ind_p2w_3d.
//
// Usage:
//   dump_harness wavelet  <nx> <ny> <nz> <lvl> <in.f64> <out.f64>
//   dump_harness encode   <nx> <ny> <nz> <wtflag> <tolrel> <in.f64> <out.bin>
//   dump_harness decode   <nx> <ny> <nz> <in.bin> <out.f64>
//   dump_harness p2w      <lvl> <nx> <ny> <nz> <i1> <i2> <i3>
//
// encode out.bin layout (little-endian, this harness's own format):
//   f64 tolabs, midval, halfspanval; u8 wlev, nlay; u64 ntot_enc;
//   f64 deps_vec[8]; f64 minval_vec[8]; u64 len_enc_vec[8];
//   u8 data_enc[ntot_enc]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void waveletcdf97_3d(int, int, int, int, double*);
void ind_p2w_3d(int, int, int, int, int, int, int, int*, int*, int*, int*);
void encoding_wrap(int nx, int ny, int nz, double* fld_1d, int wtflag, int mx,
                   int my, int mz, double* cutoffvec, double& tolabs,
                   double& midval, double& halfspanval, unsigned char& wlev,
                   unsigned char& nlay, unsigned long int& ntot_enc,
                   double* deps_vec, double* minval_vec,
                   unsigned long int* len_enc_vec, unsigned char* data_enc);
void decoding_wrap(int nx, int ny, int nz, double* fld_1d, double& tolabs,
                   double& midval, double& halfspanval, unsigned char& wlev,
                   unsigned char& nlay, unsigned long int& ntot_enc,
                   double* deps_vec, double* minval_vec,
                   unsigned long int* len_enc_vec, unsigned char* data_enc);
}

static std::vector<char> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) { perror("read"); exit(2); }
  fclose(f);
  return buf;
}

static void spit(const char* path, const void* data, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { perror(path); exit(2); }
  fwrite(data, 1, n, f);
  fclose(f);
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: see header\n"); return 1; }
  std::string mode = argv[1];

  if (mode == "wavelet") {
    int nx = atoi(argv[2]), ny = atoi(argv[3]), nz = atoi(argv[4]);
    int lvl = atoi(argv[5]);
    auto buf = slurp(argv[6]);
    waveletcdf97_3d(nx, ny, nz, lvl, (double*)buf.data());
    spit(argv[7], buf.data(), buf.size());
    return 0;
  }

  if (mode == "p2w") {
    int lvl = atoi(argv[2]);
    int nx = atoi(argv[3]), ny = atoi(argv[4]), nz = atoi(argv[5]);
    int i1 = atoi(argv[6]), i2 = atoi(argv[7]), i3 = atoi(argv[8]);
    int l, o1, o2, o3;
    ind_p2w_3d(lvl, nx, ny, nz, i1, i2, i3, &l, &o1, &o2, &o3);
    printf("%d %d %d %d\n", l, o1, o2, o3);
    return 0;
  }

  if (mode == "encode") {
    int nx = atoi(argv[2]), ny = atoi(argv[3]), nz = atoi(argv[4]);
    int wtflag = atoi(argv[5]);
    double tolrel = atof(argv[6]);
    auto buf = slurp(argv[7]);
    unsigned long ntot = (unsigned long)nx * ny * nz;
    double cutoff[1] = {tolrel};
    double tolabs, midval, halfspanval;
    unsigned char wlev, nlay;
    unsigned long ntot_enc;
    double deps_vec[8] = {0}, minval_vec[8] = {0};
    unsigned long len_enc_vec[8] = {0};
    std::vector<unsigned char> data_enc(8UL * (ntot < 1024 ? 1024 : ntot));
    encoding_wrap(nx, ny, nz, (double*)buf.data(), wtflag, 1, 1, 1, cutoff,
                  tolabs, midval, halfspanval, wlev, nlay, ntot_enc, deps_vec,
                  minval_vec, len_enc_vec, data_enc.data());
    FILE* f = fopen(argv[8], "wb");
    fwrite(&tolabs, 8, 1, f);
    fwrite(&midval, 8, 1, f);
    fwrite(&halfspanval, 8, 1, f);
    fwrite(&wlev, 1, 1, f);
    fwrite(&nlay, 1, 1, f);
    uint64_t ne = ntot_enc;
    fwrite(&ne, 8, 1, f);
    fwrite(deps_vec, 8, 8, f);
    fwrite(minval_vec, 8, 8, f);
    uint64_t lev[8];
    for (int i = 0; i < 8; i++) lev[i] = len_enc_vec[i];
    fwrite(lev, 8, 8, f);
    fwrite(data_enc.data(), 1, ntot_enc, f);
    fclose(f);
    return 0;
  }

  if (mode == "encodem") {
    // encode with a non-uniform (mx,my,mz) cutoff grid: cutoffs follow
    // as argv values after the input path
    int nx = atoi(argv[2]), ny = atoi(argv[3]), nz = atoi(argv[4]);
    int wtflag = atoi(argv[5]);
    int mx = atoi(argv[6]), my = atoi(argv[7]), mz = atoi(argv[8]);
    auto buf = slurp(argv[9]);
    int mtot = mx * my * mz;
    std::vector<double> cutoff(mtot);
    for (int k = 0; k < mtot; k++) cutoff[k] = atof(argv[11 + k]);
    unsigned long ntot = (unsigned long)nx * ny * nz;
    double tolabs, midval, halfspanval;
    unsigned char wlev, nlay;
    unsigned long ntot_enc;
    double deps_vec[8] = {0}, minval_vec[8] = {0};
    unsigned long len_enc_vec[8] = {0};
    std::vector<unsigned char> data_enc(8UL * (ntot < 1024 ? 1024 : ntot));
    encoding_wrap(nx, ny, nz, (double*)buf.data(), wtflag, mx, my, mz,
                  cutoff.data(), tolabs, midval, halfspanval, wlev, nlay,
                  ntot_enc, deps_vec, minval_vec, len_enc_vec,
                  data_enc.data());
    FILE* f = fopen(argv[10], "wb");
    fwrite(&tolabs, 8, 1, f);
    fwrite(&midval, 8, 1, f);
    fwrite(&halfspanval, 8, 1, f);
    fwrite(&wlev, 1, 1, f);
    fwrite(&nlay, 1, 1, f);
    uint64_t ne = ntot_enc;
    fwrite(&ne, 8, 1, f);
    fwrite(deps_vec, 8, 8, f);
    fwrite(minval_vec, 8, 8, f);
    uint64_t lev[8];
    for (int i = 0; i < 8; i++) lev[i] = len_enc_vec[i];
    fwrite(lev, 8, 8, f);
    fwrite(data_enc.data(), 1, ntot_enc, f);
    fclose(f);
    return 0;
  }

  if (mode == "decode") {
    int nx = atoi(argv[2]), ny = atoi(argv[3]), nz = atoi(argv[4]);
    auto buf = slurp(argv[5]);
    const char* p = buf.data();
    double tolabs, midval, halfspanval;
    unsigned char wlev, nlay;
    uint64_t ne;
    double deps_vec[8], minval_vec[8];
    uint64_t lev[8];
    memcpy(&tolabs, p, 8); p += 8;
    memcpy(&midval, p, 8); p += 8;
    memcpy(&halfspanval, p, 8); p += 8;
    memcpy(&wlev, p, 1); p += 1;
    memcpy(&nlay, p, 1); p += 1;
    memcpy(&ne, p, 8); p += 8;
    memcpy(deps_vec, p, 64); p += 64;
    memcpy(minval_vec, p, 64); p += 64;
    memcpy(lev, p, 64); p += 64;
    unsigned long ntot = (unsigned long)nx * ny * nz;
    std::vector<unsigned char> data_enc((char*)p, (char*)p + ne);
    std::vector<double> fld(ntot);
    unsigned long ntot_enc = ne;
    unsigned long len_enc_vec[8];
    for (int i = 0; i < 8; i++) len_enc_vec[i] = lev[i];
    decoding_wrap(nx, ny, nz, fld.data(), tolabs, midval, halfspanval, wlev,
                  nlay, ntot_enc, deps_vec, minval_vec, len_enc_vec,
                  data_enc.data());
    spit(argv[6], fld.data(), ntot * 8);
    return 0;
  }

  fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 1;
}
