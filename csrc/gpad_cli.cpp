// gpad_cli: native end-to-end solver binary.
//
// Functional equivalent of the reference's main.cu (readData + fixed-budget
// device loop + timing report, Code/CUDA/FinalProject/main.cu:79-207), built
// on the host step library. Reads a problem in the reference's text dataset
// format (header "n_u N m num_iterations L" followed by M_G, g_P, G_L, p_D,
// theta, beta — main.cu:29-67; M_G stored pre-negated per the CUDA
// convention, kernel_functions.cu:62) and prints per-iteration timing.
//
// Usage: gpad_cli <input.txt> [repeat]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void gpad_solve_fixed(const float*, const float*, const float*, const float*,
                      const float*, const float*, int64_t, int64_t, int64_t,
                      float, float*, float*, float*);
}

namespace {

bool read_floats(FILE* f, float* dst, int64_t count) {
  for (int64_t i = 0; i < count; ++i)
    if (std::fscanf(f, "%f", dst + i) != 1) return false;
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <input.txt> [repeat]\n", argv[0]);
    return 2;
  }
  const int repeat = argc > 2 ? std::atoi(argv[2]) : 1;
  FILE* f = std::fopen(argv[1], "r");
  if (!f) {
    std::perror(argv[1]);
    return 1;
  }
  int64_t n_u, N, m, iters;
  float L;
  if (std::fscanf(f, "%ld %ld %ld %ld %f", &n_u, &N, &m, &iters, &L) != 5) {
    std::fprintf(stderr, "bad header\n");
    return 1;
  }
  const int64_t n_z = n_u * N;
  // File layout (main.cu:34-64): M_G (n_z x m), g_P (n_z), G_L (m x n_z),
  // p_D (m), theta (iters), beta (iters). M_G on disk is (n_z x m) row-major
  // = MG_T (m x n_z) column-major; transpose into our row-major MG_T.
  std::vector<float> MG_file(n_z * m), MG_T(m * n_z), g_P(n_z);
  std::vector<float> GL(m * n_z), GL_T(n_z * m), p_D(m);
  std::vector<float> theta(iters), beta(iters);
  bool ok = read_floats(f, MG_file.data(), n_z * m) &&
            read_floats(f, g_P.data(), n_z) &&
            read_floats(f, GL.data(), m * n_z) &&
            read_floats(f, p_D.data(), m) &&
            read_floats(f, theta.data(), iters) &&
            read_floats(f, beta.data(), iters);
  std::fclose(f);
  if (!ok) {
    std::fprintf(stderr, "truncated input\n");
    return 1;
  }
  for (int64_t j = 0; j < n_z; ++j)
    for (int64_t i = 0; i < m; ++i) MG_T[i * n_z + j] = MG_file[j * m + i];
  // G_L file layout is (m x n_z) row-major; GL_T is its transpose.
  for (int64_t i = 0; i < m; ++i)
    for (int64_t j = 0; j < n_z; ++j) GL_T[j * m + i] = GL[i * n_z + j];

  std::vector<float> z(n_z), y(m), scratch(3 * m + n_z);
  // File ships pre-negated M_G (CUDA convention) => sign = +1.
  double total_us = 0.0;
  for (int r = 0; r < repeat; ++r) {
    auto t0 = std::chrono::steady_clock::now();
    gpad_solve_fixed(MG_T.data(), GL_T.data(), g_P.data(), p_D.data(),
                     theta.data(), beta.data(), m, n_z, iters, +1.0f, z.data(),
                     y.data(), scratch.data());
    auto t1 = std::chrono::steady_clock::now();
    total_us +=
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count();
  }
  // Same report shape as main.cu:184-190.
  std::printf("dataset: n_u=%ld N=%ld m=%ld iters=%ld L=%g\n", n_u, N, m,
              iters, L);
  std::printf("u* =");
  for (int64_t j = 0; j < n_u; ++j) std::printf(" %.8f", z[j]);
  std::printf("\n");
  std::printf("avg per-iteration: %.3f us, total solve: %.3f us\n",
              total_us / repeat / iters, total_us / repeat);
  return 0;
}
