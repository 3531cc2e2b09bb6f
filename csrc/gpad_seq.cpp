// Native sequential GPAD step library.
//
// Functional equivalent of the reference's CPU baseline
// (Code/CUDA/FinalProject/src/seq_functions.cpp — StepOne..StepFour dense
// variants) rebuilt for this framework: float32, row-major, canonical
// (MATLAB/paper) sign convention zhat = -M_G w - g_P, plus a full
// fixed-budget solve loop (acceldualgrad.m:39-64) and a paired half-stack
// solve matching the TPU solver's layout. Exposed with C linkage for ctypes.
//
// Role in the oracle hierarchy (SURVEY.md section 4): the fast host-side
// ground truth for parity tests and the CPU baseline the benchmark's
// vs_baseline speedup is measured against.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Step 1 (SAXPY): w = y + beta * (y - y_prev)
void gpad_step1(const float* y, const float* y_prev, float beta, float* w,
                int64_t m) {
  for (int64_t i = 0; i < m; ++i) w[i] = y[i] + beta * (y[i] - y_prev[i]);
}

// Step 2 (MVP): zhat = sign * (M_G^T w) - g_P, with M_G stored as MG_T
// (m x n_z, row-major): zhat[j] = sign * sum_i w[i] * MG_T[i, j] - g_P[j].
// sign = -1 for the canonical convention, +1 for the reference CUDA
// convention against a pre-negated matrix (kernel_functions.cu:62).
void gpad_step2(const float* MG_T, const float* w, const float* g_P,
                float* zhat, int64_t m, int64_t n_z, float sign) {
  for (int64_t j = 0; j < n_z; ++j) zhat[j] = 0.0f;
  for (int64_t i = 0; i < m; ++i) {
    const float wi = w[i];
    const float* row = MG_T + i * n_z;
    for (int64_t j = 0; j < n_z; ++j) zhat[j] += wi * row[j];
  }
  for (int64_t j = 0; j < n_z; ++j) zhat[j] = sign * zhat[j] - g_P[j];
}

// Step 3: z = (1 - theta) z + theta zhat
void gpad_step3(float* z, const float* zhat, float theta, int64_t n_z) {
  for (int64_t j = 0; j < n_z; ++j)
    z[j] = (1.0f - theta) * z[j] + theta * zhat[j];
}

// Step 4 (MVP + projection): y_next = max(w + GL_T^T zhat + p_D, 0) with
// GL_T stored (n_z x m, row-major): y_next[i] = max(w[i] + sum_j zhat[j] *
// GL_T[j, i] + p_D[i], 0). Branchless like kernel_functions.cu:195.
void gpad_step4(const float* GL_T, const float* w, const float* p_D,
                const float* zhat, float* y_next, int64_t m, int64_t n_z) {
  for (int64_t i = 0; i < m; ++i) y_next[i] = w[i] + p_D[i];
  for (int64_t j = 0; j < n_z; ++j) {
    const float zj = zhat[j];
    const float* row = GL_T + j * m;
    for (int64_t i = 0; i < m; ++i) y_next[i] += zj * row[i];
  }
  for (int64_t i = 0; i < m; ++i)
    y_next[i] = 0.5f * (y_next[i] + std::abs(y_next[i]));
}

// Full fixed-budget GPAD solve (acceldualgrad.m:39-64 / main.cu:160-175).
// Outputs the final primal iterate z (n_z) and dual iterate y (m).
// Workspaces are allocated on the stack of the caller via the out buffers:
// scratch must hold 3*m + n_z floats (y, y_prev, w | zhat).
void gpad_solve_fixed(const float* MG_T, const float* GL_T, const float* g_P,
                      const float* p_D, const float* theta, const float* beta,
                      int64_t m, int64_t n_z, int64_t iterations, float sign,
                      float* z_out, float* y_out, float* scratch) {
  float* y = scratch;
  float* y_prev = scratch + m;
  float* w = scratch + 2 * m;
  float* zhat = scratch + 3 * m;
  std::memset(y, 0, sizeof(float) * m);
  std::memset(y_prev, 0, sizeof(float) * m);
  std::memset(z_out, 0, sizeof(float) * n_z);
  for (int64_t k = 0; k < iterations; ++k) {
    gpad_step1(y, y_prev, beta[k], w, m);
    gpad_step2(MG_T, w, g_P, zhat, m, n_z, sign);
    gpad_step3(z_out, zhat, theta[k], n_z);
    // register shift BEFORE y is overwritten (acceldualgrad.m:59-64)
    std::memcpy(y_prev, y, sizeof(float) * m);
    gpad_step4(GL_T, w, p_D, zhat, y, m, n_z);
  }
  std::memcpy(y_out, y, sizeof(float) * m);
}

// Paired half-stack solve (the TPU solver's layout, GPADData docs):
// MG_T is (m_h x n_z), GL_T is (n_z x m_h), p_D is (2 x m_h) [plus; minus],
// y/w are (2 x m_h). Step 2 contracts (w+ - w-); step 4 computes
// q = GL_T^T zhat once and projects both sign applications.
// scratch must hold 6*m_h + n_z + m_h floats.
void gpad_solve_fixed_paired(const float* MG_T, const float* GL_T,
                             const float* g_P, const float* p_D,
                             const float* theta, const float* beta,
                             int64_t m_h, int64_t n_z, int64_t iterations,
                             float* z_out, float* y_out, float* scratch) {
  float* y = scratch;              // (2, m_h)
  float* y_prev = scratch + 2 * m_h;
  float* w = scratch + 4 * m_h;    // (2, m_h)
  float* zhat = scratch + 6 * m_h; // (n_z)
  float* wd = scratch + 6 * m_h + n_z;  // (m_h)
  std::memset(y, 0, sizeof(float) * 2 * m_h);
  std::memset(y_prev, 0, sizeof(float) * 2 * m_h);
  std::memset(z_out, 0, sizeof(float) * n_z);
  for (int64_t k = 0; k < iterations; ++k) {
    gpad_step1(y, y_prev, beta[k], w, 2 * m_h);
    for (int64_t i = 0; i < m_h; ++i) wd[i] = w[i] - w[m_h + i];
    gpad_step2(MG_T, wd, g_P, zhat, m_h, n_z, -1.0f);
    gpad_step3(z_out, zhat, theta[k], n_z);
    std::memcpy(y_prev, y, sizeof(float) * 2 * m_h);
    // q = GL_T^T zhat, applied with both signs
    for (int64_t i = 0; i < m_h; ++i) {
      float q = 0.0f;
      for (int64_t j = 0; j < n_z; ++j) q += zhat[j] * GL_T[j * m_h + i];
      const float vp = w[i] + q + p_D[i];
      const float vm = w[m_h + i] - q + p_D[m_h + i];
      y[i] = 0.5f * (vp + std::abs(vp));
      y[m_h + i] = 0.5f * (vm + std::abs(vm));
    }
  }
  std::memcpy(y_out, y, sizeof(float) * 2 * m_h);
}

// Flat paired solve: the structure-exploiting variant (the reference's
// flat kernels, seq_functions.cpp:5-43 / kernel_functions.cu:74-109, done
// for THIS framework's flat layout). Half-stack rows are ordered
// [struct (n_s) | input-box (n_z)] with the box rows EXACTLY the identity
// (GPADData.n_struct): step 4's box rows cost w +- zhat/L + p_D with no
// matmul, and only the (n_z x n_s) structured block multiplies.
// GLs_T is GL_T's structured columns, (n_z x n_s) row-major.
// scratch layout identical to gpad_solve_fixed_paired (m_h = n_s + n_z).
void gpad_solve_fixed_paired_flat(const float* MG_T, const float* GLs_T,
                                  const float* g_P, const float* p_D,
                                  const float* theta, const float* beta,
                                  float inv_L, int64_t n_s, int64_t n_z,
                                  int64_t iterations, float* z_out,
                                  float* y_out, float* scratch) {
  const int64_t m_h = n_s + n_z;
  float* y = scratch;              // (2, m_h)
  float* y_prev = scratch + 2 * m_h;
  float* w = scratch + 4 * m_h;    // (2, m_h)
  float* zhat = scratch + 6 * m_h; // (n_z)
  float* wd = scratch + 6 * m_h + n_z;  // (m_h)
  std::memset(y, 0, sizeof(float) * 2 * m_h);
  std::memset(y_prev, 0, sizeof(float) * 2 * m_h);
  std::memset(z_out, 0, sizeof(float) * n_z);
  for (int64_t k = 0; k < iterations; ++k) {
    gpad_step1(y, y_prev, beta[k], w, 2 * m_h);
    for (int64_t i = 0; i < m_h; ++i) wd[i] = w[i] - w[m_h + i];
    gpad_step2(MG_T, wd, g_P, zhat, m_h, n_z, -1.0f);
    gpad_step3(z_out, zhat, theta[k], n_z);
    std::memcpy(y_prev, y, sizeof(float) * 2 * m_h);
    // structured rows: the only matmul of step 4
    for (int64_t i = 0; i < n_s; ++i) {
      float q = 0.0f;
      for (int64_t j = 0; j < n_z; ++j) q += zhat[j] * GLs_T[j * n_s + i];
      const float vp = w[i] + q + p_D[i];
      const float vm = w[m_h + i] - q + p_D[m_h + i];
      y[i] = 0.5f * (vp + std::abs(vp));
      y[m_h + i] = 0.5f * (vm + std::abs(vm));
    }
    // identity-block rows: q is just zhat / L (no flops beyond the add)
    for (int64_t j = 0; j < n_z; ++j) {
      const int64_t i = n_s + j;
      const float q = zhat[j] * inv_L;
      const float vp = w[i] + q + p_D[i];
      const float vm = w[m_h + i] - q + p_D[m_h + i];
      y[i] = 0.5f * (vp + std::abs(vp));
      y[m_h + i] = 0.5f * (vm + std::abs(vm));
    }
  }
  std::memcpy(y_out, y, sizeof(float) * 2 * m_h);
}

// Batched dense solve: B independent scenarios sharing MG_T/GL_T with
// per-scenario g_P (B x n_z) and p_D (B x m). The multi-scenario CPU
// baseline for throughput comparisons.
void gpad_solve_fixed_batch(const float* MG_T, const float* GL_T,
                            const float* g_P, const float* p_D,
                            const float* theta, const float* beta, int64_t B,
                            int64_t m, int64_t n_z, int64_t iterations,
                            float sign, float* z_out, float* y_out,
                            float* scratch) {
  for (int64_t b = 0; b < B; ++b) {
    gpad_solve_fixed(MG_T, GL_T, g_P + b * n_z, p_D + b * m, theta, beta, m,
                     n_z, iterations, sign, z_out + b * n_z, y_out + b * m,
                     scratch);
  }
}

}  // extern "C"
