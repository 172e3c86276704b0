// Sequential latent-grid decoder: CABAC bin decode -> causal context gather
// -> int32 ARM MLP -> (mu, sigma) context bins -> next bin, pixel by pixel
// in raster order. This is the autoregressive half the TPU cannot run
// (reference: coolchic/cpp/cc-frame-decoder.cpp run_arm + arm_cpu.cpp /
// arm_avx2.hpp, cc-bac.h decode path); upsampling + synthesis run elsewhere.
//
// Performance structure (same idea as the reference's AVX2 kernels,
// expressed as autovectorizable fixed-width loops instead of intrinsics):
//   * the MLP is templated on (dim_arm, n_hidden) so every loop bound is a
//     compile-time constant and g++ -O3 -march=native vectorizes the
//     [in x out] accumulation across the output lanes;
//   * weights are transposed to input-major [in][out] at setup so the inner
//     loop is out-contiguous (broadcast-input, vector-accumulate form);
//   * the fixed-point "divide by 2^8 toward zero with rounding offset" is
//     branchless: offset = (x>0)*128 - (x<0)*128, then the standard
//     (x + 255*(x<0)) >> 8 truncation identity.
//
// Compiled into libccz.so together with entropy_api.cpp.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include "cabac.hpp"

namespace {

constexpr int N_MUQ = 16;
constexpr int N_SIGQ = 50;
constexpr int SIG_LOG_MIN = -1;
constexpr int SIG_LOG_MAX_EXCL = 9;
constexpr int ARM_PRECISION = 8;
constexpr int ARM_SCALE = 1 << ARM_PRECISION;
constexpr int PROBA_50_STATE = 2 * 32 + 1;
constexpr int MAX_DIM_ARM = 32;
constexpr int MAX_HIDDEN = 4;
constexpr int PAD = 4;

#include "gen_contexts.inc"

inline void val_mu_indices2(int val_mu, int val_log_sig, int& mu_rounded,
                            int& mu_index, int& sig_index) {
  mu_rounded = (val_mu >= 0)
                   ? (val_mu + ARM_SCALE / 2) >> ARM_PRECISION << ARM_PRECISION
                   : -((-val_mu + ARM_SCALE / 2) >> ARM_PRECISION << ARM_PRECISION);
  mu_index = (val_mu - mu_rounded) * N_MUQ;
  mu_index = mu_index >= 0 ? ((mu_index + ARM_SCALE / 2) >> ARM_PRECISION)
                           : -((-mu_index + ARM_SCALE / 2) >> ARM_PRECISION);
  mu_index += N_MUQ / 2;
  int v = val_log_sig - SIG_LOG_MIN * ARM_SCALE;
  if (v < 0) {
    sig_index = 0;
  } else {
    sig_index = (v * (N_SIGQ / (SIG_LOG_MAX_EXCL - SIG_LOG_MIN)) + ARM_SCALE / 2) >>
                ARM_PRECISION;
    if (sig_index >= N_SIGQ) sig_index = N_SIGQ - 1;
  }
  mu_rounded >>= ARM_PRECISION;
}

// Branchless C-style to-zero division by 2^ARM_PRECISION with rounding
// offset, matching the python/torch integer ARM (reference:
// enc/bitstream/armint.py:95-109). Identities:
//   x + sign(x)*128  ==  x + 128*(x>0) - 128*(x<0)
//   trunc_to_zero(x >> 8)  ==  (x + 255*(x<0)) >> 8   (arithmetic shift)
inline int32_t div256_to_zero(int32_t x) {
  int32_t neg = x >> 31;                      // -1 if x<0 else 0
  int32_t pos = (int32_t)((uint32_t)(-x) >> 31);  // 1 if x>0 else 0
  x += (pos << (ARM_PRECISION - 1)) + (neg << (ARM_PRECISION - 1));
  neg = x >> 31;
  return (x + (neg & (ARM_SCALE - 1))) >> ARM_PRECISION;
}

// Weights transposed to input-major [in][out] so the per-input inner loop
// accumulates contiguously across outputs (vectorizes across lanes).
// 64-byte alignment lets the AVX2/AVX-512 kernels use aligned row loads
// (row stride MAX_DIM_ARM ints = 128 bytes keeps every row aligned).
struct alignas(64) ArmWeightsT {
  int32_t wt[MAX_HIDDEN][MAX_DIM_ARM][MAX_DIM_ARM];  // [layer][in][out]
  int32_t b[MAX_HIDDEN][MAX_DIM_ARM];
  int32_t head_w[MAX_DIM_ARM][2];   // [in][out] (scalar path)
  int32_t head_w0[MAX_DIM_ARM];     // head rows, per-output (SIMD path)
  int32_t head_w1[MAX_DIM_ARM];
  int32_t head_b[2];
  int32_t mu0, ls0;  // cached MLP output for the all-zero context
  int dim;
  int n_hidden;
};

void build_weights(ArmWeightsT& aw, const int32_t* weights,
                   const int32_t* biases, int dim, int n_hidden) {
  std::memset(aw.wt, 0, sizeof(aw.wt));
  std::memset(aw.b, 0, sizeof(aw.b));
  std::memset(aw.head_w0, 0, sizeof(aw.head_w0));
  std::memset(aw.head_w1, 0, sizeof(aw.head_w1));
  aw.dim = dim;
  aw.n_hidden = n_hidden;
  const int32_t* wp = weights;
  const int32_t* bp = biases;
  for (int l = 0; l < n_hidden; l++) {
    for (int o = 0; o < dim; o++)
      for (int i = 0; i < dim; i++) aw.wt[l][i][o] = wp[o * dim + i];
    wp += dim * dim;
    for (int o = 0; o < dim; o++) aw.b[l][o] = bp[o];
    bp += dim;
  }
  for (int o = 0; o < 2; o++)
    for (int i = 0; i < dim; i++) aw.head_w[i][o] = wp[o * dim + i];
  for (int i = 0; i < dim; i++) {
    aw.head_w0[i] = wp[0 * dim + i];
    aw.head_w1[i] = wp[1 * dim + i];
  }
  for (int o = 0; o < 2; o++) aw.head_b[o] = bp[o];
}

// Fixed-size int32 MLP over one context vector -> (mu, logsig) at 8 frac
// bits. C and NH are compile-time so every loop fully unrolls/vectorizes.
// noinline is deliberate: inlined into the (branchy, register-hungry)
// raster decode loop, gcc's vectorizer gives up and the MLP runs ~2.5x
// slower; as a standalone function it vectorizes cleanly and the call
// costs nothing by comparison.
template <int C, int NH>
__attribute__((noinline)) void arm_forward_fixed(const ArmWeightsT& aw,
                                                 const int32_t* ctx,
                                                 int32_t& mu, int32_t& ls) {
  {
    int32_t nz = 0;
    for (int i = 0; i < C; i++) nz |= ctx[i];
    if (!nz) {
      mu = aw.mu0;
      ls = aw.ls0;
      return;
    }
  }
  int32_t x[C], acc[C];
  for (int i = 0; i < C; i++) x[i] = ctx[i];
  for (int l = 0; l < NH; l++) {
    for (int o = 0; o < C; o++) acc[o] = aw.b[l][o];
    for (int i = 0; i < C; i++) {
      const int32_t xi = x[i];
      const int32_t* col = aw.wt[l][i];
      for (int o = 0; o < C; o++) acc[o] += col[o] * xi;
    }
    for (int o = 0; o < C; o++) {
      int32_t v = div256_to_zero(acc[o] + (x[o] << ARM_PRECISION));  // residual
      x[o] = v > 0 ? v : 0;                                          // ReLU
    }
  }
  int32_t a0 = aw.head_b[0], a1 = aw.head_b[1];
  for (int i = 0; i < C; i++) {
    a0 += aw.head_w[i][0] * x[i];
    a1 += aw.head_w[i][1] * x[i];
  }
  mu = div256_to_zero(a0);
  ls = div256_to_zero(a1);
}

#ifdef __AVX2__
// In-register AVX2 pixel kernel (same math, same results as the scalar
// path; structured like the reference's AVX2 ARM, reference:
// coolchic/cpp/arm_avx2.hpp:14-256, but written against our transposed
// weight layout). Two exact transformations make it branch-free:
//   * gather -> MLP -> head stays in C/8 ymm registers, no spills;
//   * hidden activations apply ReLU BEFORE the fixed-point shift — the
//     value is then non-negative, so "divide by 2^8 toward zero with
//     rounding offset" is exactly (v + 128) >> 8.
template <int C>
inline void arm_forward_avx2(const ArmWeightsT& aw, const int32_t* base,
                             const __m256i* idx, int n_hidden, int32_t& mu,
                             int32_t& ls) {
  constexpr int NB = C / 8;
  __m256i x[NB], acc[NB];
  for (int b = 0; b < NB; b++)
    x[b] = _mm256_i32gather_epi32(base, idx[b], 4);
  {
    __m256i nz = x[0];
    for (int b = 1; b < NB; b++) nz = _mm256_or_si256(nz, x[b]);
    if (_mm256_testz_si256(nz, nz)) {  // all-zero context: cached output
      mu = aw.mu0;
      ls = aw.ls0;
      return;
    }
  }
  const __m256i scale = _mm256_set1_epi32(ARM_SCALE);
  const __m256i half = _mm256_set1_epi32(ARM_SCALE / 2);
  const __m256i zero = _mm256_setzero_si256();
  const __m256i rot = _mm256_setr_epi32(1, 2, 3, 4, 5, 6, 7, 0);
  for (int l = 0; l < n_hidden; l++) {
    const int32_t* k = &aw.wt[l][0][0];  // row stride MAX_DIM_ARM
    for (int b = 0; b < NB; b++) {
      acc[b] = _mm256_load_si256((const __m256i*)&aw.b[l][b * 8]);
      acc[b] = _mm256_add_epi32(acc[b], _mm256_mullo_epi32(x[b], scale));
    }
    __m256i cur = x[0];
    for (int ib = 0; ib < NB; ib++) {
      for (int sub = 0; sub < 8; sub++, k += MAX_DIM_ARM) {
        __m256i in = _mm256_broadcastd_epi32(_mm256_castsi256_si128(cur));
        cur = _mm256_permutevar8x32_epi32(cur, rot);
        for (int b = 0; b < NB; b++) {
          __m256i w = _mm256_load_si256((const __m256i*)(k + b * 8));
          acc[b] = _mm256_add_epi32(acc[b], _mm256_mullo_epi32(in, w));
        }
      }
      if (ib + 1 < NB) cur = x[ib + 1];
    }
    for (int b = 0; b < NB; b++) {
      __m256i r = _mm256_max_epi32(acc[b], zero);
      x[b] = _mm256_srai_epi32(_mm256_add_epi32(r, half), ARM_PRECISION);
    }
  }
  __m256i s0 = zero, s1 = zero;
  for (int b = 0; b < NB; b++) {
    s0 = _mm256_add_epi32(
        s0, _mm256_mullo_epi32(
                x[b], _mm256_load_si256((const __m256i*)&aw.head_w0[b * 8])));
    s1 = _mm256_add_epi32(
        s1, _mm256_mullo_epi32(
                x[b], _mm256_load_si256((const __m256i*)&aw.head_w1[b * 8])));
  }
  auto hsum = [](__m256i v) -> int32_t {
    __m128i lo = _mm256_castsi256_si128(v);
    __m128i hi = _mm256_extracti128_si256(v, 1);
    lo = _mm_add_epi32(lo, hi);
    lo = _mm_add_epi32(lo, _mm_shuffle_epi32(lo, 0x4e));
    lo = _mm_add_epi32(lo, _mm_shuffle_epi32(lo, 0xb1));
    return _mm_cvtsi128_si32(lo);
  };
  mu = div256_to_zero(aw.head_b[0] + hsum(s0));
  ls = div256_to_zero(aw.head_b[1] + hsum(s1));
}
#endif  // __AVX2__

#ifdef __AVX512F__
// AVX-512 pixel kernel for C a multiple of 16: the whole activation vector
// lives in C/16 zmm registers, halving the multiply-add chain vs the AVX2
// form (same exact math: residual added pre-shift, ReLU before the
// round-half-away shift makes the to-zero division a plain (v+128)>>8).
// Inputs are broadcast from a small aligned stack spill (vpbroadcastd from
// memory) instead of the AVX2 rotate dance.
template <int C>
inline void arm_forward_avx512(const ArmWeightsT& aw, const int32_t* base,
                               const __m512i* idx, int n_hidden, int32_t& mu,
                               int32_t& ls) {
  constexpr int NB = C / 16;
  __m512i x[NB], acc[NB];
  for (int b = 0; b < NB; b++) x[b] = _mm512_i32gather_epi32(idx[b], base, 4);
  // All-zero context (common in sparse grids): the MLP output is a
  // constant, cached at setup.
  {
    __mmask16 nz = 0;
    for (int b = 0; b < NB; b++) nz |= _mm512_test_epi32_mask(x[b], x[b]);
    if (!nz) {
      mu = aw.mu0;
      ls = aw.ls0;
      return;
    }
  }
  const __m512i half = _mm512_set1_epi32(ARM_SCALE / 2);
  const __m512i zero = _mm512_setzero_si512();
  alignas(64) int32_t xs[C];
  for (int l = 0; l < n_hidden; l++) {
    const int32_t* k = &aw.wt[l][0][0];  // row stride MAX_DIM_ARM
    for (int b = 0; b < NB; b++) {
      acc[b] = _mm512_load_si512((const void*)&aw.b[l][b * 16]);
      acc[b] = _mm512_add_epi32(acc[b], _mm512_slli_epi32(x[b], ARM_PRECISION));
      _mm512_store_si512(&xs[b * 16], x[b]);
    }
    for (int i = 0; i < C; i++, k += MAX_DIM_ARM) {
      const __m512i in = _mm512_set1_epi32(xs[i]);
      for (int b = 0; b < NB; b++) {
        __m512i w = _mm512_load_si512((const void*)(k + b * 16));
        acc[b] = _mm512_add_epi32(acc[b], _mm512_mullo_epi32(in, w));
      }
    }
    for (int b = 0; b < NB; b++) {
      __m512i r = _mm512_max_epi32(acc[b], zero);
      x[b] = _mm512_srai_epi32(_mm512_add_epi32(r, half), ARM_PRECISION);
    }
  }
  __m512i s0 = zero, s1 = zero;
  for (int b = 0; b < NB; b++) {
    s0 = _mm512_add_epi32(
        s0, _mm512_mullo_epi32(
                x[b], _mm512_load_si512((const void*)&aw.head_w0[b * 16])));
    s1 = _mm512_add_epi32(
        s1, _mm512_mullo_epi32(
                x[b], _mm512_load_si512((const void*)&aw.head_w1[b * 16])));
  }
  mu = div256_to_zero(aw.head_b[0] + _mm512_reduce_add_epi32(s0));
  ls = div256_to_zero(aw.head_b[1] + _mm512_reduce_add_epi32(s1));
}
#endif  // __AVX512F__

// Generic fallback for unusual (dim, n_hidden) combinations.
void arm_forward_generic(const ArmWeightsT& aw, const int32_t* ctx,
                         int32_t& mu, int32_t& ls) {
  const int C = aw.dim;
  {
    int32_t nz = 0;
    for (int i = 0; i < C; i++) nz |= ctx[i];
    if (!nz && !(aw.mu0 == INT32_MIN)) {
      mu = aw.mu0;
      ls = aw.ls0;
      return;
    }
  }
  int32_t x[MAX_DIM_ARM], acc[MAX_DIM_ARM];
  for (int i = 0; i < C; i++) x[i] = ctx[i];
  for (int l = 0; l < aw.n_hidden; l++) {
    for (int o = 0; o < C; o++) acc[o] = aw.b[l][o];
    for (int i = 0; i < C; i++) {
      const int32_t xi = x[i];
      const int32_t* col = aw.wt[l][i];
      for (int o = 0; o < C; o++) acc[o] += col[o] * xi;
    }
    for (int o = 0; o < C; o++) {
      int32_t v = div256_to_zero(acc[o] + (x[o] << ARM_PRECISION));
      x[o] = v > 0 ? v : 0;
    }
  }
  int32_t a0 = aw.head_b[0], a1 = aw.head_b[1];
  for (int i = 0; i < C; i++) {
    a0 += aw.head_w[i][0] * x[i];
    a1 += aw.head_w[i][1] * x[i];
  }
  mu = div256_to_zero(a0);
  ls = div256_to_zero(a1);
}

int decode_val2(ccz::Decoder& dec, const short* s) {
  ccz::ProbState gt0(s[0]), gt1(s[1]), gt2(s[2]), gt3(s[3]), ppos(s[4]);
  if (dec.decode_bin(gt0) == 0) return 0;
  int v;
  if (dec.decode_bin(gt1) == 0) v = 1;
  else if (dec.decode_bin(gt2) == 0) v = 2;
  else if (dec.decode_bin(gt3) == 0) v = 3;
  else v = dec.decode_exgolomb(0) + 3 + 1;
  if (dec.decode_bin(ppos) != 0) v = -v;
  return v;
}

// Raster decode loop, templated on the MLP shape so arm_forward_fixed
// inlines into the per-pixel body (an indirect call per pixel costs ~2x).
// FWD == nullptr (generic shapes) falls back to arm_forward_generic.
template <int C, int NH, bool GENERIC>
void decode_grid_loop(const ArmWeightsT& aw, ccz::Decoder& dec,
                      const std::vector<uint8_t>& blk_sig,
                      const std::vector<uint8_t>& blk_flat, int nbx, int ablk,
                      int shift, int h, int w, int pw, int32_t* plane0,
                      const int32_t* ctx_off, int dim_arm, int32_t* out) {
  int32_t ctxbuf[MAX_DIM_ARM];
#ifdef __AVX2__
  __m256i vidx[MAX_DIM_ARM / 8];
  if constexpr (!GENERIC)
    for (int b = 0; b < C / 8; b++)
      vidx[b] = _mm256_loadu_si256((const __m256i*)&ctx_off[b * 8]);
#endif
#ifdef __AVX512F__
  __m512i vidx512[MAX_DIM_ARM / 16 > 0 ? MAX_DIM_ARM / 16 : 1];
  if constexpr (!GENERIC && C % 16 == 0)
    for (int b = 0; b < C / 16; b++)
      vidx512[b] = _mm512_loadu_si512((const void*)&ctx_off[b * 16]);
#endif
  for (int y = 0; y < h; y++) {
    int32_t* prow = plane0 + (size_t)(y + PAD) * pw + PAD;
    for (int x = 0; x < w; x++) {
      int idx = y * w + x;
      int32_t val;
      if (ablk > 0 && !blk_sig[(y >> shift) * nbx + (x >> shift)]) {
        val = 0;
      } else if (ablk > 0 && blk_flat[(y >> shift) * nbx + (x >> shift)] &&
                 (y % ablk != 0 || x % ablk != 0)) {
        val = (x % ablk != 0) ? out[idx - 1] : out[idx - w];
      } else {
        const int32_t* base = prow + x;
        int32_t mu, ls;
        if constexpr (GENERIC) {
          for (int c = 0; c < dim_arm; c++) ctxbuf[c] = base[ctx_off[c]];
          arm_forward_generic(aw, ctxbuf, mu, ls);
        } else {
#if defined(__AVX512F__)
          if constexpr (C % 16 == 0) {
            arm_forward_avx512<C % 16 == 0 ? C : 16>(aw, base, vidx512, NH, mu,
                                                     ls);
          } else {
            arm_forward_avx2<C>(aw, base, vidx, NH, mu, ls);
          }
#elif defined(__AVX2__)
          arm_forward_avx2<C>(aw, base, vidx, NH, mu, ls);
#else
          for (int c = 0; c < C; c++) ctxbuf[c] = base[ctx_off[c]];
          arm_forward_fixed<C, NH>(aw, ctxbuf, mu, ls);
#endif
        }
        int mu_rounded, mu_index, sig_index;
        val_mu_indices2(mu, ls, mu_rounded, mu_index, sig_index);
        val = mu_rounded +
              decode_val2(dec, kContextStates[mu_index][sig_index]);
      }
      out[idx] = val;
      prow[x] = val * ARM_SCALE;
    }
  }
}

}  // namespace

extern "C" {

// Decode one 2-D latent grid: the ARM runs sequentially over the raster,
// reading causal contexts from the zero-padded, already-decoded plane.
//
//   data/len      : the grid's CABAC substream
//   weights/biases: concatenated int32 fixed-point ARM params, hidden layers
//                   first then the 2-wide head (weight row-major [out][in])
//   ctx_dy/ctx_dx : dim_arm context offsets relative to the padded window
//                   top-left (from NON_ZERO_PIXEL_CTX_INDEX)
//   blk           : flat-block size (sign selects adaptive block contexts)
//   out           : h*w int32 decoded latent values
void ccz_decode_arm_latent_layer(const uint8_t* data, int len,
                                 const int32_t* weights, const int32_t* biases,
                                 int dim_arm, int n_hidden,
                                 const int32_t* ctx_dy, const int32_t* ctx_dx,
                                 int h, int w, int blk, int32_t* out) {
  ArmWeightsT aw;
  build_weights(aw, weights, biases, dim_arm, n_hidden);
  {  // seed the all-zero-context cache (sentinel disables the shortcut
     // inside arm_forward_generic during this very call)
    aw.mu0 = INT32_MIN;
    int32_t zctx[MAX_DIM_ARM] = {0};
    int32_t m0, l0;
    arm_forward_generic(aw, zctx, m0, l0);
    aw.mu0 = m0;
    aw.ls0 = l0;
  }

  bool update = blk < 0;
  int ablk = update ? -blk : blk;
  int shift = 0;
  while ((1 << shift) < ablk) shift++;
  int nby = 1, nbx = 1;
  if (ablk != 0) {
    nby = (h + ablk - 1) / ablk;
    nbx = (w + ablk - 1) / ablk;
  }
  std::vector<uint8_t> blk_sig(nby * nbx, 1), blk_flat(nby * nbx, 0);

  ccz::Decoder dec(data, len);
  if (nby != 1 || nbx != 1) {
    if (dec.decode_bin_ep() != 0) {
      ccz::ProbState ctx(PROBA_50_STATE);
      for (int i = 0; i < nby * nbx; i++)
        blk_sig[i] = update ? dec.decode_bin(ctx, true) : dec.decode_bin_ep();
    }
    if (dec.decode_bin_ep() != 0) {
      ccz::ProbState ctx(PROBA_50_STATE);
      for (int i = 0; i < nby * nbx; i++)
        if (blk_sig[i])
          blk_flat[i] = update ? dec.decode_bin(ctx, true) : dec.decode_bin_ep();
    }
  }

  // Zero-padded plane holding latent * 2^8 for context gathers.
  const int pw = w + 2 * PAD;
  std::vector<int32_t> plane((h + 2 * PAD) * pw, 0);

  // Precompute flat plane offsets of each context tap relative to the
  // current pixel's plane cell: (dy - PAD) * pw + (dx - PAD).
  int32_t ctx_off[MAX_DIM_ARM];
  for (int c = 0; c < dim_arm; c++)
    ctx_off[c] = (ctx_dy[c] - PAD) * pw + (ctx_dx[c] - PAD);

  switch (dim_arm * 10 + n_hidden) {
#define CCZ_CASE(C, NH)                                                     \
  case C * 10 + NH:                                                         \
    decode_grid_loop<C, NH, false>(aw, dec, blk_sig, blk_flat, nbx, ablk,   \
                                   shift, h, w, pw, plane.data(), ctx_off,  \
                                   dim_arm, out);                           \
    break;
    CCZ_CASE(8, 1)
    CCZ_CASE(8, 2)
    CCZ_CASE(16, 1)
    CCZ_CASE(16, 2)
    CCZ_CASE(24, 1)
    CCZ_CASE(24, 2)
    CCZ_CASE(32, 1)
    CCZ_CASE(32, 2)
#undef CCZ_CASE
    default:
      decode_grid_loop<0, 0, true>(aw, dec, blk_sig, blk_flat, nbx, ablk,
                                   shift, h, w, pw, plane.data(), ctx_off,
                                   dim_arm, out);
  }
}

}  // extern "C"
