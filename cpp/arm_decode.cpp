// Sequential latent-grid decoder: CABAC bin decode -> causal context gather
// -> int32 ARM MLP -> (mu, sigma) context bins -> next bin, pixel by pixel
// in raster order. This is the autoregressive half the TPU cannot run
// (reference: coolchic/cpp/cc-frame-decoder.cpp run_arm + arm_cpu.cpp,
// cc-bac.h decode path); upsampling + synthesis run elsewhere.
//
// Compiled into libccz.so together with entropy_api.cpp.

#include <cstdint>
#include <cstring>
#include <vector>

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

// C-style to-zero division with rounding offset, matching the python/torch
// integer ARM (reference: enc/bitstream/armint.py:95-109).
inline int32_t div_to_zero(int32_t x, int32_t d) {
  x += (x > 0 ? 1 : (x < 0 ? -1 : 0)) * (d / 2);
  return x < 0 ? -((-x) / d) : x / d;
}

struct ArmWeights {
  // hidden layers then head; weight [out][in] row-major, bias [out].
  std::vector<const int32_t*> w;
  std::vector<const int32_t*> b;
  int dim;
  int n_hidden;
};

// int32 MLP over one context vector -> (mu_int, logsig_int) at 8 frac bits.
inline void arm_forward_one(const ArmWeights& aw, const int32_t* ctx,
                            int32_t& mu, int32_t& ls) {
  int32_t buf0[MAX_DIM_ARM], buf1[MAX_DIM_ARM];
  const int C = aw.dim;
  std::memcpy(buf0, ctx, C * sizeof(int32_t));
  int32_t* x = buf0;
  int32_t* y = buf1;
  for (int l = 0; l < aw.n_hidden; l++) {
    const int32_t* W = aw.w[l];
    const int32_t* B = aw.b[l];
    for (int o = 0; o < C; o++) {
      int32_t acc = B[o] + x[o] * ARM_SCALE;  // residual
      const int32_t* row = W + o * C;
      for (int i = 0; i < C; i++) acc += row[i] * x[i];
      acc = div_to_zero(acc, ARM_SCALE);
      y[o] = acc > 0 ? acc : 0;  // ReLU
    }
    std::swap(x, y);
  }
  const int32_t* W = aw.w[aw.n_hidden];
  const int32_t* B = aw.b[aw.n_hidden];
  int32_t out[2];
  for (int o = 0; o < 2; o++) {
    int32_t acc = B[o];
    const int32_t* row = W + o * C;
    for (int i = 0; i < C; i++) acc += row[i] * x[i];
    out[o] = div_to_zero(acc, ARM_SCALE);
  }
  mu = out[0];
  ls = out[1];
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
  ArmWeights aw;
  aw.dim = dim_arm;
  aw.n_hidden = n_hidden;
  const int32_t* wp = weights;
  const int32_t* bp = biases;
  for (int l = 0; l < n_hidden; l++) {
    aw.w.push_back(wp);
    wp += dim_arm * dim_arm;
    aw.b.push_back(bp);
    bp += dim_arm;
  }
  aw.w.push_back(wp);
  aw.b.push_back(bp);

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
  auto plane_at = [&](int y, int x) -> int32_t& {
    return plane[(y + PAD) * pw + (x + PAD)];
  };

  int32_t ctxbuf[MAX_DIM_ARM];
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int idx = y * w + x;
      int32_t val;
      if (ablk > 0 && !blk_sig[(y >> shift) * nbx + (x >> shift)]) {
        val = 0;
      } else if (ablk > 0 && blk_flat[(y >> shift) * nbx + (x >> shift)] &&
                 (y % ablk != 0 || x % ablk != 0)) {
        val = (x % ablk != 0) ? out[idx - 1] : out[idx - w];
      } else {
        for (int c = 0; c < dim_arm; c++) {
          // offsets are window coordinates: plane position (y-4+dy, x-4+dx).
          ctxbuf[c] = plane_at(y - PAD + ctx_dy[c], x - PAD + ctx_dx[c]);
        }
        int32_t mu, ls;
        arm_forward_one(aw, ctxbuf, mu, ls);
        int mu_rounded, mu_index, sig_index;
        val_mu_indices2(mu, ls, mu_rounded, mu_index, sig_index);
        val = mu_rounded +
              decode_val2(dec, kContextStates[mu_index][sig_index]);
      }
      out[idx] = val;
      plane_at(y, x) = val * ARM_SCALE;
    }
  }
}

}  // extern "C"
