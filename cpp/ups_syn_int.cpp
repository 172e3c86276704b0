// Fixed-point (int32) upsampling + synthesis: the deterministic decode path.
//
// Integer twins of the float reference math, matching the reference
// decoder's fixed-point semantics (reference: coolchic/cpp/
// ups_refine_cpu.hpp, ups_upsample_cpu.hpp, syn_cpu.hpp,
// cc-frame-decoder.cpp run_ups/run_syn):
//   * latents arrive at ARM_PRECISION (8 frac bits),
//   * upsampling kernels and synthesis weights at 12 frac bits, synthesis
//     biases at 24,
//   * every renormalization shifts toward zero, no rounding offset,
//   * refine = odd symmetric conv (zero padding) + residual,
//   * upsample = even symmetric x2 transposed conv expressed as its two
//     polyphase filters (replicate padding),
//   * synthesis convs use replicate padding; ReLU clamps pre-shift.
//
// Each latent layer is refined once then upsampled to full resolution
// independently (channelwise, this equals the encoder's cascade since the
// upsampling never mixes channels).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

#ifdef __AVX512F__
#include <immintrin.h>
#endif

// Per-call stage timings (seconds): [0] upsampling, [1] synthesis.
// Read via ccz_ups_syn_stage_secs after a ccz_ups_syn_int call.
// thread_local: ccz_decode_many runs frame decodes concurrently and each
// thread reads its own stream's timings.
static thread_local double g_stage_secs[4] = {0, 0, 0, 0};  // [2]=chain, [3]=spatial
extern "C" const double* ccz_ups_syn_stage_secs() { return g_stage_secs; }

namespace {

constexpr int ARM_PRECISION = 8;
constexpr int UPS_PRECISION = 12;
constexpr int SYN_MUL_PRECISION = 12;

inline int32_t shr_to_zero(int32_t v, int n) {
  return v < 0 ? -((-v) >> n) : (v >> n);
}

// Plane over capacity-reusing UNINITIALIZED storage: resize never zero-fills
// (every pass writes its full output) and never reallocates when shrinking,
// so scratch planes are allocated once at their largest size and recycled
// across the whole cascade.
struct Plane {
  int h = 0, w = 0;
  int32_t* data = nullptr;

  Plane() = default;
  Plane(Plane&& o) noexcept { *this = std::move(o); }
  Plane& operator=(Plane&& o) noexcept {
    h = o.h;
    w = o.w;
    data = o.data;
    cap_ = o.cap_;
    store_ = std::move(o.store_);
    o.h = o.w = 0;
    o.data = nullptr;
    o.cap_ = 0;
    return *this;
  }
  void resize(int hh, int ww) {
    size_t n = static_cast<size_t>(hh) * ww;
    if (n > cap_) {
      store_.reset(new int32_t[n]);
      data = store_.get();
      cap_ = n;
    }
    h = hh;
    w = ww;
  }

 private:
  size_t cap_ = 0;
  std::unique_ptr<int32_t[]> store_;
};

// Odd symmetric separable conv + residual (reference: ups_refine_cpu.hpp).
// src at src_prec frac bits; output at UPS_PRECISION. Borders are handled
// inline (zero padding semantics) instead of materializing padded copies.
void ups_refine(const Plane& in, const int32_t* kw, int ks, int src_prec,
                Plane& tmp, Plane& out) {
  const int pad = ks / 2;
  const int h = in.h, w = in.w;
  tmp.resize(h, w);
  // Horizontal pass, zero-padded columns. Interior is X-blocked so the
  // accumulator strip vectorizes (shifted contiguous loads per tap).
  constexpr int HXB = 64;
  int32_t hacc[HXB];
  for (int y = 0; y < h; y++) {
    const int32_t* src = &in.data[(size_t)y * w];
    int32_t* dst = &tmp.data[(size_t)y * w];
    int x = 0;
    for (; x < pad && x < w; x++) {  // left border
      int32_t sum = 0;
      for (int k = 0; k < ks; k++) {
        int sx = x - pad + k;
        if (sx >= 0 && sx < w) sum += src[sx] * kw[k];
      }
      dst[x] = shr_to_zero(sum, src_prec);
    }
    const int x_end = w - pad;  // interior: [pad, x_end)
    for (int x0 = x; x0 < x_end; x0 += HXB) {
      const int nb = x_end - x0 < HXB ? x_end - x0 : HXB;
      for (int i = 0; i < nb; i++) hacc[i] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t wgt = kw[k];
        const int32_t* s = src + x0 - pad + k;
        if (nb == HXB) {
          for (int i = 0; i < HXB; i++) hacc[i] += s[i] * wgt;
        } else {
          for (int i = 0; i < nb; i++) hacc[i] += s[i] * wgt;
        }
      }
      for (int i = 0; i < nb; i++) dst[x0 + i] = shr_to_zero(hacc[i], src_prec);
    }
    for (x = x_end > x ? x_end : x; x < w; x++) {  // right border
      int32_t sum = 0;
      for (int k = 0; k < ks; k++) {
        int sx = x - pad + k;
        if (sx >= 0 && sx < w) sum += src[sx] * kw[k];
      }
      dst[x] = shr_to_zero(sum, src_prec);
    }
  }

  // Vertical pass (zero-padded rows) + residual, X-blocked so the
  // accumulator strip stays in registers across the taps.
  out.resize(h, w);
  const int residue_shift = UPS_PRECISION - src_prec;
  constexpr int XB = 64;
  int32_t accb[XB];
  for (int y = 0; y < h; y++) {
    int32_t* dst = &out.data[(size_t)y * w];
    const int32_t* res = &in.data[(size_t)y * w];
    for (int x0 = 0; x0 < w; x0 += XB) {
      const int nb = w - x0 < XB ? w - x0 : XB;
      for (int x = 0; x < nb; x++)
        accb[x] = (res[x0 + x] << residue_shift) << UPS_PRECISION;
      for (int k = 0; k < ks; k++) {
        int sy = y - pad + k;
        if (sy < 0 || sy >= h) continue;
        const int32_t wgt = kw[k];
        const int32_t* s = &tmp.data[(size_t)sy * w] + x0;
        if (nb == XB) {
          for (int x = 0; x < XB; x++) accb[x] += s[x] * wgt;
        } else {
          for (int x = 0; x < nb; x++) accb[x] += s[x] * wgt;
        }
      }
      for (int x = 0; x < nb; x++)
        dst[x0 + x] = shr_to_zero(accb[x], UPS_PRECISION);
    }
  }
}

// Even symmetric x2 transposed conv as two polyphase filters
// (reference: ups_upsample_cpu.hpp). Output is exactly (2h, 2w), cropped to
// (out_h, out_w).
void ups_upsample(const Plane& in, const int32_t* kw_full, int ksx2,
                  int src_prec, int out_h, int out_w, Plane& tmp,
                  Plane& out) {
  int ks = ksx2 / 2;  // per-phase taps
  int pad = ks / 2;
  int32_t kw_even[16], kw_odd[16];
  for (int i = 0; i < ks; i++) {
    kw_even[i] = kw_full[2 * i];
    kw_odd[i] = kw_full[2 * i + 1];
  }
  const int h = in.h, w = in.w;
  auto clampi = [](int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  // Horizontal polyphase pass (replicate-padded columns): X-blocked
  // interior (both phase accumulator strips vectorize over shifted
  // contiguous loads), borders clamped inline.
  tmp.resize(h, 2 * w);
  constexpr int HXB = 32;
  int32_t hacc_e[HXB], hacc_o[HXB];
  // interior x: needs x-pad >= 0 and (x-pad+ks-1)+1 <= w-1 for the odd phase
  const int xi0 = pad;
  const int xi1 = w - ks + pad;  // exclusive
  for (int y = 0; y < h; y++) {
    const int32_t* src = &in.data[(size_t)y * w];
    int32_t* dst = &tmp.data[(size_t)y * 2 * w];
    auto border = [&](int x) {
      int32_t se = 0, so = 0;
      for (int k = 0; k < ks; k++) {
        se += src[clampi(x - pad + k, 0, w - 1)] * kw_even[k];
        so += src[clampi(x - pad + k + 1, 0, w - 1)] * kw_odd[k];
      }
      dst[2 * x] = shr_to_zero(se, src_prec);
      dst[2 * x + 1] = shr_to_zero(so, src_prec);
    };
    int x = 0;
    for (; x < xi0 && x < w; x++) border(x);
    for (int x0 = x; x0 < xi1; x0 += HXB) {
      const int nb = xi1 - x0 < HXB ? xi1 - x0 : HXB;
      for (int i = 0; i < nb; i++) hacc_e[i] = 0;
      for (int i = 0; i < nb; i++) hacc_o[i] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t we = kw_even[k], wo = kw_odd[k];
        const int32_t* se = src + x0 - pad + k;
        const int32_t* so = se + 1;
        if (nb == HXB) {
          for (int i = 0; i < HXB; i++) hacc_e[i] += se[i] * we;
          for (int i = 0; i < HXB; i++) hacc_o[i] += so[i] * wo;
        } else {
          for (int i = 0; i < nb; i++) hacc_e[i] += se[i] * we;
          for (int i = 0; i < nb; i++) hacc_o[i] += so[i] * wo;
        }
      }
      int32_t* d = dst + 2 * x0;
      for (int i = 0; i < nb; i++) {
        d[2 * i] = shr_to_zero(hacc_e[i], src_prec);
        d[2 * i + 1] = shr_to_zero(hacc_o[i], src_prec);
      }
    }
    for (x = xi1 > x ? xi1 : x; x < w; x++) border(x);
  }
  // Vertical polyphase pass (replicate-padded rows), X-blocked: both
  // phase accumulators live in registers across the taps.
  out.resize(out_h, out_w);
  constexpr int XB = 64;
  int32_t acc_e[XB], acc_o[XB];
  for (int y = 0; y < h; y++) {
    const int32_t* rows_e[16];
    const int32_t* rows_o[16];
    for (int k = 0; k < ks; k++) {
      rows_e[k] = &tmp.data[(size_t)clampi(y - pad + k, 0, h - 1) * 2 * w];
      rows_o[k] = &tmp.data[(size_t)clampi(y - pad + k + 1, 0, h - 1) * 2 * w];
    }
    int32_t* dst_e = 2 * y < out_h ? &out.data[(size_t)(2 * y) * out_w] : nullptr;
    int32_t* dst_o =
        2 * y + 1 < out_h ? &out.data[(size_t)(2 * y + 1) * out_w] : nullptr;
    for (int x0 = 0; x0 < out_w; x0 += XB) {
      const int nb = out_w - x0 < XB ? out_w - x0 : XB;
      for (int x = 0; x < nb; x++) acc_e[x] = 0;
      for (int x = 0; x < nb; x++) acc_o[x] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t we = kw_even[k], wo = kw_odd[k];
        const int32_t* se = rows_e[k] + x0;
        const int32_t* so = rows_o[k] + x0;
        if (nb == XB) {
          for (int x = 0; x < XB; x++) acc_e[x] += se[x] * we;
          for (int x = 0; x < XB; x++) acc_o[x] += so[x] * wo;
        } else {
          for (int x = 0; x < nb; x++) acc_e[x] += se[x] * we;
          for (int x = 0; x < nb; x++) acc_o[x] += so[x] * wo;
        }
      }
      if (dst_e)
        for (int x = 0; x < nb; x++)
          dst_e[x0 + x] = shr_to_zero(acc_e[x], UPS_PRECISION);
      if (dst_o)
        for (int x = 0; x < nb; x++)
          dst_o[x0 + x] = shr_to_zero(acc_o[x], UPS_PRECISION);
    }
  }
  }

// ================== Row-streaming fused ups+syn pipeline ==================
//
// The plane-based path below round-trips every dense plane (n_res x
// full-res) plus the chain outputs through memory; at 1080p+ that traffic
// dominates decode time (the working set is tens of MB while the compute
// is ~100 MACs/pixel). This path computes the whole upsample->synthesis
// stack row by row through a pull pipeline of ring buffers: each stage
// keeps only the last few rows its consumer can still reach, so the
// working set stays in cache at any resolution (reference equivalent:
// coolchic/cpp/synlb_avx2.hpp line-buffer synthesis — re-derived here as
// a general pull pipeline covering the upsampling cascade too).
//
// Arithmetic is copied verbatim from the plane passes (identical
// shr_to_zero points and accumulation order), so outputs are
// bit-identical; the cross-decoder suites gate this.

struct Ring {
  int w = 0, cap = 0, hi = -1;
  std::vector<int32_t> buf;
  void init(int w_, int cap_) {
    w = w_;
    cap = cap_;
    hi = -1;
    buf.resize((size_t)w * cap);
  }
  int32_t* slot(int j) { return &buf[(size_t)(j % cap) * w]; }
};

// CCZ_STREAM_PROF=1: per-stage-type EXCLUSIVE time of the pull pipeline,
// printed to stderr after each frame (off the hot path unless enabled).
inline bool stream_prof_enabled() {
  static const bool on = [] {
    const char* e = getenv("CCZ_STREAM_PROF");
    return e && e[0] == '1';
  }();
  return on;
}
inline std::vector<double>& prof_stack() {
  static thread_local std::vector<double> s;
  return s;
}
inline double* prof_bins() {
  static thread_local double bins[8];  // indexed by RowProducer::tag
  return bins;
}
const char* const PROF_TAGS[] = {"latent", "refine", "upsample", "chain",
                                 "spatial"};

struct RowProducer {
  int h = 0, w = 0;  // logical output dims (w = ints per row incl. channels)
  int tag = 0;       // PROF_TAGS index
  Ring ring;
  virtual ~RowProducer() = default;
  // Row y in [0, h). Look-back is bounded by ring.cap — guaranteed by the
  // fixed kernel footprints of every consumer below.
  const int32_t* row(int y) {
    if (stream_prof_enabled()) {
      while (ring.hi < y) {
        const auto t0 = std::chrono::steady_clock::now();
        prof_stack().push_back(0.0);
        produce(ring.hi + 1, ring.slot(ring.hi + 1));
        ring.hi++;
        const double total =
            std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                .count();
        const double child = prof_stack().back();
        prof_stack().pop_back();
        prof_bins()[tag] += total - child;
        if (!prof_stack().empty()) prof_stack().back() += total;
      }
      return ring.slot(y);
    }
    while (ring.hi < y) {
      produce(ring.hi + 1, ring.slot(ring.hi + 1));
      ring.hi++;
    }
    return ring.slot(y);
  }

 protected:
  virtual void produce(int y, int32_t* dst) = 0;
};

inline int clampi_s(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Latent grid rows, shifted to ARM fixed point on the fly.
struct LatentRows : RowProducer {
  const int32_t* lat = nullptr;
  void init(const int32_t* l, int h_, int w_, int cap) {
    tag = 0;
    lat = l;
    h = h_;
    w = w_;
    ring.init(w_, cap);
  }

 protected:
  void produce(int y, int32_t* dst) override {
    const int32_t* s = lat + (size_t)y * w;
    for (int x = 0; x < w; x++) dst[x] = s[x] << ARM_PRECISION;
  }
};

// Streaming twin of ups_refine: odd symmetric conv + residual.
struct RefineRows : RowProducer {
  RowProducer* src = nullptr;
  const int32_t* kw = nullptr;
  int ks = 0, pad = 0, src_prec = ARM_PRECISION;
  Ring tmp;  // horizontally-filtered rows (zero-pad columns)

  void init(RowProducer* s, const int32_t* k, int ks_, int prec, int out_cap) {
    tag = 1;
    src = s;
    kw = k;
    ks = ks_;
    pad = ks_ / 2;
    src_prec = prec;
    h = s->h;
    w = s->w;
    ring.init(w, out_cap);
    tmp.init(w, 2 * pad + 4);
  }

 protected:
  const int32_t* trow(int j) {
    while (tmp.hi < j) {
      hpass(src->row(tmp.hi + 1), tmp.slot(tmp.hi + 1));
      tmp.hi++;
    }
    return tmp.slot(j);
  }
  void hpass(const int32_t* s, int32_t* dst) {
    constexpr int HXB = 64;
    auto edge = [&](int x) {
      int32_t sum = 0;
      for (int k = 0; k < ks; k++) {
        int sx = x - pad + k;
        if (sx >= 0 && sx < w) sum += s[sx] * kw[k];
      }
      dst[x] = shr_to_zero(sum, src_prec);
    };
    int x = 0;
    for (; x < pad && x < w; x++) edge(x);
    const int x_end = w - pad;
    auto block = [&](int x0) {
      int32_t hacc[HXB];
      for (int i = 0; i < HXB; i++) hacc[i] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t wgt = kw[k];
        const int32_t* sp = s + x0 - pad + k;
        for (int i = 0; i < HXB; i++) hacc[i] += sp[i] * wgt;
      }
      for (int i = 0; i < HXB; i++)
        dst[x0 + i] = shr_to_zero(hacc[i], src_prec);
    };
    if (x_end - x >= HXB) {
      int x0 = x;
      for (; x0 + HXB <= x_end; x0 += HXB) block(x0);
      if (x0 < x_end) block(x_end - HXB);
      x = x_end;
    } else {
      for (; x < x_end; x++) edge(x);
    }
    for (x = x_end > x ? x_end : x; x < w; x++) edge(x);
  }
  void produce(int y, int32_t* dst) override {
    const int jmax = y + pad < h ? y + pad : h - 1;
    if (jmax >= 0) trow(jmax);
    const int32_t* trows[32];
    for (int k = 0; k < ks; k++) {
      const int sy = y - pad + k;
      trows[k] = (sy >= 0 && sy < h) ? trow(sy) : nullptr;
    }
    const int32_t* res = src->row(y);
    const int residue_shift = UPS_PRECISION - src_prec;
    constexpr int XB = 64;
    auto block = [&](int x0) {
      int32_t accb[XB];
      for (int x = 0; x < XB; x++)
        accb[x] = (res[x0 + x] << residue_shift) << UPS_PRECISION;
      for (int k = 0; k < ks; k++) {
        if (!trows[k]) continue;
        const int32_t wgt = kw[k];
        const int32_t* sp = trows[k] + x0;
        for (int x = 0; x < XB; x++) accb[x] += sp[x] * wgt;
      }
      for (int x = 0; x < XB; x++)
        dst[x0 + x] = shr_to_zero(accb[x], UPS_PRECISION);
    };
    if (w >= XB) {
      int x0 = 0;
      for (; x0 + XB <= w; x0 += XB) block(x0);
      if (x0 < w) block(w - XB);
    } else {
      for (int x = 0; x < w; x++) {
        int32_t sum = (res[x] << residue_shift) << UPS_PRECISION;
        for (int k = 0; k < ks; k++)
          if (trows[k]) sum += trows[k][x] * kw[k];
        dst[x] = shr_to_zero(sum, UPS_PRECISION);
      }
    }
  }
};

// Streaming twin of ups_upsample: even symmetric x2 transposed conv as two
// polyphase filters, output cropped to (out_h, out_w).
struct UpsampleRows : RowProducer {
  RowProducer* src = nullptr;
  int src_prec = UPS_PRECISION, ks = 0, pad = 0, h_in = 0, w_in = 0;
  int32_t kw_e[16], kw_o[16];
  Ring tmp;  // H-polyphase rows, width 2*w_in (replicate-pad columns)

  void init(RowProducer* s, const int32_t* kw_full, int ksx2, int prec,
            int out_h, int out_w, int out_cap) {
    tag = 2;
    src = s;
    h_in = s->h;
    w_in = s->w;
    src_prec = prec;
    ks = ksx2 / 2;
    pad = ks / 2;
    for (int i = 0; i < ks; i++) {
      kw_e[i] = kw_full[2 * i];
      kw_o[i] = kw_full[2 * i + 1];
    }
    h = out_h;
    w = out_w;
    ring.init(out_w, out_cap);
    tmp.init(2 * w_in, 2 * pad + 6);
  }

 protected:
  const int32_t* trow(int j) {
    while (tmp.hi < j) {
      hpass(src->row(tmp.hi + 1), tmp.slot(tmp.hi + 1));
      tmp.hi++;
    }
    return tmp.slot(j);
  }
  void hpass(const int32_t* s, int32_t* dst) {
    constexpr int HXB = 32;
    const int xi0 = pad;
    const int xi1 = w_in - ks + pad;  // exclusive
    auto border = [&](int x) {
      int32_t se = 0, so = 0;
      for (int k = 0; k < ks; k++) {
        se += s[clampi_s(x - pad + k, 0, w_in - 1)] * kw_e[k];
        so += s[clampi_s(x - pad + k + 1, 0, w_in - 1)] * kw_o[k];
      }
      dst[2 * x] = shr_to_zero(se, src_prec);
      dst[2 * x + 1] = shr_to_zero(so, src_prec);
    };
    int x = 0;
    for (; x < xi0 && x < w_in; x++) border(x);
    auto block = [&](int x0) {
      int32_t hacc_e[HXB], hacc_o[HXB];
      for (int i = 0; i < HXB; i++) hacc_e[i] = 0;
      for (int i = 0; i < HXB; i++) hacc_o[i] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t we = kw_e[k], wo = kw_o[k];
        const int32_t* se = s + x0 - pad + k;
        const int32_t* so = se + 1;
        for (int i = 0; i < HXB; i++) hacc_e[i] += se[i] * we;
        for (int i = 0; i < HXB; i++) hacc_o[i] += so[i] * wo;
      }
      int32_t* d = dst + 2 * x0;
      for (int i = 0; i < HXB; i++) {
        d[2 * i] = shr_to_zero(hacc_e[i], src_prec);
        d[2 * i + 1] = shr_to_zero(hacc_o[i], src_prec);
      }
    };
    if (xi1 - x >= HXB) {
      int x0 = x;
      for (; x0 + HXB <= xi1; x0 += HXB) block(x0);
      if (x0 < xi1) block(xi1 - HXB);
      x = xi1;
    } else {
      for (; x < xi1; x++) border(x);
    }
    for (x = xi1 > x ? xi1 : x; x < w_in; x++) border(x);
  }
  void produce(int r, int32_t* dst) override {
    const int y = r >> 1, ph = r & 1;
    const int jmax = clampi_s(y + ks - pad, 0, h_in - 1);
    trow(jmax);
    const int32_t* rows[16];
    for (int k = 0; k < ks; k++)
      rows[k] = trow(clampi_s(y - pad + k + ph, 0, h_in - 1));
    const int32_t* kw = ph ? kw_o : kw_e;
    constexpr int XB = 64;
    auto block = [&](int x0) {
      int32_t accb[XB];
      for (int x = 0; x < XB; x++) accb[x] = 0;
      for (int k = 0; k < ks; k++) {
        const int32_t wgt = kw[k];
        const int32_t* sp = rows[k] + x0;
        for (int x = 0; x < XB; x++) accb[x] += sp[x] * wgt;
      }
      for (int x = 0; x < XB; x++)
        dst[x0 + x] = shr_to_zero(accb[x], UPS_PRECISION);
    };
    if (w >= XB) {
      int x0 = 0;
      for (; x0 + XB <= w; x0 += XB) block(x0);
      if (x0 < w) block(w - XB);
    } else {
      for (int x = 0; x < w; x++) {
        int32_t sum = 0;
        for (int k = 0; k < ks; k++) sum += rows[k][x] * kw[k];
        dst[x] = shr_to_zero(sum, UPS_PRECISION);
      }
    }
  }
};

#ifdef __AVX512F__
// One 1x1 layer over a 64-px block, 4-output register tile: each input
// block is loaded once and feeds 4 accumulator quartets (the
// autovectorized form reloads it per output — measured 1.5x slower).
inline void chain_block4_avx512(const int32_t** srcp, int32_t** dstp,
                                const int32_t* w, const int32_t* b, int ci,
                                int o0, int x0, bool residual, bool relu) {
  __m512i a0[4], a1[4], a2[4], a3[4];
  for (int v = 0; v < 4; v++) {
    a0[v] = _mm512_set1_epi32(b[o0]);
    a1[v] = _mm512_set1_epi32(b[o0 + 1]);
    a2[v] = _mm512_set1_epi32(b[o0 + 2]);
    a3[v] = _mm512_set1_epi32(b[o0 + 3]);
  }
  if (residual) {
    __m512i* accs[4] = {a0, a1, a2, a3};
    for (int j = 0; j < 4; j++) {
      const int32_t* r = srcp[o0 + j] + x0;
      for (int v = 0; v < 4; v++) {
        __m512i rv = _mm512_loadu_si512((const void*)(r + v * 16));
        accs[j][v] = _mm512_add_epi32(
            accs[j][v], _mm512_slli_epi32(rv, SYN_MUL_PRECISION));
      }
    }
  }
  for (int i = 0; i < ci; i++) {
    const int32_t* sr = srcp[i] + x0;
    const __m512i w0 = _mm512_set1_epi32(w[(size_t)(o0 + 0) * ci + i]);
    const __m512i w1 = _mm512_set1_epi32(w[(size_t)(o0 + 1) * ci + i]);
    const __m512i w2 = _mm512_set1_epi32(w[(size_t)(o0 + 2) * ci + i]);
    const __m512i w3 = _mm512_set1_epi32(w[(size_t)(o0 + 3) * ci + i]);
    for (int v = 0; v < 4; v++) {
      const __m512i sv = _mm512_loadu_si512((const void*)(sr + v * 16));
      a0[v] = _mm512_add_epi32(a0[v], _mm512_mullo_epi32(sv, w0));
      a1[v] = _mm512_add_epi32(a1[v], _mm512_mullo_epi32(sv, w1));
      a2[v] = _mm512_add_epi32(a2[v], _mm512_mullo_epi32(sv, w2));
      a3[v] = _mm512_add_epi32(a3[v], _mm512_mullo_epi32(sv, w3));
    }
  }
  const __m512i zero = _mm512_setzero_si512();
  __m512i* accs[4] = {a0, a1, a2, a3};
  for (int j = 0; j < 4; j++) {
    int32_t* dst = dstp[o0 + j] + x0;
    for (int v = 0; v < 4; v++) {
      const __m512i sum = accs[j][v];
      const __mmask16 isneg = _mm512_cmplt_epi32_mask(sum, zero);
      const __m512i pos = _mm512_srai_epi32(sum, SYN_MUL_PRECISION);
      const __m512i nval = _mm512_sub_epi32(
          zero, _mm512_srai_epi32(_mm512_sub_epi32(zero, sum),
                                  SYN_MUL_PRECISION));
      _mm512_storeu_si512(
          (void*)(dst + v * 16),
          _mm512_mask_blend_epi32(isneg, pos, relu ? zero : nval));
    }
  }
}

inline void chain_block1_avx512(const int32_t** srcp, int32_t** dstp,
                                const int32_t* w, const int32_t* b, int ci,
                                int o, int x0, bool residual, bool relu) {
  __m512i a[4];
  for (int v = 0; v < 4; v++) a[v] = _mm512_set1_epi32(b[o]);
  if (residual) {
    const int32_t* r = srcp[o] + x0;
    for (int v = 0; v < 4; v++) {
      __m512i rv = _mm512_loadu_si512((const void*)(r + v * 16));
      a[v] = _mm512_add_epi32(a[v], _mm512_slli_epi32(rv, SYN_MUL_PRECISION));
    }
  }
  const int32_t* krow = w + (size_t)o * ci;
  for (int i = 0; i < ci; i++) {
    if (!krow[i]) continue;
    const __m512i wv = _mm512_set1_epi32(krow[i]);
    const int32_t* sr = srcp[i] + x0;
    for (int v = 0; v < 4; v++) {
      const __m512i sv = _mm512_loadu_si512((const void*)(sr + v * 16));
      a[v] = _mm512_add_epi32(a[v], _mm512_mullo_epi32(sv, wv));
    }
  }
  const __m512i zero = _mm512_setzero_si512();
  int32_t* dst = dstp[o] + x0;
  for (int v = 0; v < 4; v++) {
    const __m512i sum = a[v];
    const __mmask16 isneg = _mm512_cmplt_epi32_mask(sum, zero);
    const __m512i pos = _mm512_srai_epi32(sum, SYN_MUL_PRECISION);
    const __m512i nval = _mm512_sub_epi32(
        zero,
        _mm512_srai_epi32(_mm512_sub_epi32(zero, sum), SYN_MUL_PRECISION));
    _mm512_storeu_si512(
        (void*)(dst + v * 16),
        _mm512_mask_blend_epi32(isneg, pos, relu ? zero : nval));
  }
}
#endif  // __AVX512F__

// Fused 1x1 chain over the dense rows: channel-major [co][W] output rows.
struct ChainRows : RowProducer {
  std::vector<RowProducer*> dense;
  std::vector<const int32_t*> cw, cb;
  std::vector<int> couts, cins;
  std::vector<int> res_flags, relu_flags;
  int W_ = 0, n_layers = 0, co_final = 0;
  std::vector<int32_t> buf_a, buf_b;

  void init(std::vector<RowProducer*> d, const int32_t*& wp, const int32_t*& bp,
            const int32_t* syn_desc, int chain_end, int W, int out_cap) {
    tag = 3;
    dense = std::move(d);
    W_ = W;
    n_layers = chain_end;
    int ci = (int)dense.size();
    int max_ft = ci;
    for (int l = 0; l < chain_end; l++) {
      const int co = syn_desc[4 * l + 0];
      cw.push_back(wp);
      cb.push_back(bp);
      cins.push_back(ci);
      couts.push_back(co);
      res_flags.push_back(syn_desc[4 * l + 2]);
      relu_flags.push_back(syn_desc[4 * l + 3]);
      wp += (size_t)co * ci;
      bp += co;
      ci = co;
      if (co > max_ft) max_ft = co;
    }
    co_final = ci;
    h = dense[0]->h;
    w = co_final * W;
    ring.init(w, out_cap);
    buf_a.resize((size_t)max_ft * W);
    buf_b.resize((size_t)max_ft * W);
  }

 protected:
  void produce(int y, int32_t* out_row) override {
    const int n_in = (int)dense.size();
    const int32_t* srcp[64];
    int32_t* dstp[64];
    int32_t* lbuf_in = buf_a.data();
    int32_t* lbuf_out = buf_b.data();
    for (int i = 0; i < n_in; i++) srcp[i] = dense[i]->row(y);
    for (int l = 0; l < n_layers; l++) {
      const bool residual = res_flags[l] != 0;
      const bool relu = relu_flags[l] != 0;
      const int ci = cins[l], co = couts[l];
      if (l > 0)
        for (int i = 0; i < ci; i++) srcp[i] = lbuf_in + (size_t)i * W_;
      for (int o = 0; o < co; o++)
        dstp[o] = l == n_layers - 1 ? out_row + (size_t)o * W_
                                    : lbuf_out + (size_t)o * W_;
      constexpr int XB = 64;
#ifdef __AVX512F__
      if (W_ >= XB) {
        auto col = [&](int x0) {
          int o = 0;
          for (; o + 4 <= co; o += 4)
            chain_block4_avx512(srcp, dstp, cw[l], cb[l], ci, o, x0, residual,
                                relu);
          for (; o < co; o++)
            chain_block1_avx512(srcp, dstp, cw[l], cb[l], ci, o, x0, residual,
                                relu);
        };
        int x0 = 0;
        for (; x0 + XB <= W_; x0 += XB) col(x0);
        if (x0 < W_) col(W_ - XB);
        std::swap(lbuf_in, lbuf_out);
        continue;
      }
#endif
      // Constant-trip block (accb strip promoted to registers); outputs are
      // pure in x, so a shifted overlapping final block covers the tail.
      auto block = [&](int x0) {
        for (int o = 0; o < co; o++) {
          const int32_t bias = cb[l][o];
          const int32_t* krow = cw[l] + (size_t)o * ci;
          int32_t accb[XB];
          for (int x = 0; x < XB; x++) accb[x] = bias;
          if (residual) {
            const int32_t* r = srcp[o] + x0;
            for (int x = 0; x < XB; x++) accb[x] += r[x] << SYN_MUL_PRECISION;
          }
          for (int i = 0; i < ci; i++) {
            const int32_t wgt = krow[i];
            if (wgt == 0) continue;
            const int32_t* s = srcp[i] + x0;
            for (int x = 0; x < XB; x++) accb[x] += s[x] * wgt;
          }
          int32_t* dst = dstp[o] + x0;
          for (int x = 0; x < XB; x++) {
            int32_t sum = accb[x];
            if (sum < 0)
              dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
            else
              dst[x] = sum >> SYN_MUL_PRECISION;
          }
        }
      };
      if (W_ >= XB) {
        int x0 = 0;
        for (; x0 + XB <= W_; x0 += XB) block(x0);
        if (x0 < W_) block(W_ - XB);
      } else {
        for (int o = 0; o < co; o++) {
          const int32_t bias = cb[l][o];
          const int32_t* krow = cw[l] + (size_t)o * ci;
          for (int x = 0; x < W_; x++) {
            int32_t sum = bias;
            if (residual) sum += srcp[o][x] << SYN_MUL_PRECISION;
            for (int i = 0; i < ci; i++) sum += srcp[i][x] * krow[i];
            if (sum < 0)
              dstp[o][x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
            else
              dstp[o][x] = sum >> SYN_MUL_PRECISION;
          }
        }
      }
      std::swap(lbuf_in, lbuf_out);
    }
  }
};

#ifdef __AVX512F__
// One spatial layer over a 64-px block, 4-output register tile (same
// load-sharing as chain_block4_avx512; taps iterate (in, ky, kx)).
inline void spatial_block4_avx512(const int32_t* const* srows, int32_t* dst0,
                                  const int32_t* resrow, const int32_t* wts,
                                  const int32_t* bias, int n_in, int ks,
                                  int pad, int W, int o0, int x0,
                                  bool residual, bool relu) {
  __m512i a0[4], a1[4], a2[4], a3[4];
  for (int v = 0; v < 4; v++) {
    a0[v] = _mm512_set1_epi32(bias[o0]);
    a1[v] = _mm512_set1_epi32(bias[o0 + 1]);
    a2[v] = _mm512_set1_epi32(bias[o0 + 2]);
    a3[v] = _mm512_set1_epi32(bias[o0 + 3]);
  }
  __m512i* accs[4] = {a0, a1, a2, a3};
  if (residual) {
    for (int j = 0; j < 4; j++) {
      const int32_t* r = resrow + (size_t)(o0 + j) * W + x0;
      for (int v = 0; v < 4; v++) {
        __m512i rv = _mm512_loadu_si512((const void*)(r + v * 16));
        accs[j][v] = _mm512_add_epi32(
            accs[j][v], _mm512_slli_epi32(rv, SYN_MUL_PRECISION));
      }
    }
  }
  const int ksq = ks * ks;
  const size_t ostride = (size_t)n_in * ksq;
  for (int i = 0; i < n_in; i++) {
    for (int yy = 0; yy < ks; yy++) {
      const int32_t* srow = srows[i * ks + yy] + x0 - pad;
      for (int xx = 0; xx < ks; xx++) {
        const int t = i * ksq + yy * ks + xx;
        const __m512i w0 = _mm512_set1_epi32(wts[(o0 + 0) * ostride + t]);
        const __m512i w1 = _mm512_set1_epi32(wts[(o0 + 1) * ostride + t]);
        const __m512i w2 = _mm512_set1_epi32(wts[(o0 + 2) * ostride + t]);
        const __m512i w3 = _mm512_set1_epi32(wts[(o0 + 3) * ostride + t]);
        const int32_t* sp = srow + xx;
        for (int v = 0; v < 4; v++) {
          const __m512i sv = _mm512_loadu_si512((const void*)(sp + v * 16));
          a0[v] = _mm512_add_epi32(a0[v], _mm512_mullo_epi32(sv, w0));
          a1[v] = _mm512_add_epi32(a1[v], _mm512_mullo_epi32(sv, w1));
          a2[v] = _mm512_add_epi32(a2[v], _mm512_mullo_epi32(sv, w2));
          a3[v] = _mm512_add_epi32(a3[v], _mm512_mullo_epi32(sv, w3));
        }
      }
    }
  }
  const __m512i zero = _mm512_setzero_si512();
  for (int j = 0; j < 4; j++) {
    int32_t* dst = dst0 + (size_t)(o0 + j) * W + x0;
    for (int v = 0; v < 4; v++) {
      const __m512i sum = accs[j][v];
      const __mmask16 isneg = _mm512_cmplt_epi32_mask(sum, zero);
      const __m512i pos = _mm512_srai_epi32(sum, SYN_MUL_PRECISION);
      const __m512i nval = _mm512_sub_epi32(
          zero, _mm512_srai_epi32(_mm512_sub_epi32(zero, sum),
                                  SYN_MUL_PRECISION));
      _mm512_storeu_si512(
          (void*)(dst + v * 16),
          _mm512_mask_blend_epi32(isneg, pos, relu ? zero : nval));
    }
  }
}

inline void spatial_block1_avx512(const int32_t* const* srows, int32_t* dst0,
                                  const int32_t* resrow, const int32_t* wts,
                                  const int32_t* bias, int n_in, int ks,
                                  int pad, int W, int o, int x0, bool residual,
                                  bool relu) {
  __m512i a[4];
  for (int v = 0; v < 4; v++) a[v] = _mm512_set1_epi32(bias[o]);
  if (residual) {
    const int32_t* r = resrow + (size_t)o * W + x0;
    for (int v = 0; v < 4; v++) {
      __m512i rv = _mm512_loadu_si512((const void*)(r + v * 16));
      a[v] = _mm512_add_epi32(a[v], _mm512_slli_epi32(rv, SYN_MUL_PRECISION));
    }
  }
  const int ksq = ks * ks;
  const int32_t* kbase = wts + (size_t)o * n_in * ksq;
  for (int i = 0; i < n_in; i++) {
    for (int yy = 0; yy < ks; yy++) {
      const int32_t* srow = srows[i * ks + yy] + x0 - pad;
      for (int xx = 0; xx < ks; xx++) {
        const int32_t wgt = kbase[i * ksq + yy * ks + xx];
        if (!wgt) continue;
        const __m512i wv = _mm512_set1_epi32(wgt);
        const int32_t* sp = srow + xx;
        for (int v = 0; v < 4; v++) {
          const __m512i sv = _mm512_loadu_si512((const void*)(sp + v * 16));
          a[v] = _mm512_add_epi32(a[v], _mm512_mullo_epi32(sv, wv));
        }
      }
    }
  }
  const __m512i zero = _mm512_setzero_si512();
  int32_t* dst = dst0 + (size_t)o * W + x0;
  for (int v = 0; v < 4; v++) {
    const __m512i sum = a[v];
    const __mmask16 isneg = _mm512_cmplt_epi32_mask(sum, zero);
    const __m512i pos = _mm512_srai_epi32(sum, SYN_MUL_PRECISION);
    const __m512i nval = _mm512_sub_epi32(
        zero,
        _mm512_srai_epi32(_mm512_sub_epi32(zero, sum), SYN_MUL_PRECISION));
    _mm512_storeu_si512(
        (void*)(dst + v * 16),
        _mm512_mask_blend_epi32(isneg, pos, relu ? zero : nval));
  }
}
#endif  // __AVX512F__

// One spatial (odd-ks) synthesis layer over a multi-channel producer.
struct SpatialRows : RowProducer {
  RowProducer* src = nullptr;
  int n_in = 0, co = 0, ks = 0, pad = 0, W_ = 0;
  bool residual = false, relu = false;
  // yuv420 output: odd-row chroma is discarded by the caller's 4:2:0
  // expansion, so the final layer skips channels 1.. on odd rows.
  bool skip_odd_chroma = false;
  const int32_t* wts = nullptr;
  const int32_t* bias = nullptr;

  void init(RowProducer* s, int n_in_, int W, const int32_t*& wp,
            const int32_t*& bp, const int32_t* desc, int out_cap) {
    tag = 4;
    src = s;
    n_in = n_in_;
    W_ = W;
    co = desc[0];
    ks = desc[1];
    residual = desc[2] != 0;
    relu = desc[3] != 0;
    pad = (ks - 1) / 2;
    wts = wp;
    bias = bp;
    wp += (size_t)co * n_in * ks * ks;
    bp += co;
    h = s->h;
    w = co * W;
    ring.init(w, out_cap);
  }

 protected:
  void produce(int y, int32_t* out_row) override {
    const int jmax = y + pad < h ? y + pad : h - 1;
    src->row(jmax);
    const int32_t* srows[64 * 9];
    for (int yy = 0; yy < ks; yy++) {
      const int sy = clampi_s(y + yy - pad, 0, h - 1);
      const int32_t* block = src->row(sy);
      for (int i = 0; i < n_in; i++)
        srows[i * ks + yy] = block + (size_t)i * W_;
    }
    const int32_t* resrow = residual ? src->row(y) : nullptr;
    auto clampx = [&](int x) { return x < 0 ? 0 : (x >= W_ ? W_ - 1 : x); };
    constexpr int XB = 64;
    const int o_end = (skip_odd_chroma && (y & 1) && co > 1) ? 1 : co;
#ifdef __AVX512F__
    if (W_ - 2 * pad >= XB) {
      // Interior via the 4-output register-tiled kernels; borders scalar.
      const int xi1 = W_ - pad;
      auto col = [&](int x0) {
        int o = 0;
        for (; o + 4 <= o_end; o += 4)
          spatial_block4_avx512(srows, out_row, resrow, wts, bias, n_in, ks,
                                pad, W_, o, x0, residual, relu);
        for (; o < o_end; o++)
          spatial_block1_avx512(srows, out_row, resrow, wts, bias, n_in, ks,
                                pad, W_, o, x0, residual, relu);
      };
      int x0 = pad;
      for (; x0 + XB <= xi1; x0 += XB) col(x0);
      if (x0 < xi1) col(xi1 - XB);
      for (int o = 0; o < o_end; o++) {
        const int32_t* kbase = wts + (size_t)o * n_in * ks * ks;
        const int32_t b = bias[o];
        const int32_t* rres = residual ? resrow + (size_t)o * W_ : nullptr;
        int32_t* dst = out_row + (size_t)o * W_;
        auto border_px = [&](int x) {
          int32_t sum = b;
          if (rres) sum += rres[x] << SYN_MUL_PRECISION;
          const int32_t* k = kbase;
          for (int i = 0; i < n_in; i++)
            for (int yy = 0; yy < ks; yy++) {
              const int32_t* sp = srows[i * ks + yy];
              for (int xx = 0; xx < ks; xx++)
                sum += sp[clampx(x + xx - pad)] * *k++;
            }
          if (sum < 0)
            dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
          else
            dst[x] = sum >> SYN_MUL_PRECISION;
        };
        for (int x = 0; x < pad; x++) border_px(x);
        for (int x = xi1; x < W_; x++) border_px(x);
      }
      return;
    }
#endif
    for (int o = 0; o < o_end; o++) {
      const int32_t* kbase = wts + (size_t)o * n_in * ks * ks;
      const int32_t b = bias[o];
      const int32_t* rres = residual ? resrow + (size_t)o * W_ : nullptr;
      int32_t* dst = out_row + (size_t)o * W_;
      auto border_px = [&](int x) {
        int32_t sum = b;
        if (rres) sum += rres[x] << SYN_MUL_PRECISION;
        const int32_t* k = kbase;
        for (int i = 0; i < n_in; i++)
          for (int yy = 0; yy < ks; yy++) {
            const int32_t* sp = srows[i * ks + yy];
            for (int xx = 0; xx < ks; xx++)
              sum += sp[clampx(x + xx - pad)] * *k++;
          }
        if (sum < 0)
          dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
        else
          dst[x] = sum >> SYN_MUL_PRECISION;
      };
      for (int x = 0; x < pad && x < W_; x++) border_px(x);
      const int xi1 = W_ - pad;
      // Constant-trip interior blocks with a shifted overlapping tail (pure
      // in x), so the accumulator strip stays in registers.
      auto block = [&](int x0) {
        int32_t accb[XB];
        for (int x = 0; x < XB; x++) accb[x] = b;
        if (rres)
          for (int x = 0; x < XB; x++)
            accb[x] += rres[x0 + x] << SYN_MUL_PRECISION;
        const int32_t* k = kbase;
        for (int i = 0; i < n_in; i++) {
          for (int yy = 0; yy < ks; yy++) {
            const int32_t* srow = srows[i * ks + yy] + x0 - pad;
            for (int xx = 0; xx < ks; xx++) {
              const int32_t wgt = *k++;
              if (wgt == 0) continue;
              const int32_t* s = srow + xx;
              for (int x = 0; x < XB; x++) accb[x] += s[x] * wgt;
            }
          }
        }
        for (int x = 0; x < XB; x++) {
          int32_t sum = accb[x];
          if (sum < 0)
            dst[x0 + x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
          else
            dst[x0 + x] = sum >> SYN_MUL_PRECISION;
        }
      };
      if (xi1 - pad >= XB) {
        int x0 = pad;
        for (; x0 + XB <= xi1; x0 += XB) block(x0);
        if (x0 < xi1) block(xi1 - XB);
      } else {
        for (int x = pad; x < xi1; x++) border_px(x);
      }
      for (int x = xi1 > pad ? xi1 : pad; x < W_; x++) border_px(x);
    }
  }
};

// Build the pipeline and stream the frame. Returns false when the layer
// pattern falls outside what the pipeline handles (caller falls back to
// the plane path).
// flags bit 0: yuv420 output — odd-row chroma of the final layer is
// overwritten by the caller's 4:2:0 expansion, so skip computing it.
bool ups_syn_stream(const int32_t* latents, const int32_t* heights,
                    const int32_t* widths, int n_res, int ups_k_size,
                    int pre_k_size, const int32_t* ups_kernels,
                    const int32_t* pre_kernels, const int32_t* syn_w,
                    const int32_t* syn_b, const int32_t* syn_desc,
                    int n_syn_layers, int flags, int32_t* out) {
  const int H = heights[0], W = widths[0];
  // Applicability: a leading run of 1x1 layers (>=1; mixes the n_res
  // channels) followed only by odd-ks spatial layers; bounded kernels.
  int chain_end = 0;
  while (chain_end < n_syn_layers && syn_desc[4 * chain_end + 1] == 1)
    chain_end++;
  if (chain_end < 1 || n_res < 2 || n_res > 16) return false;
  for (int l = 0; l < chain_end; l++)
    if (syn_desc[4 * l + 0] > 64) return false;  // srcp/dstp bounds
  for (int l = chain_end; l < n_syn_layers; l++) {
    const int ks = syn_desc[4 * l + 1];
    if (ks < 3 || ks > 9 || ks % 2 == 0) return false;
    if (syn_desc[4 * l + 0] > 64) return false;
  }
  if (ups_k_size / 2 > 16 || pre_k_size > 31 || pre_k_size % 2 == 0)
    return false;

  // Per-layer cascades: latent -> [refine] -> upsample chain to full res.
  std::vector<std::unique_ptr<RowProducer>> stages;
  std::vector<RowProducer*> dense(n_res);
  const int32_t* lat_ptr = latents;
  const int lat_cap = 2 * (pre_k_size / 2) + 6;
  for (int layer = 0; layer < n_res; layer++) {
    const int hL = heights[layer], wL = widths[layer];
    auto lr = std::make_unique<LatentRows>();
    lr->init(lat_ptr, hL, wL, lat_cap);
    lat_ptr += (size_t)hL * wL;
    RowProducer* cur = lr.get();
    stages.push_back(std::move(lr));

    int src_prec = ARM_PRECISION;
    if (layer == 0 || layer != n_res - 1) {
      const int32_t* kw =
          pre_kernels + ((n_res - 2 - layer) % (n_res - 1)) * pre_k_size;
      auto rf = std::make_unique<RefineRows>();
      // Cascade consumers (upsample hpass / chain) read rows strictly
      // sequentially, so a 3-row ring suffices — keeps the working set
      // cache-resident at 1080p+ widths.
      rf->init(cur, kw, pre_k_size, ARM_PRECISION, 3);
      cur = rf.get();
      stages.push_back(std::move(rf));
      src_prec = UPS_PRECISION;
      if (layer == 0) {
        dense[0] = cur;
        continue;
      }
    } else {
      src_prec = ARM_PRECISION;  // coarsest layer: no refine
    }
    for (int target = layer - 1; target >= 0; target--) {
      const int32_t* kw =
          ups_kernels + ((n_res - 2 - target) % (n_res - 1)) * ups_k_size;
      auto up = std::make_unique<UpsampleRows>();
      up->init(cur, kw, ups_k_size, src_prec, heights[target], widths[target],
               3);
      cur = up.get();
      stages.push_back(std::move(up));
      src_prec = UPS_PRECISION;
    }
    dense[layer] = cur;
  }

  const int32_t* wp = syn_w;
  const int32_t* bp = syn_b;
  auto chain = std::make_unique<ChainRows>();
  // Chain ring must cover the first spatial layer's look-back (ks rows).
  int next_ks = chain_end < n_syn_layers ? syn_desc[4 * chain_end + 1] : 1;
  chain->init(dense, wp, bp, syn_desc, chain_end, W, next_ks + 3);
  RowProducer* top = chain.get();
  int n_in = chain->co_final;
  stages.push_back(std::move(chain));
  SpatialRows* last_spatial = nullptr;
  for (int l = chain_end; l < n_syn_layers; l++) {
    next_ks = l + 1 < n_syn_layers ? syn_desc[4 * (l + 1) + 1] : 1;
    auto sp = std::make_unique<SpatialRows>();
    sp->init(top, n_in, W, wp, bp, syn_desc + 4 * l, next_ks + 3);
    n_in = sp->co;
    top = sp.get();
    last_spatial = sp.get();
    stages.push_back(std::move(sp));
  }
  const bool skip_odd = (flags & 1) && last_spatial && n_in == 3;
  if (skip_odd) last_spatial->skip_odd_chroma = true;

  for (int y = 0; y < H; y++) {
    const int32_t* r = top->row(y);
    const int o_copy = (skip_odd && (y & 1)) ? 1 : n_in;
    for (int o = 0; o < o_copy; o++)
      std::memcpy(out + ((size_t)o * H + y) * W, r + (size_t)o * W,
                  (size_t)W * sizeof(int32_t));
  }
  if (stream_prof_enabled()) {
    double* b = prof_bins();
    fprintf(stderr, "stream prof:");
    for (int i = 0; i < 5; i++) {
      fprintf(stderr, " %s %.1f ms", PROF_TAGS[i], b[i] * 1e3);
      b[i] = 0.0;
    }
    fprintf(stderr, "\n");
  }
  return true;
}

}  // namespace

extern "C" {

// Integer upsample + synthesize one frame.
//
//   latents       : concatenated int32 latent grids (1 feature per
//                   resolution), full-res grid first; PLAIN integer values
//                   (the function applies the ARM fixed-point shift).
//   heights/widths: per-resolution dims, [n_res].
//   ups_kernels   : n_res-1 full (mirrored) x2 kernels at 12 frac bits,
//                   concatenated, each ups_k_size ints.
//   pre_kernels   : n_res-1 full pre-concat kernels, each pre_k_size ints.
//   syn_w / syn_b : concatenated synthesis weights (12 frac) / biases (24
//                   frac), layer order, OIHW row-major.
//   syn_desc      : per layer [out_ft, ks, residual, relu], 4 ints each.
//   out           : [out_ft_last * H * W] int32 at 12 frac bits.
void ccz_ups_syn_int_flags(const int32_t* latents, const int32_t* heights,
                           const int32_t* widths, int n_res, int ups_k_size,
                           int pre_k_size, const int32_t* ups_kernels,
                           const int32_t* pre_kernels, const int32_t* syn_w,
                           const int32_t* syn_b, const int32_t* syn_desc,
                           int n_syn_layers, int flags, int32_t* out) {
  int H = heights[0], W = widths[0];
  const auto t_ups0 = std::chrono::steady_clock::now();

  // ---- Row-streaming fused path (cache-resident; see ups_syn_stream).
  // CCZ_NO_STREAM=1 forces the plane path (A/B and debugging).
  static const bool no_stream = [] {
    const char* e = getenv("CCZ_NO_STREAM");
    return e && e[0] == '1';
  }();
  if (!no_stream &&
      ups_syn_stream(latents, heights, widths, n_res, ups_k_size, pre_k_size,
                     ups_kernels, pre_kernels, syn_w, syn_b, syn_desc,
                     n_syn_layers, flags, out)) {
    const double dt = std::chrono::duration<double>(
                          std::chrono::steady_clock::now() - t_ups0)
                          .count();
    // Stages are interleaved in the stream: report the whole cost as
    // fused syn, ups/chain/spatial splits zero.
    g_stage_secs[0] = g_stage_secs[2] = g_stage_secs[3] = 0.0;
    g_stage_secs[1] = dt;
    return;
  }

  // ---- Upsampling: each layer independently to full resolution. Scratch
  // planes (pass intermediate + cascade ping/pong) are allocated once at
  // full-res size and recycled across every layer — no per-step heap
  // traffic or zero fills.
  std::vector<Plane> dense(n_res);
  Plane scratch, ping, pong;
  const int32_t* lat_ptr = latents;
  for (int layer = 0; layer < n_res; layer++) {
    int h = heights[layer], w = widths[layer];
    ping.resize(h, w);
    for (int i = 0; i < h * w; i++)
      ping.data[i] = lat_ptr[i] << ARM_PRECISION;  // to ARM fixed point
    lat_ptr += h * w;

    int src_prec = ARM_PRECISION;
    if (layer == 0) {
      const int32_t* kw = pre_kernels + (n_res - 2 - 0) % (n_res - 1) * pre_k_size;
      ups_refine(ping, kw, pre_k_size, ARM_PRECISION, scratch, dense[0]);
      continue;
    }
    Plane* cur = &ping;
    Plane* nxt = &pong;
    if (layer != n_res - 1) {
      const int32_t* kw =
          pre_kernels + ((n_res - 2 - layer) % (n_res - 1)) * pre_k_size;
      ups_refine(*cur, kw, pre_k_size, ARM_PRECISION, scratch, *nxt);
      std::swap(cur, nxt);
      src_prec = UPS_PRECISION;
    }
    for (int target = layer - 1; target >= 0; target--) {
      const int32_t* kw =
          ups_kernels + ((n_res - 2 - target) % (n_res - 1)) * ups_k_size;
      Plane& dst = target == 0 ? dense[layer] : *nxt;
      ups_upsample(*cur, kw, ups_k_size, src_prec, heights[target],
                   widths[target], scratch, dst);
      if (target != 0) std::swap(cur, nxt);
      src_prec = UPS_PRECISION;
    }
  }

  const auto t_syn0 = std::chrono::steady_clock::now();
  g_stage_secs[0] =
      std::chrono::duration<double>(t_syn0 - t_ups0).count();

  // ---- Synthesis: conv stack over the dense planes
  // (reference: syn_cpu.hpp, run_syn). int32 accumulation matches the
  // reference's fixed-point semantics exactly; row-major inner loops
  // autovectorize.
  std::vector<Plane> planes = std::move(dense);
  const int32_t* wp = syn_w;
  const int32_t* bp = syn_b;
  int n_in = n_res;

  // Fast path: a leading chain of consecutive 1x1 layers (the reference's
  // "fused" hot case, e.g. 7->48(relu)->3; reference: synfused_cpu.hpp)
  // is processed row by row so the wide intermediate (48 x W) lives in
  // cache instead of round-tripping 48 full planes through memory.
  int l0 = 0;
  {
    int chain_end = 0;
    while (chain_end < n_syn_layers && syn_desc[4 * chain_end + 1] == 1)
      chain_end++;
    if (chain_end >= 2) {
      // Per-layer weight/bias pointers within the chain.
      std::vector<const int32_t*> cw(chain_end), cb(chain_end);
      std::vector<int> couts(chain_end), cins(chain_end);
      {
        const int32_t* w = wp;
        const int32_t* b = bp;
        int ci = n_in;
        for (int l = 0; l < chain_end; l++) {
          int co = syn_desc[4 * l + 0];
          cw[l] = w;
          cb[l] = b;
          couts[l] = co;
          cins[l] = ci;
          w += (size_t)co * ci;
          b += co;
          ci = co;
        }
        wp = w;
        bp = b;
      }
      int max_ft = n_in;
      for (int l = 0; l < chain_end; l++)
        if (couts[l] > max_ft) max_ft = couts[l];
      int final_ft = couts[chain_end - 1];

      std::vector<Plane> next(final_ft);
      for (int o = 0; o < final_ft; o++) next[o].resize(H, W);
      // Two intermediate row-block buffers [max_ft][W]; the first layer
      // reads the dense plane rows directly and the last layer writes the
      // output plane rows directly — no row copies in or out.
      std::vector<int32_t> buf_a((size_t)max_ft * W), buf_b((size_t)max_ft * W);
      std::vector<const int32_t*> srcp(max_ft);
      std::vector<int32_t*> dstp(max_ft);
      for (int y = 0; y < H; y++) {
        int32_t* lbuf_in = buf_a.data();
        int32_t* lbuf_out = buf_b.data();
        for (int l = 0; l < chain_end; l++) {
          bool residual = syn_desc[4 * l + 2] != 0;
          bool relu = syn_desc[4 * l + 3] != 0;
          const int ci = cins[l], co = couts[l];
          for (int i = 0; i < ci; i++)
            srcp[i] = l == 0 ? &planes[i].data[(size_t)y * W]
                             : lbuf_in + (size_t)i * W;
          for (int o = 0; o < co; o++)
            dstp[o] = l == chain_end - 1 ? &next[o].data[(size_t)y * W]
                                         : lbuf_out + (size_t)o * W;
          // X-blocked accumulation: the whole accumulator strip stays in
          // registers while all ci inputs stream through, instead of a
          // load+store of acc per (input, x) — ~2x on the 7->48 layer.
          constexpr int XB = 64;
          int32_t accb[XB];
          for (int x0 = 0; x0 < W; x0 += XB) {
            const int nb = W - x0 < XB ? W - x0 : XB;
            for (int o = 0; o < co; o++) {
              const int32_t bias = cb[l][o];
              const int32_t* krow = cw[l] + (size_t)o * ci;
              if (nb == XB) {
                for (int x = 0; x < XB; x++) accb[x] = bias;
                if (residual) {
                  const int32_t* r = srcp[o] + x0;
                  for (int x = 0; x < XB; x++)
                    accb[x] += r[x] << SYN_MUL_PRECISION;
                }
                for (int i = 0; i < ci; i++) {
                  const int32_t wgt = krow[i];
                  if (wgt == 0) continue;
                  const int32_t* s = srcp[i] + x0;
                  for (int x = 0; x < XB; x++) accb[x] += s[x] * wgt;
                }
                int32_t* dst = dstp[o] + x0;
                for (int x = 0; x < XB; x++) {
                  int32_t sum = accb[x];
                  if (sum < 0)
                    dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
                  else
                    dst[x] = sum >> SYN_MUL_PRECISION;
                }
              } else {
                for (int x = 0; x < nb; x++) accb[x] = bias;
                if (residual) {
                  const int32_t* r = srcp[o] + x0;
                  for (int x = 0; x < nb; x++)
                    accb[x] += r[x] << SYN_MUL_PRECISION;
                }
                for (int i = 0; i < ci; i++) {
                  const int32_t wgt = krow[i];
                  if (wgt == 0) continue;
                  const int32_t* s = srcp[i] + x0;
                  for (int x = 0; x < nb; x++) accb[x] += s[x] * wgt;
                }
                int32_t* dst = dstp[o] + x0;
                for (int x = 0; x < nb; x++) {
                  int32_t sum = accb[x];
                  if (sum < 0)
                    dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
                  else
                    dst[x] = sum >> SYN_MUL_PRECISION;
                }
              }
            }
          }
          std::swap(lbuf_in, lbuf_out);
        }
      }
      planes = std::move(next);
      n_in = final_ft;
      l0 = chain_end;
    }
  }
  const auto t_chain = std::chrono::steady_clock::now();
  g_stage_secs[2] = std::chrono::duration<double>(t_chain - t_syn0).count();

  for (int l = l0; l < n_syn_layers; l++) {
    int out_ft = syn_desc[4 * l + 0];
    int ks = syn_desc[4 * l + 1];
    bool residual = syn_desc[4 * l + 2] != 0;
    bool relu = syn_desc[4 * l + 3] != 0;
    int pad = (ks - 1) / 2;

    std::vector<Plane> next(out_ft);
    for (int o = 0; o < out_ft; o++) next[o].resize(H, W);

    // Line-based conv with inline replicate clamping: no padded plane
    // copies (the reference's line-buffer strategy, synlb_*.hpp), interior
    // X-blocked so the accumulator strip vectorizes over shifted loads.
    auto clampy = [&](int y) { return y < 0 ? 0 : (y >= H ? H - 1 : y); };
    auto clampx = [&](int x) { return x < 0 ? 0 : (x >= W ? W - 1 : x); };
    std::vector<const int32_t*> srows_v((size_t)n_in * ks);
    const int32_t** srows = srows_v.data();
    for (int o = 0; o < out_ft; o++) {
      const int32_t* kbase = wp + (size_t)o * n_in * ks * ks;
      const int32_t bias = bp[o];
      constexpr int XB = 64;
      int32_t accb[XB];
      for (int y = 0; y < H; y++) {
        const int32_t* rres = residual ? &planes[o].data[(size_t)y * W] : nullptr;
        int32_t* dst = &next[o].data[(size_t)y * W];
        // clamped source row base pointers per (input, tap-row)
        for (int i = 0; i < n_in; i++)
          for (int yy = 0; yy < ks; yy++)
            srows[i * ks + yy] =
                &planes[i].data[(size_t)clampy(y + yy - pad) * W];
        auto border_px = [&](int x) {
          int32_t sum = bias;
          if (rres) sum += rres[x] << SYN_MUL_PRECISION;
          const int32_t* k = kbase;
          for (int i = 0; i < n_in; i++)
            for (int yy = 0; yy < ks; yy++) {
              const int32_t* src = srows[i * ks + yy];
              for (int xx = 0; xx < ks; xx++)
                sum += src[clampx(x + xx - pad)] * *k++;
            }
          if (sum < 0)
            dst[x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
          else
            dst[x] = sum >> SYN_MUL_PRECISION;
        };
        for (int x = 0; x < pad && x < W; x++) border_px(x);
        const int xi1 = W - pad;  // interior [pad, xi1)
        for (int x0 = pad; x0 < xi1; x0 += XB) {
          const int nb = xi1 - x0 < XB ? xi1 - x0 : XB;
          for (int x = 0; x < nb; x++) accb[x] = bias;
          if (rres)
            for (int x = 0; x < nb; x++)
              accb[x] += rres[x0 + x] << SYN_MUL_PRECISION;
          const int32_t* k = kbase;
          for (int i = 0; i < n_in; i++) {
            for (int yy = 0; yy < ks; yy++) {
              const int32_t* srow = srows[i * ks + yy] + x0 - pad;
              for (int xx = 0; xx < ks; xx++) {
                const int32_t wgt = *k++;
                if (wgt == 0) continue;
                const int32_t* s = srow + xx;
                if (nb == XB) {
                  for (int x = 0; x < XB; x++) accb[x] += s[x] * wgt;
                } else {
                  for (int x = 0; x < nb; x++) accb[x] += s[x] * wgt;
                }
              }
            }
          }
          for (int x = 0; x < nb; x++) {
            int32_t sum = accb[x];
            if (sum < 0)
              dst[x0 + x] = relu ? 0 : -((-sum) >> SYN_MUL_PRECISION);
            else
              dst[x0 + x] = sum >> SYN_MUL_PRECISION;
          }
        }
        for (int x = xi1 > pad ? xi1 : pad; x < W; x++) border_px(x);
      }
    }
    wp += (size_t)out_ft * n_in * ks * ks;
    bp += out_ft;
    planes = std::move(next);
    n_in = out_ft;
  }

  for (int o = 0; o < n_in; o++)
    std::memcpy(out + (size_t)o * H * W, planes[o].data,
                (size_t)H * W * sizeof(int32_t));
  g_stage_secs[1] = std::chrono::duration<double>(
                        std::chrono::steady_clock::now() - t_syn0)
                        .count();
  g_stage_secs[3] = g_stage_secs[1] - g_stage_secs[2];
}

// Legacy entry (python ctypes ABI): all output positions computed.
void ccz_ups_syn_int(const int32_t* latents, const int32_t* heights,
                     const int32_t* widths, int n_res, int ups_k_size,
                     int pre_k_size, const int32_t* ups_kernels,
                     const int32_t* pre_kernels, const int32_t* syn_w,
                     const int32_t* syn_b, const int32_t* syn_desc,
                     int n_syn_layers, int32_t* out) {
  ccz_ups_syn_int_flags(latents, heights, widths, n_res, ups_k_size,
                        pre_k_size, ups_kernels, pre_kernels, syn_w, syn_b,
                        syn_desc, n_syn_layers, 0, out);
}

}  // extern "C"
