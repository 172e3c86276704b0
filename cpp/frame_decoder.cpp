// Whole-frame bitstream decoder: one C ABI call from header bytes to the
// reconstructed image, no Python in the loop
// (reference: coolchic/cpp/cc-frame-decoder.cpp:1152-1168 decode_frame and
//  coolchic/cpp/cc-bitstream.cpp header parsing; byte layout mirrored from
//  coolchic_tpu/bitstream/header.py which matches the reference
//  enc/bitstream/header.py:10-467).
//
// All NN weights are reconstructed directly in fixed point from the decoded
// integer symbols — every q-step in the format is a power of two
// (reference: enc/utils/misc.py:111-130), so
//     weight_fp<F> = symbol << q_step_index
// holds exactly for ARM (8 frac bits), upsampling/synthesis kernels
// (12 frac bits) and biases (ARM 16, synthesis 24): no float round-trip.
//
// Compiled into libccz.so together with entropy_api.cpp / arm_decode.cpp /
// ups_syn_int.cpp, and into the standalone `ccdec` binary (ccdec_main.cpp).

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "cabac.hpp"

// Siblings in the same library (arm_decode.cpp, ups_syn_int.cpp).
extern "C" void ccz_decode_arm_latent_layer(
    const uint8_t* data, int len, const int32_t* weights, const int32_t* biases,
    int dim_arm, int n_hidden, const int32_t* ctx_dy, const int32_t* ctx_dx,
    int h, int w, int blk, int32_t* out);
extern "C" void ccz_ups_syn_int_flags(
    const int32_t* latents, const int32_t* heights, const int32_t* widths,
    int n_res, int ups_k_size, int pre_k_size, const int32_t* ups_kernels,
    const int32_t* pre_kernels, const int32_t* syn_w, const int32_t* syn_b,
    const int32_t* syn_desc, int n_syn_layers, int flags, int32_t* out);

namespace {

constexpr int MASK_SIZE = 9;  // ARM context window (format constant)

// Causal-context stencils inside the flattened 9x9 window, per dim_arm
// (format constants; reference: enc/component/core/arm.py:398-501,
// coolchic_tpu/models/arm.py NON_ZERO_PIXEL_CTX_INDEX).
const int kCtx8[] = {13, 22, 30, 31, 32, 37, 38, 39};
const int kCtx16[] = {13, 14, 20, 21, 22, 23, 24, 28,
                      29, 30, 31, 32, 33, 37, 38, 39};
const int kCtx24[] = {4,  11, 12, 13, 14, 15, 19, 20, 21, 22, 23, 24,
                      25, 28, 29, 30, 31, 32, 33, 34, 36, 37, 38, 39};
const int kCtx32[] = {2,  3,  4,  5,  10, 11, 12, 13, 14, 15, 16, 19, 20, 21,
                      22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
                      36, 37, 38, 39};

const int* ctx_table(int dim_arm) {
  switch (dim_arm) {
    case 8: return kCtx8;
    case 16: return kCtx16;
    case 24: return kCtx24;
    case 32: return kCtx32;
    default: return nullptr;
  }
}

// ------------------------------------------------------------------ parsing

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  uint32_t u(int n) {
    if (p + n > end) { ok = false; return 0; }
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 8) | *p++;
    return v;
  }
  int8_t s8() { return (int8_t)u(1); }
};

struct GopHeader {
  int n_bytes_header, img_h, img_w, bitdepth, frame_data_type;
  int intra_period, p_period;
};

// reference: header.py write_gop_header (9 bytes)
bool read_gop_header(Reader& r, GopHeader& g) {
  static const int kBitdepths[] = {8, 9, 10, 11, 12, 13, 14, 15, 16};
  g.n_bytes_header = r.u(2);
  g.img_h = r.u(2);
  g.img_w = r.u(2);
  uint32_t raw = r.u(1);
  if ((raw >> 4) > 8) return false;
  g.bitdepth = kBitdepths[raw >> 4];
  g.frame_data_type = raw & 0xF;  // 0 rgb, 1 yuv420, 2 yuv444
  g.intra_period = r.u(1);
  g.p_period = r.u(1);
  return r.ok && g.n_bytes_header == 9;
}

constexpr int MAX_SYN_LAYERS = 16;
constexpr int MAX_GRIDS = 16;

struct FrameHeader {
  int n_bytes_header;
  int display_index;
  int dim_arm, n_hidden_layers_arm;
  int latent_n_grids, ups_k_size, ups_preconcat_k_size;
  int n_syn_layers;
  int syn_desc[MAX_SYN_LAYERS][4];  // out_ft, ks, residual, relu
  int flow_gain;
  int ac_max_val_nn, ac_max_val_latent;
  int hls_sig_blksize;
  int q_step_idx[3][2];  // [arm, ups, syn] x [w, b]
  int scale_idx[3][2];
  int n_bytes_nn[3][2];
  int n_ft_per_latent[MAX_GRIDS];
  int n_2d_grids;
  int n_bytes_per_latent[MAX_GRIDS * 4];
};

// reference: header.py write_frame_header / read_frame_header
bool read_frame_header(Reader& r, FrameHeader& f) {
  const uint8_t* start = r.p;
  f.n_bytes_header = r.u(2);
  f.display_index = r.u(1);
  uint32_t raw = r.u(1);
  f.dim_arm = (raw >> 4) * 8;
  f.n_hidden_layers_arm = raw & 0xF;
  // The ARM kernels store weights in fixed [MAX_HIDDEN=4] arrays
  // (arm_decode.cpp ArmWeightsT); deeper values only arise from corrupt
  // headers and would overflow them.
  if (f.n_hidden_layers_arm > 4) return false;
  raw = r.u(1);
  f.latent_n_grids = (raw >> 4) + 1;
  f.ups_k_size = raw & 0xF;
  raw = r.u(1);
  f.ups_preconcat_k_size = raw & 0xF;
  r.u(1);  // legacy n_synth_branch
  f.n_syn_layers = r.u(1);
  if (f.n_syn_layers > MAX_SYN_LAYERS || f.latent_n_grids > MAX_GRIDS)
    return false;
  int in_run = f.latent_n_grids;  // synthesis input width per layer
  for (int i = 0; i < f.n_syn_layers; i++) {
    f.syn_desc[i][0] = r.u(1);           // out_ft
    f.syn_desc[i][1] = r.u(1);           // k_size
    raw = r.u(1);
    f.syn_desc[i][2] = (raw >> 4) != 0;  // residual mode
    f.syn_desc[i][3] = (raw & 0xF) != 0; // relu
    // Robustness against corrupt/malicious headers: the synthesis kernels
    // cap channel fan-out at 64 (ups_syn_int.cpp srcp[64]) and use odd
    // square kernels; reject anything outside that envelope instead of
    // sizing weight buffers (and kernel pointer arrays) from garbage.
    if (f.syn_desc[i][0] < 1 || f.syn_desc[i][0] > 64) return false;
    const int ks = f.syn_desc[i][1];
    if (ks < 1 || ks > 9 || ks % 2 == 0) return false;
    // Residual layers add the layer input to its output elementwise —
    // only well-defined (and only emitted by the encoder) when the
    // channel count is preserved.
    if (f.syn_desc[i][2] && f.syn_desc[i][0] != in_run) return false;
    in_run = f.syn_desc[i][0];
  }
  f.flow_gain = r.u(1);
  f.ac_max_val_nn = r.u(2);
  f.ac_max_val_latent = r.u(2);
  f.hls_sig_blksize = r.s8();
  for (int m = 0; m < 3; m++)
    for (int k = 0; k < 2; k++) f.q_step_idx[m][k] = r.u(1);
  for (int m = 0; m < 3; m++)
    for (int k = 0; k < 2; k++) f.scale_idx[m][k] = r.u(1);
  // q_step_idx feeds `symbol << shift` (32-bit) and scale_idx is the
  // exp-Golomb count (format searches 0-12); out-of-range values only
  // arise from corruption and would be UB / unbounded decode work.
  for (int m = 0; m < 3; m++)
    for (int k = 0; k < 2; k++)
      if (f.q_step_idx[m][k] > 31 || f.scale_idx[m][k] > 15) return false;
  for (int m = 0; m < 3; m++)
    for (int k = 0; k < 2; k++) f.n_bytes_nn[m][k] = r.u(2);
  int n_res = r.u(1);
  f.n_2d_grids = r.u(1);
  if (n_res != f.latent_n_grids || f.n_2d_grids > MAX_GRIDS * 4) return false;
  for (int i = 0; i < n_res; i++) f.n_ft_per_latent[i] = r.u(1);
  for (int i = 0; i < f.n_2d_grids; i++) f.n_bytes_per_latent[i] = r.u(3);
  return r.ok && (r.p - start) == f.n_bytes_header;
}

// --------------------------------------------------------------- NN decode

// Streaming exp-Golomb+sign symbol decoder (same coding as
// entropy_api.cpp ccz_wb_decoder_continue; reference: ccencapi.cpp
// cc_decode_wb).
struct WbStream {
  ccz::Decoder dec;
  WbStream(const uint8_t* p, int len) : dec(p, len) {}
  void read(int n, int count, int shift, int32_t* out) {
    for (int i = 0; i < n; i++) {
      int32_t v = dec.decode_exgolomb(count);
      if (v != 0 && dec.decode_bin_ep() != 0) v = -v;
      out[i] = v << shift;  // power-of-two dequantization to fixed point
    }
  }
};

struct StageTimes {
  double nn = 0, arm = 0, ups_syn = 0;
};

using clk = std::chrono::steady_clock;
double secs_since(clk::time_point t0) {
  return std::chrono::duration<double>(clk::now() - t0).count();
}

// Decode one frame payload starting at `ptr`; advances `ptr` past it.
// Returns 12-frac-bit synthesis output planes in `out` ([c_out, H, W]).
// Only the intra tool-set is implemented (inter frames handled by the
// caller via warp/bpred on the decoded residue, ccz_warp / ccz_bpred).
int decode_frame_payload(const uint8_t* data, size_t len, size_t& ptr,
                         const GopHeader& gop, FrameHeader& fh,
                         std::vector<int32_t>& out, StageTimes& times,
                         bool chroma420_skip = false) {
  Reader r{data + ptr, data + len};
  if (!read_frame_header(r, fh)) return -2;
  ptr += fh.n_bytes_header;

  if (!ctx_table(fh.dim_arm)) return -3;
  // The fixed-point ups/syn path runs one feature per resolution (the
  // format's standard configuration; ccz_ups_syn_int contract).
  for (int i = 0; i < fh.latent_n_grids; i++)
    if (fh.n_ft_per_latent[i] != 1) return -4;
  if (fh.n_2d_grids != fh.latent_n_grids) return -4;

  auto t0 = clk::now();

  // ----- NN streams (arm w/b, ups w/b, syn w/b in order).
  const uint8_t* nn_ptr[3][2];
  for (int m = 0; m < 3; m++)
    for (int k = 0; k < 2; k++) {
      nn_ptr[m][k] = data + ptr;
      ptr += fh.n_bytes_nn[m][k];
      if (ptr > len) return -5;
    }

  const int C = fh.dim_arm, NH = fh.n_hidden_layers_arm;

  // ARM: hidden layers then 2-wide head, row-major [out][in]; weights at
  // 8 frac bits (<< q_idx_w), biases at 16 (<< q_idx_b)
  // (reference: cc-frame-decoder.cpp read_arm; armint.py FPFB).
  std::vector<int32_t> arm_w(NH * C * C + 2 * C), arm_b(NH * C + 2);
  {
    WbStream ws(nn_ptr[0][0], fh.n_bytes_nn[0][0]);
    WbStream bs(nn_ptr[0][1], fh.n_bytes_nn[0][1]);
    int32_t* wp = arm_w.data();
    int32_t* bp = arm_b.data();
    for (int l = 0; l < NH; l++) {
      ws.read(C * C, fh.scale_idx[0][0], fh.q_step_idx[0][0], wp);
      wp += C * C;
      bs.read(C, fh.scale_idx[0][1], fh.q_step_idx[0][1], bp);
      bp += C;
    }
    ws.read(2 * C, fh.scale_idx[0][0], fh.q_step_idx[0][0], wp);
    bs.read(2, fh.scale_idx[0][1], fh.q_step_idx[0][1], bp);
  }

  // Upsampling: n-1 half x2 kernels then n-1 half pre-concat kernels,
  // mirrored to full kernels at 12 frac bits
  // (reference: cc-frame-decoder.cpp:188-199 decode_upsweights_qi).
  int n_ups = fh.latent_n_grids - 1;
  int half_u = (fh.ups_k_size + 1) / 2, half_p = (fh.ups_preconcat_k_size + 1) / 2;
  std::vector<int32_t> ups_k(n_ups * fh.ups_k_size),
      pre_k(n_ups * fh.ups_preconcat_k_size);
  {
    WbStream ws(nn_ptr[1][0], fh.n_bytes_nn[1][0]);
    std::vector<int32_t> half(std::max(half_u, half_p));
    auto mirror = [&](int k_size, int n_half, int32_t* full) {
      ws.read(n_half, fh.scale_idx[1][0], fh.q_step_idx[1][0], half.data());
      for (int i = 0; i < n_half; i++) full[i] = half[i];
      for (int i = n_half; i < k_size; i++) full[i] = half[k_size - 1 - i];
    };
    for (int g = 0; g < n_ups; g++)
      mirror(fh.ups_k_size, half_u, &ups_k[g * fh.ups_k_size]);
    for (int g = 0; g < n_ups; g++)
      mirror(fh.ups_preconcat_k_size, half_p, &pre_k[g * fh.ups_preconcat_k_size]);
  }

  // Synthesis: per layer OIHW weights (12 frac) + biases (24 frac).
  std::vector<int32_t> syn_w, syn_b;
  {
    WbStream ws(nn_ptr[2][0], fh.n_bytes_nn[2][0]);
    WbStream bs(nn_ptr[2][1], fh.n_bytes_nn[2][1]);
    int in_ft = fh.latent_n_grids;
    size_t nw = 0, nb = 0;
    int in_run = in_ft;
    for (int l = 0; l < fh.n_syn_layers; l++) {
      nw += (size_t)fh.syn_desc[l][0] * in_run * fh.syn_desc[l][1] * fh.syn_desc[l][1];
      nb += fh.syn_desc[l][0];
      in_run = fh.syn_desc[l][0];
    }
    syn_w.resize(nw);
    syn_b.resize(nb);
    ws.read((int)nw, fh.scale_idx[2][0], fh.q_step_idx[2][0], syn_w.data());
    bs.read((int)nb, fh.scale_idx[2][1], fh.q_step_idx[2][1], syn_b.data());
  }
  times.nn += secs_since(t0);

  // ----- Latent grids: sequential autoregressive ARM decode.
  t0 = clk::now();
  const int* tab = ctx_table(C);
  int32_t ctx_dy[32], ctx_dx[32];
  for (int i = 0; i < C; i++) {
    ctx_dy[i] = tab[i] / MASK_SIZE;
    ctx_dx[i] = tab[i] % MASK_SIZE;
  }
  std::vector<int32_t> latents;
  std::vector<int32_t> heights(fh.latent_n_grids), widths(fh.latent_n_grids);
  size_t total = 0;
  for (int g = 0; g < fh.latent_n_grids; g++) {
    heights[g] = (gop.img_h + (1 << g) - 1) >> g;
    widths[g] = (gop.img_w + (1 << g) - 1) >> g;
    total += (size_t)heights[g] * widths[g];
  }
  latents.resize(total);
  {
    // Each grid is an independent CABAC stream with its own byte range, so
    // grids can decode concurrently (CCZ_ARM_THREADS > 1; default serial).
    // The raster-order dependency is only WITHIN a grid. Speedup is capped
    // by the largest grid; the within-stream lever the reference lacks.
    static const int arm_threads = [] {
      const char* e = getenv("CCZ_ARM_THREADS");
      const int v = e ? atoi(e) : 1;
      return v > 0 ? v : 1;
    }();
    struct GridTask {
      const uint8_t* p;
      int n, h, w;
      int32_t* lp;
    };
    std::vector<GridTask> tasks(fh.latent_n_grids);
    int32_t* lp = latents.data();
    for (int g = 0; g < fh.latent_n_grids; g++) {
      int n = fh.n_bytes_per_latent[g];
      if (ptr + n > len) return -5;
      tasks[g] = {data + ptr, n, heights[g], widths[g], lp};
      ptr += n;
      lp += (size_t)heights[g] * widths[g];
    }
    auto run_task = [&](const GridTask& t) {
      if (t.n == 0) {
        std::memset(t.lp, 0, sizeof(int32_t) * t.h * t.w);
      } else {
        ccz_decode_arm_latent_layer(t.p, t.n, arm_w.data(), arm_b.data(), C,
                                    NH, ctx_dy, ctx_dx, t.h, t.w,
                                    fh.hls_sig_blksize, t.lp);
      }
    };
    if (arm_threads <= 1 || fh.latent_n_grids <= 1) {
      for (const auto& t : tasks) run_task(t);
    } else {
      // Grid 0 dominates (~3/4 of the pixels): give it its own thread and
      // round-robin the tail grids over the rest of the pool.
      const int pool = std::min(arm_threads, fh.latent_n_grids);
      std::vector<std::thread> th;
      th.reserve(pool);
      for (int k = 0; k < pool; k++)
        th.emplace_back([&, k] {
          for (int g = k; g < fh.latent_n_grids; g += pool) run_task(tasks[g]);
        });
      for (auto& t : th) t.join();
    }
  }
  times.arm += secs_since(t0);

  // ----- Fixed-point upsample + synthesize.
  t0 = clk::now();
  int c_out = fh.syn_desc[fh.n_syn_layers - 1][0];
  out.resize((size_t)c_out * gop.img_h * gop.img_w);
  int32_t desc_flat[MAX_SYN_LAYERS * 4];
  for (int l = 0; l < fh.n_syn_layers; l++)
    for (int k = 0; k < 4; k++) desc_flat[l * 4 + k] = fh.syn_desc[l][k];
  // yuv420 3-channel output: odd-row chroma is overwritten by the 4:2:0
  // expansion below, so the synthesis may skip it (flags bit 0).
  const int flags =
      (chroma420_skip && gop.frame_data_type == 1 && c_out == 3) ? 1 : 0;
  ccz_ups_syn_int_flags(latents.data(), heights.data(), widths.data(),
                        fh.latent_n_grids, fh.ups_k_size,
                        fh.ups_preconcat_k_size, ups_k.data(), pre_k.data(),
                        syn_w.data(), syn_b.data(), desc_flat, fh.n_syn_layers,
                        flags, out.data());
  times.ups_syn += secs_since(t0);
  return c_out;
}

// round-half-even of (v / 2^12), matching numpy's np.round in the python
// integer pipeline (decode.py: clip(round(raw * max_dyn))).
inline int32_t round_q12_half_even(int64_t v) {
  int64_t q = v >> 12;  // floor
  int64_t rem = v - (q << 12);
  if (rem > 2048 || (rem == 2048 && (q & 1))) q++;
  return (int32_t)q;
}

// ---------------------------------------------------------------- inter

constexpr int PREC = 12;           // SYN_LAYER_PRECISION
constexpr int32_t PONE = 1 << PREC;
constexpr int32_t PHALF = 1 << (PREC - 1);

inline int32_t inter_gain(int32_t raw, bool invert) {
  int32_t g = raw + PHALF;
  if (g < 0) g = 0;
  else if (g > PONE) g = PONE;
  return invert ? PONE - g : g;
}

// Integer bilinear warp of ref [3, H, W] (12 frac bits) by the flow in
// raw channels [xy, xy+1], gain channel gi (reference:
// ccdecapi.cpp:496-600 warp; python twin bitstream/inter.py).
void warp_int(const int32_t* ref, const int32_t* raw, int h, int w, int xy,
              int gi, int flow_gain, bool add_residue, bool invert_gain,
              int32_t* out) {
  const size_t ps = (size_t)h * w;
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      const size_t i = (size_t)y * w + x;
      int64_t px = (int64_t)raw[xy * ps + i] * flow_gain + ((int64_t)x << PREC);
      int64_t py = (int64_t)raw[(xy + 1) * ps + i] * flow_gain +
                   ((int64_t)y << PREC);
      // floor with the reference's negative-branch quirk.
      int64_t bx0 = px < 0 ? ((px - (PONE - 1)) >> PREC) : (px >> PREC);
      int64_t dx = px - (bx0 << PREC);
      int64_t bx1 = bx0 + 1;
      if (bx0 < 0) { bx0 = 0; bx1 = 0; dx = 0; }
      else if (bx0 >= w - 1) { bx0 = w - 1; bx1 = bx0; dx = 0; }
      int64_t by0 = py < 0 ? ((py - (PONE - 1)) >> PREC) : (py >> PREC);
      int64_t dy = py - (by0 << PREC);
      int64_t by1 = by0 + 1;
      if (by0 < 0) { by0 = 0; by1 = 0; dy = 0; }
      else if (by0 >= h - 1) { by0 = h - 1; by1 = by0; dy = 0; }

      int32_t gain = inter_gain(raw[gi * ps + i], invert_gain);
      for (int c = 0; c < 3; c++) {
        const int32_t* p = ref + c * ps;
        int64_t a = p[by0 * w + bx0], b = p[by0 * w + bx1];
        int64_t cc = p[by1 * w + bx0], d = p[by1 * w + bx1];
        int64_t h0 = a + (((b - a) * dx) >> PREC);
        int64_t h1 = cc + (((d - cc) * dx) >> PREC);
        int64_t v = ((h1 - h0) * dy) >> PREC;
        int64_t o = ((h0 + v) * gain) >> PREC;
        if (add_residue) o += raw[c * ps + i];
        out[c * ps + i] = (int32_t)o;
      }
    }
  }
}

// P/B reconstruction (reference: ccdecapi.cpp:602-671 bpred/process_inter).
void process_inter(const int32_t* raw, int c_raw, int h, int w,
                   const int32_t* ref0, const int32_t* ref1, int flow_gain,
                   int32_t* out) {
  const size_t ps = (size_t)h * w;
  if (c_raw == 6) {
    warp_int(ref0, raw, h, w, 3, 5, flow_gain, true, false, out);
    return;
  }
  std::vector<int32_t> p0(3 * ps), p1(3 * ps);
  warp_int(ref0, raw, h, w, 3, 8, flow_gain, false, false, p0.data());
  warp_int(ref1, raw, h, w, 6, 8, flow_gain, false, true, p1.data());
  for (size_t i = 0; i < ps; i++) {
    int32_t gain = inter_gain(raw[5 * ps + i], false);
    for (int c = 0; c < 3; c++)
      out[c * ps + i] =
          (int32_t)((((int64_t)p0[c * ps + i] + p1[c * ps + i]) * gain) >>
                    PREC) +
          raw[c * ps + i];
  }
}

}  // namespace

extern "C" {

// Parse the stream headers: out_info = {img_h, img_w, c_out, bitdepth,
// frame_data_type, n_frames}. Returns 0 on success.
int ccz_probe_bitstream(const uint8_t* data, int len, int32_t* out_info) {
  Reader r{data, data + len};
  GopHeader gop;
  if (!read_gop_header(r, gop)) return -1;
  FrameHeader fh;
  Reader r2{data + gop.n_bytes_header, data + len};
  if (!read_frame_header(r2, fh)) return -2;
  out_info[0] = gop.img_h;
  out_info[1] = gop.img_w;
  out_info[2] = fh.syn_desc[fh.n_syn_layers - 1][0];
  out_info[3] = gop.bitdepth;
  out_info[4] = gop.frame_data_type;
  out_info[5] = gop.intra_period > 0 ? gop.intra_period + 1 : 1;
  return 0;
}

// Decode a multi-frame bitstream (reference: ccdecapi.cpp:673-840
// cc_decode_* frame loop). Writes display-ordered int32 samples in
// [0, 2^bitdepth-1], [n_frames, 3, H, W]; for yuv420 content the chroma
// planes carry the decoded subsamples expanded 2x2 (nearest), so a 420
// subsample of the output reproduces the decoded bytes. Frame type follows
// the synthesis channel count (3/6/9 = I/P/B); references are stored
// through the bitdepth (and 420) round-trip before reuse, exactly like the
// reference. Returns n_frames, or <0 on error.
int ccz_decode_video(const uint8_t* data, int len, int32_t* out_frames,
                     double* timings) {
  auto t_all = clk::now();
  Reader r{data, data + len};
  GopHeader gop;
  if (!read_gop_header(r, gop)) return -1;
  const int n_frames = gop.intra_period > 0 ? gop.intra_period + 1 : 1;
  const int h = gop.img_h, w = gop.img_w;
  const size_t ps = (size_t)h * w;
  const int64_t max_dyn = (1ll << gop.bitdepth) - 1;

  std::vector<std::vector<int32_t>> stored(n_frames);  // by display idx
  size_t ptr = gop.n_bytes_header;
  StageTimes times;
  std::vector<int32_t> raw12, f444(3 * ps), store_lut;
  for (int coding_idx = 0; coding_idx < n_frames; coding_idx++) {
    FrameHeader fh;
    int c_out =
        decode_frame_payload(data, len, ptr, gop, fh, raw12, times, true);
    if (c_out < 0) return c_out;
    const int disp = fh.display_index;
    if (disp < 0 || disp >= n_frames) return -6;

    if (coding_idx == 0 || c_out == 3) {
      std::copy(raw12.begin(), raw12.begin() + 3 * ps, f444.begin());
    } else {
      const int32_t* ref0 = nullptr;
      const int32_t* ref1 = nullptr;
      for (int i = disp - 1; i >= 0; i--)
        if (!stored[i].empty()) { ref0 = stored[i].data(); break; }
      if (c_out == 9)
        for (int i = disp + 1; i < n_frames; i++)
          if (!stored[i].empty()) { ref1 = stored[i].data(); break; }
      if (!ref0 || (c_out == 9 && !ref1)) return -7;
      process_inter(raw12.data(), c_out, h, w, ref0, ref1, fh.flow_gain,
                    f444.data());
    }

    // Output quantization + reference storage round-trip
    // (reference: get_raw_444_* / convert_444_420_* + store_444_* /
    // convert_420_444_*).
    int32_t* out = out_frames + (size_t)disp * 3 * ps;
    for (size_t i = 0; i < 3 * ps; i++) {
      int64_t v = ((int64_t)f444[i] * max_dyn + PHALF) >> PREC;
      out[i] = v < 0 ? 0 : (v > max_dyn ? (int32_t)max_dyn : (int32_t)v);
    }
    if (gop.frame_data_type == 1) {  // yuv420: chroma = expanded subsamples
      for (int c = 1; c < 3; c++) {
        int32_t* p = out + c * ps;
        for (int y = 0; y < h; y += 2) {
          int32_t* row = p + (size_t)y * w;
          for (int x = 1; x < w; x += 2) row[x] = row[x - 1];
          if (y + 1 < h) std::memcpy(row + w, row, (size_t)w * sizeof(int32_t));
        }
      }
    }
    // Reference storage round-trip — only when a later frame can read it
    // (single-frame streams skip ~3*ps integer divisions). The division
    // (v << PREC) / max_dyn is exact via a small LUT over [0, max_dyn].
    if (n_frames > 1) {
      if (store_lut.empty()) {
        store_lut.resize((size_t)max_dyn + 1);
        for (int64_t v = 0; v <= max_dyn; v++)
          store_lut[v] = (int32_t)((v << PREC) / max_dyn);
      }
      stored[disp].resize(3 * ps);
      for (size_t i = 0; i < 3 * ps; i++) stored[disp][i] = store_lut[out[i]];
    }
  }
  if (timings) {
    timings[0] = times.nn;
    timings[1] = times.arm;
    timings[2] = times.ups_syn;
    timings[3] = secs_since(t_all);
  }
  return n_frames;
}

// Decode a single-image bitstream to integer samples in [0, 2^bitdepth-1],
// written as int32 [c_out, H, W]. `timings` (optional, 4 doubles) receives
// {nn_parse, arm, ups_syn, total} seconds. Returns c_out, or <0 on error
// (the caller falls back to the python pipeline).
int ccz_decode_image(const uint8_t* data, int len, int32_t* out_img,
                     double* timings) {
  auto t_all = clk::now();
  Reader r{data, data + len};
  GopHeader gop;
  if (!read_gop_header(r, gop)) return -1;
  size_t ptr = gop.n_bytes_header;
  FrameHeader fh;
  StageTimes times;
  std::vector<int32_t> raw12;
  int c_out = decode_frame_payload(data, len, ptr, gop, fh, raw12, times);
  if (c_out < 0) return c_out;

  const int64_t max_dyn = (1ll << gop.bitdepth) - 1;
  const size_t n = raw12.size();
  for (size_t i = 0; i < n; i++) {
    int32_t v = round_q12_half_even((int64_t)raw12[i] * max_dyn);
    out_img[i] = v < 0 ? 0 : (v > max_dyn ? (int32_t)max_dyn : v);
  }
  if (timings) {
    timings[0] = times.nn;
    timings[1] = times.arm;
    timings[2] = times.ups_syn;
    timings[3] = secs_since(t_all);
  }
  return c_out;
}

// Decode n independent bitstreams concurrently on a pool of n_threads
// std::threads (work-stealing via an atomic index; streams are decoded by
// exactly the single-stream entry points above, so outputs are bit-identical
// to serial decodes). The decoder has no shared mutable state — per-stream
// scratch lives on each worker's stack and the stage profilers are
// thread_local — so this is plain data parallelism over streams, the
// production serving shape (the reference decoder is strictly one stream
// per process; reference: cpp/ccdecapi.cpp main).
//
//   datas[i], lens[i]  stream i bytes
//   kinds[i]           0 = single image  (ccz_decode_image semantics)
//                      1 = video / GOP   (ccz_decode_video semantics)
//   outs[i]            caller-allocated int32 output (probe for the size:
//                      image c_out*H*W, video n_frames*3*H*W)
//   timings            optional [n, 4] per-stream {nn, arm, ups_syn, total}
//   rcs                per-stream return code (c_out / n_frames, <0 error)
//
// Returns the number of failed streams (0 = all decoded).
int ccz_decode_many(const uint8_t* const* datas, const int32_t* lens, int n,
                    int32_t* const* outs, const int32_t* kinds,
                    double* timings, int n_threads, int32_t* rcs) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next{0};
  std::atomic<int> failed{0};
  auto worker = [&] {
    for (;;) {
      const int i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n) return;
      double* t = timings ? timings + (size_t)i * 4 : nullptr;
      const int rc =
          kinds[i] == 0
              ? ccz_decode_image(datas[i], lens[i], outs[i], t)
              : ccz_decode_video(datas[i], lens[i], outs[i], t);
      rcs[i] = rc;
      if (rc < 0) failed.fetch_add(1, std::memory_order_relaxed);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int k = 0; k < n_threads; k++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

}  // extern "C"
