// Standalone decoder executable: .cool bitstream -> PPM (image) or
// planar YUV (video / yuv content), no Python
// (reference: coolchic/cpp/ccdecapi.cpp main + CMakeLists ccdec target).
//
// Build (see coolchic_tpu/bitstream/entropy.py build_decoder_binary):
//   g++ -O3 -march=native -std=c++17 ccdec_main.cpp frame_decoder.cpp \
//       arm_decode.cpp ups_syn_int.cpp entropy_api.cpp -o ccdec
//
// Usage: ccdec -i bitstream.cool -o out.{ppm|yuv} [-i ... -o ...] [-t N] [-v]
//   Repeated -i/-o pairs decode multiple streams; -t sets the worker-pool
//   size (0 = all cores). Outputs are bit-identical to serial decodes.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" int ccz_probe_bitstream(const uint8_t* data, int len,
                                   int32_t* out_info);
extern "C" int ccz_decode_image(const uint8_t* data, int len, int32_t* out_img,
                                double* timings);
extern "C" int ccz_decode_video(const uint8_t* data, int len,
                                int32_t* out_frames, double* timings);
extern "C" const double* ccz_ups_syn_stage_secs();

static bool ends_with(const char* s, const char* suf) {
  size_t n = strlen(s), m = strlen(suf);
  return n >= m && !strcmp(s + n - m, suf);
}

static void write_samples(FILE* out, const int32_t* p, size_t n, int bitdepth) {
  if (bitdepth <= 8) {
    std::vector<uint8_t> buf(n);
    for (size_t i = 0; i < n; i++) buf[i] = (uint8_t)p[i];
    fwrite(buf.data(), 1, n, out);
  } else {
    std::vector<uint16_t> buf(n);
    for (size_t i = 0; i < n; i++) buf[i] = (uint16_t)p[i];
    fwrite(buf.data(), 2, n, out);
  }
}

// Decode one bitstream file and write the PPM/YUV output (the original
// single-stream main body; re-entrant, so multi-input mode runs it on a
// thread pool — one stream per worker, outputs bit-identical to serial).
static int process_one(const char* in_path, const char* out_path,
                       bool verbose) {
  FILE* f = fopen(in_path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", in_path); return 1; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(sz);
  if (fread(data.data(), 1, sz, f) != (size_t)sz) { fclose(f); return 1; }
  fclose(f);

  int32_t info[6];
  if (ccz_probe_bitstream(data.data(), (int)sz, info) != 0) {
    fprintf(stderr, "bad bitstream header\n");
    return 1;
  }
  int h = info[0], w = info[1], bitdepth = info[3];
  int data_type = info[4];  // 0 rgb, 1 yuv420, 2 yuv444
  int n_frames = info[5];
  size_t ps = (size_t)h * w;
  double times[4];

  if (ends_with(out_path, ".yuv")) {
    // Video / YUV path (reference: ccdecapi.cpp yuv output loop).
    std::vector<int32_t> frames((size_t)n_frames * 3 * ps);
    int rc = ccz_decode_video(data.data(), (int)sz, frames.data(), times);
    if (rc < 0) { fprintf(stderr, "decode failed (%d)\n", rc); return 1; }
    FILE* out = fopen(out_path, "wb");
    if (!out) { fprintf(stderr, "cannot write %s\n", out_path); return 1; }
    for (int fi = 0; fi < n_frames; fi++) {
      const int32_t* fr = frames.data() + (size_t)fi * 3 * ps;
      write_samples(out, fr, ps, bitdepth);  // Y
      if (data_type == 1) {                  // 420: subsample the expansion
        std::vector<int32_t> sub((size_t)(h / 2) * (w / 2));
        for (int c = 1; c < 3; c++) {
          const int32_t* p = fr + c * ps;
          for (int y = 0; y < h / 2; y++)
            for (int x = 0; x < w / 2; x++)
              sub[(size_t)y * (w / 2) + x] = p[(size_t)(2 * y) * w + 2 * x];
          write_samples(out, sub.data(), sub.size(), bitdepth);
        }
      } else {
        write_samples(out, fr + ps, 2 * ps, bitdepth);  // U, V full
      }
    }
    fclose(out);
    if (verbose)
      fprintf(stderr,
              "%d frames %dx%d @%db  nn %.1f ms | arm %.1f ms | ups+syn "
              "%.1f ms | total %.1f ms\n",
              n_frames, w, h, bitdepth, times[0] * 1e3, times[1] * 1e3,
              times[2] * 1e3, times[3] * 1e3);
    return 0;
  }

  // Single-image PPM path.
  if (data_type != 0) {
    fprintf(stderr, "YUV content requires a .yuv output path\n");
    return 1;
  }
  int c = info[2];
  std::vector<int32_t> img((size_t)c * ps);
  int rc = ccz_decode_image(data.data(), (int)sz, img.data(), times);
  if (rc < 0) { fprintf(stderr, "decode failed (%d)\n", rc); return 1; }
  if (verbose) {
    const double* st = ccz_ups_syn_stage_secs();
    fprintf(stderr,
            "%dx%dx%d @%db  nn %.1f ms | arm %.1f ms | ups+syn %.1f ms "
            "(ups %.1f syn %.1f [c %.1f s %.1f]) | total %.1f ms\n",
            w, h, c, bitdepth, times[0] * 1e3, times[1] * 1e3, times[2] * 1e3,
            st[0] * 1e3, st[1] * 1e3, st[2] * 1e3, st[3] * 1e3, times[3] * 1e3);
  }

  FILE* out = fopen(out_path, "wb");
  if (!out) { fprintf(stderr, "cannot write %s\n", out_path); return 1; }
  int maxval = (1 << bitdepth) - 1;
  fprintf(out, "P6\n%d %d\n%d\n", w, h, maxval);
  if (bitdepth <= 8) {
    std::vector<uint8_t> row(3 * w);
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++)
        for (int ch = 0; ch < 3; ch++)
          row[3 * x + ch] = (uint8_t)img[(ch % c) * ps + (size_t)y * w + x];
      fwrite(row.data(), 1, row.size(), out);
    }
  } else {
    std::vector<uint8_t> row(6 * w);
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++)
        for (int ch = 0; ch < 3; ch++) {
          int32_t v = img[(ch % c) * ps + (size_t)y * w + x];
          row[6 * x + 2 * ch] = (uint8_t)(v >> 8);
          row[6 * x + 2 * ch + 1] = (uint8_t)(v & 0xFF);
        }
      fwrite(row.data(), 1, row.size(), out);
    }
  }
  fclose(out);
  return 0;
}

int main(int argc, char** argv) {
  std::vector<const char*> ins, outs;
  bool verbose = false;
  int n_threads = 1;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-i") && i + 1 < argc) ins.push_back(argv[++i]);
    else if (!strcmp(argv[i], "-o") && i + 1 < argc) outs.push_back(argv[++i]);
    else if (!strcmp(argv[i], "-t") && i + 1 < argc) n_threads = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-v")) verbose = true;
    else {
      fprintf(stderr,
              "usage: ccdec -i in.cool -o out.{ppm|yuv} [-i ... -o ...] "
              "[-t threads] [-v]\n");
      return 2;
    }
  }
  if (ins.empty() || ins.size() != outs.size()) {
    fprintf(stderr,
            "usage: ccdec -i in.cool -o out.{ppm|yuv} [-i ... -o ...] "
            "[-t threads] [-v]\n");
    return 2;
  }
  if (ins.size() == 1) return process_one(ins[0], outs[0], verbose);

  // Multi-input: decode streams concurrently (work-stealing index). The
  // reference decoder is one stream per process (ccdecapi.cpp main).
  const int n = (int)ins.size();
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n) n_threads = n;
  std::atomic<int> next{0}, failed{0};
  auto worker = [&] {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (process_one(ins[i], outs[i], verbose) != 0) failed.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int k = 0; k < n_threads; k++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  if (failed.load()) {
    fprintf(stderr, "%d/%d streams failed\n", failed.load(), n);
    return 1;
  }
  return 0;
}
