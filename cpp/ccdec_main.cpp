// Standalone decoder executable: .cool bitstream -> PPM, no Python
// (reference: coolchic/cpp/ccdecapi.cpp main + CMakeLists ccdec target).
//
// Build (see coolchic_tpu/bitstream/entropy.py build_decoder_binary):
//   g++ -O3 -march=native -std=c++17 ccdec_main.cpp frame_decoder.cpp \
//       arm_decode.cpp ups_syn_int.cpp entropy_api.cpp -o ccdec
//
// Usage: ccdec -i bitstream.cool -o out.ppm [-v]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int ccz_probe_bitstream(const uint8_t* data, int len,
                                   int32_t* out_info);
extern "C" int ccz_decode_image(const uint8_t* data, int len, int32_t* out_img,
                                double* timings);

int main(int argc, char** argv) {
  const char* in_path = nullptr;
  const char* out_path = nullptr;
  bool verbose = false;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-i") && i + 1 < argc) in_path = argv[++i];
    else if (!strcmp(argv[i], "-o") && i + 1 < argc) out_path = argv[++i];
    else if (!strcmp(argv[i], "-v")) verbose = true;
    else {
      fprintf(stderr, "usage: ccdec -i in.cool -o out.ppm [-v]\n");
      return 2;
    }
  }
  if (!in_path || !out_path) {
    fprintf(stderr, "usage: ccdec -i in.cool -o out.ppm [-v]\n");
    return 2;
  }

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
  int h = info[0], w = info[1], c = info[2], bitdepth = info[3];
  if (info[4] != 0) {
    fprintf(stderr, "only RGB streams supported by the standalone decoder\n");
    return 1;
  }

  std::vector<int32_t> img((size_t)c * h * w);
  double times[4];
  int rc = ccz_decode_image(data.data(), (int)sz, img.data(), times);
  if (rc < 0) {
    fprintf(stderr, "decode failed (%d)\n", rc);
    return 1;
  }
  if (verbose)
    fprintf(stderr,
            "%dx%dx%d @%db  nn %.1f ms | arm %.1f ms | ups+syn %.1f ms | "
            "total %.1f ms\n",
            w, h, c, bitdepth, times[0] * 1e3, times[1] * 1e3, times[2] * 1e3,
            times[3] * 1e3);

  // PPM P6 (8 bit) / 16-bit big-endian for higher bitdepths.
  FILE* out = fopen(out_path, "wb");
  if (!out) { fprintf(stderr, "cannot write %s\n", out_path); return 1; }
  int maxval = (1 << bitdepth) - 1;
  fprintf(out, "P6\n%d %d\n%d\n", w, h, maxval);
  size_t plane = (size_t)h * w;
  if (bitdepth <= 8) {
    std::vector<uint8_t> row(3 * w);
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++)
        for (int ch = 0; ch < 3; ch++)
          row[3 * x + ch] = (uint8_t)img[(ch % c) * plane + (size_t)y * w + x];
      fwrite(row.data(), 1, row.size(), out);
    }
  } else {
    std::vector<uint8_t> row(6 * w);
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++)
        for (int ch = 0; ch < 3; ch++) {
          int32_t v = img[(ch % c) * plane + (size_t)y * w + x];
          row[6 * x + 2 * ch] = (uint8_t)(v >> 8);
          row[6 * x + 2 * ch + 1] = (uint8_t)(v & 0xFF);
        }
      fwrite(row.data(), 1, row.size(), out);
    }
  }
  fclose(out);
  return 0;
}
