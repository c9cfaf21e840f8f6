// ICL-NUIM scene directory -> SLAMBench .raw converter.
//
// Native equivalent of the reference tool (se_tools/scene2raw.cpp:76-187):
// reads scene_00_%04d.depth text files (Euclidean ray lengths for a
// hardcoded 640x480 camera), converts to z-depth millimeters, writes the
// .raw frame stream. Exposed with a C ABI and as a standalone main.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kW = 640;
constexpr int kH = 480;
constexpr float kFx = 481.2f;
constexpr float kFy = -480.0f;
constexpr float kCx = 319.5f;
constexpr float kCy = 239.5f;

bool convert_frame(const char* depth_path, FILE* out) {
  FILE* in = fopen(depth_path, "r");
  if (!in) return false;
  std::vector<uint16_t> depth_mm(kW * kH);
  for (int v = 0; v < kH; ++v) {
    for (int u = 0; u < kW; ++u) {
      double ray = 0.0;
      if (fscanf(in, "%lf", &ray) != 1) {
        fclose(in);
        return false;
      }
      // ray length -> z-depth (ref scene2raw.cpp:96-123)
      const double du = (u - kCx) / kFx;
      const double dv = (v - kCy) / kFy;
      const double z = ray / std::sqrt(du * du + dv * dv + 1.0);
      depth_mm[v * kW + u] = static_cast<uint16_t>(z * 1000.0 + 0.5);
    }
  }
  fclose(in);
  const uint32_t hdr[2] = {kW, kH};
  std::vector<uint8_t> rgb(3 * kW * kH, 0);
  fwrite(hdr, 4, 2, out);
  fwrite(depth_mm.data(), 2, depth_mm.size(), out);
  fwrite(hdr, 4, 2, out);
  fwrite(rgb.data(), 1, rgb.size(), out);
  return true;
}

}  // namespace

extern "C" {

// returns number of frames converted, or -1 on error
int se_scene2raw(const char* scene_dir, const char* out_path) {
  FILE* out = fopen(out_path, "wb");
  if (!out) return -1;
  int frame = 0;
  for (;; ++frame) {
    char path[4096];
    snprintf(path, sizeof(path), "%s/scene_00_%04d.depth", scene_dir,
             frame);
    if (!convert_frame(path, out)) break;
  }
  fclose(out);
  return frame;
}

}  // extern "C"

#ifdef SE_TOOL_MAIN
int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <scene_dir> <out.raw>\n", argv[0]);
    return 1;
  }
  const int n = se_scene2raw(argv[1], argv[2]);
  if (n <= 0) {
    fprintf(stderr, "no frames converted\n");
    return 1;
  }
  fprintf(stderr, "converted %d frames\n", n);
  return 0;
}
#endif
