// himan native data-IO kernels (C ABI, loaded via ctypes).
//
// The reference has no native code (SURVEY.md §3.4) — its host-side data
// path is PIL/numpy inside torch DataLoader workers. On this framework's
// TPU hosts the Python/numpy versions of these inner loops are the
// throughput ceiling of the input pipeline (single-core hosts serve the
// chip), so they are implemented natively:
//
//   himan_extract_bboxes   — per-instance-id bounding boxes from a
//                            Cityscapes instance map (id = class*1000+k),
//                            one O(H*W) pass instead of numpy's
//                            unique()+nonzero() per id (O(K*H*W)).
//   himan_u8_to_pm1        — uint8 HWC -> float32 [-1,1] normalize
//                            (Normalize(0.5,0.5) of the reference).
//   himan_nearest_resize_i32 — nearest resize for int32 id maps
//                            (label/inst geometry, PIL-NEAREST semantics).
//   himan_box_mask_f32     — binary box-interior mask rasterizer.
//
// Build: make -C native   (g++ -O3 -shared; zero dependencies)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Scans an int32 instance map and writes up to max_records records of
// (inst_id, cls, y0, x0, h, w) into out (int32, row-major 6 cols).
// Only ids >= min_id (default 1000 = Cityscapes "thing" convention).
// Returns the number of records written.
int32_t himan_extract_bboxes(const int32_t* inst, int32_t h, int32_t w,
                             int32_t min_id, int32_t* out,
                             int32_t max_records) {
  struct Box {
    int32_t y0, x0, y1, x1;
  };
  std::unordered_map<int32_t, Box> boxes;
  boxes.reserve(64);
  for (int32_t y = 0; y < h; ++y) {
    const int32_t* row = inst + (int64_t)y * w;
    for (int32_t x = 0; x < w; ++x) {
      int32_t id = row[x];
      if (id < min_id) continue;
      auto it = boxes.find(id);
      if (it == boxes.end()) {
        boxes.emplace(id, Box{y, x, y, x});
      } else {
        Box& b = it->second;
        if (y < b.y0) b.y0 = y;
        if (y > b.y1) b.y1 = y;
        if (x < b.x0) b.x0 = x;
        if (x > b.x1) b.x1 = x;
      }
    }
  }
  int32_t n = 0;
  for (const auto& kv : boxes) {
    if (n >= max_records) break;
    const Box& b = kv.second;
    int32_t* rec = out + (int64_t)n * 6;
    rec[0] = kv.first;
    rec[1] = kv.first / 1000;
    rec[2] = b.y0;
    rec[3] = b.x0;
    rec[4] = b.y1 - b.y0 + 1;
    rec[5] = b.x1 - b.x0 + 1;
    ++n;
  }
  return n;
}

// uint8 -> float32 in [-1, 1]: dst = src/127.5 - 1
void himan_u8_to_pm1(const uint8_t* src, float* dst, int64_t n) {
  static float lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) lut[i] = (float)i / 127.5f - 1.0f;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// Nearest resize of an int32 (H,W) map to (oh, ow) — PIL NEAREST
// convention: src index = floor((i + 0.5) * scale).
void himan_nearest_resize_i32(const int32_t* src, int32_t h, int32_t w,
                              int32_t* dst, int32_t oh, int32_t ow) {
  std::vector<int32_t> xi(ow);
  const double sx = (double)w / ow;
  const double sy = (double)h / oh;
  for (int32_t x = 0; x < ow; ++x) {
    int32_t v = (int32_t)((x + 0.5) * sx);
    xi[x] = v < w ? v : w - 1;
  }
  for (int32_t y = 0; y < oh; ++y) {
    int32_t yi = (int32_t)((y + 0.5) * sy);
    if (yi >= h) yi = h - 1;
    const int32_t* srow = src + (int64_t)yi * w;
    int32_t* drow = dst + (int64_t)y * ow;
    for (int32_t x = 0; x < ow; ++x) drow[x] = srow[xi[x]];
  }
}

// Rasterize a binary box mask (float32 HxWx1): 1 inside [y0,y0+bh) x
// [x0,x0+bw), 0 elsewhere.
void himan_box_mask_f32(float* dst, int32_t h, int32_t w, int32_t y0,
                        int32_t x0, int32_t bh, int32_t bw) {
  std::memset(dst, 0, sizeof(float) * (int64_t)h * w);
  int32_t y1 = y0 + bh < h ? y0 + bh : h;
  int32_t x1 = x0 + bw < w ? x0 + bw : w;
  if (y0 < 0) y0 = 0;
  if (x0 < 0) x0 = 0;
  for (int32_t y = y0; y < y1; ++y) {
    float* row = dst + (int64_t)y * w;
    for (int32_t x = x0; x < x1; ++x) row[x] = 1.0f;
  }
}

}  // extern "C"
