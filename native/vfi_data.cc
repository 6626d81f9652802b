// Native data-path kernels for the host input pipeline.
//
// The reference feeds its trainer from 8 Python DataLoader workers
// (configs/DAT.yaml:24); this host often has far fewer cores, so the
// per-sample augmentation pipeline (crop + channel reverse + flips +
// rot90 with flow fixups + uint8->float normalize) is implemented here as
// one fused C++ pass over the pixel data instead of a chain of numpy
// copies. Exposed through a minimal C ABI consumed via ctypes
// (videoframeinterpolation_tpu/data/native.py); the numpy path remains as
// a fallback and as the test oracle.
//
// Layout contract: images are HWC uint8 (3 channels each), flows HWC
// float32 (2 channels each). The output stack is HWC float32
// [x0 | x1 | xt | f0x | f1x] with images scaled by img_scale and flows by
// flow_scale, matching data/vimeo90k.py.

#include <cstdint>
#include <cstring>

namespace {

struct Geom {
  int crop_h, crop_w;     // output size
  int h_off, w_off;       // crop origin in the source
  int chan_reverse;       // RGB -> BGR on images
  int vflip, hflip;       // applied after crop
  int rot;                // 0..3 x 90-degree CCW rotations, applied last
};

// Map an output pixel (y, x) in the final (post-rot) frame back to the
// cropped frame's coordinates, and report the output dims.
inline void out_dims(const Geom& g, int* oh, int* ow) {
  if (g.rot % 2 == 0) {
    *oh = g.crop_h;
    *ow = g.crop_w;
  } else {
    *oh = g.crop_w;
    *ow = g.crop_h;
  }
}

// Inverse mapping: output (y, x) -> cropped-frame (cy, cx).
inline void inv_map(const Geom& g, int y, int x, int* cy, int* cx) {
  // Invert rot90 (numpy rot90 CCW by k on axes (0, 1)).
  int ry, rx;
  switch (g.rot & 3) {
    case 0: ry = y; rx = x; break;
    case 1: rx = g.crop_w - 1 - y; ry = x; break;          // inverse of CCW
    case 2: ry = g.crop_h - 1 - y; rx = g.crop_w - 1 - x; break;
    case 3: rx = y; ry = g.crop_h - 1 - x; break;
    default: ry = y; rx = x;
  }
  // Invert flips (flips applied before rotation in the pipeline).
  if (g.vflip) ry = g.crop_h - 1 - ry;
  if (g.hflip) rx = g.crop_w - 1 - rx;
  *cy = ry;
  *cx = rx;
}

// Flow component transform for the forward pipeline order
// (vflip -> hflip -> rot), matching data/augment.py.
inline void flow_transform(const Geom& g, float fx, float fy,
                           float* ox, float* oy) {
  if (g.vflip) fy = -fy;
  if (g.hflip) fx = -fx;
  switch (g.rot & 3) {
    case 1: { float t = fx; fx = fy; fy = -t; } break;
    case 2: fx = -fx; fy = -fy; break;
    case 3: { float t = fx; fx = -fy; fy = t; } break;
    default: break;
  }
  *ox = fx;
  *oy = fy;
}

}  // namespace

extern "C" {

// Fused augmentation of a Vimeo90K triplet (+ optional flows).
//
//  imgs:  x0, x1, xt — each (src_h, src_w, 3) uint8, C-contiguous.
//  flows: f0x, f1x   — each (src_h, src_w, 2) float32, or nullptr.
//  out:   (out_h, out_w, 9 + 4*have_flow) float32 where (out_h, out_w) =
//         crop dims possibly swapped by odd rotations.
// Returns 0 on success.
int vfi_augment_triplet(
    const uint8_t* x0, const uint8_t* x1, const uint8_t* xt,
    const float* f0x, const float* f1x,
    int src_h, int src_w,
    int crop_h, int crop_w, int h_off, int w_off,
    int chan_reverse, int vflip, int hflip, int rot,
    float img_scale, float flow_scale,
    float* out) {
  Geom g{crop_h, crop_w, h_off, w_off, chan_reverse, vflip, hflip, rot};
  int oh, ow;
  out_dims(g, &oh, &ow);
  const int have_flow = (f0x != nullptr && f1x != nullptr) ? 1 : 0;
  const int oc = 9 + 4 * have_flow;

  for (int y = 0; y < oh; ++y) {
    float* orow = out + static_cast<int64_t>(y) * ow * oc;
    for (int x = 0; x < ow; ++x) {
      int cy, cx;
      inv_map(g, y, x, &cy, &cx);
      const int sy = g.h_off + cy;
      const int sx = g.w_off + cx;
      const int64_t src_idx = (static_cast<int64_t>(sy) * src_w + sx) * 3;
      float* o = orow + static_cast<int64_t>(x) * oc;

      const uint8_t* imgs[3] = {x0, x1, xt};
      for (int k = 0; k < 3; ++k) {
        const uint8_t* p = imgs[k] + src_idx;
        if (chan_reverse) {
          o[k * 3 + 0] = p[2] * img_scale;
          o[k * 3 + 1] = p[1] * img_scale;
          o[k * 3 + 2] = p[0] * img_scale;
        } else {
          o[k * 3 + 0] = p[0] * img_scale;
          o[k * 3 + 1] = p[1] * img_scale;
          o[k * 3 + 2] = p[2] * img_scale;
        }
      }
      if (have_flow) {
        const int64_t fidx = (static_cast<int64_t>(sy) * src_w + sx) * 2;
        float ox, oy;
        flow_transform(g, f0x[fidx], f0x[fidx + 1], &ox, &oy);
        o[9] = ox * flow_scale;
        o[10] = oy * flow_scale;
        flow_transform(g, f1x[fidx], f1x[fidx + 1], &ox, &oy);
        o[11] = ox * flow_scale;
        o[12] = oy * flow_scale;
      }
    }
  }
  return 0;
}

// Batched HWC uint8 -> float32 [0,1] normalize (eval path).
void vfi_u8_to_f32(const uint8_t* src, float* dst, int64_t n, float scale) {
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale;
}

}  // extern "C"
