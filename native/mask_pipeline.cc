// Native host-side input-pipeline kernels.
//
// The reference delegates its mask rasterization to skimage.draw.random_shapes
// (a Cython kernel) and per-image normalization to kornia, both invoked
// per-sample from Python DataLoader workers (/root/reference/misc.py:13-68,
// /root/reference/data.py:46-56). On a TPU VM the host pipeline must feed
// multiple chips, so these run as batched C++ kernels callable via ctypes:
//
//   * generate_training_masks / generate_validation_masks — the paper-3.2
//     semantic mask schedule for a whole batch in one call (stage draw with
//     double-weighted fc8/fc7, p=0.3 random-shape branch, nearest broadcast);
//   * normalize_minmax_m11 — uint8 HWC image -> float32 [-1,1] per-image
//     min-max normalization with grayscale->RGB expansion.
//
// RNG: per-sample PCG32 streams seeded by (seed, sample index) so results are
// reproducible and order-independent, matching the Python pipeline's
// np.random.Generator((seed, epoch, index)) discipline (distribution-
// equivalent, not bit-equal).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// ----------------------------------------------------------------- PCG32
struct Pcg32 {
  uint64_t state;
  uint64_t inc;
  explicit Pcg32(uint64_t seed, uint64_t stream) {
    state = 0u;
    inc = (stream << 1u) | 1u;
    next();
    state += seed;
    next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  // uniform in [0, 1)
  double uniform() { return next() * (1.0 / 4294967296.0); }
  // uniform integer in [lo, hi] inclusive
  int randint(int lo, int hi) {
    if (hi <= lo) return lo;
    return lo + static_cast<int>(uniform() * (hi - lo + 1));
  }
};

constexpr int kConvLevels = 5;  // deep->shallow spatial dims 8,16,32,64,128

// Rasterize 1-4 random shapes (rect/ellipse/triangle) into a [h x w] binary
// mask: 1.0 background, 0.0 inside shapes (misc.py:43-45 semantics).
void rasterize_random_shapes(Pcg32& rng, int h, int w, float* mask) {
  for (int i = 0; i < h * w; ++i) mask[i] = 1.0f;
  int min_size = std::max(1, std::min(8, h / 2));
  int n_shapes = rng.randint(1, 4);
  for (int s = 0; s < n_shapes; ++s) {
    int sh = rng.randint(min_size, std::max(h, min_size));
    int sw = rng.randint(min_size, std::max(w, min_size));
    sh = std::min(sh, h);
    sw = std::min(sw, w);
    int r0 = rng.randint(0, std::max(h - sh, 0));
    int c0 = rng.randint(0, std::max(w - sw, 0));
    int kind = rng.randint(0, 2);
    if (kind == 0) {  // rectangle
      for (int r = r0; r < r0 + sh; ++r)
        for (int c = c0; c < c0 + sw; ++c) mask[r * w + c] = 0.0f;
    } else if (kind == 1) {  // ellipse inscribed in the box
      double cy = r0 + sh / 2.0, cx = c0 + sw / 2.0;
      double ry = std::max(sh / 2.0, 0.5), rx = std::max(sw / 2.0, 0.5);
      for (int r = r0; r < r0 + sh; ++r)
        for (int c = c0; c < c0 + sw; ++c) {
          double dy = (r - cy) / ry, dx = (c - cx) / rx;
          if (dy * dy + dx * dx <= 1.0) mask[r * w + c] = 0.0f;
        }
    } else {  // triangle, apex mid-top, base at the bottom of the box
      double cx = c0 + sw / 2.0;
      int hspan = std::max(sh - 1, 1);
      for (int r = r0; r < r0 + sh; ++r) {
        double rel = static_cast<double>(r - r0) / hspan;
        double half = (sw / 2.0) * rel;
        for (int c = c0; c < c0 + sw; ++c)
          if (std::fabs(c - cx) <= half) mask[r * w + c] = 0.0f;
      }
    }
  }
}

// torch-nearest broadcast: dst[i,j] = src[i*sh/dh, j*sw/dw]
void nearest_resize(const float* src, int sh, int sw, float* dst, int dh,
                    int dw) {
  for (int r = 0; r < dh; ++r) {
    int sr = std::min(r * sh / dh, sh - 1);
    for (int c = 0; c < dw; ++c) {
      int sc = std::min(c * sw / dw, sw - 1);
      dst[r * dw + c] = src[sr * sw + sc];
    }
  }
}

void fill(float* p, int n, float v) {
  for (int i = 0; i < n; ++i) p[i] = v;
}

}  // namespace

extern "C" {

// Batched training-mask schedule.
//
// conv_out: 5 pointers, deep->SHALLOW index NOT — given shallow->deep like the
// feature list: conv_out[0] = (batch, s0, s0, 1) ... conv_out[4] deepest.
// conv_dims: their spatial sizes shallow->deep (e.g. 128,64,32,16,8).
// fc7/fc8: (batch, fc7_dim) / (batch, fc8_dim).
// validation != 0 selects the one-hot-only schedule (misc.py:71-75).
// Returns 0 on success, 1 if any conv dim exceeds the 128x128 raster buffers
// (image_size > 256 configs must use the numpy schedule).
int generate_masks(uint64_t seed, uint64_t epoch, int batch,
                   float** conv_out, const int* conv_dims, float* fc7,
                   int fc7_dim, float* fc8, int fc8_dim, float p_random,
                   int validation) {
  // deep-first stage indexing: 0=fc8, 1=fc7, 2..6 = conv deep->shallow
  const int n_levels = kConvLevels + 2;
  for (int i = 0; i < kConvLevels; ++i)
    if (conv_dims[i] > 128 || conv_dims[i] < 1) return 1;
  float scratch[128 * 128];
  float resized[128 * 128];
  for (int b = 0; b < batch; ++b) {
    Pcg32 rng(seed ^ (epoch * 0x9E3779B97F4A7C15ULL), b);
    int stage;
    bool spatial = false;
    if (validation) {
      stage = rng.randint(0, n_levels - 1);
    } else {
      // range(7) + [0, 1]: fc8/fc7 double-weighted (misc.py:28)
      int pick = rng.randint(0, n_levels + 1);
      stage = pick < n_levels ? pick : pick - n_levels;
      spatial = (rng.uniform() < p_random) && stage > 0 && stage < n_levels - 1;
    }
    int raster_dim = 0;
    if (spatial) {
      // next-shallower stage's dims; deep-first conv index 2 has the deepest
      // spatial dim conv_dims[4], index 6 the shallowest conv_dims[0].
      int deep_idx = stage + 1;              // in 2..6
      raster_dim = conv_dims[kConvLevels - (deep_idx - 2) - 1];
      rasterize_random_shapes(rng, raster_dim, raster_dim, scratch);
    }
    // fc8 (deep index 0)
    fill(fc8 + static_cast<size_t>(b) * fc8_dim, fc8_dim,
         stage == 0 ? 1.0f : 0.0f);
    // fc7 (deep index 1): ones if selected, zeros otherwise (deeper or
    // shallower-but-fc levels never get spatial masks)
    fill(fc7 + static_cast<size_t>(b) * fc7_dim, fc7_dim,
         stage == 1 ? 1.0f : 0.0f);
    // conv levels, deep index 2..6
    for (int deep_idx = 2; deep_idx < n_levels; ++deep_idx) {
      int shallow_idx = kConvLevels - (deep_idx - 2) - 1;  // 4..0
      int dim = conv_dims[shallow_idx];
      float* out =
          conv_out[shallow_idx] + static_cast<size_t>(b) * dim * dim;
      if (deep_idx == stage) {
        fill(out, dim * dim, 1.0f);
      } else if (deep_idx < stage || !spatial) {
        fill(out, dim * dim, 0.0f);
      } else {
        nearest_resize(scratch, raster_dim, raster_dim, resized, dim, dim);
        std::memcpy(out, resized, sizeof(float) * dim * dim);
      }
    }
  }
  return 0;
}

// uint8 HWC (c in {1,3,4}) -> float32 HW3 per-image min-max to [-1, 1]
// (data.py:46-56: grayscale broadcast, alpha dropped, kornia min-max).
void normalize_minmax_m11(const uint8_t* src, int h, int w, int c,
                          float* dst) {
  int cc = c >= 3 ? 3 : 1;
  uint8_t lo = 255, hi = 0;
  for (int i = 0; i < h * w; ++i)
    for (int k = 0; k < cc; ++k) {
      uint8_t v = src[i * c + k];
      lo = std::min(lo, v);
      hi = std::max(hi, v);
    }
  float scale = hi > lo ? 2.0f / (hi - lo) : 0.0f;
  for (int i = 0; i < h * w; ++i)
    for (int k = 0; k < 3; ++k) {
      uint8_t v = src[i * c + (cc == 1 ? 0 : k)];
      dst[i * 3 + k] = (v - lo) * scale - 1.0f;
    }
}

}  // extern "C"
