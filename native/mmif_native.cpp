// Native host-side data kernels for the TPU input pipeline.
//
// The training feed's hot host path — tiling images into 64x64 patches,
// applying dihedral-group augmentation, normalizing, and packing NHWC
// batches — replaces the reference's torch DataLoader worker processes
// (reference train.py:207-222, data/patches.py:106-123, data/transform.py).
// Python orchestrates; these loops do the byte work at memcpy speed.
//
// Build: make -C native     (produces libmmif_native.so, loaded via ctypes
// with a pure-numpy fallback in data/native.py)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Tile an HxW float32 image into non-overlapping ph x pw patches with step
// (sh, sw); writes n_h*n_w patches contiguously. Returns patch count.
int extract_patches_f32(const float* img, int h, int w, int ph, int pw,
                        int sh, int sw, float* out) {
    const int nh = (h - ph) / sh + 1;
    const int nw = (w - pw) / sw + 1;
    if (nh <= 0 || nw <= 0) return 0;
    float* dst = out;
    for (int i = 0; i < nh; ++i) {
        for (int j = 0; j < nw; ++j) {
            const float* src = img + (i * sh) * w + (j * sw);
            for (int r = 0; r < ph; ++r) {
                std::memcpy(dst, src + r * w, pw * sizeof(float));
                dst += pw;
            }
        }
    }
    return nh * nw;
}

// Same, from a uint8 image with /255 normalization fused in.
int extract_patches_u8_norm(const uint8_t* img, int h, int w, int ph,
                            int pw, int sh, int sw, float* out) {
    const int nh = (h - ph) / sh + 1;
    const int nw = (w - pw) / sw + 1;
    if (nh <= 0 || nw <= 0) return 0;
    const float inv = 1.0f / 255.0f;
    float* dst = out;
    for (int i = 0; i < nh; ++i) {
        for (int j = 0; j < nw; ++j) {
            const uint8_t* src = img + (i * sh) * w + (j * sw);
            for (int r = 0; r < ph; ++r) {
                const uint8_t* s = src + r * w;
                for (int c = 0; c < pw; ++c) dst[c] = s[c] * inv;
                dst += pw;
            }
        }
    }
    return nh * nw;
}

// The 8 dihedral-group transforms (reference data/transform.py:38-66).
// mode 0 identity, 1 fliplr, 2 rot180, 3 flipud, 4 rot90, 5 rot90+flipud,
// 6 rot270, 7 rot270+flipud. Output is (h, w) for modes 0-3 and (w, h) for
// modes 4-7.
void dihedral_f32(const float* in, int h, int w, int mode, float* out) {
    switch (mode) {
    case 0:
        std::memcpy(out, in, sizeof(float) * h * w);
        break;
    case 1:  // fliplr
        for (int i = 0; i < h; ++i)
            for (int j = 0; j < w; ++j)
                out[i * w + j] = in[i * w + (w - 1 - j)];
        break;
    case 2:  // rot180
        for (int i = 0; i < h; ++i)
            for (int j = 0; j < w; ++j)
                out[i * w + j] = in[(h - 1 - i) * w + (w - 1 - j)];
        break;
    case 3:  // flipud
        for (int i = 0; i < h; ++i)
            std::memcpy(out + i * w, in + (h - 1 - i) * w,
                        sizeof(float) * w);
        break;
    case 4:  // rot90 (ccw): out[j, i] has shape (w, h); out[r,c]=in[c, w-1-r]
        for (int r = 0; r < w; ++r)
            for (int c = 0; c < h; ++c)
                out[r * h + c] = in[c * w + (w - 1 - r)];
        break;
    case 5:  // rot90 then flipud: out[r,c] = rot90[w-1-r, c]
        for (int r = 0; r < w; ++r)
            for (int c = 0; c < h; ++c)
                out[r * h + c] = in[c * w + (w - 1 - (w - 1 - r))];
        break;
    case 6:  // rot270 (cw): out[r,c] = in[h-1-c, r]
        for (int r = 0; r < w; ++r)
            for (int c = 0; c < h; ++c)
                out[r * h + c] = in[(h - 1 - c) * w + r];
        break;
    case 7:  // rot270 then flipud: out[r,c] = rot270[w-1-r, c]
        for (int r = 0; r < w; ++r)
            for (int c = 0; c < h; ++c)
                out[r * h + c] = in[(h - 1 - c) * w + (w - 1 - r)];
        break;
    }
}

// Normalization (reference data/transform.py:15-29). mode 0: /255,
// mode 1: min-max, mode 2: z-score.
void normalize_f32(const float* in, int64_t n, int mode, float* out) {
    const float eps = 1e-7f;
    if (mode == 0) {
        const float inv = 1.0f / 255.0f;
        for (int64_t i = 0; i < n; ++i) out[i] = in[i] * inv;
    } else if (mode == 1) {
        float lo = in[0], hi = in[0];
        for (int64_t i = 1; i < n; ++i) {
            lo = std::min(lo, in[i]);
            hi = std::max(hi, in[i]);
        }
        const float inv = 1.0f / std::max(hi - lo, eps);
        for (int64_t i = 0; i < n; ++i) out[i] = (in[i] - lo) * inv;
    } else {
        double sum = 0.0, sq = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            sum += in[i];
            sq += double(in[i]) * in[i];
        }
        const double mean = sum / n;
        const double var = sq / n - mean * mean;
        const float inv = 1.0f / std::max(float(std::sqrt(std::max(var, 0.0))),
                                          eps);
        for (int64_t i = 0; i < n; ++i) out[i] = (in[i] - mean) * inv;
    }
}

// Pack a set of HW float32 patches (given by index list) into an NHWC
// (n, h, w, 1) batch buffer — the per-step batch assembly.
void gather_batch_f32(const float* patches, const int64_t* indices, int n,
                      int64_t patch_elems, float* out) {
    for (int i = 0; i < n; ++i) {
        std::memcpy(out + i * patch_elems,
                    patches + indices[i] * patch_elems,
                    patch_elems * sizeof(float));
    }
}

}  // extern "C"
