// yume_host: native host-side data-path kernels.
//
// TPU-native counterpart of the reference's native components: where the
// reference offloads its host hot paths to C++/CUDA (ADD/th_utils/ops/*,
// decord video decode), the TPU build keeps device compute in XLA/Pallas
// and moves the *host* data hot path (frame preprocessing feeding the
// device: uint8 -> float32 [-1,1] conversion, center-crop + bilinear
// resize, batch assembly) into this small C++ library, loaded via ctypes
// (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libyume_host.so yume_host.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// Convert HWC uint8 RGB frames to float32 in [-1, 1].
// in:  [n, h, w, 3] uint8;  out: [n, h, w, 3] float32
void u8_to_unit_range(const uint8_t* in, float* out, int64_t count) {
    static float lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        for (int i = 0; i < 256; ++i) lut[i] = i / 127.5f - 1.0f;
        lut_init = true;
    }
    for (int64_t i = 0; i < count; ++i) out[i] = lut[in[i]];
}

// Center-crop to the target aspect ratio then bilinear-resize.
// in:  [h, w, 3] uint8; out: [out_h, out_w, 3] float32 in [-1, 1].
// (host equivalent of the reference CenterCropResizeVideo transform,
// fastvideo/dataset/transform.py:324)
void center_crop_resize_frame(
    const uint8_t* in, int h, int w,
    float* out, int out_h, int out_w) {
    // crop window with the target aspect
    double target_ar = (double)out_w / out_h;
    int crop_w = w, crop_h = h;
    if ((double)w / h > target_ar) {
        crop_w = (int)std::lround(h * target_ar);
    } else {
        crop_h = (int)std::lround(w / target_ar);
    }
    int x0 = (w - crop_w) / 2;
    int y0 = (h - crop_h) / 2;

    double sy = (double)crop_h / out_h;
    double sx = (double)crop_w / out_w;
    for (int oy = 0; oy < out_h; ++oy) {
        double fy = (oy + 0.5) * sy - 0.5;
        int y1 = (int)std::floor(fy);
        double wy = fy - y1;
        int ya = std::clamp(y1, 0, crop_h - 1) + y0;
        int yb = std::clamp(y1 + 1, 0, crop_h - 1) + y0;
        for (int ox = 0; ox < out_w; ++ox) {
            double fx = (ox + 0.5) * sx - 0.5;
            int x1 = (int)std::floor(fx);
            double wx = fx - x1;
            int xa = std::clamp(x1, 0, crop_w - 1) + x0;
            int xb = std::clamp(x1 + 1, 0, crop_w - 1) + x0;
            for (int c = 0; c < 3; ++c) {
                double v =
                    (1 - wy) * ((1 - wx) * in[(ya * w + xa) * 3 + c] +
                                wx * in[(ya * w + xb) * 3 + c]) +
                    wy * ((1 - wx) * in[(yb * w + xa) * 3 + c] +
                          wx * in[(yb * w + xb) * 3 + c]);
                out[(oy * out_w + ox) * 3 + c] = (float)(v / 127.5 - 1.0);
            }
        }
    }
}

// Batched variant: frames [n, h, w, 3] uint8 -> [n, out_h, out_w, 3] f32.
void center_crop_resize_batch(
    const uint8_t* in, int n, int h, int w,
    float* out, int out_h, int out_w) {
    const int64_t in_stride = (int64_t)h * w * 3;
    const int64_t out_stride = (int64_t)out_h * out_w * 3;
    for (int i = 0; i < n; ++i) {
        center_crop_resize_frame(in + i * in_stride, h, w,
                                 out + i * out_stride, out_h, out_w);
    }
}

// Trim a frame count to 4n+1 (reference distill_model.py:249-253).
int trim_4n1(int n) { return ((n - 1) / 4) * 4 + 1; }

}  // extern "C"
