// Native host-side data-pipeline kernels for matchnerf-tpu.
//
// The reference delegates its host data path to torch DataLoader workers
// (coach.py:67-68) whose hot inner loops (image resize, dtype conversion,
// PFM depth parsing) run in PIL/numpy C code. This library provides our own
// C++ implementations, loaded via ctypes (matchnerf_tpu/data/native_io.py),
// so the input pipeline's per-sample work is native end to end:
//
//   - read_pfm / pfm_dims: portable-float-map depth maps (DTU GT depth)
//   - resize_bilinear_f32: HWC float32 bilinear resize (half-pixel or
//     align-corners sampling)
//   - resize_nearest_f32:  HWC float32 nearest resize (depth maps)
//   - u8_to_f32: uint8 -> [0,1] float conversion
//   - normalize_imagenet: in-place ImageNet mean/std normalization
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// PFM
// ---------------------------------------------------------------------------

// Query dimensions of a PFM file. Returns 0 on success.
// channels: 3 for 'PF', 1 for 'Pf'. little_endian: 1/0.
int pfm_dims(const char* path, int* height, int* width, int* channels,
             int* little_endian) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    char header[8] = {0};
    if (fscanf(f, "%7s", header) != 1) { fclose(f); return 2; }
    if (strcmp(header, "PF") == 0) *channels = 3;
    else if (strcmp(header, "Pf") == 0) *channels = 1;
    else { fclose(f); return 3; }
    int w, h;
    if (fscanf(f, "%d %d", &w, &h) != 2) { fclose(f); return 4; }
    double scale;
    if (fscanf(f, "%lf", &scale) != 1) { fclose(f); return 5; }
    *width = w; *height = h;
    *little_endian = scale < 0 ? 1 : 0;
    fclose(f);
    return 0;
}

// Read PFM payload into out (row-flipped to top-down order, like the
// reference's np.flipud — misc/utils.py:311). out must hold h*w*c floats.
int read_pfm(const char* path, float* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    char header[8] = {0};
    int w = 0, h = 0;
    double scale = 0;
    if (fscanf(f, "%7s", header) != 1 ||
        fscanf(f, "%d %d", &w, &h) != 2 ||
        fscanf(f, "%lf", &scale) != 1) { fclose(f); return 2; }
    int c = (strcmp(header, "PF") == 0) ? 3 : 1;
    fgetc(f);  // single whitespace after the scale line
    const long row = (long)w * c;
    const bool little = scale < 0;
    float* buf = new float[row];
    for (int y = h - 1; y >= 0; --y) {     // PFM stores bottom-up
        if (fread(buf, sizeof(float), row, f) != (size_t)row) {
            delete[] buf; fclose(f); return 3;
        }
        if (!little) {                      // big-endian payload: byte swap
            for (long i = 0; i < row; ++i) {
                uint32_t v;
                memcpy(&v, &buf[i], 4);
                v = __builtin_bswap32(v);
                memcpy(&buf[i], &v, 4);
            }
        }
        memcpy(out + (long)y * row, buf, row * sizeof(float));
    }
    delete[] buf;
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// Resize
// ---------------------------------------------------------------------------

// Bilinear HWC float32 resize. align_corners=0 uses half-pixel centers with
// edge clamping (PIL/torch antialias-off convention); =1 maps corners.
void resize_bilinear_f32(const float* src, int sh, int sw, int c,
                         float* dst, int dh, int dw, int align_corners) {
    for (int y = 0; y < dh; ++y) {
        float fy;
        if (align_corners && dh > 1) fy = (float)y * (sh - 1) / (dh - 1);
        else fy = ((float)y + 0.5f) * sh / dh - 0.5f;
        fy = std::min(std::max(fy, 0.0f), (float)(sh - 1));
        int y0 = (int)fy;
        int y1 = std::min(y0 + 1, sh - 1);
        float wy = fy - y0;
        for (int x = 0; x < dw; ++x) {
            float fx;
            if (align_corners && dw > 1) fx = (float)x * (sw - 1) / (dw - 1);
            else fx = ((float)x + 0.5f) * sw / dw - 0.5f;
            fx = std::min(std::max(fx, 0.0f), (float)(sw - 1));
            int x0 = (int)fx;
            int x1 = std::min(x0 + 1, sw - 1);
            float wx = fx - x0;
            const float* p00 = src + ((long)y0 * sw + x0) * c;
            const float* p01 = src + ((long)y0 * sw + x1) * c;
            const float* p10 = src + ((long)y1 * sw + x0) * c;
            const float* p11 = src + ((long)y1 * sw + x1) * c;
            float* o = dst + ((long)y * dw + x) * c;
            for (int k = 0; k < c; ++k) {
                float top = p00[k] * (1 - wx) + p01[k] * wx;
                float bot = p10[k] * (1 - wx) + p11[k] * wx;
                o[k] = top * (1 - wy) + bot * wy;
            }
        }
    }
}

// Nearest-neighbor HWC float32 resize matching cv2.INTER_NEAREST
// (x_src = floor(x_dst * sw / dw)) used for DTU depth maps (dtu.py:125-127).
void resize_nearest_f32(const float* src, int sh, int sw, int c,
                        float* dst, int dh, int dw) {
    for (int y = 0; y < dh; ++y) {
        int ys = std::min((int)((float)y * sh / dh), sh - 1);
        for (int x = 0; x < dw; ++x) {
            int xs = std::min((int)((float)x * sw / dw), sw - 1);
            memcpy(dst + ((long)y * dw + x) * c,
                   src + ((long)ys * sw + xs) * c, c * sizeof(float));
        }
    }
}

// ---------------------------------------------------------------------------
// Conversions
// ---------------------------------------------------------------------------

void u8_to_f32(const uint8_t* src, long n, float* dst) {
    const float inv = 1.0f / 255.0f;
    for (long i = 0; i < n; ++i) dst[i] = src[i] * inv;
}

// In-place ImageNet normalization of an HWC RGB image in [0,1]
// (models/gmflow/gmflow.py:82-89).
void normalize_imagenet(float* img, long npix) {
    const float mean[3] = {0.485f, 0.456f, 0.406f};
    const float istd[3] = {1.0f / 0.229f, 1.0f / 0.224f, 1.0f / 0.225f};
    for (long i = 0; i < npix; ++i) {
        float* p = img + i * 3;
        p[0] = (p[0] - mean[0]) * istd[0];
        p[1] = (p[1] - mean[1]) * istd[1];
        p[2] = (p[2] - mean[2]) * istd[2];
    }
}

}  // extern "C"
