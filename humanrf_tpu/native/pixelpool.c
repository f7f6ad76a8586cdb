/* Native host data-path for the streaming loader.
 *
 * The reference keeps its pixel pool on the CPU and gathers sampled pixels
 * into the CUDA batch inside its native sampler (ray_sampler.cu:262). The TPU
 * loader's equivalent hot path — gathering R random pixels from the uint8
 * pool and normalizing to float32 rgba — runs here as plain C with no GIL /
 * no numpy temporaries, called through ctypes (humanrf_tpu/native/__init__.py,
 * which also provides a pure-numpy fallback when no C compiler exists).
 */
#include <stdint.h>
#include <stddef.h>

/* pool:      (buffer_size, num_pixels, 4) uint8, C-contiguous
 * light_ok:  (buffer_size, num_pixels) uint8 (0/1), may be NULL
 * buffer_idx, pixel_idx: (n,) int32
 * out_rgba:  (n, 4) float32
 * out_light: (n,) uint8 (written 1s when light_ok == NULL)
 */
void pixelpool_gather(const uint8_t* pool,
                      const uint8_t* light_ok,
                      const int32_t* buffer_idx,
                      const int32_t* pixel_idx,
                      int64_t num_pixels,
                      int64_t n,
                      float* out_rgba,
                      uint8_t* out_light) {
    const float inv = 1.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t off = ((int64_t)buffer_idx[i] * num_pixels + pixel_idx[i]);
        const uint8_t* px = pool + off * 4;
        out_rgba[i * 4 + 0] = px[0] * inv;
        out_rgba[i * 4 + 1] = px[1] * inv;
        out_rgba[i * 4 + 2] = px[2] * inv;
        out_rgba[i * 4 + 3] = px[3] * inv;
        out_light[i] = light_ok ? light_ok[off] : 1;
    }
}

/* Compose rgb*mask + mask channel into a packed uint8 rgba buffer:
 * rgb: (num_pixels, 3) float32 in [0,1] (already masked or not, see mul_mask)
 * mask: (num_pixels,) float32 in [0,1]
 * out: (num_pixels, 4) uint8
 */
void pixelpool_pack_rgba(const float* rgb,
                         const float* mask,
                         int64_t num_pixels,
                         int mul_mask,
                         uint8_t* out) {
    for (int64_t i = 0; i < num_pixels; ++i) {
        const float m = mask[i];
        const float s = mul_mask ? m : 1.0f;
        for (int c = 0; c < 3; ++c) {
            float v = rgb[i * 3 + c] * s * 255.0f;
            out[i * 4 + c] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
        }
        float a = m * 255.0f;
        out[i * 4 + 3] = (uint8_t)(a < 0 ? 0 : (a > 255 ? 255 : a + 0.5f));
    }
}
