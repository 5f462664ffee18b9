// Native host-side data-pipeline kernels.
//
// The reference's host data path is Python/PIL inside torch DataLoader
// worker processes (`barf/dataset.py:161-262`, `barf/data_module.py:202-209`).
// Here the two host-side hot loops — full-dataset ray precomputation and the
// separable Gaussian blur pyramid — are C++ (OpenMP across images), bound
// via ctypes (`nerf_experiments_tpu/data/native.py`). The TPU compute path
// stays JAX/XLA/Pallas; this is the runtime around it.
//
// Build: make -C native  (produces libnetpu_data.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Compute world-space rays for every pixel of every camera.
//   c2w:       (n_images, 4, 4) row-major float32
//   out_origs: (n_images, H*W, 3) float32
//   out_dirs:  (n_images, H*W, 3) float32
// Convention (barf/dataset.py:406-482): camera looks down -z, y flipped,
// pixel (i,j) -> row i*W + j, directions unit-normalized in camera space
// then rotated by c2w[:3,:3]; origins are the camera position repeated.
void compute_rays(const float* c2w, int n_images, int height, int width,
                  float focal, float* out_origs, float* out_dirs) {
  const int hw = height * width;
#pragma omp parallel for schedule(static)
  for (int n = 0; n < n_images; ++n) {
    const float* M = c2w + n * 16;
    const float r00 = M[0], r01 = M[1], r02 = M[2], tx = M[3];
    const float r10 = M[4], r11 = M[5], r12 = M[6], ty = M[7];
    const float r20 = M[8], r21 = M[9], r22 = M[10], tz = M[11];
    float* origs = out_origs + (size_t)n * hw * 3;
    float* dirs = out_dirs + (size_t)n * hw * 3;
    for (int i = 0; i < height; ++i) {
      const float y = -((float)i - (height - 1) * 0.5f) / focal;
      for (int j = 0; j < width; ++j) {
        const float x = ((float)j - (width - 1) * 0.5f) / focal;
        const float inv_norm = 1.0f / std::sqrt(x * x + y * y + 1.0f);
        const float dx = x * inv_norm, dy = y * inv_norm, dz = -inv_norm;
        const size_t p = (size_t)(i * width + j) * 3;
        dirs[p + 0] = r00 * dx + r01 * dy + r02 * dz;
        dirs[p + 1] = r10 * dx + r11 * dy + r12 * dz;
        dirs[p + 2] = r20 * dx + r21 * dy + r22 * dz;
        origs[p + 0] = tx;
        origs[p + 1] = ty;
        origs[p + 2] = tz;
      }
    }
  }
}

// Separable Gaussian blur of an (H, W, C) float32 image into out.
// Kernel radius = ceil(3*sigma) with the standard normalized Gaussian —
// matches PIL ImageFilter.GaussianBlur visually (PIL uses a box-approx; we
// use the exact separable kernel, which is the mathematically-correct blur
// the reference intends). sigma <= 0.25 copies the input
// (`barf/dataset.py:250-262` min_sigma gate).
void gaussian_blur(const float* img, int height, int width, int channels,
                   float sigma, float* out) {
  const size_t n = (size_t)height * width * channels;
  if (sigma <= 0.25f) {
    std::memcpy(out, img, n * sizeof(float));
    return;
  }
  const int radius = (int)std::ceil(3.0f * sigma);
  std::vector<float> kernel(2 * radius + 1);
  float sum = 0.0f;
  for (int k = -radius; k <= radius; ++k) {
    kernel[k + radius] = std::exp(-(float)(k * k) / (2.0f * sigma * sigma));
    sum += kernel[k + radius];
  }
  for (auto& v : kernel) v /= sum;

  std::vector<float> tmp(n);
  // horizontal pass (clamp-to-edge)
#pragma omp parallel for schedule(static)
  for (int i = 0; i < height; ++i) {
    for (int j = 0; j < width; ++j) {
      for (int c = 0; c < channels; ++c) {
        float acc = 0.0f;
        for (int k = -radius; k <= radius; ++k) {
          int jj = j + k;
          jj = jj < 0 ? 0 : (jj >= width ? width - 1 : jj);
          acc += kernel[k + radius] *
                 img[((size_t)i * width + jj) * channels + c];
        }
        tmp[((size_t)i * width + j) * channels + c] = acc;
      }
    }
  }
  // vertical pass
#pragma omp parallel for schedule(static)
  for (int i = 0; i < height; ++i) {
    for (int j = 0; j < width; ++j) {
      for (int c = 0; c < channels; ++c) {
        float acc = 0.0f;
        for (int k = -radius; k <= radius; ++k) {
          int ii = i + k;
          ii = ii < 0 ? 0 : (ii >= height ? height - 1 : ii);
          acc += kernel[k + radius] *
                 tmp[((size_t)ii * width + j) * channels + c];
        }
        out[((size_t)i * width + j) * channels + c] = acc;
      }
    }
  }
}

// Blur pyramid: apply gaussian_blur for each sigma over a batch of images.
//   imgs: (n_images, H, W, C); out: (n_images, H, W, n_sigmas, C)
void blur_pyramid(const float* imgs, int n_images, int height, int width,
                  int channels, const float* sigmas, int n_sigmas,
                  float* out) {
  const size_t img_sz = (size_t)height * width * channels;
#pragma omp parallel for collapse(2) schedule(dynamic)
  for (int n = 0; n < n_images; ++n) {
    for (int s = 0; s < n_sigmas; ++s) {
      std::vector<float> blurred(img_sz);
      gaussian_blur(imgs + (size_t)n * img_sz, height, width, channels,
                    sigmas[s], blurred.data());
      // scatter into the (H, W, n_sigmas, C) layout
      float* dst = out + (size_t)n * img_sz * n_sigmas;
      for (size_t p = 0; p < (size_t)height * width; ++p) {
        std::memcpy(dst + (p * n_sigmas + s) * channels,
                    blurred.data() + p * channels, channels * sizeof(float));
      }
    }
  }
}

// Apply per-camera pose noise: translation added to origins, rotation
// applied to directions (`barf/dataset.py:513-561`).
//   rot:   (n_images, 3, 3); trans: (n_images, 3)
//   origs/dirs: (n_images, hw, 3), modified copies written to out_*
void apply_pose_noise(const float* origs, const float* dirs, int n_images,
                      int hw, const float* rot, const float* trans,
                      float* out_origs, float* out_dirs) {
#pragma omp parallel for schedule(static)
  for (int n = 0; n < n_images; ++n) {
    const float* R = rot + n * 9;
    const float* t = trans + n * 3;
    const float* o = origs + (size_t)n * hw * 3;
    const float* d = dirs + (size_t)n * hw * 3;
    float* oo = out_origs + (size_t)n * hw * 3;
    float* od = out_dirs + (size_t)n * hw * 3;
    for (int p = 0; p < hw; ++p) {
      const size_t q = (size_t)p * 3;
      oo[q + 0] = o[q + 0] + t[0];
      oo[q + 1] = o[q + 1] + t[1];
      oo[q + 2] = o[q + 2] + t[2];
      od[q + 0] = R[0] * d[q] + R[1] * d[q + 1] + R[2] * d[q + 2];
      od[q + 1] = R[3] * d[q] + R[4] * d[q + 1] + R[5] * d[q + 2];
      od[q + 2] = R[6] * d[q] + R[7] * d[q + 1] + R[8] * d[q + 2];
    }
  }
}

}  // extern "C"
