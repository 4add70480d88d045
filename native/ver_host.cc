// ver_host — native host-runtime kernels for the vln_ver_tpu data path.
//
// The reference's hot native code is the CUDA deformable-attention kernel
// (ours is the Pallas TPU kernel); its host data path is Python
// (mmcv DataLoader workers).  This library speeds up the host side that
// feeds the TPU: sparse->dense occupancy scatter (504k voxels/sample), ViT
// feature CLS-strip + layout fixup, and multi-threaded batch collation.
//
// Exposed as a plain C ABI consumed via ctypes (vln_ver_tpu/native.py);
// every entry point has a numpy fallback, so the library is an accelerator,
// not a dependency.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// dense[i] = empty; dense[idx[j]] = cls[j]  (bounds-checked)
void ver_dense_from_sparse(const int64_t* idx, const int64_t* cls,
                           int64_t n, int32_t* dense, int64_t voxel_num,
                           int32_t empty) {
  std::fill(dense, dense + voxel_num, empty);
  for (int64_t j = 0; j < n; ++j) {
    int64_t i = idx[j];
    if (i >= 0 && i < voxel_num) dense[i] = static_cast<int32_t>(cls[j]);
  }
}

// Parallel collation: stack n_src equal-size fp32 blocks into out.
void ver_collate_f32(const float** srcs, int64_t n_src, int64_t elems,
                     float* out, int32_t n_threads) {
  int32_t workers = std::max(1, std::min<int32_t>(n_threads, n_src));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  std::int64_t per = (n_src + workers - 1) / workers;
  for (int32_t w = 0; w < workers; ++w) {
    int64_t lo = w * per;
    int64_t hi = std::min<int64_t>(lo + per, n_src);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * elems, srcs[i],
                    sizeof(float) * static_cast<size_t>(elems));
      }
    });
  }
  for (auto& t : pool) t.join();
}

// Confusion-histogram accumulation for SSC metrics:
// hist[gt*n_cl + pred] += 1 over valid gt entries.
void ver_confusion_hist(const int32_t* pred, const int32_t* gt, int64_t n,
                        int64_t n_cl, int64_t* hist) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t g = gt[i];
    int64_t p = pred[i];
    if (g >= 0 && g < n_cl && p >= 0 && p < n_cl) ++hist[g * n_cl + p];
  }
}

}  // extern "C"
