// Native NIfTI-1 batch decoder for the host input pipeline.
//
// The reference parallelizes volume decode with DataLoader worker
// *processes* (reference train_ResNet3D.py:146-147) — fork overhead, IPC
// serialization, and Python in the loop. This native tier decodes NIfTI
// volumes (.nii / .nii.gz via zlib) on a pthread pool entirely outside the
// GIL, optionally fusing min-max intensity normalization
// (MONAI ScaleIntensityd semantics, reference datasets/ADNI.py:148)
// into the decode pass, and writes straight into caller-provided float32
// buffers (zero-copy into numpy / jax.device_put staging).
//
// C ABI (ctypes): see utils/native_loader.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>
#include <zlib.h>

namespace {

constexpr int kHdrSize = 348;

struct Header {
  int ndim;
  int64_t shape[7];
  int datatype;
  float scl_slope, scl_inter;
  int64_t vox_offset;
  bool swap;  // byte-swapped file
};

uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

int16_t rd_i16(const unsigned char* p, bool swap) {
  uint16_t v; memcpy(&v, p, 2); if (swap) v = bswap16(v);
  int16_t out; memcpy(&out, &v, 2); return out;
}
int32_t rd_i32(const unsigned char* p, bool swap) {
  uint32_t v; memcpy(&v, p, 4); if (swap) v = bswap32(v);
  int32_t out; memcpy(&out, &v, 4); return out;
}
float rd_f32(const unsigned char* p, bool swap) {
  uint32_t v; memcpy(&v, p, 4); if (swap) v = bswap32(v);
  float out; memcpy(&out, &v, 4); return out;
}

// read whole file (gz-transparent: gzread handles plain files too)
bool read_all(const char* path, std::vector<unsigned char>& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  constexpr size_t kChunk = 1 << 20;
  size_t size = 0;
  out.resize(kChunk);
  for (;;) {
    if (out.size() < size + kChunk) out.resize(out.size() * 2);
    int n = gzread(f, out.data() + size, kChunk);
    if (n < 0) { gzclose(f); return false; }
    size += static_cast<size_t>(n);
    if (n == 0) break;
  }
  gzclose(f);
  out.resize(size);
  return true;
}

bool parse_header(const std::vector<unsigned char>& buf, Header* h) {
  if (buf.size() < kHdrSize) return false;
  int32_t sizeof_hdr = rd_i32(buf.data(), false);
  h->swap = false;
  if (sizeof_hdr != 348) {
    sizeof_hdr = rd_i32(buf.data(), true);
    if (sizeof_hdr != 348) return false;
    h->swap = true;
  }
  const unsigned char* magic = buf.data() + 344;
  if (memcmp(magic, "n+1", 3) != 0 && memcmp(magic, "ni1", 3) != 0)
    return false;
  h->ndim = rd_i16(buf.data() + 40, h->swap);
  if (h->ndim < 1 || h->ndim > 7) return false;
  for (int i = 0; i < h->ndim; ++i)
    h->shape[i] = rd_i16(buf.data() + 42 + 2 * i, h->swap);
  h->datatype = rd_i16(buf.data() + 70, h->swap);
  for (int i = 0; i < h->ndim; ++i)
    if (h->shape[i] <= 0) return false;  // corrupt dims -> huge/negative n
  h->vox_offset = static_cast<int64_t>(rd_f32(buf.data() + 108, h->swap));
  // a corrupt/negative vox_offset would point `data` before the buffer and
  // make `avail` huge -> out-of-bounds read in convert()
  if (h->vox_offset < kHdrSize) return false;
  h->scl_slope = rd_f32(buf.data() + 112, h->swap);
  h->scl_inter = rd_f32(buf.data() + 116, h->swap);
  if (h->scl_slope == 0.0f || std::isnan(h->scl_slope)) h->scl_slope = 1.0f;
  if (std::isnan(h->scl_inter)) h->scl_inter = 0.0f;
  return true;
}

template <typename T>
void convert(const unsigned char* src, float* dst, int64_t n, bool swap,
             float slope, float inter) {
  if (!swap) {
    // aligned fast path: plain casts auto-vectorize under -O3
    const T* s = reinterpret_cast<const T*>(src);
    if (slope == 1.0f && inter == 0.0f) {
      for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
    } else {
      for (int64_t i = 0; i < n; ++i)
        dst[i] = static_cast<float>(s[i]) * slope + inter;
    }
    return;
  }
  for (int64_t i = 0; i < n; ++i) {
    T v;
    memcpy(&v, src + i * sizeof(T), sizeof(T));
    if (sizeof(T) == 2) { uint16_t u; memcpy(&u, &v, 2); u = bswap16(u); memcpy(&v, &u, 2); }
    else if (sizeof(T) == 4) { uint32_t u; memcpy(&u, &v, 4); u = bswap32(u); memcpy(&v, &u, 4); }
    else if (sizeof(T) == 8) { uint64_t u; memcpy(&u, &v, 8); u = bswap64(u); memcpy(&v, &u, 8); }
    dst[i] = static_cast<float>(v) * slope + inter;
  }
}

int decode_one(const char* path, float* out, int64_t cap, int32_t* shape_out,
               int normalize) {
  std::vector<unsigned char> buf;
  if (!read_all(path, buf)) return -1;
  Header h;
  if (!parse_header(buf, &h)) return -2;
  if (h.ndim != 3) return -3;
  int64_t n = h.shape[0] * h.shape[1] * h.shape[2];
  if (n > cap) return -4;
  if ((int64_t)buf.size() < h.vox_offset) return -5;
  const unsigned char* data = buf.data() + h.vox_offset;
  int64_t avail = buf.size() - h.vox_offset;

  // decode straight into `out` in the file's Fortran order (x fastest);
  // the Python wrapper re-views it as [x, y, z] with numpy's optimized
  // transpose — faster than any scalar transpose loop here
  float* tmp_ptr = out;
  auto need = [&](size_t e) { return avail >= (int64_t)(n * e); };
  switch (h.datatype) {
    case 2:   if (!need(1)) return -5; convert<uint8_t>(data, tmp_ptr, n, false, h.scl_slope, h.scl_inter); break;
    case 256: if (!need(1)) return -5; convert<int8_t>(data, tmp_ptr, n, false, h.scl_slope, h.scl_inter); break;
    case 4:   if (!need(2)) return -5; convert<int16_t>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    case 512: if (!need(2)) return -5; convert<uint16_t>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    case 8:   if (!need(4)) return -5; convert<int32_t>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    case 768: if (!need(4)) return -5; convert<uint32_t>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    case 16:  if (!need(4)) return -5; convert<float>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    case 64:  if (!need(8)) return -5; convert<double>(data, tmp_ptr, n, h.swap, h.scl_slope, h.scl_inter); break;
    default: return -6;
  }

  if (normalize) {  // fused min-max to [0, 1]
    float mn = out[0], mx = out[0];
    for (int64_t i = 1; i < n; ++i) {
      mn = out[i] < mn ? out[i] : mn;
      mx = out[i] > mx ? out[i] : mx;
    }
    float range = mx - mn;
    if (range < 1e-12f) {
      for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    } else {
      float inv = 1.0f / range;
      for (int64_t i = 0; i < n; ++i) out[i] = (out[i] - mn) * inv;
    }
  }

  shape_out[0] = (int32_t)h.shape[0];
  shape_out[1] = (int32_t)h.shape[1];
  shape_out[2] = (int32_t)h.shape[2];
  return 0;
}

}  // namespace

extern "C" {

// Decode one volume into `out` (float32, capacity `cap` elements).
// Returns 0 on success; negative error codes otherwise.
int mad_read_nifti(const char* path, float* out, int64_t cap,
                   int32_t* shape_out, int normalize) {
  return decode_one(path, out, cap, shape_out, normalize);
}

// Decode `n` volumes in parallel on `n_threads` worker threads. All
// volumes must share `vol_elems` elements; outputs are packed
// consecutively in `out`. Per-volume status lands in `status`.
int mad_read_batch(const char** paths, int n, float* out, int64_t vol_elems,
                   int32_t* shapes, int* status, int normalize,
                   int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = decode_one(paths[i], out + (int64_t)i * vol_elems,
                             vol_elems, shapes + 3 * i, normalize);
      if (status[i] != 0) failures.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : 1;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
