// Native data-loader runtime: NIfTI-1 decode + resample + center pad/crop +
// multithreaded batch loading.
//
// The reference's data path is SimpleITK's C++ resampler driven per-sample
// from Python (`VolumeDataset.py:214-238`); neither SimpleITK nor nibabel is
// a dependency here, so this library owns the hot host path: mmap/gzip read,
// header parse, dtype decode to float32 (with scl_slope/inter scaling),
// nearest-neighbor or trilinear resample to target spacing (ITK
// round-half-up semantics, see `ops/resize.py`), center pad/crop, and a
// pthread pool that fills a whole batch buffer in parallel while the Python
// side stays free to drive the device.
//
// C ABI (ctypes-friendly); all volumes are float32 (z, y, x) arrays.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <zlib.h>

namespace {

#pragma pack(push, 1)
struct Nifti1Header {
  int32_t sizeof_hdr;      // 0
  char pad0[36];           // 4..39
  int16_t dim[8];          // 40
  char pad1[14];           // 56..69
  int16_t datatype;        // 70
  int16_t bitpix;          // 72
  int16_t slice_start;     // 74
  float pixdim[8];         // 76
  float vox_offset;        // 108
  float scl_slope;         // 112
  float scl_inter;         // 116
  char pad2[224];          // 120..343
  char magic[4];           // 344
};
#pragma pack(pop)

static_assert(sizeof(Nifti1Header) == 348, "NIfTI-1 header must be 348 bytes");

struct Volume {
  std::vector<float> data;  // (z, y, x) C-order, i.e. file order is x-fastest
  int64_t nx = 0, ny = 0, nz = 0;
  float sx = 1.f, sy = 1.f, sz = 1.f;  // spacing (x, y, z)
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  size_t n = strlen(path);
  bool gz = n > 3 && strcmp(path + n - 3, ".gz") == 0;
  if (gz) {
    gzFile f = gzopen(path, "rb");
    if (!f) return false;
    out.clear();
    uint8_t buf[1 << 16];
    int r;
    while ((r = gzread(f, buf, sizeof(buf))) > 0) {
      out.insert(out.end(), buf, buf + r);
    }
    gzclose(f);
    return r == 0;
  }
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(sz);
  size_t rd = fread(out.data(), 1, sz, f);
  fclose(f);
  return rd == static_cast<size_t>(sz);
}

template <typename T>
void decode_typed(const uint8_t* src, int64_t n, float slope, float inter,
                  float* dst) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 0.f) slope = 1.f;
  if (slope == 1.f && inter == 0.f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
  } else {
    for (int64_t i = 0; i < n; ++i)
      dst[i] = static_cast<float>(s[i]) * slope + inter;
  }
}

bool load_nifti(const char* path, Volume& v) {
  std::vector<uint8_t> raw;
  if (!read_file(path, raw) || raw.size() < sizeof(Nifti1Header)) return false;
  Nifti1Header h;
  memcpy(&h, raw.data(), sizeof(h));
  if (h.sizeof_hdr != 348) return false;  // big-endian unsupported here
  if (memcmp(h.magic, "n+1", 3) != 0 && memcmp(h.magic, "ni1", 3) != 0)
    return false;
  int ndim = h.dim[0];
  if (ndim < 3) return false;
  if (h.dim[1] <= 0 || h.dim[2] <= 0 || h.dim[3] <= 0) return false;
  v.nx = h.dim[1];
  v.ny = h.dim[2];
  v.nz = h.dim[3];
  v.sx = fabsf(h.pixdim[1]);
  v.sy = fabsf(h.pixdim[2]);
  v.sz = fabsf(h.pixdim[3]);
  int64_t n = v.nx * v.ny * v.nz;
  // Element size must come from the datatype code (what decode_typed reads),
  // not bitpix: a corrupt file with bitpix=8 + datatype=float32 would pass a
  // bitpix-based size check and overread the buffer.
  size_t elem_size;
  switch (h.datatype) {
    case 2: case 256: elem_size = 1; break;
    case 4: case 512: elem_size = 2; break;
    case 8: case 16: case 768: elem_size = 4; break;
    case 64: elem_size = 8; break;
    default: return false;
  }
  // Single-file (.nii, "n+1") data must start past the header (spec: >= 352).
  if (memcmp(h.magic, "n+1", 3) == 0 && !(h.vox_offset >= 352.f)) return false;
  if (h.vox_offset < 0.f) return false;
  size_t off = static_cast<size_t>(h.vox_offset);
  if (raw.size() < off || raw.size() - off < static_cast<size_t>(n) * elem_size)
    return false;
  // file order: x fastest -> store as (z, y, x) C-order == same linear order
  v.data.resize(n);
  const uint8_t* src = raw.data() + off;
  switch (h.datatype) {
    case 2: decode_typed<uint8_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 4: decode_typed<int16_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 8: decode_typed<int32_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 16: decode_typed<float>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 64: decode_typed<double>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 256: decode_typed<int8_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 512: decode_typed<uint16_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    case 768: decode_typed<uint32_t>(src, n, h.scl_slope, h.scl_inter, v.data.data()); break;
    default: return false;
  }
  // NaN -> 0 (reference `torch.nan_to_num`, VolumeDataset.py:225)
  for (auto& x : v.data)
    if (std::isnan(x)) x = 0.f;
  return true;
}

inline int64_t nn_index(int64_t i, double ratio, int64_t n) {
  int64_t j = static_cast<int64_t>(std::floor(i * ratio + 0.5));
  if (j < 0) j = 0;
  if (j >= n) j = n - 1;
  return j;
}

// Resample to new spacing; out dims = round(n * s / ns) (ITK semantics).
void resample(const Volume& v, float nsx, float nsy, float nsz, bool linear,
              Volume& out) {
  auto osz = [](int64_t n, float s, float ns) {
    return static_cast<int64_t>(std::llround(n * (double)s / ns));
  };
  out.nx = osz(v.nx, v.sx, nsx);
  out.ny = osz(v.ny, v.sy, nsy);
  out.nz = osz(v.nz, v.sz, nsz);
  out.sx = nsx; out.sy = nsy; out.sz = nsz;
  out.data.resize(out.nx * out.ny * out.nz);
  double rx = nsx / v.sx, ry = nsy / v.sy, rz = nsz / v.sz;
  const float* src = v.data.data();
  float* dst = out.data.data();
  const int64_t sxy = v.nx * v.ny;
  if (!linear) {
    // precompute per-axis index LUTs; the x gather is then a tight loop
    std::vector<int64_t> xi(out.nx);
    for (int64_t x = 0; x < out.nx; ++x) xi[x] = nn_index(x, rx, v.nx);
    for (int64_t z = 0; z < out.nz; ++z) {
      int64_t zi = nn_index(z, rz, v.nz);
      for (int64_t y = 0; y < out.ny; ++y) {
        int64_t yi = nn_index(y, ry, v.ny);
        const float* row = src + zi * sxy + yi * v.nx;
        float* orow = dst + (z * out.ny + y) * out.nx;
        const int64_t* xp = xi.data();
        for (int64_t x = 0; x < out.nx; ++x) {
          orow[x] = row[xp[x]];
        }
      }
    }
  } else {
    auto lerp_idx = [](int64_t i, double r, int64_t n, int64_t& lo,
                       int64_t& hi, float& w) {
      double p = i * r;
      lo = static_cast<int64_t>(std::floor(p));
      w = static_cast<float>(p - lo);
      if (lo < 0) lo = 0;
      if (lo >= n) lo = n - 1;
      hi = lo + 1 < n ? lo + 1 : n - 1;
    };
    for (int64_t z = 0; z < out.nz; ++z) {
      int64_t z0, z1; float wz;
      lerp_idx(z, rz, v.nz, z0, z1, wz);
      for (int64_t y = 0; y < out.ny; ++y) {
        int64_t y0, y1; float wy;
        lerp_idx(y, ry, v.ny, y0, y1, wy);
        float* orow = dst + (z * out.ny + y) * out.nx;
        for (int64_t x = 0; x < out.nx; ++x) {
          int64_t x0, x1; float wx;
          lerp_idx(x, rx, v.nx, x0, x1, wx);
          auto at = [&](int64_t zz, int64_t yy, int64_t xx) {
            return src[zz * sxy + yy * v.nx + xx];
          };
          float c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx;
          float c01 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx;
          float c10 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx;
          float c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx;
          float c0 = c00 * (1 - wy) + c01 * wy;
          float c1 = c10 * (1 - wy) + c11 * wy;
          orow[x] = c0 * (1 - wz) + c1 * wz;
        }
      }
    }
  }
}

// Center pad/crop (z, y, x) volume into a (tz, ty, tx) target buffer.
void pad_crop(const Volume& v, int64_t tz, int64_t ty, int64_t tx, float* out) {
  memset(out, 0, sizeof(float) * tz * ty * tx);
  auto span = [](int64_t n, int64_t t, int64_t& src_lo, int64_t& dst_lo,
                 int64_t& len) {
    if (n < t) {
      src_lo = 0;
      dst_lo = (t - n) / 2;
      len = n;
    } else {
      src_lo = (n - t) / 2;
      dst_lo = 0;
      len = t;
    }
  };
  int64_t sz0, dz0, lz, sy0, dy0, ly, sx0, dx0, lx;
  span(v.nz, tz, sz0, dz0, lz);
  span(v.ny, ty, sy0, dy0, ly);
  span(v.nx, tx, sx0, dx0, lx);
  for (int64_t z = 0; z < lz; ++z) {
    for (int64_t y = 0; y < ly; ++y) {
      const float* srow =
          v.data.data() + (sz0 + z) * v.nx * v.ny + (sy0 + y) * v.nx + sx0;
      float* drow = out + (dz0 + z) * ty * tx + (dy0 + y) * tx + dx0;
      memcpy(drow, srow, sizeof(float) * lx);
    }
  }
}

}  // namespace

extern "C" {

// Load one volume: read -> (optional) resample to new_spacing -> center
// pad/crop to (tz, ty, tx). Returns 0 on success.
int cn_load_volume(const char* path, float* out, int64_t tz, int64_t ty,
                   int64_t tx, float new_spacing, int resize, int linear) {
  Volume v;
  if (!load_nifti(path, v)) return 1;
  if (resize) {
    Volume r;
    resample(v, new_spacing, new_spacing, new_spacing, linear != 0, r);
    pad_crop(r, tz, ty, tx, out);
  } else {
    pad_crop(v, tz, ty, tx, out);
  }
  return 0;
}

// Batched load with a thread pool: paths is n null-terminated strings packed
// consecutively; out is [n, tz, ty, tx] float32. Returns count of failures.
int cn_load_batch(const char* paths, int64_t n, float* out, int64_t tz,
                  int64_t ty, int64_t tx, float new_spacing, int resize,
                  int linear, int num_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int64_t i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  int64_t vol_elems = tz * ty * tx;
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > n) nt = (int)n;
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      if (cn_load_volume(ptrs[i], out + i * vol_elems, tz, ty, tx, new_spacing,
                         resize, linear) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Read header only: dims[3] (x,y,z), spacing[3] (x,y,z). Returns 0 on ok.
int cn_read_header(const char* path, int64_t* dims, float* spacing) {
  Volume v;  // cheap enough: full decode avoided by parsing header only
  std::vector<uint8_t> raw;
  if (!read_file(path, raw) || raw.size() < sizeof(Nifti1Header)) return 1;
  Nifti1Header h;
  memcpy(&h, raw.data(), sizeof(h));
  if (h.sizeof_hdr != 348) return 1;
  dims[0] = h.dim[1]; dims[1] = h.dim[2]; dims[2] = h.dim[3];
  spacing[0] = fabsf(h.pixdim[1]);
  spacing[1] = fabsf(h.pixdim[2]);
  spacing[2] = fabsf(h.pixdim[3]);
  return 0;
}

}  // extern "C"
