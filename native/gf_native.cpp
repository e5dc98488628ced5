// Native runtime components for gaussian_fluids_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these are the host-side runtime
// pieces where the reference relied on native code (Taichi JIT) for
// non-device work, reimplemented in C++ and exposed over a C ABI for
// ctypes:
//   * vti_write_f32 — VTK ImageData writer (appended raw encoding). The
//     smoke pipeline writes 512^3 float volumes per frame (reference
//     3D/advance_density.py:73-85); Python base64 encoding is the
//     bottleneck there.
//   * parse_obj_* — OBJ mesh parser (v/vn/f with // indices), two-call
//     API (count then fill) for the boundary mesh sampler (reference
//     3D/mesh_sampler.py:23-41).
//   * blue_noise_2d — best-candidate (Mitchell) sampling (reference
//     2D/GSR.py:650-664), O(n^2 * k) scalar loops that belong in C++.
//
// Build: g++ -O3 -march=native -shared -fPIC gf_native.cpp -o gf_native.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// VTI writer (appended raw)
// ---------------------------------------------------------------------

int vti_write_f32(const char* path, const float* data,
                  int32_t nx, int32_t ny, int32_t nz,
                  const double* origin, const double* spacing,
                  const char* name) {
  const uint64_t n = (uint64_t)nx * ny * nz;
  // the inline header is UInt32; volumes at or beyond 2^32 payload bytes
  // would silently wrap the byte count — refuse (caller falls back)
  if (n * sizeof(float) > 0xFFFFFFFFull) return -1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint32_t nbytes = (uint32_t)(n * sizeof(float));
  bool ok = true;
  std::string head;
  char buf[512];
  std::snprintf(buf, sizeof(buf),
                "<?xml version=\"1.0\"?>\n"
                "<VTKFile type=\"ImageData\" version=\"0.1\" "
                "byte_order=\"LittleEndian\" header_type=\"UInt32\">\n"
                "  <ImageData WholeExtent=\"0 %d 0 %d 0 %d\" "
                "Origin=\"%.9g %.9g %.9g\" Spacing=\"%.9g %.9g %.9g\">\n"
                "    <Piece Extent=\"0 %d 0 %d 0 %d\">\n"
                "      <PointData Scalars=\"%s\">\n",
                nx - 1, ny - 1, nz - 1, origin[0], origin[1], origin[2],
                spacing[0], spacing[1], spacing[2], nx - 1, ny - 1, nz - 1,
                name);
  head += buf;
  std::snprintf(buf, sizeof(buf),
                "        <DataArray type=\"Float32\" Name=\"%s\" "
                "format=\"appended\" offset=\"0\"/>\n"
                "      </PointData>\n"
                "      <CellData></CellData>\n"
                "    </Piece>\n"
                "  </ImageData>\n"
                "  <AppendedData encoding=\"raw\">\n_",
                name);
  head += buf;
  ok &= std::fwrite(head.data(), 1, head.size(), f) == head.size();
  ok &= std::fwrite(&nbytes, sizeof(nbytes), 1, f) == 1;
  // data arrives C-ordered (x, y, z); VTK wants x fastest => transpose.
  // Stream in z-major order without materialising a transposed copy.
  std::vector<float> slab((size_t)nx);
  for (int64_t k = 0; k < nz && ok; ++k) {
    for (int64_t j = 0; j < ny && ok; ++j) {
      for (int64_t i = 0; i < nx; ++i) {
        slab[(size_t)i] = data[(i * ny + j) * nz + k];
      }
      ok &= std::fwrite(slab.data(), sizeof(float), (size_t)nx, f)
            == (size_t)nx;
    }
  }
  ok &= std::fputs("\n  </AppendedData>\n</VTKFile>\n", f) >= 0;
  ok &= std::fclose(f) == 0;
  // a partial write (e.g. disk full) must not report success — the caller
  // retries with the Python writer or surfaces the error
  return ok ? 0 : -2;
}

// ---------------------------------------------------------------------
// OBJ parser (two-call: first count, then fill)
// ---------------------------------------------------------------------

struct ObjData {
  std::vector<float> v, vn;
  std::vector<int32_t> f, fn;
};

static ObjData* g_obj = nullptr;

int parse_obj_open(const char* path, int64_t* n_v, int64_t* n_vn,
                   int64_t* n_f) {
  std::FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  delete g_obj;
  g_obj = new ObjData();
  char line[1024];
  while (std::fgets(line, sizeof(line), fp)) {
    if (line[0] == 'v' && line[1] == ' ') {
      float x, y, z;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        g_obj->v.push_back(x);
        g_obj->v.push_back(y);
        g_obj->v.push_back(z);
      }
    } else if (line[0] == 'v' && line[1] == 'n' && line[2] == ' ') {
      float x, y, z;
      if (std::sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
        g_obj->vn.push_back(x);
        g_obj->vn.push_back(y);
        g_obj->vn.push_back(z);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      // parse the whole polygon, then fan-triangulate (quads/n-gons
      // would otherwise silently lose every triangle past the first)
      const int kMaxPoly = 64;
      int32_t vi[kMaxPoly], ni[kMaxPoly];
      int got = 0;
      char* p = line + 2;
      // OBJ indices are 1-based; negative indices are relative to the
      // elements defined so far. Resolve both to 0-based here.
      const int32_t nv = (int32_t)(g_obj->v.size() / 3);
      const int32_t nn = (int32_t)(g_obj->vn.size() / 3);
      while (got < kMaxPoly) {
        while (*p == ' ') ++p;
        if (!*p || *p == '\n' || *p == '\r') break;
        int32_t v0 = (int32_t)std::strtol(p, &p, 10);
        vi[got] = v0 > 0 ? v0 - 1 : nv + v0;
        ni[got] = vi[got];  // default: no normal index in this token
        // strtol skips leading whitespace, so an empty slot ('v//')
        // would silently eat the NEXT token's digits — only parse when
        // a number starts right here; otherwise keep the vertex-index
        // fallback (matches the Python parser in scenes/mesh.py)
        auto at_num = [](const char* c) {
          return *c == '-' || (*c >= '0' && *c <= '9');
        };
        if (*p == '/') {
          ++p;
          if (*p == '/') {
            ++p;
            if (at_num(p)) {
              int32_t n0 = (int32_t)std::strtol(p, &p, 10);
              ni[got] = n0 > 0 ? n0 - 1 : nn + n0;
            }
          } else {
            if (at_num(p)) std::strtol(p, &p, 10);  // texture idx, ignored
            if (*p == '/') {
              ++p;
              if (at_num(p)) {
                int32_t n0 = (int32_t)std::strtol(p, &p, 10);
                ni[got] = n0 > 0 ? n0 - 1 : nn + n0;
              }
            }
          }
        }
        ++got;
        while (*p && *p != ' ' && *p != '\n') ++p;
      }
      for (int t = 2; t < got; ++t) {  // fan: (0, t-1, t)
        const int idx[3] = {0, t - 1, t};
        for (int c = 0; c < 3; ++c) {
          g_obj->f.push_back(vi[idx[c]]);
          g_obj->fn.push_back(ni[idx[c]]);
        }
      }
    }
  }
  std::fclose(fp);
  *n_v = (int64_t)g_obj->v.size() / 3;
  *n_vn = (int64_t)g_obj->vn.size() / 3;
  *n_f = (int64_t)g_obj->f.size() / 3;
  return 0;
}

int parse_obj_fill(float* v, float* vn, int32_t* f, int32_t* fn) {
  if (!g_obj) return -1;
  std::memcpy(v, g_obj->v.data(), g_obj->v.size() * sizeof(float));
  std::memcpy(vn, g_obj->vn.data(), g_obj->vn.size() * sizeof(float));
  std::memcpy(f, g_obj->f.data(), g_obj->f.size() * sizeof(int32_t));
  std::memcpy(fn, g_obj->fn.data(), g_obj->fn.size() * sizeof(int32_t));
  delete g_obj;
  g_obj = nullptr;
  return 0;
}

// ---------------------------------------------------------------------
// Blue-noise (best-candidate) sampling, reference 2D/GSR.py:650-664
// ---------------------------------------------------------------------

int blue_noise_2d(int64_t n, uint64_t seed, double x_min, double x_max,
                  double y_min, double y_max, int32_t candidates,
                  double* out) {
  if (n <= 0) return -1;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> ux(x_min, x_max), uy(y_min, y_max);
  out[0] = ux(rng);
  out[1] = uy(rng);
  for (int64_t i = 1; i < n; ++i) {
    double best_d = -1.0, bx = 0.0, by = 0.0;
    for (int32_t c = 0; c < candidates; ++c) {
      const double cx = ux(rng), cy = uy(rng);
      double dmin = 1e300;
      for (int64_t j = 0; j < i; ++j) {
        const double dx = cx - out[2 * j], dy = cy - out[2 * j + 1];
        const double d = dx * dx + dy * dy;
        if (d < dmin) dmin = d;
      }
      if (dmin > best_d) {
        best_d = dmin;
        bx = cx;
        by = cy;
      }
    }
    out[2 * i] = bx;
    out[2 * i + 1] = by;
  }
  return 0;
}

}  // extern "C"
