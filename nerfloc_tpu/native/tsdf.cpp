// TSDF volume fusion — native preprocessing engine.
//
// C++ rebuild of the reference's GPU/numba TSDF integrator (reference:
// nerf_loc/datasets/video/fusion.py:19-425 — pycuda SourceModule kernel +
// @njit(parallel=True) CPU fallback). Same math: voxel -> world -> camera
// projection, truncated SDF update with per-voxel running weights, color
// accumulated in a packed float (here: three separate accumulators, simpler
// and exact). OpenMP across voxel slabs; exposed through a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC tsdf.cpp -o libtsdf.so

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct TsdfVolume {
  int64_t nx, ny, nz;
  float origin[3];
  float voxel_size;
  float sdf_trunc;
  float* tsdf;    // [nx*ny*nz], init 1
  float* weight;  // [nx*ny*nz], init 0
  float* r;       // color accumulators (weighted)
  float* g;
  float* b;
};

TsdfVolume* tsdf_create(int64_t nx, int64_t ny, int64_t nz,
                        const float* origin, float voxel_size,
                        float sdf_trunc) {
  auto* v = new TsdfVolume();
  v->nx = nx; v->ny = ny; v->nz = nz;
  std::memcpy(v->origin, origin, 3 * sizeof(float));
  v->voxel_size = voxel_size;
  v->sdf_trunc = sdf_trunc;
  int64_t n = nx * ny * nz;
  v->tsdf = static_cast<float*>(std::malloc(n * sizeof(float)));
  v->weight = static_cast<float*>(std::calloc(n, sizeof(float)));
  v->r = static_cast<float*>(std::calloc(n, sizeof(float)));
  v->g = static_cast<float*>(std::calloc(n, sizeof(float)));
  v->b = static_cast<float*>(std::calloc(n, sizeof(float)));
  for (int64_t i = 0; i < n; ++i) v->tsdf[i] = 1.0f;
  return v;
}

void tsdf_free(TsdfVolume* v) {
  if (!v) return;
  std::free(v->tsdf); std::free(v->weight);
  std::free(v->r); std::free(v->g); std::free(v->b);
  delete v;
}

// Integrate one RGB-D frame.
//   depth:  [H*W] metres, 0 = invalid
//   color:  [H*W*3] in [0,1] (may be null for geometry-only fusion)
//   K:      [9] row-major intrinsics
//   c2w:    [16] row-major camera-to-world
//   obs_weight: per-frame weight (reference fusion.py integrate obs_weight)
void tsdf_integrate(TsdfVolume* v, const float* depth, const float* color,
                    int H, int W, const float* K, const float* c2w,
                    float obs_weight) {
  // world -> camera = inverse of rigid c2w
  float R[9], t[3];
  // R = c2w[:3,:3]^T ; t = -R @ c2w[:3,3]
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) R[i * 3 + j] = c2w[j * 4 + i];
  for (int i = 0; i < 3; ++i)
    t[i] = -(R[i * 3 + 0] * c2w[0 * 4 + 3] + R[i * 3 + 1] * c2w[1 * 4 + 3] +
             R[i * 3 + 2] * c2w[2 * 4 + 3]);
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  const int64_t nyz = v->ny * v->nz;

#pragma omp parallel for schedule(static)
  for (int64_t ix = 0; ix < v->nx; ++ix) {
    const float wx = v->origin[0] + (float)ix * v->voxel_size;
    for (int64_t iy = 0; iy < v->ny; ++iy) {
      const float wy = v->origin[1] + (float)iy * v->voxel_size;
      // hoist the x/y part of the rotation
      const float px0 = R[0] * wx + R[1] * wy + t[0];
      const float py0 = R[3] * wx + R[4] * wy + t[1];
      const float pz0 = R[6] * wx + R[7] * wy + t[2];
      const int64_t base = ix * nyz + iy * v->nz;
      for (int64_t iz = 0; iz < v->nz; ++iz) {
        const float wz = v->origin[2] + (float)iz * v->voxel_size;
        const float pz = pz0 + R[8] * wz;
        if (pz <= 0.0f) continue;
        const float px = px0 + R[2] * wz;
        const float py = py0 + R[5] * wz;
        const int u = (int)std::lround(fx * px / pz + cx);
        const int vv = (int)std::lround(fy * py / pz + cy);
        if (u < 0 || u >= W || vv < 0 || vv >= H) continue;
        const float d = depth[(int64_t)vv * W + u];
        if (d <= 0.0f) continue;
        const float sdf = d - pz;
        if (sdf < -v->sdf_trunc) continue;
        const float tsdf_new = std::fmin(1.0f, sdf / v->sdf_trunc);
        const int64_t idx = base + iz;
        const float w_old = v->weight[idx];
        const float w_new = w_old + obs_weight;
        v->tsdf[idx] = (v->tsdf[idx] * w_old + tsdf_new * obs_weight) / w_new;
        v->weight[idx] = w_new;
        if (color) {
          const int64_t c = ((int64_t)vv * W + u) * 3;
          v->r[idx] = (v->r[idx] * w_old + color[c + 0] * obs_weight) / w_new;
          v->g[idx] = (v->g[idx] * w_old + color[c + 1] * obs_weight) / w_new;
          v->b[idx] = (v->b[idx] * w_old + color[c + 2] * obs_weight) / w_new;
        }
      }
    }
  }
}

// Count surface voxels (|tsdf| < thresh && weight > 0).
int64_t tsdf_count_surface(const TsdfVolume* v, float thresh) {
  const int64_t n = v->nx * v->ny * v->nz;
  int64_t cnt = 0;
#pragma omp parallel for reduction(+ : cnt) schedule(static)
  for (int64_t i = 0; i < n; ++i)
    if (v->weight[i] > 0.0f && std::fabs(v->tsdf[i]) < thresh) ++cnt;
  return cnt;
}

// Extract surface voxel centers + colors. Buffers must hold `cap` entries.
// Returns the number written (equivalent of get_point_cloud,
// reference fusion.py point-cloud path).
int64_t tsdf_extract_points(const TsdfVolume* v, float thresh, float* xyz,
                            float* rgb, int64_t cap) {
  int64_t out = 0;
  const int64_t nyz = v->ny * v->nz;
  for (int64_t ix = 0; ix < v->nx && out < cap; ++ix)
    for (int64_t iy = 0; iy < v->ny && out < cap; ++iy)
      for (int64_t iz = 0; iz < v->nz && out < cap; ++iz) {
        const int64_t idx = ix * nyz + iy * v->nz + iz;
        if (v->weight[idx] <= 0.0f || std::fabs(v->tsdf[idx]) >= thresh)
          continue;
        xyz[out * 3 + 0] = v->origin[0] + (float)ix * v->voxel_size;
        xyz[out * 3 + 1] = v->origin[1] + (float)iy * v->voxel_size;
        xyz[out * 3 + 2] = v->origin[2] + (float)iz * v->voxel_size;
        rgb[out * 3 + 0] = v->r[idx];
        rgb[out * 3 + 1] = v->g[idx];
        rgb[out * 3 + 2] = v->b[idx];
        ++out;
      }
  return out;
}

// Direct accessors for testing / advanced use.
const float* tsdf_data(const TsdfVolume* v) { return v->tsdf; }
const float* tsdf_weights(const TsdfVolume* v) { return v->weight; }

// ---------------------------------------------------------------------------
// Surface mesh extraction by marching tetrahedra (equivalent of the
// reference's get_mesh / skimage marching_cubes path, fusion.py get_mesh):
// each cell splits into 6 tetrahedra; zero crossings of the TSDF along
// tetrahedron edges emit triangles. Table-free and watertight.
// ---------------------------------------------------------------------------

namespace {

struct V3 { float x, y, z; };

// the 6 tetrahedra of a cube, as corner indices (0..7, z fastest)
const int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};
// cube corner offsets (x, y, z)
const int kOff[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                        {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};

inline V3 lerp_zero(const V3& a, const V3& b, float va, float vb) {
  float t = va / (va - vb + 1e-12f);
  if (t < 0.f) t = 0.f;
  if (t > 1.f) t = 1.f;
  return V3{a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
            a.z + t * (b.z - a.z)};
}

}  // namespace

// Count then emit surface triangles. verts buffer holds cap triangles
// (9 floats each). Returns triangles written.
int64_t tsdf_extract_mesh(const TsdfVolume* v, float* tri_verts,
                          int64_t cap) {
  const int64_t nyz = v->ny * v->nz;
  int64_t out = 0;
  for (int64_t ix = 0; ix + 1 < v->nx && out < cap; ++ix)
    for (int64_t iy = 0; iy + 1 < v->ny && out < cap; ++iy)
      for (int64_t iz = 0; iz + 1 < v->nz && out < cap; ++iz) {
        float val[8];
        V3 pos[8];
        bool ok = true;
        for (int c = 0; c < 8; ++c) {
          const int64_t jx = ix + kOff[c][0], jy = iy + kOff[c][1],
                        jz = iz + kOff[c][2];
          const int64_t idx = jx * nyz + jy * v->nz + jz;
          if (v->weight[idx] <= 0.0f) { ok = false; break; }
          val[c] = v->tsdf[idx];
          // surfaces exactly on lattice planes collapse crossings onto
          // corners (degenerate triangles); nudge exact zeros inside
          if (val[c] == 0.0f) val[c] = -1e-6f;
          pos[c] = V3{v->origin[0] + (float)jx * v->voxel_size,
                      v->origin[1] + (float)jy * v->voxel_size,
                      v->origin[2] + (float)jz * v->voxel_size};
        }
        if (!ok) continue;
        for (int t = 0; t < 6 && out < cap; ++t) {
          const int* T = kTets[t];
          int inside = 0, code = 0;
          for (int k = 0; k < 4; ++k)
            if (val[T[k]] < 0.0f) { ++inside; code |= 1 << k; }
          if (inside == 0 || inside == 4) continue;

          // collect crossing points on the 6 tet edges
          V3 pts[4];
          int np = 0;
          const int E[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
          for (int e = 0; e < 6 && np < 4; ++e) {
            const int a = T[E[e][0]], b = T[E[e][1]];
            if ((val[a] < 0.f) != (val[b] < 0.f))
              pts[np++] = lerp_zero(pos[a], pos[b], val[a], val[b]);
          }
          auto emit = [&](const V3& a, const V3& b, const V3& c) {
            if (out >= cap) return;
            float* p = tri_verts + out * 9;
            p[0] = a.x; p[1] = a.y; p[2] = a.z;
            p[3] = b.x; p[4] = b.y; p[5] = b.z;
            p[6] = c.x; p[7] = c.y; p[8] = c.z;
            ++out;
          };
          if (np == 3) {
            emit(pts[0], pts[1], pts[2]);
          } else if (np == 4) {  // quad -> two triangles
            emit(pts[0], pts[1], pts[2]);
            emit(pts[0], pts[2], pts[3]);
          }
        }
      }
  return out;
}

}  // extern "C"
