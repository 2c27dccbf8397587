// Host-side z-buffer triangle rasterizer.
//
// Replaces the reference's pyrender/EGL + GLSL normal-shader pipeline
// (reference src/NPHM/evaluation/render_utils.py:26-130): it renders depth
// from a pinhole camera and returns, per pixel, the *world-space surface
// point* and *face normal* directly (perspective-correct interpolation), so
// the Python side needs no unprojection at all.
//
// Camera convention matches pyrender's IntrinsicsCamera with an OpenGL-style
// camera-to-world pose: the camera looks along its local -z axis;
// u = fx * (x_c / -z_c) + cx,  v = cy - fy * (y_c / -z_c)  (v: image row).
// No backface culling (the reference renders with SKIP_CULL_FACES and culls
// by view angle afterwards).
//
// Parallelized over triangles with per-thread tiles merged by depth.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 cross3(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct FrameBuf {
  std::vector<float> depth;   // view depth (-z_c), +inf = empty
  std::vector<float> points;  // world xyz
  std::vector<float> normals; // world face normal

  void init(int n) {
    depth.assign(n, std::numeric_limits<float>::infinity());
    points.assign(3 * n, 0.f);
    normals.assign(3 * n, 0.f);
  }
};

struct Cam {
  float fx, fy, cx, cy;
  float R[9];   // world->camera rotation (rows)
  float t[3];   // camera origin in world
  float znear, zfar;
};

static inline void world_to_cam(const Cam& c, const float* pw, float* pc) {
  float d[3] = {pw[0] - c.t[0], pw[1] - c.t[1], pw[2] - c.t[2]};
  for (int i = 0; i < 3; ++i)
    pc[i] = c.R[3 * i] * d[0] + c.R[3 * i + 1] * d[1] + c.R[3 * i + 2] * d[2];
}

static void raster_range(const float* verts, const int32_t* faces,
                         int64_t f0, int64_t f1, const Cam& cam,
                         int h, int w, FrameBuf& fb) {
  for (int64_t f = f0; f < f1; ++f) {
    const int32_t* tri = faces + 3 * f;
    float pc[3][3];
    const float* pw[3];
    bool ok = true;
    for (int k = 0; k < 3; ++k) {
      pw[k] = verts + 3 * tri[k];
      world_to_cam(cam, pw[k], pc[k]);
      // clip triangles touching the near plane (simple, fine for closed heads)
      if (-pc[k][2] < cam.znear || -pc[k][2] > cam.zfar) ok = false;
    }
    if (!ok) continue;

    float u[3], v[3], invz[3];
    for (int k = 0; k < 3; ++k) {
      float iz = 1.0f / (-pc[k][2]);
      invz[k] = iz;
      u[k] = cam.fx * pc[k][0] * iz + cam.cx;
      v[k] = cam.cy - cam.fy * pc[k][1] * iz;
    }

    int min_x = (int)std::floor(std::min({u[0], u[1], u[2]}));
    int max_x = (int)std::ceil(std::max({u[0], u[1], u[2]}));
    int min_y = (int)std::floor(std::min({v[0], v[1], v[2]}));
    int max_y = (int)std::ceil(std::max({v[0], v[1], v[2]}));
    min_x = std::max(min_x, 0);
    min_y = std::max(min_y, 0);
    max_x = std::min(max_x, w - 1);
    max_y = std::min(max_y, h - 1);
    if (min_x > max_x || min_y > max_y) continue;

    float ax = u[1] - u[0], ay = v[1] - v[0];
    float bx = u[2] - u[0], by = v[2] - v[0];
    float det = ax * by - ay * bx;
    if (std::fabs(det) < 1e-12f) continue;
    float inv_det = 1.0f / det;

    // world-space face normal (flat shading, as the reference's
    // smooth=False rendering produces)
    Vec3 e1 = {pw[1][0] - pw[0][0], pw[1][1] - pw[0][1], pw[1][2] - pw[0][2]};
    Vec3 e2 = {pw[2][0] - pw[0][0], pw[2][1] - pw[0][1], pw[2][2] - pw[0][2]};
    Vec3 n = cross3(e1, e2);
    float nl = std::sqrt(n.x * n.x + n.y * n.y + n.z * n.z);
    if (nl < 1e-20f) continue;
    n.x /= nl; n.y /= nl; n.z /= nl;

    for (int py = min_y; py <= max_y; ++py) {
      for (int px = min_x; px <= max_x; ++px) {
        float qx = (float)px + 0.5f - u[0];
        float qy = (float)py + 0.5f - v[0];
        float l1 = (qx * by - qy * bx) * inv_det;
        float l2 = (qy * ax - qx * ay) * inv_det;
        float l0 = 1.0f - l1 - l2;
        if (l0 < 0.f || l1 < 0.f || l2 < 0.f) continue;
        // perspective-correct weights
        float w0 = l0 * invz[0], w1 = l1 * invz[1], w2 = l2 * invz[2];
        float wsum = w0 + w1 + w2;
        float z_view = 1.0f / wsum;  // = -z_c at the surface point
        int64_t idx = (int64_t)py * w + px;
        if (z_view >= fb.depth[idx]) continue;
        fb.depth[idx] = z_view;
        float iw = 1.0f / wsum;
        for (int d = 0; d < 3; ++d) {
          fb.points[3 * idx + d] =
              (w0 * pw[0][d] + w1 * pw[1][d] + w2 * pw[2][d]) * iw;
        }
        fb.normals[3 * idx] = n.x;
        fb.normals[3 * idx + 1] = n.y;
        fb.normals[3 * idx + 2] = n.z;
      }
    }
  }
}

}  // namespace

extern "C" {

// Rt: 4x4 camera-to-world pose, row-major (OpenGL convention: camera looks
// along -z). K: 3x3 row-major intrinsics. Outputs are h*w(-sized) buffers
// allocated by the caller: depth (view depth, inf where empty), points
// (world xyz), normals (world face normals), mask (1 where hit).
int nphm_rasterize(const float* verts, int64_t n_verts, const int32_t* faces,
                   int64_t n_faces, const float* K, const float* Rt, int h,
                   int w, float znear, float zfar, float* out_depth,
                   float* out_points, float* out_normals,
                   uint8_t* out_mask) {
  (void)n_verts;
  Cam cam;
  cam.fx = K[0]; cam.fy = K[4]; cam.cx = K[2]; cam.cy = K[5];
  cam.znear = znear; cam.zfar = zfar;
  // Rt[:3,:3] columns are camera axes in world coords; world->cam rotation
  // is its transpose. Rt is row-major: Rt[r*4+c].
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      cam.R[3 * r + c] = Rt[4 * c + r];
  cam.t[0] = Rt[3]; cam.t[1] = Rt[7]; cam.t[2] = Rt[11];

  unsigned hw_threads = std::thread::hardware_concurrency();
  int n_threads = hw_threads ? (int)hw_threads : 4;
  if ((int64_t)n_threads > n_faces) n_threads = (int)std::max<int64_t>(1, n_faces);

  std::vector<FrameBuf> bufs(n_threads);
  std::vector<std::thread> threads;
  int64_t per = (n_faces + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    int64_t f0 = i * per;
    int64_t f1 = std::min<int64_t>(f0 + per, n_faces);
    if (f0 >= f1) continue;
    bufs[i].init(h * w);
    threads.emplace_back([&, i, f0, f1]() {
      raster_range(verts, faces, f0, f1, cam, h, w, bufs[i]);
    });
  }
  for (auto& t : threads) t.join();

  int64_t n = (int64_t)h * w;
  for (int64_t i = 0; i < n; ++i) {
    float best = std::numeric_limits<float>::infinity();
    int best_b = -1;
    for (int b = 0; b < n_threads; ++b) {
      if (!bufs[b].depth.empty() && bufs[b].depth[i] < best) {
        best = bufs[b].depth[i];
        best_b = b;
      }
    }
    if (best_b < 0) {
      out_depth[i] = std::numeric_limits<float>::infinity();
      out_mask[i] = 0;
      std::memset(out_points + 3 * i, 0, 3 * sizeof(float));
      std::memset(out_normals + 3 * i, 0, 3 * sizeof(float));
    } else {
      out_depth[i] = best;
      out_mask[i] = 1;
      std::memcpy(out_points + 3 * i, &bufs[best_b].points[3 * i],
                  3 * sizeof(float));
      std::memcpy(out_normals + 3 * i, &bufs[best_b].normals[3 * i],
                  3 * sizeof(float));
    }
  }
  return 0;
}

}  // extern "C"
