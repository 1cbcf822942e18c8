// Minimal single-threaded CPU Whitted tracer with the reference's exact
// semantics (main.cpp:471-832 equivalents: recursive depth-4 shading,
// Blinn-Phong with spec*0.4, bounded shadow rays, Schlick Fresnel, the
// reference's tangent-form refraction direction) — the measured CPU anchor
// for bench.py's vs_baseline (BASELINE.md). Independent implementation in
// the style of tests/oracle.py; it does NOT copy reference code.
//
// Input: a flat scene dump written by tools/measure_baseline.py.
// Output: one JSON line {"frames":N,"seconds":s,"mrays_per_s":...}.
//
// Build: g++ -O3 -march=native -o baseline_ref baseline_ref.cpp
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

static const float EPS = 1e-3f;
static const float BIG = 1e30f;
static const int MAX_DEPTH = 4;

struct V3 {
  float x, y, z;
};
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline V3 norm(V3 a) {
  float n = std::sqrt(dot(a, a));
  return n > 0 ? a * (1.0f / n) : a;
}

enum { PLANE = 0, TRIANGLE = 1, SPHERE = 2, AABOX = 3 };

struct Obj {
  int ptype;
  float p[12];
  int mat;
};
struct Mat {
  V3 diff;
  float kd;
  V3 spec;
  float ks, shine, T, ior;
};
struct Light {
  V3 pos, color;
};

static std::vector<Obj> objs;
static std::vector<Mat> mats;
static std::vector<Light> lights;
static V3 bg;
static V3 eye, U, Vv, N;
static float plane_dist, W, H;
static int res_x, res_y;

// intercepts(): reference-exact per-type tests (scene.cpp:55-283 semantics)
static bool hit_one(const Obj &o, V3 ro, V3 rd, float &t) {
  const float *p = o.p;
  switch (o.ptype) {
    case SPHERE: {
      V3 c = v3(p[0], p[1], p[2]);
      float r = p[3];
      V3 L = ro - c;
      float a = dot(rd, rd), b = 2.0f * dot(rd, L), cc = dot(L, L) - r * r;
      float delta = b * b - 4.0f * a * cc;
      if (delta < 0) return false;
      float sq = std::sqrt(delta);
      float t0 = (-b - sq) / (2 * a), t1 = (-b + sq) / (2 * a);
      if (t0 > t1) std::swap(t0, t1);
      if (t0 < 0) t0 = t1;
      if (t0 < 0) return false;
      t = t0;
      return true;
    }
    case TRIANGLE: {
      V3 v0 = v3(p[0], p[1], p[2]), e1 = v3(p[3], p[4], p[5]),
         e2 = v3(p[6], p[7], p[8]);
      V3 h = cross(rd, e2);
      float det = dot(e1, h);
      if (det > -EPS && det < EPS) return false;
      float f = 1.0f / det;
      V3 s = ro - v0;
      float u = f * dot(s, h);
      if (u < 0 || u > 1) return false;
      V3 q = cross(s, e1);
      float v = f * dot(rd, q);
      if (v < 0 || u + v > 1) return false;
      float tt = f * dot(e2, q);
      if (tt <= EPS) return false;
      t = tt;
      return true;
    }
    case PLANE: {
      V3 pn = v3(p[0], p[1], p[2]);
      float dd = p[3];
      float den = dot(rd, pn);
      if (std::fabs(den) <= EPS) return false;
      float tt = -(dot(ro, pn) + dd) / den;
      if (tt <= 0) return false;
      t = tt;
      return true;
    }
    case AABOX: {
      V3 bmin = v3(p[0], p[1], p[2]), bmax = v3(p[3], p[4], p[5]);
      float tmin = -BIG, tmax = BIG;
      const float ro_[3] = {ro.x, ro.y, ro.z}, rd_[3] = {rd.x, rd.y, rd.z};
      const float bn[3] = {bmin.x, bmin.y, bmin.z},
                  bx[3] = {bmax.x, bmax.y, bmax.z};
      for (int i = 0; i < 3; i++) {
        float inv = 1.0f / (rd_[i] == 0 ? 1e-30f : rd_[i]);
        float lo = (bn[i] - ro_[i]) * inv, hi = (bx[i] - ro_[i]) * inv;
        if (inv < 0) std::swap(lo, hi);
        if (lo > tmin) tmin = lo;
        if (hi < tmax) tmax = hi;
      }
      if (tmin >= tmax || tmax <= EPS) return false;
      t = tmin > EPS ? tmin : tmax;
      return true;
    }
  }
  return false;
}

static V3 normal_one(const Obj &o, V3 point, V3 ro, V3 rd) {
  const float *p = o.p;
  switch (o.ptype) {
    case SPHERE:
      return norm(point - v3(p[0], p[1], p[2]));
    case TRIANGLE:
      return v3(p[9], p[10], p[11]);
    case PLANE:
      return v3(p[0], p[1], p[2]);
    case AABOX: {
      // entry/exit face from the slab test (stateless aaBox normal)
      const float ro_[3] = {ro.x, ro.y, ro.z}, rd_[3] = {rd.x, rd.y, rd.z};
      const float bn[3] = {p[0], p[1], p[2]}, bx[3] = {p[3], p[4], p[5]};
      float tmin[3], tmax[3];
      for (int i = 0; i < 3; i++) {
        float inv = 1.0f / (rd_[i] == 0 ? 1e-30f : rd_[i]);
        float lo = (bn[i] - ro_[i]) * inv, hi = (bx[i] - ro_[i]) * inv;
        if (inv < 0) std::swap(lo, hi);
        tmin[i] = lo;
        tmax[i] = hi;
      }
      int ai = 0, ao = 0;
      for (int i = 1; i < 3; i++) {
        if (tmin[i] > tmin[ai]) ai = i;
        if (tmax[i] < tmax[ao]) ao = i;
      }
      bool use_in = tmin[ai] > EPS;
      int ax = use_in ? ai : ao;
      float sgn = (use_in ? tmin[ai] : tmax[ao]) < 0 ? -1.0f : 1.0f;
      V3 n = v3(0, 0, 0);
      (&n.x)[ax] = sgn;
      return n;
    }
  }
  return v3(0, 0, 1);
}

static long long ray_count = 0;

static bool in_shadow(V3 o, V3 d, float max_t) {
  ray_count++;
  float t;
  for (const auto &ob : objs)
    if (hit_one(ob, o, d, t) && t < max_t) return true;
  return false;
}

static V3 ray_tracing(V3 o, V3 d, int depth, float ior_1) {
  ray_count++;
  float best_t = BIG, t;
  int best = -1;
  for (size_t i = 0; i < objs.size(); i++)
    if (hit_one(objs[i], o, d, t) && t < best_t) {
      best_t = t;
      best = (int)i;
    }
  if (best < 0) return bg;

  const Obj &ob = objs[best];
  const Mat &m = mats[ob.mat];
  V3 hp = o + d * best_t;
  V3 n = norm(normal_one(ob, hp, o, d));
  V3 precise = hp + n * EPS;

  V3 color = v3(0, 0, 0);
  for (const auto &L : lights) {
    V3 Lv = L.pos - hp;  // unnormalized; max_t = 1 bounds at the light
    if (dot(Lv, n) > 0 && !in_shadow(precise, Lv, 1.0f)) {
      V3 Lh = norm(Lv);
      V3 Vd = norm(d * -1.0f);
      V3 Hh = norm(Lh + Vd);
      float ndl = std::fmax(0.0f, dot(n, Lh));
      float vdn = std::fmax(0.0f, dot(Hh, n));
      float sp = vdn > 0 ? std::pow(vdn, m.shine) : (m.shine == 0 ? 1.0f : 0.0f);
      color = color + L.color * m.diff * (ndl * m.kd) +
              L.color * m.spec * (sp * m.ks * 0.4f);
    }
  }
  if (depth >= MAX_DEPTH) {
    return v3(std::fmin(color.x, 1.0f), std::fmin(color.y, 1.0f),
              std::fmin(color.z, 1.0f));
  }

  bool inside = dot(d, n) > 0;
  V3 nf = inside ? n * -1.0f : n;

  V3 refl = v3(0, 0, 0), refr = v3(0, 0, 0);
  bool has_refl = m.ks > 0, has_refr = m.T != 0;
  float kr = m.ks;
  float new_ior = 1.0f;
  bool can_refract = false;
  V3 refr_dir = v3(0, 0, 1);
  if (has_refr) {
    // reference tangent-form refraction (main.cpp:671-697)
    V3 Vd = d * -1.0f;
    float ndv = dot(nf, Vd);
    V3 viewnormal = nf * ndv;
    V3 viewtangent = viewnormal - Vd;
    float mior = m.ior > 0 ? m.ior : 1.0f;
    float eta = inside ? ior_1 : ior_1 / mior;
    float cos_i = std::fabs(ndv);
    float sin_t = eta * std::sqrt(dot(viewtangent, viewtangent));
    float insq = 1.0f - sin_t * sin_t;
    can_refract = insq > 0;
    new_ior = inside ? 1.0f : mior;
    if (can_refract) {
      refr_dir = norm(viewtangent) * sin_t + nf;
      float r0 = (ior_1 - new_ior) / (ior_1 + new_ior);
      r0 *= r0;
      kr = r0 + (1 - r0) * std::pow(1 - cos_i, 5.0f);  // Schlick
    } else {
      kr = 1.0f;  // TIR
    }
  }
  if (has_refl) {
    V3 rdir = norm(d - nf * (2.0f * dot(d, nf)));
    refl = ray_tracing(precise, rdir, depth + 1, ior_1);
  }
  if (has_refr && can_refract) {
    refr = ray_tracing(hp + refr_dir * 0.001f, refr_dir, depth + 1, new_ior);
  }
  color = color + refl * m.spec * kr + refr * (1.0f - kr);
  return color;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: baseline_ref scene.txt [frames]\n");
    return 2;
  }
  std::ifstream f(argv[1]);
  int frames = argc > 2 ? std::atoi(argv[2]) : 1;
  int nm, nl, no;
  f >> eye.x >> eye.y >> eye.z >> U.x >> U.y >> U.z >> Vv.x >> Vv.y >> Vv.z >>
      N.x >> N.y >> N.z >> plane_dist >> W >> H >> res_x >> res_y;
  f >> bg.x >> bg.y >> bg.z;
  f >> nm;
  for (int i = 0; i < nm; i++) {
    Mat m;
    f >> m.diff.x >> m.diff.y >> m.diff.z >> m.kd >> m.spec.x >> m.spec.y >>
        m.spec.z >> m.ks >> m.shine >> m.T >> m.ior;
    mats.push_back(m);
  }
  f >> nl;
  for (int i = 0; i < nl; i++) {
    Light L;
    f >> L.pos.x >> L.pos.y >> L.pos.z >> L.color.x >> L.color.y >> L.color.z;
    lights.push_back(L);
  }
  f >> no;
  for (int i = 0; i < no; i++) {
    Obj o;
    f >> o.ptype;
    for (int k = 0; k < 12; k++) f >> o.p[k];
    f >> o.mat;
    objs.push_back(o);
  }

  double sum = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int fr = 0; fr < frames; fr++) {
    for (int y = 0; y < res_y; y++)
      for (int x = 0; x < res_x; x++) {
        float px = x + 0.5f + 0.37f * fr, py = y + 0.5f;  // frame drift like bench.py
        V3 d = norm(U * (W * (px / res_x - 0.5f)) + Vv * (H * (py / res_y - 0.5f)) -
                    N * plane_dist);
        V3 c = ray_tracing(eye, d, 1, 1.0f);
        sum += std::fmin(c.x, 1.0f) + std::fmin(c.y, 1.0f) + std::fmin(c.z, 1.0f);
      }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  // primary + top-level-shadow convention (BASELINE.md): pixels*(1+nlights)
  double conv_rays = (double)res_x * res_y * (1 + (int)lights.size()) * frames;
  // %.5g keeps >=3 significant digits even for sub-0.01 Mrays/s scenes
  // (a %.3f print collapsed the dragon anchor to one digit)
  std::printf(
      "{\"frames\":%d,\"seconds\":%.3f,\"mrays_per_s\":%.5g,"
      "\"all_rays_mrays_per_s\":%.5g,\"checksum\":%.1f}\n",
      frames, secs, conv_rays / secs / 1e6, ray_count / secs / 1e6, sum);
  return 0;
}
