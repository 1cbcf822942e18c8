// Minimal single-threaded CPU path tracer with the GLSL template's exact
// semantics (P3D_RT.glsl rayColor / common.glsl scatter equivalents:
// 10-bounce iterative loop, half-b sphere quadratic with the c>0&&b>0
// reject, the triangle test WITHOUT the u+v<=1 guard, per-type Blinn-Phong
// direct light with shadow feelers, diffuse/metal/dielectric scatter with
// Beer's law on the refracted branch, sky gradient on miss) — the measured
// CPU anchor for bench.py's path-tracer vs_baseline (BASELINE.md).
// Independent implementation in the style of tools/baseline_ref.cpp; it
// does NOT copy reference code. RNG is xorshift128+ (the anchor measures
// throughput; the reference GLSL publishes no numbers to match).
//
// Input: a flat world dump written by tools/measure_baseline_pt.py.
// Output: one JSON line {"paths":N,"seconds":s,"mpaths_per_s":...}.
//
// Build: g++ -O3 -march=native -o baseline_pt baseline_pt.cpp
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

static const float T_MIN = 1e-3f;
static const float T_MAX = 1e4f;
static const float EPS = 1e-3f;
static const float BIG = 1e30f;
static const int BOUNCES = 10;

struct V3 { float x, y, z; };
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

enum { DIFFUSE = 0, METAL = 1, DIELECTRIC = 2 };

struct Mat { int type; V3 albedo, spec; float rough, refidx; V3 refract; };
struct Sph { V3 c0, c1; float r, t0, t1; int mat; };
struct Tri { V3 v0, e1, e2; int mat; };
struct Light { V3 pos, color; };

static std::vector<Mat> mats;
static std::vector<Sph> sphs;
static std::vector<Tri> tris;
static std::vector<Light> lights;

// camera (pinhole; the anchor times the integrator, not the lens)
static V3 eye, cu, cv, cn;
static float plane_dist, cw, ch;
static int res_x, res_y;

// xorshift128+
static uint64_t rs[2] = {0x9E3779B97F4A7C15ull, 0xBF58476D1CE4E5B9ull};
static inline float rnd() {
  uint64_t x = rs[0], y = rs[1];
  rs[0] = y;
  x ^= x << 23;
  rs[1] = x ^ y ^ (x >> 17) ^ (y >> 26);
  return (float)((rs[1] + y) >> 40) / (float)(1 << 24);
}
static V3 unit_sphere() {
  float x = rnd() * 2.0f - 1.0f;
  float phi = rnd() * 6.28318530718f;
  float r = std::cbrt(rnd());
  float s = std::sqrt(std::fmax(1.0f - x * x, 0.0f));
  return v3(r * s * std::sin(phi), r * s * std::cos(phi), r * x);
}

struct Hit { float t; int mat; V3 point, normal; bool ok; };

static Hit hit_world(V3 o, V3 d, float time, float t_max) {
  Hit h;
  h.t = BIG;
  h.ok = false;
  h.mat = 0;
  int win_s = -1, win_t = -1;
  V3 win_c = v3(0, 0, 0);
  for (size_t i = 0; i < sphs.size(); i++) {
    const Sph &s = sphs[i];
    float span = s.t1 - s.t0;
    float frac = span != 0.0f ? (time - s.t0) / span : 0.0f;
    V3 c = s.c0 + (s.c1 - s.c0) * frac;
    V3 L = o - c;
    float b = dot(L, d);
    float cc = dot(L, L) - s.r * s.r;
    if (cc > 0.0f && b > 0.0f) continue;
    float disc = b * b - cc;
    if (disc < 0.0f) continue;
    float sq = std::sqrt(disc);
    float t = -b - sq;
    if (t < 0.0f) t = -b + sq;
    if (t <= T_MIN || t >= t_max || t >= h.t) continue;
    h.t = t;
    win_s = (int)i;
    win_c = c;
  }
  for (size_t i = 0; i < tris.size(); i++) {
    const Tri &tr = tris[i];
    V3 hv = cross(d, tr.e2);
    float det = dot(hv, tr.e1);
    if (std::fabs(det) <= 1e-7f) continue;
    float f = 1.0f / det;
    V3 s = o - tr.v0;
    float u = f * dot(s, hv);
    if (u < 0.0f || u > 1.0f) continue;
    V3 q = cross(s, tr.e1);
    float v = f * dot(d, q);
    if (v < 0.0f || v > 1.0f) continue;  // GLSL quirk: no u+v<=1 guard
    float t = f * dot(tr.e2, q);
    if (t <= T_MIN || t >= t_max || t >= h.t) continue;
    h.t = t;
    win_s = -1;
    win_t = (int)i;
  }
  if (win_s < 0 && win_t < 0) return h;
  h.ok = true;
  h.point = o + d * h.t;
  if (win_s >= 0) {
    const Sph &s = sphs[win_s];
    h.normal = norm(h.point - win_c) * (s.r < 0 ? -1.0f : 1.0f);
    h.mat = s.mat;
  } else {
    const Tri &tr = tris[win_t];
    h.normal = norm(cross(tr.e1, tr.e2));
    h.mat = tr.mat;
  }
  return h;
}

static V3 direct_light(V3 d, const Hit &h, float time) {
  const Mat &m = mats[h.mat];
  V3 out = v3(0, 0, 0);
  bool is_diff = m.type == DIFFUSE;
  V3 diff_col = is_diff ? m.albedo : v3(0, 0, 0);
  V3 spec_col = is_diff ? v3(.1f, .1f, .1f)
                        : (m.type == METAL ? m.albedo : v3(.004f, .004f, .004f));
  float shin = is_diff ? 10.0f : 100.0f;
  float kd = is_diff ? 1.0f : 0.0f, ks = 1.0f - kd;
  for (const Light &l : lights) {
    V3 L = l.pos - h.point;
    V3 ld = norm(L);
    float ndl = dot(h.normal, ld);
    if (ndl <= 0.0f) continue;
    V3 fo = h.point + h.normal * EPS;
    float max_t = std::sqrt(dot(L, L));
    Hit sh = hit_world(fo, ld, time, max_t);
    if (sh.ok) continue;
    V3 H = norm(ld - d);
    float nh = std::fmax(0.0f, dot(h.normal, H));
    V3 dterm = l.color * diff_col * std::fmax(0.0f, ndl);
    V3 sterm = l.color * spec_col * std::pow(nh, shin);
    out = out + dterm * kd + sterm * ks;
  }
  return out;
}

static V3 ray_color(V3 o, V3 d, float time) {
  V3 thr = v3(1, 1, 1), col = v3(0, 0, 0);
  for (int b = 0; b < BOUNCES; b++) {
    Hit h = hit_world(o, d, time, T_MAX);
    if (!h.ok) {
      float tt = 0.8f * (d.y + 1.0f);
      V3 sky = v3(1, 1, 1) * (1.0f - tt) + v3(0.5f, 0.7f, 1.0f) * tt;
      col = col + thr * sky;
      break;
    }
    col = col + thr * direct_light(d, h, time);
    const Mat &m = mats[h.mat];
    V3 n = h.normal;
    V3 precise = h.point + n * EPS;
    if (m.type == DIFFUSE) {
      V3 dd = norm(n + norm(unit_sphere()));
      thr = thr * (m.albedo * (std::fmax(dot(dd, n), 0.0f) / 3.14159265f));
      o = precise;
      d = dd;
    } else if (m.type == METAL) {
      V3 mirror = norm(d - n * (2.0f * dot(d, n)));
      d = mirror + unit_sphere() * m.rough;  // not renormalized (GLSL)
      thr = thr * m.spec;
      o = precise;
    } else {
      float dn = dot(d, n);
      bool inside = dn > 0.0f;
      V3 ow = inside ? n * -1.0f : n;
      float ni_over_nt = inside ? m.refidx : 1.0f / m.refidx;
      float cosine = inside ? dn : -dn;
      float eta_i = inside ? m.refidx : 1.0f;
      float eta_t = inside ? 1.0f : m.refidx;
      float r0 = (eta_i - eta_t) / (eta_i + eta_t);
      r0 = r0 * r0;
      float k = 1.0f - ni_over_nt * ni_over_nt * (1.0f - cosine * cosine);
      float reflect_prob =
          k < 0.0f ? 1.0f : r0 + (1.0f - r0) * std::pow(1.0f - cosine, 5.0f);
      V3 s4 = unit_sphere();
      if (rnd() < reflect_prob) {
        V3 mirror = norm(d - n * (2.0f * dot(d, n)));
        d = mirror + s4 * m.rough;
        o = h.point + ow * EPS;
        thr = thr * m.albedo;
      } else {
        float sqk = std::sqrt(std::fmax(k, 0.0f));
        V3 refr = norm(d * ni_over_nt + ow * (ni_over_nt * cosine - sqk));
        V3 blend = norm(ow + s4);
        float rr = m.rough * m.rough;
        d = refr * (1.0f - rr) + blend * rr;
        o = h.point - ow * EPS;
        V3 beer = v3(std::exp(-m.refract.x * h.t), std::exp(-m.refract.y * h.t),
                     std::exp(-m.refract.z * h.t));
        thr = thr * (m.albedo * beer);
      }
    }
  }
  return col;
}

int main(int argc, char **argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: baseline_pt dump sub_raster samples\n");
    return 1;
  }
  std::ifstream f(argv[1]);
  int sub = std::atoi(argv[2]);
  int samples = std::atoi(argv[3]);
  f >> eye.x >> eye.y >> eye.z >> cu.x >> cu.y >> cu.z >> cv.x >> cv.y >>
      cv.z >> cn.x >> cn.y >> cn.z >> plane_dist >> cw >> ch >> res_x >> res_y;
  int nm, ns, nt, nl;
  f >> nm;
  for (int i = 0; i < nm; i++) {
    Mat m;
    f >> m.type >> m.albedo.x >> m.albedo.y >> m.albedo.z >> m.spec.x >>
        m.spec.y >> m.spec.z >> m.rough >> m.refidx >> m.refract.x >>
        m.refract.y >> m.refract.z;
    mats.push_back(m);
  }
  f >> ns;
  for (int i = 0; i < ns; i++) {
    Sph s;
    f >> s.c0.x >> s.c0.y >> s.c0.z >> s.c1.x >> s.c1.y >> s.c1.z >> s.r >>
        s.t0 >> s.t1 >> s.mat;
    sphs.push_back(s);
  }
  f >> nt;
  for (int i = 0; i < nt; i++) {
    Tri t;
    f >> t.v0.x >> t.v0.y >> t.v0.z >> t.e1.x >> t.e1.y >> t.e1.z >> t.e2.x >>
        t.e2.y >> t.e2.z >> t.mat;
    tris.push_back(t);
  }
  f >> nl;
  for (int i = 0; i < nl; i++) {
    Light l;
    f >> l.pos.x >> l.pos.y >> l.pos.z >> l.color.x >> l.color.y >> l.color.z;
    lights.push_back(l);
  }

  double acc = 0.0;  // fold so nothing is optimized away
  auto t0 = std::chrono::steady_clock::now();
  for (int py = 0; py < sub; py++) {
    for (int px = 0; px < sub; px++) {
      for (int s = 0; s < samples; s++) {
        float fx = ((px + rnd()) / sub) - 0.5f;
        float fy = ((py + rnd()) / sub) - 0.5f;
        V3 d = norm(cu * (cw * fx) + cv * (ch * fy) - cn * plane_dist);
        V3 c = ray_color(eye, d, rnd());
        acc += c.x + c.y + c.z;
      }
    }
  }
  double sec =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  long paths = (long)sub * sub * samples;
  std::printf(
      "{\"paths\": %ld, \"seconds\": %.3f, \"mpaths_per_s\": %.4f, "
      "\"checksum\": %.3f}\n",
      paths, sec, paths / sec / 1e6, acc);
  return 0;
}
