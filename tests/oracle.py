"""Scalar NumPy oracle: an independent, recursive implementation of the
reference renderer's semantics (main.cpp:471-832), used to validate the
vectorized JAX pipeline. Deliberately written in the reference's recursive
per-pixel style so structural bugs in the wavefront flattening can't hide.

Deterministic features only (no AA/DoF/motion blur): stochastic paths cannot
bit-match a different RNG (SURVEY.md §7 hard part d).
"""
from __future__ import annotations

import numpy as np

EPSILON = 1e-3
BIG = 1e30

PLANE, TRIANGLE, SPHERE, AABOX = 0, 1, 2, 3


def _norm(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def intersect_one(ptype, p, o, d):
    """Scalar intercepts(); returns t or None."""
    if ptype == SPHERE:
        c, r = p[0:3], p[3]
        L = o - c
        a = d @ d
        b = 2.0 * (d @ L)
        cc = L @ L - r * r
        delta = b * b - 4 * a * cc
        if delta < 0:
            return None
        sq = np.sqrt(delta)
        t0 = (-b - sq) / (2 * a)
        t1 = (-b + sq) / (2 * a)
        if t0 > t1:
            t0, t1 = t1, t0
        if t0 < 0:
            t0 = t1
            if t0 < 0:
                return None
        return t0
    if ptype == TRIANGLE:
        v0, e1, e2 = p[0:3], p[3:6], p[6:9]
        h = np.cross(d, e2)
        det = e1 @ h
        if -EPSILON < det < EPSILON:
            return None
        f = 1.0 / det
        s = o - v0
        u = f * (s @ h)
        if u < 0 or u > 1:
            return None
        q = np.cross(s, e1)
        v = f * (d @ q)
        if v < 0 or u + v > 1:
            return None
        t = f * (e2 @ q)
        return t if t > EPSILON else None
    if ptype == PLANE:
        pn, D = p[0:3], p[3]
        denom = pn @ d
        if abs(denom) < EPSILON:
            return None
        t = -(pn @ o + D) / denom
        return t if t > 0 else None
    if ptype == AABOX:
        mn, mx = p[0:3], p[3:6]
        tmin = np.empty(3)
        tmax = np.empty(3)
        for ax in range(3):
            inv = 1.0 / d[ax] if d[ax] != 0 else np.inf
            lo = (mn[ax] - o[ax]) * inv
            hi = (mx[ax] - o[ax]) * inv
            if inv >= 0:
                tmin[ax], tmax[ax] = lo, hi
            else:
                tmin[ax], tmax[ax] = hi, lo
        t_in = tmin.max()
        t_out = tmax.min()
        if t_in < t_out and t_out > EPSILON:
            return t_in if t_in > EPSILON else t_out
        return None
    return None


def normal_one(ptype, p, point, o, d):
    if ptype == SPHERE:
        return _norm(point - p[0:3])
    if ptype == TRIANGLE:
        return p[9:12]
    if ptype == PLANE:
        return p[0:3]
    if ptype == AABOX:
        mn, mx = p[0:3], p[3:6]
        tmin = np.empty(3)
        tmax = np.empty(3)
        for ax in range(3):
            inv = 1.0 / d[ax] if d[ax] != 0 else np.inf
            lo = (mn[ax] - o[ax]) * inv
            hi = (mx[ax] - o[ax]) * inv
            if inv >= 0:
                tmin[ax], tmax[ax] = lo, hi
            else:
                tmin[ax], tmax[ax] = hi, lo
        ax_in = int(tmin.argmax())
        ax_out = int(tmax.argmin())
        n = np.zeros(3)
        if tmin.max() > EPSILON:
            n[ax_in] = -1.0 if tmin[ax_in] < 0 else 1.0
        else:
            n[ax_out] = -1.0 if tmax[ax_out] < 0 else 1.0
        return n
    return np.zeros(3)


class Oracle:
    """Holds host-side SceneDef data and renders recursively."""

    def __init__(self, sd, cfg):
        self.sd = sd
        self.cfg = cfg
        self.objects = [(o.ptype, o.params.astype(np.float32), o.mat_id)
                        for o in sd.objects]
        self.materials = [m.astype(np.float32) for m in sd.materials]
        self.lights = [l.astype(np.float32) for l in sd.lights]
        self.bg = sd.bg_color.astype(np.float32)
        cam = sd.camera
        eye = cam["eye"].astype(np.float32)
        at = cam["at"].astype(np.float32)
        up = cam["up"].astype(np.float32)
        n = eye - at
        self.plane_dist = np.linalg.norm(n)
        self.n = n / self.plane_dist
        u = np.cross(up, self.n)
        self.u = u / np.linalg.norm(u)
        self.v = np.cross(self.n, self.u)
        self.h = 2 * self.plane_dist * np.tan(np.pi * cam["fov"] / 180 / 2)
        self.w = cam["res_x"] / cam["res_y"] * self.h
        self.eye = eye
        self.res_x, self.res_y = cam["res_x"], cam["res_y"]

    def closest_hit(self, o, d):
        best_t, best_i = BIG, -1
        for i, (pt, p, m) in enumerate(self.objects):
            t = intersect_one(pt, p, o, d)
            if t is not None and t < best_t:
                best_t, best_i = t, i
        return best_t, best_i

    def in_shadow(self, o, d, max_t):
        for pt, p, m in self.objects:
            t = intersect_one(pt, p, o, d)
            if t is not None and t < max_t:
                return True
        return False

    def mat(self, i):
        m = self.materials[i]
        return dict(diff=m[0:3], kd=m[3], spec=m[4:7], ks=m[7], shine=m[8],
                    T=m[9], ior=m[10])

    def process_light(self, Lvec, light_color, mat, d, precise, normal):
        """processLight (main.cpp:471-526)."""
        if Lvec @ normal <= 0:
            return np.zeros(3)
        max_t = BIG if self.cfg.shadow_unbounded else 1.0
        if self.in_shadow(precise, Lvec, max_t):
            return np.zeros(3)
        L = _norm(Lvec)
        V = -d
        H = _norm(L + V)
        max1 = max(0.0, normal @ L)
        max2 = max(0.0, H @ normal)
        diff = light_color * mat["diff"] * max1
        spec = light_color * mat["spec"] * max2 ** mat["shine"]
        return diff * mat["kd"] + spec * mat["ks"] * 0.4

    def ray_tracing(self, o, d, depth, ior_1):
        """rayTracing (main.cpp:530-721)."""
        cfg = self.cfg
        t, i = self.closest_hit(o, d)
        if i < 0:
            return self.bg.copy()
        pt, p, mi = self.objects[i]
        mat = self.mat(mi)
        hit_point = o + d * t
        n0 = _norm(normal_one(pt, p, hit_point, o, d))
        precise = hit_point + n0 * EPSILON
        normal = _norm(normal_one(pt, p, precise, o, d))

        color = np.zeros(3)
        for l in self.lights:
            if getattr(self.cfg, "soft_shadow", False):
                # 4x4 light grid, each 1/16 color (main.cpp:601-618)
                dd, start = 0.125, -0.25
                for i in range(4):
                    for j in range(4):
                        pos = l[0:3] + np.array(
                            [start + j * dd, start + i * dd, 0.0], np.float32)
                        color += self.process_light(
                            pos - hit_point, l[3:6] / 16.0, mat, d, precise,
                            normal)
            else:
                Lvec = l[0:3] - hit_point
                color += self.process_light(Lvec, l[3:6], mat, d, precise,
                                            normal)

        if depth >= cfg.max_depth:
            return np.clip(color, 0, 1)

        inside = d @ normal > 0
        nf = -normal if inside else normal

        refl_color = np.zeros(3)
        if mat["ks"] > 0:
            refl_dir = _norm(d - nf * (d @ nf) * 2)
            refl_color = self.ray_tracing(precise, refl_dir, depth + 1, ior_1)

        refr_color = np.zeros(3)
        if mat["T"] != 0:
            V = -d
            viewnormal = nf * (nf @ V)
            viewtangent = viewnormal - V
            eta = ior_1 if inside else ior_1 / mat["ior"]
            cos_i = np.linalg.norm(viewnormal)
            sin_t = eta * np.linalg.norm(viewtangent)
            insqrt = 1 - sin_t ** 2
            new_ior = 1.0 if inside else mat["ior"]
            can = insqrt >= 0
            if can:
                cos_t = np.sqrt(insqrt)
                that = _norm(viewtangent)
                if cfg.refraction_mode == "reference":
                    refr_dir = that * sin_t + nf
                else:
                    refr_dir = _norm(that * sin_t - nf * cos_t)
                origin = hit_point + refr_dir * 0.001
                refr_color = self.ray_tracing(origin, refr_dir, depth + 1,
                                              new_ior)
            if cfg.fresnel_mode == "reference_exact":
                KR = 0.0
            else:
                if can:
                    r0 = ((ior_1 - new_ior) / (ior_1 + new_ior)) ** 2
                    KR = r0 + (1 - r0) * (1 - cos_i) ** 5
                else:
                    KR = 1.0 if cfg.fresnel_mode == "schlick" else 0.0
        else:
            KR = mat["ks"]

        color = color + refl_color * KR * mat["spec"] + refr_color * (1 - KR)
        return color

    def render(self):
        img = np.zeros((self.res_y, self.res_x, 3))
        for y in range(self.res_y):
            for x in range(self.res_x):
                px, py = x + 0.5, y + 0.5
                sx = self.w * (px / self.res_x - 0.5)
                sy = self.h * (py / self.res_y - 0.5)
                d = _norm(sx * self.u + sy * self.v - self.plane_dist * self.n)
                img[y, x] = np.clip(
                    self.ray_tracing(self.eye, d, 1, 1.0), 0, 1)
        return img
