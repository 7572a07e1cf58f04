"""CPU reference renderer (pure NumPy) — the golden-test oracle.

An independent, deliberately-simple implementation of the same rendering
semantics as the JAX pipeline (render/megakernel.py), written directly from
the reference shaders (raygen.rgen, closesthit.rchit, miss.rmiss, LTC.glsl,
cook-torrance.glsl, denoise.comp, combine.comp).  SURVEY.md §4 defines this
role: "rendered image allclose vs a CPU reference implementation".

It shares only the counter-based RNG (ops/rng.py uniform_np) with the JAX
path — sampling sequences must agree bit-for-bit for stochastic terms to be
comparable.  Everything else (intersection, LTC, BRDF, denoise) is written
separately in straight NumPy with explicit Python loops over lights.
"""

from __future__ import annotations

import numpy as np

from realtimeraytracer_tpu.ops.rng import uniform_np
from realtimeraytracer_tpu.scene.scene import Scene

PI = 3.14159265359


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _norm(v, axis=-1, keepdims=True):
    n = np.linalg.norm(v, axis=axis, keepdims=keepdims)
    return v / np.maximum(n, 1e-20)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def aces(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def to_srgb(x, gamma=2.2):
    return np.power(np.maximum(x, 0.0), 1.0 / gamma)


def to_linear(x, gamma=2.2):
    return np.power(np.maximum(x, 0.0), gamma)


def tonemap_np(x, mode, gamma=2.2):
    """NumPy twin of ops/tonemap.tonemap: 'aces', 'lut', or 'none'.

    The 'lut' path builds the identical 1024-entry ACES+gamma table
    (ops/tonemap.build_tonemap_lut — already NumPy) and applies the same
    linear interpolation, so the BASELINE config-3 LUT-tonemap pipeline is
    golden-comparable."""
    if mode == "aces":
        return to_srgb(aces(x), gamma)
    if mode == "lut":
        from realtimeraytracer_tpu.ops.tonemap import build_tonemap_lut

        lut = build_tonemap_lut(gamma=gamma)
        n = lut.shape[0]
        max_input = 8.0
        pos = np.clip(x, 0.0, max_input) * ((n - 1) / max_input)
        i0 = np.clip(pos.astype(np.int32), 0, n - 2)
        frac = (pos - i0).astype(np.float32)
        return lut[i0] * (1.0 - frac) + lut[i0 + 1] * frac
    if mode == "none":
        return x
    raise ValueError(f"unknown tonemap mode {mode!r}")


def _bilinear(img, u, v, wrap=True):
    h, w = img.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    if wrap:
        xi0, xi1 = x0 % w, (x0 + 1) % w
        yi0, yi1 = y0 % h, (y0 + 1) % h
    else:
        xi0, xi1 = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
        yi0, yi1 = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    top = img[yi0, xi0] * (1 - fx) + img[yi0, xi1] * fx
    bot = img[yi1, xi0] * (1 - fx) + img[yi1, xi1] * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# intersection
# ---------------------------------------------------------------------------

def closest_hit(o, d, verts, faces, sph_c, sph_r, t_min, t_max):
    """Brute-force closest hit. Returns (t, prim, u, v); prim -1 on miss,
    sphere prims offset by len(faces)."""
    # Force f32: float64 inputs would make the f64 miss sentinel 3e38
    # compare LESS than the f32 init (f32(3e38) rounds up), turning every
    # miss into a fake hit of the argmin prim.
    o = np.asarray(o, np.float32)
    d = np.asarray(d, np.float32)
    R = o.shape[0]
    best_t = np.full(R, 3e38, np.float32)
    best_p = np.full(R, -1, np.int64)
    best_u = np.zeros(R, np.float32)
    best_v = np.zeros(R, np.float32)
    if len(faces):
        v0 = verts[faces[:, 0]][None]
        v1 = verts[faces[:, 1]][None]
        v2 = verts[faces[:, 2]][None]
        e1 = v1 - v0
        e2 = v2 - v0
        dd = d[:, None, :]
        oo = o[:, None, :]
        pvec = np.cross(dd, e2)
        det = _dot(e1, pvec)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = oo - v0
        u = _dot(tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        v = _dot(dd, qvec) * inv
        t = _dot(e2, qvec) * inv
        ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= t_min) & (t <= t_max)
        t = np.where(ok, t, 3e38)
        j = np.argmin(t, axis=1)
        r = np.arange(R)
        tt = t[r, j]
        sel = tt < best_t
        best_t = np.where(sel, tt, best_t)
        best_p = np.where(sel, j, best_p)
        best_u = np.where(sel, u[r, j], best_u)
        best_v = np.where(sel, v[r, j], best_v)
    if len(sph_c):
        oc = o[:, None, :] - sph_c[None]
        b = _dot(oc, d[:, None, :])
        c = _dot(oc, oc) - sph_r[None] ** 2
        disc = b * b - c
        ok = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where(t0 > 0, t0, t1)
        ok &= (t >= t_min) & (t <= t_max)
        t = np.where(ok, t, 3e38)
        j = np.argmin(t, axis=1)
        r = np.arange(R)
        tt = t[r, j]
        sel = tt < best_t
        best_t = np.where(sel, tt, best_t)
        best_p = np.where(sel, j + len(faces), best_p)
    return best_t, best_p, best_u, best_v


def occluded(o, d, verts, faces, sph_c, sph_r, t_min, t_max):
    t, p, _, _ = closest_hit(o, d, verts, faces, sph_c, sph_r, t_min, np.inf)
    return (p >= 0) & (t < t_max)


def _hit_alpha_np(g, prim, bu, bv):
    """Opacity of each hit (1.0 when no opacity map / sphere / miss)."""
    if len(g["tex_atlas"]) == 0:
        return np.ones(len(prim), np.float32)
    faces = g["faces"]
    nt = len(faces)
    is_tri = (prim >= 0) & (prim < nt)
    tid = np.clip(prim, 0, max(nt - 1, 0))
    f = faces[tid]
    w0 = (1 - bu - bv)[:, None]
    uv = (g["uvs"][f[:, 0]] * w0 + g["uvs"][f[:, 1]] * bu[:, None]
          + g["uvs"][f[:, 2]] * bv[:, None])
    obj = g["face_obj"][tid]
    tex = g["obj_tex"][obj, 3]
    atlas, sizes = g["tex_atlas"], g["tex_size"]
    tid2 = np.clip(tex, 0, len(atlas) - 1)
    hw = sizes[tid2].astype(np.float64)
    x = uv[:, 0] * hw[:, 1] - 0.5
    y = uv[:, 1] * hw[:, 0] - 0.5
    x0 = np.floor(x).astype(np.int64); y0 = np.floor(y).astype(np.int64)
    fx = x - x0; fy = y - y0
    wi = hw[:, 1].astype(np.int64); hi = hw[:, 0].astype(np.int64)
    xi0, xi1 = x0 % wi, (x0 + 1) % wi
    yi0, yi1 = y0 % hi, (y0 + 1) % hi
    a = ((atlas[tid2, yi0, xi0, 0] * (1 - fx) + atlas[tid2, yi0, xi1, 0] * fx)
         * (1 - fy)
         + (atlas[tid2, yi1, xi0, 0] * (1 - fx) + atlas[tid2, yi1, xi1, 0] * fx)
         * fy)
    return np.where(is_tri & (tex >= 0), a, 1.0)


def trace_closest(g, cfg, o, d, t_min, t_max):
    """closest_hit with the optional alpha-test ladder (render/alpha.py)."""
    t, p, bu, bv = closest_hit(o, d, g["vertices"], g["faces"],
                               g["sph_center"], g["sph_radius"], t_min, t_max)
    if not getattr(cfg, "alpha_test", False):
        return t, p, bu, bv
    t_lo = np.full(len(o), t_min, np.float32)
    for _ in range(cfg.alpha_rounds):
        a = _hit_alpha_np(g, p, bu, bv)
        rej = (p >= 0) & (a < cfg.alpha_threshold)
        if not rej.any():
            break
        t_lo = np.where(rej, t + 1e-4, t_lo)
        t2, p2, bu2, bv2 = closest_hit(
            o, d, g["vertices"], g["faces"], g["sph_center"], g["sph_radius"],
            0.0, t_max)
        # emulate per-ray t_min
        for i in np.nonzero(rej)[0]:
            ti, pi, ui, vi = closest_hit(
                o[i:i + 1], d[i:i + 1], g["vertices"], g["faces"],
                g["sph_center"], g["sph_radius"], float(t_lo[i]), t_max)
            t[i], p[i], bu[i], bv[i] = ti[0], pi[0], ui[0], vi[0]
    return t, p, bu, bv


def trace_occluded(g, cfg, o, d, t_min, t_max):
    if not getattr(cfg, "alpha_test", False):
        return occluded(o, d, g["vertices"], g["faces"], g["sph_center"],
                        g["sph_radius"], t_min, t_max)
    t, p, bu, bv = trace_closest(g, cfg, o, d, t_min, np.inf)
    return (p >= 0) & (t < t_max)


# ---------------------------------------------------------------------------
# LTC (written from LTC.glsl:2-69)
# ---------------------------------------------------------------------------

def integrate_edge(v1, v2):
    x = _dot(v1, v2)
    y = np.abs(x)
    a = 0.8543985 + (0.4965155 + 0.0145206 * y) * y
    b = 3.4175940 + (4.1616724 + y) * y
    v = a / b
    neg = 0.5 / np.sqrt(np.maximum(1 - x * x, 1e-7)) - v
    ts = np.where(x > 0, v, neg)
    return np.cross(v1, v2) * ts[..., None]


def ltc_eval(n, view, p, minv, p0, p1, p2, light_n, two_sided, ltc2):
    t1 = _norm(view - n * _dot(view, n)[..., None])
    t2 = np.cross(n, t1)
    basis = np.stack([t1, t2, n], axis=-2)
    m = minv @ basis

    def tf(q):
        return _norm(np.einsum("...ij,...j->...i", m, q - p))

    l0, l1, l2 = tf(p0), tf(p1), tf(p2)
    behind = _dot(p0 - p, light_n) < 0
    vs = integrate_edge(l0, l1) + integrate_edge(l1, l2) + integrate_edge(l2, l0)
    ln = np.sqrt(np.maximum(_dot(vs, vs), 1e-20))
    z = vs[..., 2] / ln
    z = np.where(behind, -z, z)
    lu = (z * 0.5 + 0.5) * (63.0 / 64.0) + 0.5 / 64.0
    lv = ln * (63.0 / 64.0) + 0.5 / 64.0
    scale = _bilinear(ltc2, lu, lv, wrap=False)[..., 3]
    out = ln * scale
    out = np.where((~behind) & (~two_sided), 0.0, out)
    return out


# ---------------------------------------------------------------------------
# BRDF (from cook-torrance.glsl)
# ---------------------------------------------------------------------------

def ggx_d(n, h, alpha):
    noh = _dot(n, h)
    a2 = alpha * alpha
    noh2 = noh * noh
    den = np.maximum(noh2 * a2 + (1 - noh2), 1e-3)
    return np.where(noh > 0, 1.0, 0.0) * a2 / (PI * den * den)


def ggx_g1(v, n, h, alpha):
    voh = np.clip(_dot(v, h), 1e-3, 1.0)
    chi = np.where(voh / np.clip(_dot(v, n), 1e-3, 1.0) > 0, 1.0, 0.0)
    voh2 = voh * voh
    tan2 = (1 - voh2) / voh2
    return chi * 2.0 / (1 + np.sqrt(1 + alpha * alpha * tan2))


def fresnel(cos_t, f0):
    return f0 + (1 - f0) * np.power(np.clip(1 - cos_t, 0, 1), 5.0)[..., None]


def ct_spec(view, light, n, rough, f0, min_nv=0.1, min_nl=0.1):
    h = _norm(view + light)
    ct = np.clip(_dot(view, h), 0, 1)
    d = ggx_d(n, h, rough)
    g = ggx_g1(view, n, h, rough) * ggx_g1(light, n, h, rough)
    f = fresnel(ct, f0)
    nv = np.maximum(_dot(n, view), min_nv)
    nl = np.maximum(_dot(n, light), min_nl)
    return (d * g / (4 * nv * nl))[..., None] * f


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------

def render_reference(scene: Scene, cfg, frame_index: int = 0,
                     return_components: bool = False):
    """Render with the same semantics as the JAX pipeline, in NumPy."""
    if getattr(cfg, "alpha_test", None) is None:
        cfg = cfg.replace(alpha_test=any(
            m.material.opacity_map is not None for m in scene.meshes))
    gpu = scene.compile()
    g = {k: np.asarray(v) for k, v in gpu._asdict().items()}
    h, w = cfg.height, cfg.width
    fr = scene.camera.viewport_frame_np(w, h)
    pos, top_left, h_delta, v_delta = (x.astype(np.float64) for x in fr)

    px, py = np.meshgrid(np.arange(w), np.arange(h))
    pixel_seed = (px.astype(np.uint64) * 733 + py.astype(np.uint64) * 1933
                  + np.uint64(frame_index)).reshape(-1)

    analytic = np.zeros((h * w, 3), np.float32)
    shadowed = np.zeros((h * w, 3), np.float32)
    unshadowed = np.zeros((h * w, 3), np.float32)
    nrm_acc = np.zeros((h * w, 3), np.float32)
    pos_acc = np.zeros((h * w, 3), np.float32)

    for s in range(cfg.primary_rays):
        if cfg.jitter:
            base = (py.astype(np.uint64) * w + px.astype(np.uint64)).reshape(-1)
            jx = uniform_np(base + np.uint64(s))
            jy = uniform_np(base + np.uint64(s) * np.uint64(322) + np.uint64(7919))
        else:
            jx = jy = 0.5
        ox = px.reshape(-1) + jx - 0.5
        oy = py.reshape(-1) + jy - 0.5
        world = top_left[None] + ox[:, None] * h_delta[None] + oy[:, None] * v_delta[None]
        d = _norm(world - pos[None]).astype(np.float32)
        o = np.broadcast_to(pos.astype(np.float32), d.shape)

        a, sh, un, nn, pp = _shade(g, cfg, o, d, pixel_seed, s)
        analytic += a; shadowed += sh; unshadowed += un
        nrm_acc += nn; pos_acc += pp

    inv = 1.0 / cfg.primary_rays
    tm = lambda x: tonemap_np(x * inv, cfg.tonemap, cfg.gamma)
    comp = {
        "analytic": tm(analytic).reshape(h, w, 3),
        "shadowed": tm(shadowed).reshape(h, w, 3),
        "unshadowed": tm(unshadowed).reshape(h, w, 3),
        "normal": _norm(nrm_acc * inv).reshape(h, w, 3),
        "position": (pos_acc * inv).reshape(h, w, 3),
    }
    sh_img, un_img = comp["shadowed"], comp["unshadowed"]
    for i in range(cfg.denoise_iterations):
        sh_img = atrous_np(sh_img, comp["normal"], comp["position"], i + 1,
                           cfg.denoise_c_phi, cfg.denoise_n_phi, cfg.denoise_p_phi)
        un_img = atrous_np(un_img, comp["normal"], comp["position"], i + 1,
                           cfg.denoise_c_phi, cfg.denoise_n_phi, cfg.denoise_p_phi)
    final = comp["analytic"] * (sh_img / np.maximum(un_img, 1e-3))
    if return_components:
        return final, comp
    return final


def _surface_np(g, cfg, o, d, t, prim, bu, bv):
    """HitRecord -> shading attributes (NumPy twin of render/surface.py).

    Returns a dict {miss, hit_light, valid, p, n, uv, obj, albedo, rough,
    metal, emit} where emit is the miss-env + light-hit radiance term."""
    verts, faces = g["vertices"], g["faces"]
    miss = prim < 0
    nt = len(faces)
    is_tri = (prim >= 0) & (prim < nt)

    # environment
    dn = _norm(d)
    eu = np.arctan2(dn[:, 2], dn[:, 0]) / (2 * PI) + 0.5
    ev = 1.0 - np.arccos(np.clip(dn[:, 1], -1, 1)) / PI
    env = to_linear(_bilinear(g["hdri"], eu, ev)[..., :3]) * g["env_color"][None]

    # surface attributes
    tid = np.clip(prim, 0, max(nt - 1, 0))
    f = faces[tid]
    w0 = (1 - bu - bv)[:, None]
    w1 = bu[:, None]
    w2 = bv[:, None]
    p = verts[f[:, 0]] * w0 + verts[f[:, 1]] * w1 + verts[f[:, 2]] * w2
    n = _norm(g["normals"][f[:, 0]] * w0 + g["normals"][f[:, 1]] * w1
              + g["normals"][f[:, 2]] * w2)
    uv = g["uvs"][f[:, 0]] * w0 + g["uvs"][f[:, 1]] * w1 + g["uvs"][f[:, 2]] * w2
    obj = g["face_obj"][tid]
    if len(g["sph_center"]):
        sid = np.clip(prim - nt, 0, len(g["sph_center"]) - 1)
        sp = o + t[:, None] * d
        sn = _norm(sp - g["sph_center"][sid])
        sel = (~is_tri)[:, None]
        p = np.where(sel, sp, p)
        n = np.where(sel, sn, n)
        su = np.arctan2(sn[:, 2], sn[:, 0]) / (2 * PI) + 0.5
        sv = np.arccos(np.clip(sn[:, 1], -1, 1)) / PI
        uv = np.where(sel, np.stack([su, sv], -1), uv)
        obj = np.where(~is_tri, g["sph_obj"][sid], obj)

    obj = np.where(miss, 0, obj)
    hit_light = (~miss) & (g["obj_is_light"][obj] > 0)
    valid = (~miss) & (~hit_light)

    # Sanitize non-hits (mirror of render/surface.py): avoid BIG_T-derived
    # positions feeding the masked shading math.
    p = np.where(valid[:, None], p, 0.0)
    n = np.where(valid[:, None], n, 0.0)

    color = g["obj_color"][obj]
    spec = g["obj_specular"][obj]
    metal = g["obj_metallic"][obj]
    tex = g["obj_tex"][obj]
    atlas, sizes = g["tex_atlas"], g["tex_size"]

    def tex_fetch(channel):
        tid2 = np.clip(tex[:, channel], 0, len(atlas) - 1)
        hw = sizes[tid2].astype(np.float64)
        x = uv[:, 0] * hw[:, 1] - 0.5
        y = uv[:, 1] * hw[:, 0] - 0.5
        x0 = np.floor(x).astype(np.int64); y0 = np.floor(y).astype(np.int64)
        fx = (x - x0)[:, None]; fy = (y - y0)[:, None]
        wi = hw[:, 1].astype(np.int64); hi = hw[:, 0].astype(np.int64)
        xi0, xi1 = x0 % wi, (x0 + 1) % wi
        yi0, yi1 = y0 % hi, (y0 + 1) % hi
        c00 = atlas[tid2, yi0, xi0]; c01 = atlas[tid2, yi0, xi1]
        c10 = atlas[tid2, yi1, xi0]; c11 = atlas[tid2, yi1, xi1]
        return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy

    if len(atlas) and (tex[:, 0] >= 0).any():
        color = np.where((tex[:, 0] >= 0)[:, None], tex_fetch(0)[:, :3], color)
    if len(atlas) and (tex[:, 1] >= 0).any():
        spec = np.where(tex[:, 1] >= 0, tex_fetch(1)[:, 0], spec)
    if len(atlas) and (tex[:, 2] >= 0).any():
        metal = np.where(tex[:, 2] >= 0, tex_fetch(2)[:, 0], metal)

    albedo = to_linear(color)
    rough = 1.0 - spec

    # Emitters use the raw material color, never texture overrides
    # (closesthit.rchit:46-50 parity; mirrors render/surface.py).
    emit = np.where(miss[:, None], env, 0) + np.where(
        hit_light[:, None], g["obj_color"][obj], 0)

    return dict(miss=miss, hit_light=hit_light, valid=valid, p=p, n=n,
                uv=uv, obj=obj, albedo=albedo, rough=rough, metal=metal,
                emit=emit)


def _shade(g, cfg, o, d, pixel_seed, sample_index):
    R = o.shape[0]
    t, prim, bu, bv = trace_closest(g, cfg, o, d, cfg.t_min, cfg.t_max)
    s = _surface_np(g, cfg, o, d, t, prim, bu, bv)
    miss, hit_light, valid = s["miss"], s["hit_light"], s["valid"]
    p, n, albedo, rough, metal = (s["p"], s["n"], s["albedo"], s["rough"],
                                  s["metal"])
    base = s["emit"]

    view = _norm(o - p)
    m_diff = (1 - metal[:, None]) * albedo
    m_spec = 0.04 * (1 - metal[:, None]) + albedo * metal[:, None]
    ndotv = np.clip(_dot(n, view), 0, 1)

    lut_u = rough * (63.0 / 64.0) + 0.5 / 64.0
    lut_v = np.sqrt(np.maximum(1 - ndotv, 0)) * (63.0 / 64.0) + 0.5 / 64.0
    t1v = _bilinear(g["ltc1"], lut_u, lut_v, wrap=False)
    t2v = _bilinear(g["ltc2"], lut_u, lut_v, wrap=False)
    minv = np.zeros((R, 3, 3), np.float32)
    minv[:, 0, 0] = t1v[:, 0]; minv[:, 0, 2] = t1v[:, 2]
    minv[:, 1, 1] = 1.0
    minv[:, 2, 0] = t1v[:, 1]; minv[:, 2, 2] = t1v[:, 3]
    ident = np.broadcast_to(np.eye(3, dtype=np.float32), (R, 3, 3))
    fres = m_spec * t2v[:, 0:1] + (1 - m_spec) * t2v[:, 1:2]
    lam = (1 - metal[:, None]) * albedo / PI
    so = p + n * cfg.shadow_origin_offset

    analytic = np.zeros((R, 3), np.float32)
    shadowed = np.zeros((R, 3), np.float32)
    unshadowed = np.zeros((R, 3), np.float32)

    for li in range(len(g["lt_v0"])):
        if not g["lt_valid"][li]:
            continue
        p0, p1, p2 = g["lt_v0"][li], g["lt_v1"][li], g["lt_v2"][li]
        lc, lint = g["lt_color"][li], g["lt_intensity"][li]
        two = bool(g["lt_two_sided"][li])
        nl = np.cross(p2 - p1, p0 - p1)
        area = np.linalg.norm(nl) * 0.5
        inv_pdf = area * cfg.light_pdf_scale
        nlu = nl / max(np.linalg.norm(nl), 1e-20)

        front = _dot(nlu[None], p - p0[None]) >= 0
        active = (valid & (two | front)).astype(np.float32)[:, None]

        sh_acc = np.zeros((R, 3), np.float32)
        un_acc = np.zeros((R, 3), np.float32)
        for si in range(cfg.shadow_rays):
            seed = (pixel_seed + np.uint64(si) + np.uint64(li * 7919)
                    + np.uint64(sample_index * 15485863))
            r1 = uniform_np(seed)
            r2 = uniform_np(seed + np.uint64(100))
            over = r1 + r2 > 1
            r1 = np.where(over, 1 - r1, r1)
            r2 = np.where(over, 1 - r2, r2)
            lpos = p0[None] + r1[:, None] * (p1 - p0)[None] + r2[:, None] * (p2 - p0)[None]
            delta = lpos - p
            dist = np.sqrt(np.maximum(_dot(delta, delta), 1e-20))
            sdir = delta / dist[:, None]
            occ = trace_occluded(g, cfg, so.astype(np.float32),
                                 sdir.astype(np.float32), cfg.t_min,
                                 dist - cfg.shadow_ray_margin)
            lit = np.where(occ, 0.0, 1.0)[:, None]
            ndotl = np.maximum(_dot(n, sdir), 0.1)
            cspec = ct_spec(view, sdir, n, rough, m_spec)
            brdf = cspec + lam
            atten = 1.0 / np.maximum(dist * dist, 1e-20)
            L = lc[None] * lint * (ndotl * atten)[:, None] * cfg.sampled_gain
            sh_acc += lit * brdf * L * inv_pdf
            un_acc += brdf * L * inv_pdf
        sh_acc /= cfg.shadow_rays
        un_acc /= cfg.shadow_rays

        two_b = np.full(R, two)
        dif = ltc_eval(n, view, p, ident, p0, p1, p2, nlu, two_b, g["ltc2"])
        spc = ltc_eval(n, view, p, minv, p0, p1, p2, nlu, two_b, g["ltc2"])
        an = lc[None] * lint * (spc[:, None] * fres + m_diff * dif[:, None]) * cfg.analytic_gain

        analytic += an * active
        shadowed += sh_acc * active
        unshadowed += un_acc * active

    # sun
    sd = g["sun_direction"]
    if g["sun_intensity"] > 0:
        ndl_raw = _dot(n, sd[None])
        act = (valid & (ndl_raw > 0)).astype(np.float32)[:, None]
        occ = trace_occluded(g, cfg, so.astype(np.float32),
                             np.broadcast_to(sd, (R, 3)).astype(np.float32),
                             cfg.t_min, np.full(R, cfg.t_max))
        lit = np.where(occ, 0.0, 1.0)[:, None]
        ndl = np.maximum(ndl_raw, 1e-4)
        cspec = ct_spec(view, np.broadcast_to(sd, (R, 3)), n, rough, m_spec,
                        min_nv=5.0, min_nl=1e-4)
        brdf = cspec + lam
        L = g["sun_color"][None] * g["sun_intensity"] * ndl[:, None] * cfg.sun_gain
        analytic += brdf * L * act
        shadowed += lit * brdf * L * act
        unshadowed += brdf * L * act

    vmask = valid.astype(np.float32)[:, None]
    return (analytic + base, shadowed + base, unshadowed + base,
            n * vmask, p * vmask)


def atrous_np(color, normal, position, step, c_phi, n_phi, p_phi):
    """One A-Trous pass, NumPy (denoise.comp main)."""
    h, w = color.shape[:2]
    acc = np.zeros_like(color)
    cum = np.zeros((h, w, 1), color.dtype)
    kernel = np.array([[1, 4, 7, 4, 1], [4, 16, 26, 16, 4], [7, 26, 41, 26, 7],
                       [4, 16, 26, 16, 4], [1, 4, 7, 4, 1]], np.float32)
    for ky in range(5):
        for kx in range(5):
            dy, dx = (ky - 2) * step, (kx - 2) * step
            cs = np.roll(color, (-dy, -dx), (0, 1))
            ns = np.roll(normal, (-dy, -dx), (0, 1))
            ps = np.roll(position, (-dy, -dx), (0, 1))
            yy = np.arange(h)[:, None] + dy
            xx = np.arange(w)[None, :] + dx
            ok = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(np.float32)
            dc = color - cs
            wc = np.minimum(np.exp(-np.sum(dc * dc, -1) / c_phi), 1.0)
            dn2 = normal - ns
            wn = np.minimum(np.exp(-(np.sum(dn2 * dn2, -1) / (step * step)) / n_phi), 1.0)
            dp = position - ps
            wp = np.minimum(np.exp(-np.sum(dp * dp, -1) / p_phi), 1.0)
            wgt = (wc * wn * wp * kernel[ky, kx] * ok)[..., None]
            acc += cs * wgt
            cum += wgt
    return acc / np.maximum(cum, 1e-5)


# ---------------------------------------------------------------------------
# multi-bounce wavefront reference (render/wavefront.py twin)
# ---------------------------------------------------------------------------
# Written from the same parity sources (phong.rchit:255-288 recursive
# reflection, cook-torrance.glsl:21-42 sampleGGX) with the shared
# counter-based RNG, so render_wavefront and this agree bit-for-bit in
# sampling decisions — the BASELINE config-4 golden oracle.

def sample_ggx_np(n, v, rough, r1, r2):
    a = rough * rough
    phi = 2.0 * PI * r1
    cos_t = np.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
    hx = np.cos(phi) * sin_t
    hy = np.sin(phi) * sin_t
    t = _norm(v - n * _dot(n, v)[..., None])
    b = np.cross(n, t)
    halfway = _norm(hx[..., None] * t + hy[..., None] * b
                    + cos_t[..., None] * n)
    return 2.0 * _dot(v, halfway)[..., None] * halfway - v


def cosine_hemisphere_np(n, r1, r2):
    phi = 2.0 * PI * r1
    cos_t = np.sqrt(1.0 - r2)
    sin_t = np.sqrt(r2)
    # np.where with two python floats yields float64 and would promote the
    # whole ray state (the f32 miss sentinel then misbehaves); stay f32.
    sign = np.where(n[..., 2] >= 0.0, np.float32(1.0), np.float32(-1.0))
    a = -1.0 / (sign + n[..., 2])
    bvec = n[..., 0] * n[..., 1] * a
    t = np.stack([1.0 + sign * n[..., 0] * n[..., 0] * a, sign * bvec,
                  -sign * n[..., 0]], axis=-1)
    b = np.stack([bvec, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    d = ((np.cos(phi) * sin_t)[..., None] * t
         + (np.sin(phi) * sin_t)[..., None] * b
         + cos_t[..., None] * n)
    return _norm(d)


def _sample_one_light_np(g, cfg, p, n, view, albedo, rough, metal, seed):
    """NEE: one uniform sample on one uniformly-chosen light triangle
    (+ the sun) — mirror of wavefront._sample_one_light."""
    from realtimeraytracer_tpu.ops.rng import hash_u32_np

    R = p.shape[0]
    lt = len(g["lt_v0"])
    lam = (1.0 - metal[:, None]) * albedo / PI
    f0 = 0.04 * (1.0 - metal[:, None]) + albedo * metal[:, None]

    li = (hash_u32_np(seed + np.uint64(7777)) % np.uint32(lt)).astype(np.int64)
    p0, p1, p2 = g["lt_v0"][li], g["lt_v1"][li], g["lt_v2"][li]
    lcol = g["lt_color"][li]
    lint = g["lt_intensity"][li][:, None]
    valid_l = g["lt_valid"][li]
    two = g["lt_two_sided"][li]

    r1 = uniform_np(seed + np.uint64(31))
    r2 = uniform_np(seed + np.uint64(131))
    over = r1 + r2 > 1.0
    r1 = np.where(over, 1.0 - r1, r1)
    r2 = np.where(over, 1.0 - r2, r2)
    lpos = p0 + r1[:, None] * (p1 - p0) + r2[:, None] * (p2 - p0)

    nl = np.cross(p2 - p1, p0 - p1)
    area = np.sqrt(np.maximum(_dot(nl, nl), 1e-20)) * 0.5
    nlu = _norm(nl)
    front = _dot(nlu, p - p0) >= 0.0
    active = valid_l & (two | front)

    delta = lpos - p
    dist = np.sqrt(np.maximum(_dot(delta, delta), 1e-20))
    ldir = delta / dist[:, None]
    so = p + n * cfg.shadow_origin_offset
    occ = trace_occluded(g, cfg, so.astype(np.float32), ldir.astype(np.float32),
                         cfg.t_min, dist - cfg.shadow_ray_margin)

    ndotl = np.maximum(_dot(n, ldir), 0.0)
    cos_on_light = np.abs(_dot(nlu, -ldir))
    pdf_sa = (dist * dist) / np.maximum(area * lt * cos_on_light, 1e-8)
    spec = ct_spec(view, ldir, n, rough, f0, min_nv=1e-3, min_nl=1e-3)
    brdf = spec + lam
    radiance = lcol * lint * cfg.sampled_gain
    contrib = brdf * radiance * (ndotl / np.maximum(pdf_sa, 1e-8))[:, None]
    contrib = np.where((active & ~occ & (ndotl > 0))[:, None], contrib, 0.0)

    sd = g["sun_direction"]
    sun_nl = _dot(n, sd[None])
    sun_occ = trace_occluded(g, cfg, so.astype(np.float32),
                             np.broadcast_to(sd, (R, 3)).astype(np.float32),
                             cfg.t_min, np.full(R, cfg.t_max))
    sun_spec = ct_spec(view, np.broadcast_to(sd, (R, 3)), n, rough, f0,
                       min_nv=1e-3, min_nl=1e-3)
    sun_c = ((sun_spec + lam) * g["sun_color"][None] * g["sun_intensity"]
             * cfg.sun_gain * np.maximum(sun_nl, 0.0)[:, None])
    contrib = contrib + np.where(
        ((sun_nl > 0) & ~sun_occ)[:, None] & (g["sun_intensity"] > 0),
        sun_c, 0.0)
    return contrib


def trace_paths_np(g, cfg, o, d, pixel_seed, sample_index=0):
    """One spp of full multi-bounce paths (wavefront.trace_paths twin)."""
    origins, dirs = o, d
    throughput = np.ones_like(o)
    radiance = np.zeros_like(o)
    alive = np.ones(o.shape[0], bool)

    for bounce in range(cfg.max_bounces + 1):
        bseed = (pixel_seed + np.uint64(bounce * 9176)
                 + np.uint64(sample_index * 15485863))
        t, prim, bu, bv = trace_closest(g, cfg, origins, dirs,
                                        cfg.t_min, cfg.t_max)
        s = _surface_np(g, cfg, origins, dirs, t, prim, bu, bv)
        radiance = radiance + np.where(alive[:, None],
                                       throughput * s["emit"], 0.0)
        still = alive & s["valid"]
        if bounce == cfg.max_bounces:
            break

        view = -dirs
        nee = _sample_one_light_np(g, cfg, s["p"], s["n"], view, s["albedo"],
                                   s["rough"], s["metal"], bseed)
        radiance = radiance + np.where(still[:, None], throughput * nee, 0.0)

        f0 = 0.04 * (1.0 - s["metal"][:, None]) + s["albedo"] * s["metal"][:, None]
        p_spec = np.clip(s["metal"] + (1.0 - s["rough"]) * 0.5, 0.05, 0.95)
        u_lobe = uniform_np(bseed + np.uint64(555))
        r1 = uniform_np(bseed + np.uint64(667))
        r2 = uniform_np(bseed + np.uint64(787))
        d_spec = sample_ggx_np(s["n"], view, np.maximum(s["rough"], 0.03),
                               r1, r2)
        d_diff = cosine_hemisphere_np(s["n"], r1, r2)
        choose_spec = u_lobe < p_spec
        new_dir = _norm(np.where(choose_spec[:, None], d_spec, d_diff))
        ndotl = _dot(s["n"], new_dir)
        going_up = ndotl > 1e-4

        weight = np.where(
            choose_spec[:, None],
            f0 / np.maximum(p_spec, 1e-3)[:, None],
            s["albedo"] * (1.0 - s["metal"][:, None])
            / np.maximum(1.0 - p_spec, 1e-3)[:, None])
        origins = s["p"] + s["n"] * cfg.shadow_origin_offset
        dirs = new_dir
        throughput = throughput * np.where(still[:, None], weight, 1.0)
        alive = still & going_up
    return radiance


def render_wavefront_reference(scene: Scene, cfg, frame_index: int = 0):
    """Multi-bounce render -> tonemapped (H, W, 3); render_wavefront twin."""
    if getattr(cfg, "alpha_test", None) is None:
        cfg = cfg.replace(alpha_test=any(
            m.material.opacity_map is not None for m in scene.meshes))
    gpu = scene.compile()
    g = {k: np.asarray(v) for k, v in gpu._asdict().items()}
    h, w = cfg.height, cfg.width
    fr = scene.camera.viewport_frame_np(w, h)
    pos, top_left, h_delta, v_delta = (x.astype(np.float64) for x in fr)

    px, py = np.meshgrid(np.arange(w), np.arange(h))
    pixel_seed = (px.astype(np.uint64) * 733 + py.astype(np.uint64) * 1933
                  + np.uint64(frame_index)).reshape(-1)

    acc = np.zeros((h * w, 3), np.float32)
    for s in range(cfg.primary_rays):
        if cfg.jitter:
            base = (py.astype(np.uint64) * w + px.astype(np.uint64)).reshape(-1)
            jx = uniform_np(base + np.uint64(s))
            jy = uniform_np(base + np.uint64(s) * np.uint64(322) + np.uint64(7919))
        else:
            jx = jy = 0.5
        ox = px.reshape(-1) + jx - 0.5
        oy = py.reshape(-1) + jy - 0.5
        world = (top_left[None] + ox[:, None] * h_delta[None]
                 + oy[:, None] * v_delta[None])
        d = _norm(world - pos[None]).astype(np.float32)
        o = np.broadcast_to(pos.astype(np.float32), d.shape)
        acc += trace_paths_np(g, cfg, o, d, pixel_seed, s)

    img = tonemap_np(acc / cfg.primary_rays, cfg.tonemap, cfg.gamma)
    return img.reshape(h, w, 3)
