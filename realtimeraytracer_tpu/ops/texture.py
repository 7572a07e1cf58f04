"""Bilinear texture sampling (single maps, padded atlases, equirect HDRI).

Replaces the reference's sampler2D machinery (linear filtering + repeat
addressing, vulkan/memory/image_sampler.cppm:11-51; runtime-indexed texture
arrays, raygen.rgen:28).  On TPU a texture fetch is a vectorized gather:
four corner gathers + lerp on the VPU.  Atlases are padded (T, S, S, 4)
stacks with per-texture true sizes so wrap math uses the real extent.
"""

from __future__ import annotations

import jax.numpy as jnp

from realtimeraytracer_tpu.ops.vecmath import normalize

TWO_PI = 6.28318530718
PI = 3.14159265359


def _wrap(i: jnp.ndarray, n) -> jnp.ndarray:
    """Repeat addressing: floor-mod into [0, n)."""
    return jnp.mod(i, n)


def sample_bilinear(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                    wrap: bool = True) -> jnp.ndarray:
    """Sample (H, W, C) at normalized (u, v) with GL half-texel convention.

    u along width, v along height; texel centers at (i+0.5)/N.  wrap=True is
    repeat addressing (the reference sampler), wrap=False clamps (LUTs).
    Returns (..., C).
    """
    h, w = image.shape[0], image.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    if wrap:
        xi0, xi1 = _wrap(x0, w), _wrap(x0 + 1, w)
        yi0, yi1 = _wrap(y0, h), _wrap(y0 + 1, h)
    else:
        xi0, xi1 = jnp.clip(x0, 0, w - 1), jnp.clip(x0 + 1, 0, w - 1)
        yi0, yi1 = jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)
    c00 = image[yi0, xi0]
    c01 = image[yi0, xi1]
    c10 = image[yi1, xi0]
    c11 = image[yi1, xi1]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def pack_bilinear_neighbors(image: jnp.ndarray, wrap: bool = False) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C) where each texel carries its 2x2 bilinear
    footprint [c00 | c01 | c10 | c11].

    TPU gathers cost ~10-40 ms per 2M rays REGARDLESS of row width
    (PERF.md), so one wide gather from the packed table replaces
    sample_bilinear's four — bit-identical results for in-range coords
    (LUT coords never floor below 0, and at the top edge the x+1/y+1
    mismatch is multiplied by a zero fraction).  The pack itself is four
    shifts of a tiny table — negligible next to one R-sized gather.
    """
    if wrap:
        right = jnp.roll(image, -1, axis=1)
        down = jnp.roll(image, -1, axis=0)
        diag = jnp.roll(down, -1, axis=1)
    else:
        right = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
        down = jnp.concatenate([image[1:], image[-1:]], axis=0)
        diag = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([image, right, down, diag], axis=-1)


def sample_bilinear_packed(packed: jnp.ndarray, u: jnp.ndarray,
                           v: jnp.ndarray, wrap: bool = False) -> jnp.ndarray:
    """Bilinear sample from a pack_bilinear_neighbors table: ONE gather.

    Matches sample_bilinear's math exactly (same lerp order)."""
    h, w = packed.shape[0], packed.shape[1]
    c = packed.shape[2] // 4
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    if wrap:
        xi0 = _wrap(x0, w)
        yi0 = _wrap(y0, h)
    else:
        xi0 = jnp.clip(x0, 0, w - 1)
        yi0 = jnp.clip(y0, 0, h - 1)
    g = packed[yi0, xi0]                      # (..., 4C) one gather
    c00, c01 = g[..., 0:c], g[..., c:2 * c]
    c10, c11 = g[..., 2 * c:3 * c], g[..., 3 * c:4 * c]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_atlas(atlas: jnp.ndarray, sizes: jnp.ndarray, tex_id: jnp.ndarray,
                 u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample a padded (T, S, S, 4) atlas at per-ray (tex_id, u, v).

    tex_id < 0 is allowed (callers select constants afterwards); it is
    clamped to 0 for the gather.  Repeat addressing over each texture's true
    (h, w).  Returns (..., 4).
    """
    tid = jnp.clip(tex_id, 0, atlas.shape[0] - 1)
    hw = sizes[tid].astype(jnp.float32)          # (..., 2) as (h, w)
    h, w = hw[..., 0], hw[..., 1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    xi0, xi1 = _wrap(x0, wi), _wrap(x0 + 1, wi)
    yi0, yi1 = _wrap(y0, hi), _wrap(y0 + 1, hi)
    c00 = atlas[tid, yi0, xi0]
    c01 = atlas[tid, yi0, xi1]
    c10 = atlas[tid, yi1, xi0]
    c11 = atlas[tid, yi1, xi1]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_equirect(hdri: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular environment lookup by world direction.

    Parity with the miss shader (shaders/miss.rmiss:21-26):
    u = atan2(z, x)/2pi + 0.5, v = 1 - acos(y)/pi, bilinear fetch, then
    sRGB->linear decode is left to the caller.
    """
    d = normalize(dirs)
    u = jnp.arctan2(d[..., 2], d[..., 0]) / TWO_PI + 0.5
    v = 1.0 - jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / PI
    return sample_bilinear(hdri, u, v, wrap=True)


# ---------------------------------------------------------------------------
# mip-mapped atlas (image_sampler.cppm:11-51 parity: the reference samples
# with a full mip chain + linear filtering; anisotropy is approximated by
# the isotropic footprint here)
# ---------------------------------------------------------------------------

def build_mip_atlas_np(atlas, sizes):
    """Box-filtered mip chain of a padded (T, S, S, 4) atlas, packed into
    ONE (T, 2S, S, 4) array: level k occupies rows [2S(1-2^-k),
    2S(1-2^-k) + S/2^k) — STATIC per-level row offsets independent of each
    texture's true size.  Per-texture level-k content fills the top-left
    (ceil(h/2^k), ceil(w/2^k)) of its level tile.  Runs once at compile
    (NumPy).  Returns (mip_atlas, num_levels)."""
    import numpy as np

    t, s = atlas.shape[0], atlas.shape[1]
    if t == 0:
        return np.zeros((0, 2 * s, s, 4), np.float32), 1
    levels = 1
    while (s >> levels) >= 1:
        levels += 1
    out = np.zeros((t, 2 * s, s, 4), np.float32)
    out[:, :s, :, :] = atlas
    for ti in range(t):
        h, w = int(sizes[ti, 0]), int(sizes[ti, 1])
        cur = atlas[ti, :h, :w, :]
        for k in range(1, levels):
            nh, nw = max(1, (h + 1) // 2), max(1, (w + 1) // 2)
            # 2x2 box filter with edge clamp for odd dims.
            padded = np.pad(cur, ((0, cur.shape[0] % 2), (0, cur.shape[1] % 2),
                                  (0, 0)), mode="edge")
            cur = 0.25 * (padded[0::2, 0::2] + padded[1::2, 0::2]
                          + padded[0::2, 1::2] + padded[1::2, 1::2])
            h, w = nh, nw
            y_off = 2 * s - (2 * s >> k)
            out[ti, y_off:y_off + h, :w, :] = cur
    return out, levels


def _sample_atlas_level(mip_atlas, sizes, tex_id, u, v, k):
    """Bilinear fetch at integer mip level k (per-ray int32 array)."""
    s = mip_atlas.shape[2]
    tid = jnp.clip(tex_id, 0, max(mip_atlas.shape[0] - 1, 0))
    hw = sizes[tid]
    h = jnp.maximum(hw[..., 0] >> k, 1).astype(jnp.float32)
    w = jnp.maximum(hw[..., 1] >> k, 1).astype(jnp.float32)
    y_off = (2 * s) - ((2 * s) >> k)
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wi, hi = w.astype(jnp.int32), h.astype(jnp.int32)
    xi0, xi1 = _wrap(x0, wi), _wrap(x0 + 1, wi)
    yi0, yi1 = _wrap(y0, hi) + y_off, _wrap(y0 + 1, hi) + y_off
    c00 = mip_atlas[tid, yi0, xi0]
    c01 = mip_atlas[tid, yi0, xi1]
    c10 = mip_atlas[tid, yi1, xi0]
    c11 = mip_atlas[tid, yi1, xi1]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_atlas_mip(mip_atlas, sizes, num_levels, tex_id, u, v, lod,
                     packed=None):
    """Trilinear (mip-interpolated bilinear) atlas sample.

    lod: per-ray float level-of-detail (0 = base).  Clamped to the chain;
    two level fetches + lerp, matching GPU trilinear filtering.  packed:
    optional pack_mip_atlas_neighbors_np twin — ONE gather per level
    instead of four, bit-identical."""
    lod = jnp.clip(lod, 0.0, float(num_levels - 1))
    k0 = jnp.floor(lod).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, num_levels - 1)
    f = (lod - k0.astype(jnp.float32))[..., None]
    if packed is not None:
        c0 = _sample_atlas_level_packed(packed, sizes, tex_id, u, v, k0)
        c1 = _sample_atlas_level_packed(packed, sizes, tex_id, u, v, k1)
    else:
        c0 = _sample_atlas_level(mip_atlas, sizes, tex_id, u, v, k0)
        c1 = _sample_atlas_level(mip_atlas, sizes, tex_id, u, v, k1)
    return c0 * (1.0 - f) + c1 * f


def sample_atlas_aniso(mip_atlas, sizes, num_levels, tex_id, u, v,
                       lod_minor, duv_half, taps: int, packed=None):
    """Anisotropic mip sample: `taps` trilinear fetches spread along the
    footprint's MAJOR axis, each at the MINOR-axis LOD.

    image_sampler.cppm:11-51 parity upgrade: the reference samples with
    maxAnisotropy; the isotropic path must blur to the major-axis extent
    at grazing angles, while this keeps the minor-axis sharpness and
    covers the major extent with discrete taps (the classic N-tap
    approximation of EWA).  duv_half: (..., 2) HALF major-axis vector in
    uv space; taps static (each tap costs a trilinear fetch = 2 gathers,
    so 2-4 taps is the practical TPU range).
    """
    if taps <= 1:
        return sample_atlas_mip(mip_atlas, sizes, num_levels, tex_id, u, v,
                                lod_minor, packed=packed)
    acc = None
    for i in range(taps):
        c = (2.0 * (i + 0.5) / taps) - 1.0
        ci = sample_atlas_mip(mip_atlas, sizes, num_levels, tex_id,
                              u + c * duv_half[..., 0],
                              v + c * duv_half[..., 1], lod_minor,
                              packed=packed)
        acc = ci if acc is None else acc + ci
    return acc * (1.0 / taps)


# ---------------------------------------------------------------------------
# Packed-neighborhood atlases: ONE gather per bilinear fetch
# ---------------------------------------------------------------------------

def pack_atlas_neighbors_np(atlas, sizes):
    """(T, S, S, 4) atlas -> (T, S, S, 16) where each texel carries its
    2x2 bilinear footprint [c00 | c01 | c10 | c11] with each texture's
    TRUE-extent repeat wrap baked in.

    TPU gathers cost ~10-40 ms per 2M rays regardless of row width
    (PERF.md): sample_atlas pays FOUR corner gathers per fetch, and the
    textured flagship frame pays fetches in resolve (x3 channels), the
    alpha ladder (per re-trace round) and the mip path — packing turns
    each into ONE wide gather, bit-identically (same corners, same lerp
    order).  Runs once at scene compile (NumPy)."""
    import numpy as np

    t, s = atlas.shape[0], atlas.shape[1]
    out = np.zeros((t, s, s, 16), np.float32)
    for ti in range(t):
        h, w = int(sizes[ti, 0]), int(sizes[ti, 1])
        a = atlas[ti, :h, :w]
        xr = (np.arange(w) + 1) % w
        yd = (np.arange(h) + 1) % h
        out[ti, :h, :w] = np.concatenate(
            [a, a[:, xr], a[yd, :], a[yd][:, xr]], axis=-1)
    return out


def pack_mip_atlas_neighbors_np(mip_atlas, sizes, num_levels):
    """Packed twin of the (T, 2S, S, 4) mip atlas: per LEVEL true-extent
    wrap, same static per-level row offsets."""
    import numpy as np

    t, s2, s = mip_atlas.shape[0], mip_atlas.shape[1], mip_atlas.shape[2]
    out = np.zeros((t, s2, s, 16), np.float32)
    for ti in range(t):
        for k in range(num_levels):
            h = max(1, int(sizes[ti, 0]) >> k)
            w = max(1, int(sizes[ti, 1]) >> k)
            y_off = s2 - (s2 >> k)
            a = mip_atlas[ti, y_off:y_off + h, :w]
            xr = (np.arange(w) + 1) % w
            yd = (np.arange(h) + 1) % h
            out[ti, y_off:y_off + h, :w] = np.concatenate(
                [a, a[:, xr], a[yd, :], a[yd][:, xr]], axis=-1)
    return out


def sample_atlas_packed(packed, sizes, tex_id, u, v):
    """sample_atlas from a pack_atlas_neighbors_np table: ONE gather,
    bit-identical lerp."""
    tid = jnp.clip(tex_id, 0, packed.shape[0] - 1)
    hw = sizes[tid].astype(jnp.float32)
    h, w = hw[..., 0], hw[..., 1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    xi0 = _wrap(x0f.astype(jnp.int32), w.astype(jnp.int32))
    yi0 = _wrap(y0f.astype(jnp.int32), h.astype(jnp.int32))
    g = packed[tid, yi0, xi0]
    c00, c01 = g[..., 0:4], g[..., 4:8]
    c10, c11 = g[..., 8:12], g[..., 12:16]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def _sample_atlas_level_packed(packed, sizes, tex_id, u, v, k):
    """_sample_atlas_level from the packed mip twin: ONE gather."""
    s = packed.shape[2]
    tid = jnp.clip(tex_id, 0, max(packed.shape[0] - 1, 0))
    hw = sizes[tid]
    h = jnp.maximum(hw[..., 0] >> k, 1).astype(jnp.float32)
    w = jnp.maximum(hw[..., 1] >> k, 1).astype(jnp.float32)
    y_off = (2 * s) - ((2 * s) >> k)
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    xi0 = _wrap(x0f.astype(jnp.int32), w.astype(jnp.int32))
    yi0 = _wrap(y0f.astype(jnp.int32), h.astype(jnp.int32)) + y_off
    g = packed[tid, yi0, xi0]
    c00, c01 = g[..., 0:4], g[..., 4:8]
    c10, c11 = g[..., 8:12], g[..., 12:16]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
