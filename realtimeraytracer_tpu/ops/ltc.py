"""Linearly Transformed Cosines: analytic polygonal-light integration.

Behavioral parity with the reference's LTC evaluation (shaders/LTC.glsl:
IntegrateEdgeVec :2-14, LTC_Evaluate :16-69) and its LUT usage in ray
generation (raygen.rgen:143-157: uv = (roughness, sqrt(1-NdotV)) scaled by
LUT_SCALE/LUT_BIAS; Minv assembled from ltc1; Fresnel weights from ltc2.xy;
horizon-clipped form factor from ltc2.w).

The technique is Heitz et al., "Real-Time Polygonal-Light Shading with
Linearly Transformed Cosines" (SIGGRAPH 2016); the 64x64 tables are the
public fits shipped with that work (see scripts/extract_ltc_luts.py).

TPU-first shape discipline: everything is batched (R rays x LT light
triangles) with pure elementwise math + two bilinear LUT gathers per shade —
no per-polygon control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from realtimeraytracer_tpu.ops.texture import (
    pack_bilinear_neighbors, sample_bilinear_packed)
from realtimeraytracer_tpu.ops.vecmath import cross, dot, normalize

LUT_SIZE = 64.0
LUT_SCALE = (LUT_SIZE - 1.0) / LUT_SIZE
LUT_BIAS = 0.5 / LUT_SIZE


def ltc_lut_coords(roughness: jnp.ndarray, ndotv: jnp.ndarray):
    """LUT (u, v) from roughness and N.V (raygen.rgen:143-145)."""
    u = roughness * LUT_SCALE + LUT_BIAS
    v = jnp.sqrt(jnp.maximum(1.0 - ndotv, 0.0)) * LUT_SCALE + LUT_BIAS
    return u, v


def upsample4(tbl: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 4x upsample of a (64, 64, C) LUT -> (256, 256, C).

    TPU gathers cost ~10 ms per 2M rays and bilinear needs 4 of them;
    a nearest fetch from a 4x-presampled table needs ONE, with error
    bounded by the fit's curvature over a quarter texel (~1e-3 — below
    the LTC fit error itself).  Static per scene; XLA hoists it.
    """
    import jax

    return jax.image.resize(tbl, (256, 256, tbl.shape[-1]), method="linear")


def sample_nearest(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Clamped nearest-texel fetch of (H, W, C) at normalized (u, v)."""
    h, w = image.shape[0], image.shape[1]
    xi = jnp.clip(jnp.floor(u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(v * h).astype(jnp.int32), 0, h - 1)
    return image[yi, xi]


def fetch_ltc_params(ltc1: jnp.ndarray, ltc2: jnp.ndarray,
                     roughness: jnp.ndarray, ndotv: jnp.ndarray,
                     fast: bool = False):
    """Sample both LUTs; returns (minv scalars, t2 (...,4)).

    Minv = [[a,0,b],[0,1,0],[c,0,d]] from ltc1 = (a,b,c,d)
    (raygen.rgen:148-157; note GLSL mat3 columns == our rows transposed —
    the GLSL constructor builds columns, so Minv[row][col] maps as below).

    Both tables are fetched through ONE packed (64, 64, 8) gather per
    bilinear corner (wide-row gathers cost the same as narrow ones on
    TPU); fast=True swaps in the one-gather upsampled-nearest path.
    """
    u, v = ltc_lut_coords(roughness, ndotv)
    both = jnp.concatenate([ltc1, ltc2], axis=-1)      # (64, 64, 8)
    if fast:
        t = sample_nearest(upsample4(both), u, v)
    else:
        # Neighborhood-packed bilinear: ONE R-sized gather instead of four
        # (exact; the pack is a tiny static shuffle XLA hoists/CSEs).
        t = sample_bilinear_packed(pack_bilinear_neighbors(both), u, v)
    t1, t2 = t[..., 0:4], t[..., 4:8]
    # Minv is sparse — GLSL mat3(vec3(a,0,b), vec3(0,1,0), vec3(c,0,d)),
    # i.e. rows [[a,0,c],[0,1,0],[b,0,d]].  Return the 4 scalars instead of
    # materializing (R,3,3) tensors: tiny-trailing-dim tensors get
    # catastrophic (50x) layout padding on TPU.
    return (t1[..., 0], t1[..., 1], t1[..., 2], t1[..., 3]), t2


def integrate_edge_vec(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Cubic fit to the vector edge integral (LTC.glsl:2-14)."""
    x = dot(v1, v2)
    y = jnp.abs(x)
    a = 0.8543985 + (0.4965155 + 0.0145206 * y) * y
    b = 3.4175940 + (4.1616724 + y) * y
    v = a / b
    neg = 0.5 * jax_rsqrt(jnp.maximum(1.0 - x * x, 1e-7)) - v
    theta_sintheta = jnp.where(x > 0.0, v, neg)
    return cross(v1, v2) * theta_sintheta[..., None]


def jax_rsqrt(x):
    return jnp.reciprocal(jnp.sqrt(x))


def ltc_evaluate(
    n: jnp.ndarray,           # (..., 3) shading normal
    view: jnp.ndarray,        # (..., 3) unit view dir (to camera)
    p: jnp.ndarray,           # (..., 3) shading point
    minv,                     # (a, b, c, d) scalars (see fetch_ltc_params),
                              # or None for the identity (diffuse) case
    p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,  # (..., 3) light tri (world)
    light_normal: jnp.ndarray,  # (..., 3) unit geometric normal of the tri
    two_sided: jnp.ndarray,   # (...,) bool
    ltc2: jnp.ndarray,        # (64, 64, 4) for the horizon-clip form factor
    fast: bool = False,       # one-gather upsampled-nearest LUT fetch
) -> jnp.ndarray:
    """Scalar polygon irradiance (LTC.glsl:16-69). Broadcasts batch dims.

    Keeps the reference's (quirkily named) sidedness logic verbatim:
    `behind = dot(p0 - P, lightNormal) < 0` is TRUE when P is on the *front*
    side; the z flip and the one-sided zeroing (!behind && !twoSided -> 0)
    follow it exactly.

    Minv's sparsity ([[a,0,c],[0,1,0],[b,0,d]]) is exploited so the
    world->cosine transform is pure vector FMAs — (R,3,3) matmul tensors
    suffer ~50x layout padding on TPU.
    """
    t1 = normalize(view - n * dot(view, n)[..., None])
    t2v = cross(n, t1)

    # Rows of (Minv * transpose(mat3(T1,T2,N))):
    #   row0 = a*T1 + c*N ; row1 = T2 ; row2 = b*T1 + d*N   (identity:
    #   rows are T1, T2, N).
    if minv is None:
        r0, r1r, r2r = t1, t2v, n
    else:
        a, b, c, d = (x[..., None] for x in minv)
        r0 = a * t1 + c * n
        r1r = t2v
        r2r = b * t1 + d * n

    def xform(q):
        dq = q - p
        return normalize(jnp.stack(
            [dot(r0, dq), dot(r1r, dq), dot(r2r, dq)], axis=-1))

    l0 = xform(p0)
    l1 = xform(p1)
    l2 = xform(p2)

    behind = dot(p0 - p, light_normal) < 0.0

    vsum = (
        integrate_edge_vec(l0, l1)
        + integrate_edge_vec(l1, l2)
        + integrate_edge_vec(l2, l0)
    )
    length = jnp.sqrt(jnp.maximum(dot(vsum, vsum), 1e-20))
    z = vsum[..., 2] / length
    z = jnp.where(behind, -z, z)

    u = (z * 0.5 + 0.5) * LUT_SCALE + LUT_BIAS
    v = length * LUT_SCALE + LUT_BIAS
    if fast:
        scale = sample_nearest(upsample4(ltc2), u, v)[..., 3]
    else:
        # One-gather bilinear of just the .w channel (packed 2x2 footprint).
        scale = sample_bilinear_packed(
            pack_bilinear_neighbors(ltc2[..., 3:4]), u, v)[..., 0]

    total = length * scale
    total = jnp.where(jnp.logical_and(~behind, ~two_sided), 0.0, total)
    return total
