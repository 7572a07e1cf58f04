"""BRDF math: GGX Cook-Torrance microfacet model + Lambert diffuse.

Behavioral parity with the reference's shader library
(shaders/cook-torrance.glsl): GGX normal distribution (:12-19), the
Smith-style partial geometry term (:44-51), Schlick Fresnel (:59-62), and the
diffuse/specular base-color split used in raygen.rgen:135-139
(mDiffuse = (1-metallic)*albedo, F0 = mix(0.04, albedo, metallic)).

All functions broadcast over leading batch dims; vectors are (..., 3) f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from realtimeraytracer_tpu.ops.vecmath import dot, mix, normalize

PI = 3.14159265359


def chi(x):
    """Positive-hemisphere indicator."""
    return jnp.where(x > 0.0, 1.0, 0.0)


def ggx_distribution(n, h, alpha):
    """GGX/Trowbridge-Reitz NDF, alpha = roughness (reference convention:
    alpha is the raw roughness, cook-torrance.glsl:12)."""
    noh = dot(n, h)
    a2 = alpha * alpha
    noh2 = noh * noh
    den = jnp.maximum(noh2 * a2 + (1.0 - noh2), 1e-3)
    return chi(noh) * a2 / (PI * den * den)


def ggx_partial_geometry(v, n, h, alpha):
    """One-direction Smith-style geometry term (cook-torrance.glsl:44-51)."""
    voh = jnp.clip(dot(v, h), 1e-3, 1.0)
    c = chi(voh / jnp.clip(dot(v, n), 1e-3, 1.0))
    voh2 = voh * voh
    tan2 = (1.0 - voh2) / voh2
    return c * 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))


def fresnel_schlick(cos_t, f0):
    """Schlick's approximation; f0 is (..., 3)."""
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_t, 0.0, 1.0), 5.0)[..., None]


def base_color_split(albedo, metallic):
    """(diffuse_color, F0) from albedo+metallic (raygen.rgen:135-136)."""
    m = metallic[..., None]
    diffuse = (1.0 - m) * albedo
    f0 = mix(jnp.full_like(albedo, 0.04), albedo, m)
    return diffuse, f0


def cook_torrance_specular(view, light, normal, roughness, f0,
                           min_ndotv=0.1, min_ndotl=0.1):
    """Cook-Torrance specular lobe D*F*G / (4 NdotV NdotL).

    The clamp floors default to the reference's area-light path values
    (raygen.rgen:255-256); its sun path uses (5.0, 1e-4) (:322-323) which a
    caller can pass explicitly to reproduce that (quirky) behavior.
    """
    h = normalize(view + light)
    cos_theta = jnp.clip(dot(view, h), 0.0, 1.0)
    d = ggx_distribution(normal, h, roughness)
    g = ggx_partial_geometry(view, normal, h, roughness) * ggx_partial_geometry(
        light, normal, h, roughness
    )
    f = fresnel_schlick(cos_theta, f0)
    ndotv = jnp.maximum(dot(normal, view), min_ndotv)
    ndotl = jnp.maximum(dot(normal, light), min_ndotl)
    return (d * g / (4.0 * ndotv * ndotl))[..., None] * f


def lambert_diffuse(albedo, metallic):
    """Lambert term (1-metallic)*albedo/pi (raygen.rgen:258)."""
    return (1.0 - metallic[..., None]) * albedo / PI


def sample_ggx(n, v, roughness, r1, r2):
    """GGX importance-sampled reflection direction (cook-torrance.glsl:21-42).

    Used by the multi-bounce wavefront path (the reference's legacy
    phong.rchit:255-288 recursive reflection uses the same sampler).
    """
    a = roughness * roughness
    phi = 2.0 * PI * r1
    cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    hx = jnp.cos(phi) * sin_t
    hy = jnp.sin(phi) * sin_t

    t = normalize(v - n * dot(n, v)[..., None])
    b = jnp.cross(n, t)
    halfway = normalize(
        hx[..., None] * t + hy[..., None] * b + cos_t[..., None] * n
    )
    return 2.0 * dot(v, halfway)[..., None] * halfway - v


def cosine_hemisphere(n, r1, r2):
    """Cosine-weighted hemisphere sample around n (for diffuse bounces)."""
    phi = 2.0 * PI * r1
    cos_t = jnp.sqrt(1.0 - r2)
    sin_t = jnp.sqrt(r2)
    # Build an orthonormal basis around n (branchless Frisvad-style).
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    bvec = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * bvec, -sign * n[..., 0]],
        axis=-1,
    )
    b = jnp.stack([bvec, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    d = (
        (jnp.cos(phi) * sin_t)[..., None] * t
        + (jnp.sin(phi) * sin_t)[..., None] * b
        + cos_t[..., None] * n
    )
    return normalize(d)
