"""Fused Pallas A-Trous denoiser: both stochastic images in one kernel.

The XLA stencil formulation (ops/denoise.py) materializes per-tap
intermediates through HBM — measured ~77 ms for the 4x2-iteration 1080p
denoise+combine inside the frame.  This kernel keeps a row-tile of all
twelve planes (shadowed rgb, unshadowed rgb, normal, position) resident
in VMEM and evaluates all 25 dilated taps as statically-shifted slices,
sharing the normal/position edge-stopping weights between the two images
(denoise.comp runs twice per iteration with identical n/p weights).

Out-of-bounds taps are skipped by PADDING the position plane with 1e10:
wp = exp(-|dp|^2/p_phi) underflows to exactly 0.0f, reproducing the XLA
path's validity mask bit-for-bit (w == 0.0).

Math matches ops/denoise.atrous_iteration term-for-term (same op
association); outputs agree with the XLA path to a few f32 ulp (FMA
contraction differs between compilation contexts) — pinned by
tests/test_denoise_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtimeraytracer_tpu.ops.denoise import _KERNEL

F32 = jnp.float32
TH = 8               # output rows per grid step (multiple of 8; small
                     # keeps the unrolled 25-tap live set inside the
                     # 16 MB scoped-VMEM stack)
PH = 8               # fixed halo: >= 2*step for steps 1..4, and keeps the
                     # DMA'd row window (TH + 2*PH) aligned to the (8, 128)
                     # f32 tile (Mosaic rejects unaligned memref slices)
PAD_POS = 1.0e10     # position pad: exp(-1e20/phi) == 0.0f == OOB skip


def _iter_kernel(inp_ref, out_ref, tile, otile, sem, osem, *, th, w,
                 step, c_phi, n_phi, p_phi):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        inp_ref.at[:, pl.ds(i * th, th + 2 * PH), :], tile, sem)
    copy.start()
    copy.wait()

    inv_step2 = 1.0 / float(step * step)

    def plane(k, dy, dx):
        return tile[k, PH + dy:PH + dy + th, PH + dx:PH + dx + w]

    c_s = [plane(k, 0, 0) for k in range(3)]
    c_u = [plane(3 + k, 0, 0) for k in range(3)]
    nrm = [plane(6 + k, 0, 0) for k in range(3)]
    pos = [plane(9 + k, 0, 0) for k in range(3)]

    acc_s = [jnp.zeros((th, w), F32) for _ in range(3)]
    acc_u = [jnp.zeros((th, w), F32) for _ in range(3)]
    cum_s = jnp.zeros((th, w), F32)
    cum_u = jnp.zeros((th, w), F32)

    for ky in range(5):
        for kx in range(5):
            dy = (ky - 2) * step
            dx = (kx - 2) * step
            k = float(_KERNEL[ky, kx])
            cs = [plane(kk, dy, dx) for kk in range(3)]
            cu = [plane(3 + kk, dy, dx) for kk in range(3)]
            ns = [plane(6 + kk, dy, dx) for kk in range(3)]
            ps = [plane(9 + kk, dy, dx) for kk in range(3)]

            def sq3(a, b):
                d0 = a[0] - b[0]
                d1 = a[1] - b[1]
                d2 = a[2] - b[2]
                return (d0 * d0 + d1 * d1) + d2 * d2

            w_cs = jnp.minimum(jnp.exp(-sq3(c_s, cs) / c_phi), 1.0)
            w_cu = jnp.minimum(jnp.exp(-sq3(c_u, cu) / c_phi), 1.0)
            w_n = jnp.minimum(
                jnp.exp(-(sq3(nrm, ns) * inv_step2) / n_phi), 1.0)
            w_p = jnp.minimum(jnp.exp(-sq3(pos, ps) / p_phi), 1.0)
            wnp = w_n * w_p * k
            ws = w_cs * wnp
            wu = w_cu * wnp
            for kk in range(3):
                acc_s[kk] = acc_s[kk] + cs[kk] * ws
                acc_u[kk] = acc_u[kk] + cu[kk] * wu
            cum_s = cum_s + ws
            cum_u = cum_u + wu

    den_s = jnp.maximum(cum_s, 1e-5)
    den_u = jnp.maximum(cum_u, 1e-5)
    for kk in range(3):
        otile[kk] = acc_s[kk] / den_s
        otile[3 + kk] = acc_u[kk] / den_u
    # Outputs stay in HBM (XLA would otherwise scope the full frame's
    # result tensors into VMEM and blow the 16 MB scoped limit).
    out = pltpu.make_async_copy(otile, out_ref.at[:, pl.ds(i * th, th), :],
                                osem)
    out.start()
    out.wait()


def _atrous_pair_iteration(shadowed, unshadowed, normal, position, step,
                           c_phi, n_phi, p_phi, interpret):
    h, w = shadowed.shape[0], shadowed.shape[1]
    hp = -(-h // TH) * TH
    planes = jnp.stack([
        shadowed[..., 0], shadowed[..., 1], shadowed[..., 2],
        unshadowed[..., 0], unshadowed[..., 1], unshadowed[..., 2],
        normal[..., 0], normal[..., 1], normal[..., 2],
        position[..., 0], position[..., 1], position[..., 2],
    ])                                               # (12, H, W)
    pad_vals = jnp.array([0.0] * 9 + [PAD_POS] * 3, F32)[:, None, None]
    # Lane extent must be a multiple of the 128-lane tile (Mosaic DMA
    # window alignment), rows a multiple of 8 — both via padding.  The
    # output width is lane-padded for the same reason (sliced off after).
    wo = -(-w // 128) * 128
    wp = -(-(wo + 2 * PH) // 128) * 128
    inp = jnp.full((12, hp + 2 * PH, wp), 1.0, F32) * pad_vals
    inp = jax.lax.dynamic_update_slice(inp, planes, (0, PH, PH))

    kern = functools.partial(_iter_kernel, th=TH, w=wo, step=step,
                             c_phi=float(c_phi), n_phi=float(n_phi),
                             p_phi=float(p_phi))
    outs = pl.pallas_call(
        kern,
        grid=(hp // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        # pltpu.ANY lets XLA choose — and it chooses scoped VMEM for the
        # full-frame result (32 MB > the 16 MB scoped limit).  Pin HBM.
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((6, hp, wo), F32),
        scratch_shapes=[
            pltpu.VMEM((12, TH + 2 * PH, wp), F32),
            pltpu.VMEM((6, TH, wo), F32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(inp)
    s_out = jnp.stack([outs[k, :h, :w] for k in range(3)], axis=-1)
    u_out = jnp.stack([outs[3 + k, :h, :w] for k in range(3)], axis=-1)
    return s_out, u_out


def atrous_denoise_pair(shadowed, unshadowed, normal, position,
                        iterations: int = 4, c_phi: float = 1.0,
                        n_phi: float = 0.001, p_phi: float = 0.001,
                        interpret: bool | None = None):
    """Denoise BOTH stochastic images (application.cppm:395-434 runs the
    same filter twice per iteration).  Returns (shadowed', unshadowed')."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, u = shadowed, unshadowed
    for i in range(iterations):
        s, u = _atrous_pair_iteration(s, u, normal, position, i + 1,
                                      c_phi, n_phi, p_phi, interpret)
    return s, u
