"""Render configuration.

The reference hard-codes every knob as a source constant (SURVEY.md §5.6:
window 1920x1080 at src/main.cpp:9, NUM_PRIMARY_RAYS=4 / NUM_SHADOW_RAYS=3 at
src/shaders/raygen.rgen:8-9, NUM_DENOISING_ITERATIONS=4 / DENOISING_STRENGTH=1
at src/app/application.cppm:497-501).  Here they are a real config dataclass,
hashable so it can be a static argument to jit.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All render-time knobs (static under jit)."""

    width: int = 1920
    height: int = 1080

    # Sampling (reference: raygen.rgen:8-9).
    primary_rays: int = 4           # jittered primary rays (spp)
    jitter: bool = True             # sub-pixel jitter (off for golden tests)
    # Shadow samples per light-triangle per spp.  3 is reference parity;
    # 2 is the measured near-parity fast preset: SSIM vs a 48-sample
    # converged frame is 0.9603 vs 0.9623 at 3 (PERF.md r4), for ~19%
    # less frame time — the r4 quality study found the reference's phi
    # defaults already optimal, so LOWER sampling, not stronger
    # denoising, is the honest speed knob.
    shadow_rays: int = 3            # shadow samples per light-triangle per spp
    # Wavefront path-trace depth.  The reference's ACTIVE pipeline traces
    # exactly one surface bounce per primary ray (raygen.rgen dispatches
    # shadow rays from the first hit only); its recursion limit of 4
    # (ray_tracing_pipeline.cppm:144) is a pipeline *capability* bound used
    # only by the legacy phong.rchit path.  max_bounces=1 therefore matches
    # the active reference behavior; the wavefront supports any depth.
    max_bounces: int = 1

    # Ray interval (reference: raygen.rgen:99-107).
    t_min: float = 1e-3
    t_max: float = 1e4
    # Shadow rays stop this far short of the light sample so the light's own
    # surface never occludes (reference: raygen.rgen:240 "lightDistance-0.5";
    # scene-scale dependent, so small scenes should shrink it).
    shadow_ray_margin: float = 0.5
    # Shadow/secondary ray origin offset along the normal (raygen.rgen:229).
    shadow_origin_offset: float = 0.01

    # Denoiser (reference: application.cppm:395-434,497-501; denoise.comp).
    # phi defaults match the reference's per-dispatch push constants
    # DenoisingInfo(step, 1.0, 0.001, 0.001) at application.cppm:406.
    denoise_iterations: int = 4
    denoise_c_phi: float = 1.0      # color edge-stopping phi
    denoise_n_phi: float = 0.001    # normal phi
    denoise_p_phi: float = 0.001    # position phi

    # Memory fence between stochastic shadow samples (r5): bounds the
    # XLA scheduler's live set to ~one occlusion query — required for
    # alpha-laddered frames at reference scale (the 120k-tri instanced
    # flagship OOMs HBM at 1080p without it), neutral semantics.
    # None = auto (enabled exactly when the alpha ladder is active).
    serialize_shadow_samples: bool | None = None

    # Tonemap: "aces" (analytic, ref raygen.rgen:51-59), "lut", or "none".
    tonemap: str = "aces"
    gamma: float = 2.2

    # LTC lookup mode: True fetches from a 4x-presampled table with ONE
    # gather (TPU gathers dominate shading; error ~1e-3, below the LTC
    # fit's own error); False is exact bilinear (the reference's sampler,
    # and the golden-test contract vs the CPU reference renderer).
    # Application/interactive paths enable it.
    fast_lut: bool = False

    # Light-sampling pdf fudge factor (reference: raygen.rgen:193 "area*0.7").
    light_pdf_scale: float = 0.7
    # Flat radiance multipliers the reference bakes into raygen.rgen
    # (:283 analytic *5.0, :262 sampled *10.0, :334 sun *20.0).
    analytic_gain: float = 5.0
    sampled_gain: float = 10.0
    sun_gain: float = 20.0

    # BVH / traversal.
    use_bvh: bool = True
    bvh_leaf_size: int = 4          # must be <= 15 (packed in 4 bits)
    # Safety valve on traversal loops; must exceed the worst-case visited
    # node count or hits are silently dropped (tests compare vs brute force).
    max_traversal_steps: int = 16384
    # Alpha-tested transparency (opacity.rahit parity: ignore hits with
    # sampled alpha < 0.9). alpha_rounds bounds transparent layers per ray.
    # None = auto (enabled when any material carries an opacity map).
    alpha_test: bool | None = None
    alpha_rounds: int = 4
    alpha_threshold: float = 0.9
    # Two-phase alpha occlusion (opaque-subset raw kernel + alpha-subset
    # ladder; render/alpha.py).  Default OFF: bit-identical to the
    # classic ladder and neutral as a standalone query (720 vs 738 ms on
    # the flagship scene), but composing its 2x kernel instances inside
    # the full jitted frame triggered a 5x XLA scheduling pathology
    # (82 s vs 16.3 s, r4 probe 020) — revisit if the per-program kernel
    # count stops mattering.
    alpha_split: bool = False

    # Trace backend: "auto" (hybrid Mosaic kernels on TPU / wide XLA twin
    # elsewhere when a BVH exists, else brute), or explicitly "brute",
    # "wide", "pallas" (v7), "hier" (v8), "quarter" (v9), "hybrid".
    # "packet"/"lane" were retired to render/attic/ (r4).
    backend: str = "auto"
    packet_size: int = 64           # rays per packet (attic packet backend)
    traversal_unroll: int = 8       # skip-link steps per while-loop iteration
    # Wide backend (render/wide_backend.py): dense cluster culling + MXU
    # Baldwin-Weber intersection.
    cluster_size: int = 256         # triangles per cluster
    wide_tile: int = 128            # rays per tile
    max_cluster_visits: int = 64    # safety cap on ordered cluster visits
    # Ray ordering fed to the trace backends: "block" groups rays into
    # coherent 2-D pixel blocks (tight tile frusta); "raster" is row-major.
    ray_order: str = "block"
    # Runtime traversal-cap saturation detection: when True, capped
    # backends (wide/lane) print a loud warning whenever
    # max_cluster_visits / max_traversal_steps clips unfinished work
    # (render/diagnostics.py); stats are also queryable via
    # diagnostics.diagnose_traversal.
    debug_traversal: bool = False

    # Ray-batch tile size for wavefront/pallas paths (rays per tile).
    tile_rays: int = 8192

    # Wavefront bounce-ray reordering: sort secondary rays by direction
    # octant + origin Morton code before tracing (render/wavefront.py).
    # Result-invariant (per-ray RNG rides with the ray) and 3.2x faster on
    # incoherent bounce traces; off only for debugging.
    sort_bounces: bool = True

    # Megakernel shadow-ray reordering: per light triangle, sort rays by
    # (direction-to-light octant, shadow-origin Morton) and run the whole
    # stochastic sample loop in sorted order (render/megakernel.py).
    # Tile traversal pays the union of each 128-ray tile's shadow shaft;
    # sorted tiles cost 2.6x less (83 vs 217 ms per trace at 1080p/100k).
    # Result-invariant (per-ray RNG rides with the ray).  Only engages for
    # batches >= sort_shadows_min_rays — below that the argsort + permute
    # overhead exceeds the win.
    sort_shadows: bool = True
    sort_shadows_min_rays: int = 65536

    # Megakernel batched occlusion: concatenate ALL (light-triangle x
    # shadow-sample) segments of one primary sample into ONE occluded()
    # kernel launch instead of lights*samples separate ones (bit-identical;
    # per-ray-culling backends only).  Default OFF: inside one jitted frame
    # the separate launches already compose back-to-back in a single XLA
    # executable, so batching measures NEUTRAL there (897 vs 899 ms at
    # 1080p/100k) while concatenating ~6x the ray state in HBM.  It pays
    # 20% (730 -> 585 ms for 6 segments) only when each trace is its own
    # jit call and eats host dispatch — enable for eager/per-call usage
    # (scripts/batch_occl_probe.py).  Only takes effect on the unrolled
    # <= 8-light-triangle path; larger light counts use lax.scan and log
    # a warning that the flag is ignored.
    batch_occlusion: bool = False
    batch_occlusion_min_rays: int = 65536

    # Denoiser kernel dispatch: None = auto (fused Pallas pair kernel on
    # TPU for non-differentiated renders, XLA stencil when a JVP rides the
    # trace or off-TPU); True/False force one path.  The auto detection
    # walks nested tracers (render/pipeline.py _carries_jvp) so vmapped
    # grads are routed correctly.
    use_pallas_denoise: bool | None = None

    # Mip-mapped (trilinear) texture sampling with footprint-derived LOD
    # (image_sampler.cppm:11-51 parity).  Default off: the golden tests
    # compare exact base-level bilinear against the CPU reference, which
    # has no mip chain; interactive/production paths should enable it.
    mip_textures: bool = False
    # Anisotropic filtering taps along the footprint's major axis
    # (image_sampler.cppm maxAnisotropy parity).  1 = isotropic trilinear
    # (grazing angles over-blur); 2-4 = N trilinear taps at the
    # minor-axis LOD (each tap is 2 more R-sized gathers — keep small).
    # Only active with mip_textures=True on non-instanced scenes.
    aniso_taps: int = 1

    # Numerics: intersection math is always f32; shading may be bf16 later.
    dtype: str = "float32"

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
