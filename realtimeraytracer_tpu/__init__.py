"""realtimeraytracer_tpu — a TPU-native differentiable ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Vulkan
real-time ray tracer ``DallinClark/RealTimeRaytracer`` (surveyed in SURVEY.md):
OBJ/MTL scenes with textured GGX Cook-Torrance materials, LBVH acceleration,
textured area lights shaded with analytic LTC plus stochastic ratio-estimator
shadows, HDRI environment, A-Trous denoising and ACES/sRGB tone mapping —
plus capabilities the reference does not have: end-to-end differentiability
and multi-host ray sharding over a TPU mesh.

Public API (stable):
    Scene, Camera, Material, Sphere, TriangleMesh, AreaLight, DirectionalLight
    render(scene, config)            — forward render to an (H, W, 3) image
    render_pipeline(...)             — full analytic+stochastic+denoise pipeline
    RenderConfig                     — all knobs (resolution, spp, bounces, ...)
"""

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.scene.camera import Camera
from realtimeraytracer_tpu.scene.materials import Material
from realtimeraytracer_tpu.scene.geometry import Sphere, TriangleMesh
from realtimeraytracer_tpu.scene.lights import AreaLight, DirectionalLight
from realtimeraytracer_tpu.scene.scene import Scene
# NOTE: the function `render` shadows the `render` subpackage as a package
# ATTRIBUTE (sys.modules keeps the real subpackage).  Consequence: use
# `from realtimeraytracer_tpu.render import x` (or a plain
# `import realtimeraytracer_tpu.render.x`), never
# `import realtimeraytracer_tpu.render.x as y` — the `as` binding resolves
# through the shadowed attribute and raises ImportError.
from realtimeraytracer_tpu.render.megakernel import render
from realtimeraytracer_tpu.render.pipeline import render_pipeline

__all__ = [
    "RenderConfig",
    "Camera",
    "Material",
    "Sphere",
    "TriangleMesh",
    "AreaLight",
    "DirectionalLight",
    "Scene",
    "render",
    "render_pipeline",
]

__version__ = "0.1.0"
