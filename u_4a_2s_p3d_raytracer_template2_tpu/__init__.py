"""TPU-native differentiable ray tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PedroDRodrigues/U_4A_2S_P3D_RayTracer_Template2: the C++ Whitted/distribution
ray tracer (P3D_RayTracer_Template2/) and the GLSL Monte Carlo path tracer
(GPU_PathTracer_template/), rebuilt as a pure-functional, SoA, statically
shaped pipeline that shards rays across TPU meshes and differentiates
end-to-end through shading and intersection.

Quick start::

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    scene = rt.load_scene("scene.p3f")
    cfg = rt.RenderConfig().with_scene_flags(scene)
    img = rt.render_image(scene, cfg)   # [H, W, 3] float, row 0 = bottom
    rt.save_png("out.png", img)
"""

from .core import constants
from .core.build import build_scene, load_scene
from .core.types import (
    Camera,
    Lights,
    Materials,
    Primitives,
    Rays,
    RenderConfig,
    Scene,
)
from .io.image import load_png, save_png
from .io.p3f import SceneDef, parse_p3f, parse_p3f_text
from .models.whitted import render_image, render_tile, trace_rays

__version__ = "0.1.0"
