"""GsplatRenderer — the antialiased alternative rasterization backend.

The reference's gsplat renderer (gaustudio/renderers/gsplat_renderer.py:5-86)
dispatches to the external ``gsplat`` CUDA package: intrinsics-based
projection, python-side SH precompute (:27-31), the "antialiased" low-pass
opacity compensation (gsplat's ``compensation`` output of
``project_gaussians``), and an alpha map in the outputs.

The TPU equivalent runs the same math through this repo's rasterizer
rather than a second native package: the distinguishing gsplat behaviors —
2D-filter opacity compensation (``antialias=True`` in
``gaussian.preprocess``), python SH precompute, and the rendered alpha
output — are enabled here, so configs selecting ``gsplat_renderer`` get
gsplat's *rendering semantics*, not just an alias of the vanilla renderer.
"""

from __future__ import annotations

from gaustudio_tpu import renderers
from gaustudio_tpu.renderers.vanilla import VanillaRenderer


@renderers.register("gsplat_renderer")
class GsplatRenderer(VanillaRenderer):
    default_conf = {
        "kernel_size": 0.0,
        "scaling_modifier": 1.0,
        "white_background": False,
        # gsplat_renderer.py:27-31: colors always precomputed via python SH
        "convert_SHs_python": True,
        "compute_cov3D_python": False,
        # gsplat project_gaussians' compensation factor (antialiased mode);
        # the alpha map gsplat returns (return_alpha=True) is the base
        # renderer's rendered_final_opacity output
        "antialias": True,
        "debug": False,
    }
