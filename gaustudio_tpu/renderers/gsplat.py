"""GsplatRenderer — alternative-backend renderer slot.

The reference's gsplat renderer (gaustudio/renderers/gsplat_renderer.py:5-86)
wraps the external ``gsplat`` CUDA package with an intrinsics-based camera
and always precomputes colors with python-side SH (:27-31).  Here the slot
is served by the same TPU rasterizer (there is no second CUDA backend to
delegate to), preserving the python-SH-precompute behavior so configs that
select ``gsplat_renderer`` keep working.
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
        "debug": False,
    }
