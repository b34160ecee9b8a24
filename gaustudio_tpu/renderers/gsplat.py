"""GsplatRenderer — the antialiased alternative rasterization backend.

The reference's gsplat renderer (gaustudio/renderers/gsplat_renderer.py:5-86)
dispatches to the external ``gsplat`` CUDA package: intrinsics-based
projection, python-side SH precompute (:27-31), the "antialiased" low-pass
opacity compensation (gsplat's ``compensation`` output of
``project_gaussians``), and an alpha map in the outputs.

The TPU equivalent runs the same math through this repo's rasterizer
rather than a second native package, with every distinguishing gsplat
behavior implemented for real:

* **intrinsics-based projection** (gsplat_renderer.py:38-66): the camera's
  pixel intrinsics (fx, fy, cx, cy) drive projection and the EWA Jacobian
  directly — no tanfov projection matrix; see ``gaussian.preprocess``'s
  ``intrinsics`` mode;
* **2D-filter opacity compensation** (``antialias=True``, gsplat
  project_gaussians' ``compensation``);
* **python SH precompute** (gsplat_renderer.py:27-31);
* the **alpha map** (gsplat's return_alpha=True) is the base renderer's
  rendered_final_opacity output.
"""

from __future__ import annotations

import jax.numpy as jnp

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
        "antialias": True,
        "debug": False,
    }

    def make_settings(self, camera, gaussian_model, num_entries, sh_degree=None):
        """Route projection through pixel intrinsics, as gsplat does
        (gsplat_renderer.py:38-49: fx/fy/cx/cy from camera.intrinsics)."""
        base = super().make_settings(camera, gaussian_model, num_entries,
                                     sh_degree=sh_degree)
        K = jnp.asarray(camera.intrinsics, jnp.float32)
        return base._replace(
            intrinsics=jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        )
