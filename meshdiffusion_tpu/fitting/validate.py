"""Validation loop: fixed circular poses, PSNR/MSE against GT renders.

Counterpart of reference ``nvdiffrec/eval.py:217-261`` / ``fit_dmtets.py:
287-331``: render the fitted geometry and the GT mesh at the 50 circular
validation poses, write per-view and average MSE/PSNR to ``metrics.txt``
and the sRGB-encoded comparison PNGs.
"""

from __future__ import annotations

import logging
import os
import jax.numpy as jnp
import numpy as np

from ..render import utils as U
from ..render.render import render_mesh
from .dataset import TargetRenderer
from .fit import default_material

logger = logging.getLogger(__name__)


def validate(fitter, state, renderer: TargetRenderer, out_dir: str,
             material=None, num_views: int = 50, save_images: bool = True,
             raster_K: int = 256) -> float:
    """Returns average PSNR; writes metrics.txt (+ val_*.png)."""
    os.makedirs(out_dir, exist_ok=True)
    material = material or default_material()
    mesh = fitter.get_mesh(state, material)

    mse_values, psnr_values = [], []
    with open(os.path.join(out_dir, 'metrics.txt'), 'w') as fout:
        fout.write('ID, MSE, PSNR\n')
        for it in range(num_views):
            mv, mvp, campos = renderer.rotate_camera(it)
            ref = render_mesh(renderer.ref_mesh, jnp.asarray(mvp),
                              jnp.asarray(campos), renderer.envlight,
                              renderer.display_res, num_layers=1,
                              raster_K=raster_K)
            opt = render_mesh(mesh, jnp.asarray(mvp), jnp.asarray(campos),
                              renderer.envlight, renderer.display_res,
                              num_layers=1, raster_K=raster_K)
            o = jnp.clip(U.rgb_to_srgb(opt['shaded'][0, ..., :3]), 0.0, 1.0)
            r = jnp.clip(U.rgb_to_srgb(ref['shaded'][0, ..., :3]), 0.0, 1.0)
            mse = float(jnp.mean((o - r) ** 2))
            psnr = float(U.mse_to_psnr(max(mse, 1e-10)))
            mse_values.append(mse)
            psnr_values.append(psnr)
            fout.write('%d, %1.8f, %1.8f\n' % (it, mse, psnr))
            if save_images:
                U.save_image(os.path.join(out_dir, 'val_%06d_opt.png' % it),
                             np.asarray(o))
                U.save_image(os.path.join(out_dir, 'val_%06d_ref.png' % it),
                             np.asarray(r))
        avg_mse = float(np.mean(mse_values))
        avg_psnr = float(np.mean(psnr_values))
        fout.write('AVERAGES: %1.4f, %2.3f\n' % (avg_mse, avg_psnr))
    logger.info('validate: MSE %1.8f, PSNR %2.3f', avg_mse, avg_psnr)
    return avg_psnr
