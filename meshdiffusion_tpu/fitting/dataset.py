"""On-the-fly ground-truth renders for fitting.

Counterpart of reference ``nvdiffrec/lib/dataset/dataset_mesh.py`` (random
poses:78-94, circular validation poses:67-76, target dict:132-163): the GT
mesh is rendered with the same renderer at random cameras (radius fixed,
fov 45 deg, random rigid jitter +-0.2) and the target dict carries images,
depths, masks, and 50k surface samples.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.fit_losses import sample_points
from ..render import mesh as mesh_mod
from ..render import utils as U
from ..render.render import render_mesh


@dataclasses.dataclass
class TargetRenderer:
    ref_mesh: mesh_mod.Mesh
    envlight: object
    cam_radius: float = 2.0
    train_res: tuple = (512, 512)
    display_res: tuple = (512, 512)
    cam_near_far: tuple = (0.1, 1000.0)
    fovy: float = float(np.deg2rad(45))
    spp: int = 1
    layers: int = 2
    random_lgt: bool = False
    flat_shading: bool = False
    num_surface_samples: int = 50000
    # >0: pre-render this many random view BATCHES once and sample from the
    # pool each iteration instead of re-rendering GT every step. The GT
    # render is 0.9-1.5 s of every fit iteration that the reference also
    # pays per-iteration (dataset_mesh.py renders in the data loader); the
    # pool amortizes it to a per-mesh prologue. Pooled targets keep only
    # the keys the fit losses read, compressed to f16 on device; surface
    # samples (spts) stay freshly drawn per call so chamfer keeps full
    # sample diversity. 0 = exact reference behavior.
    target_pool: int = 0

    def random_cameras(self, batch: int, rng: np.random.Generator):
        """Random training poses (reference dataset_mesh.py:78-94)."""
        iter_res = self.train_res
        proj = U.perspective(self.fovy, iter_res[1] / iter_res[0],
                             *self.cam_near_far)
        mvs, mvps, camposes = [], [], []
        for _ in range(batch):
            mv = U.translate(0, 0, -self.cam_radius) \
                @ U.random_rotation_translation(0.2, rng)
            mvs.append(mv)
            mvps.append(proj @ mv)
            camposes.append(np.linalg.inv(mv)[:3, 3])
        return (np.stack(mvs).astype(np.float32),
                np.stack(mvps).astype(np.float32),
                np.stack(camposes).astype(np.float32))

    def rotate_camera(self, itr: int):
        """Validation pose on a circle (reference dataset_mesh.py:67-76)."""
        proj = U.perspective(self.fovy,
                             self.display_res[1] / self.display_res[0],
                             *self.cam_near_far)
        ang = (itr / 50) * np.pi * 2
        mv = U.translate(0, 0, -self.cam_radius) @ (U.rotate_x(-0.4)
                                                    @ U.rotate_y(ang))
        mvp = proj @ mv
        campos = np.linalg.inv(mv)[:3, 3]
        return (mv[None].astype(np.float32), mvp[None].astype(np.float32),
                campos[None].astype(np.float32))

    def _render_target_arrays(self, mvp, campos, key, xfm) -> Dict:
        """Jit body: GT render + surface samples (arrays only)."""
        out = render_mesh(self.ref_mesh, mvp, campos, self.envlight,
                          self.train_res, spp=self.spp,
                          num_layers=self.layers,
                          xfm_lgt=xfm,
                          flat_shading=self.flat_shading)
        spts = sample_points(self.ref_mesh.v_pos, self.ref_mesh.t_pos_idx,
                             self.num_surface_samples, key,
                             face_mask=self.ref_mesh.face_mask)
        return {
            'mvp': jnp.asarray(mvp),
            'campos': jnp.asarray(campos),
            'img': out['shaded'],
            'img_second': out['shaded_second'],
            'spts': spts,
            'depth': out['depth'],
            'depth_second': out['depth_second'],
            'normal': out['normal'],
            'normal_second': out['normal_second'],
            'geo_normal': out['geo_normal'],
            'geo_viewdir': out['geo_viewdir'],
            'pos': out['pos'],
            'mask': out['mask'],
            'mask_cont': out['mask_cont'],
        }

    def render_target(self, mvp, campos, key: jax.Array,
                      envlight_transform=None) -> Dict:
        """Render the GT mesh into a target dict (reference
        dataset_mesh.py:119-163).

        The whole GT render is ONE jitted program cached on the renderer
        (keyed by batch size and xfm presence): the per-iteration target
        render otherwise runs op-by-op — hundreds of dispatches per fit
        iteration, which dominates wall-clock through the TPU tunnel."""
        B = np.asarray(mvp).shape[0] if np.asarray(mvp).ndim == 3 else 1
        cache = getattr(self, '_jit_cache', None)
        if cache is None:
            cache = self._jit_cache = {}
        k = (B, envlight_transform is not None)
        if k not in cache:
            cache[k] = jax.jit(self._render_target_arrays)
        if envlight_transform is None:
            fn = cache[k]
            target = dict(fn(jnp.asarray(mvp), jnp.asarray(campos), key,
                             None))
        else:
            target = dict(cache[k](jnp.asarray(mvp), jnp.asarray(campos),
                                   key, jnp.asarray(envlight_transform)))
        target.update({
            'mv': None,
            'resolution': self.train_res,
            'spp': self.spp,
            'vpts': self.ref_mesh.v_pos,
            'faces': self.ref_mesh.t_pos_idx,
            'envlight_transform': envlight_transform,
        })
        return target

    # target keys the fit losses actually read (geometry.py tick/tick_fixed,
    # carve_occluded, singleview) — the pool stores only these
    # compressed to f16 in the pool: color + coverage only. Depth stays
    # f32 — f16 spacing at cam distance 2-4 is ~1e-3, the same order as
    # the 5e-3 depth_prox threshold and amplified by the x100 early depth
    # scale, so quantized depth flips supervision labels the reference
    # never sees (round-3 advisor). Images alone carry most of the HBM
    # saving (2x RGBA vs 2x 1-channel depth).
    _POOLED_F16_KEYS = ('img', 'img_second', 'mask_cont')
    _POOLED_IMAGE_KEYS = _POOLED_F16_KEYS + ('depth', 'depth_second')

    def _build_pool(self, batch: int, np_rng: np.random.Generator,
                    key: jax.Array):
        entries = []
        for i in range(self.target_pool):
            key, k = jax.random.split(key)
            mv, mvp, campos = self.random_cameras(batch, np_rng)
            xfm = None
            if self.random_lgt:
                xfm = U.random_rotation_translation(0.0, np_rng)[None]
            t = self.render_target(mvp, campos, k, envlight_transform=xfm)
            # G-buffers no fit loss reads (normals, pos, viewdir, mask) are
            # dropped from pooled entries to bound HBM
            drop = {'spts', 'normal', 'normal_second', 'geo_normal',
                    'geo_viewdir', 'pos', 'mask'}
            slim = {k2: v for k2, v in t.items()
                    if k2 not in self._POOLED_IMAGE_KEYS and k2 not in drop}
            for k2 in self._POOLED_IMAGE_KEYS:
                slim[k2] = t[k2].astype(
                    jnp.float16 if k2 in self._POOLED_F16_KEYS
                    else jnp.float32)
            entries.append(slim)
        return entries

    def _fresh_spts(self, key: jax.Array) -> jnp.ndarray:
        fn = getattr(self, '_spts_jit', None)
        if fn is None:
            fn = self._spts_jit = jax.jit(lambda k: sample_points(
                self.ref_mesh.v_pos, self.ref_mesh.t_pos_idx,
                self.num_surface_samples, k,
                face_mask=self.ref_mesh.face_mask))
        return fn(key)

    def random_target(self, batch: int, np_rng: np.random.Generator,
                      key: jax.Array) -> Dict:
        if self.target_pool > 0:
            pool = getattr(self, '_pool', None)
            if pool is None or getattr(self, '_pool_batch', None) != batch:
                key, kp = jax.random.split(key)
                pool = self._pool = self._build_pool(batch, np_rng, kp)
                self._pool_batch = batch
            t = dict(pool[int(np_rng.integers(len(pool)))])
            for k2 in self._POOLED_IMAGE_KEYS:
                t[k2] = t[k2].astype(jnp.float32)
            t['spts'] = self._fresh_spts(key)
            return t
        mv, mvp, campos = self.random_cameras(batch, np_rng)
        xfm = None
        if self.random_lgt:
            xfm = U.random_rotation_translation(0.0, np_rng)[None]
        return self.render_target(mvp, campos, key, envlight_transform=xfm)
