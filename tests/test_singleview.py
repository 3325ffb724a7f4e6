"""Single-view fitting + visibility extraction smoke test (CPU-sized)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_fit_singleview_and_visibility(tmp_path, tiny_tet_grid, monkeypatch):
    import jax
    import jax.numpy as jnp
    from meshdiffusion_tpu.fitting import fit as F
    from meshdiffusion_tpu.fitting import singleview as SV
    from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
    from meshdiffusion_tpu.geometry.obj_io import write_obj

    tg = tiny_tet_grid
    sdf = 0.3 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    obj_path = tmp_path / 'sphere.obj'
    write_obj(str(obj_path), v, f)

    monkeypatch.setattr(SV.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))

    cfg = F.FitConfig(iter=3, batch=1, train_res=(64, 64),
                      dmtet_grid=tg.resolution, mesh_scale=1.0,
                      surface_samples=500, raster_K=64, learn_light=True,
                      cam_radius=2.0)
    path = SV.fit_singleview(str(obj_path), cfg, str(tmp_path / 'out'),
                             angle_ind=3, seed=0, gt_bootstrap_every=2)
    assert os.path.exists(path)

    import torch
    d = torch.load(path) if path.endswith('.pt') else dict(np.load(path))
    d = {k: (v.numpy() if hasattr(v, 'numpy') else np.asarray(v))
         for k, v in d.items()}
    assert d['sdf'].shape == (tg.num_verts,)
    assert set(np.unique(d['sdf'])) <= {-1.0, 1.0}
    assert d['vis'].shape == (tg.num_verts,)
    assert 0 < d['vis'].sum() < tg.num_verts  # some visible, not all
    # vis_rast is a superset of vis
    assert (d['vis_rast'].astype(bool) | ~d['vis'].astype(bool)).all()
