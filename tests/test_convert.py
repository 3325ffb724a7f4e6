"""Grid<->tet conversion and dataset tooling tests."""

import json
import os

import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.data import convert as C


def test_tet_grid_roundtrip(tiny_tet_grid, rng):
    tg = tiny_tet_grid
    sdf = rng.choice([-1.0, 1.0], tg.num_verts).astype(np.float32)
    deform = rng.uniform(-0.9, 0.9, (tg.num_verts, 3)).astype(np.float32)
    grid = tg.tet_to_grid(jnp.asarray(sdf), jnp.asarray(deform))
    assert grid.shape == (tg.resolution,) * 3 + (4,)
    sdf2, deform2 = tg.grid_to_tet(grid)
    np.testing.assert_array_equal(np.asarray(sdf2), sdf)
    np.testing.assert_allclose(np.asarray(deform2), deform, atol=1e-6)


def test_grid_to_tet_sign_normalization(tiny_tet_grid):
    tg = tiny_tet_grid
    grid = np.zeros((tg.resolution,) * 3 + (4,), np.float32)
    grid[..., 0] = 0.7
    sdf, _ = tg.grid_to_tet(jnp.asarray(grid))
    assert set(np.unique(np.asarray(sdf))) == {1.0}
    grid[..., 0] = 0.0  # sign(0) -> +1 (reference dataset convention)
    sdf, _ = tg.grid_to_tet(jnp.asarray(grid))
    assert set(np.unique(np.asarray(sdf))) == {1.0}


def test_convert_folder_and_meta(tiny_tet_grid, tmp_path, rng, monkeypatch):
    tg = tiny_tet_grid
    src = tmp_path / 'tets'
    src.mkdir()
    for i in range(3):
        np.savez(src / f'dmt_dict_{i:05d}.npz',
                 sdf=rng.choice([-1.0, 1.0], tg.num_verts).astype(np.float32),
                 deform=rng.uniform(-1, 1, (tg.num_verts, 3)).astype(np.float32))

    # patch TetGrid.load to return the tiny grid
    monkeypatch.setattr(C.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))
    out = C.convert_folder(str(src), str(tmp_path / 'grids'),
                           resolution=tg.resolution, split_size=5)
    assert len(out) == 3
    g = np.load(out[0])
    assert g.shape == (4, tg.resolution, tg.resolution, tg.resolution)

    meta = C.save_meta(str(tmp_path / 'grids'), str(tmp_path / 'meta.json'),
                       extensions=('npy',))
    assert len(json.load(open(meta))) == 3


def test_save_grid_mask(tiny_tet_grid, tmp_path, monkeypatch):
    monkeypatch.setattr(C.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tiny_tet_grid))
    p = C.save_grid_mask(tiny_tet_grid.resolution, str(tmp_path / 'mask.npy'))
    m = np.load(p)
    assert m.shape == (tiny_tet_grid.resolution,) * 3
    assert m.sum() == tiny_tet_grid.num_verts


def test_generate_tet_grid_matches_reference_lattice():
    """Generated 64-grid vertex lattice == bundled quartet asset's lattice."""
    from meshdiffusion_tpu.geometry.generate_tets import generate_tet_grid
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    v, t = generate_tet_grid(64)
    assert v.shape == (63 ** 3, 3)
    assert t.shape == (6 * 62 ** 3, 4)
    u = np.unique(v)
    assert len(u) == 63
    np.testing.assert_allclose(u.min(), -0.484375)
    np.testing.assert_allclose(u.max(), 0.484375)
    np.testing.assert_allclose(u[1] - u[0], 1 / 64)

    ref = TetGrid.load(64)
    ru = np.unique(ref.verts)
    np.testing.assert_allclose(u, ru, atol=1e-7)


def test_generated_grid_extracts_meshes():
    import jax.numpy as jnp
    from meshdiffusion_tpu.geometry.generate_tets import generate_tet_grid
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
    v, t = generate_tet_grid(16)
    tg = TetGrid.from_arrays(16, v, t)
    sdf = 0.3 - np.linalg.norm(v, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(v), jnp.asarray(sdf))
    mv, mf = compact_mesh(out)
    assert mf.shape[0] == 2 * mv.shape[0] - 4  # closed genus-0
    r = np.linalg.norm(mv, axis=1)
    assert abs(r.mean() - 0.3) < 0.01
