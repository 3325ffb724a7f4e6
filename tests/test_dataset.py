"""Dataset / loader tests on synthetic grid files."""

import json
import os

import numpy as np
import pytest

from meshdiffusion_tpu.data.dataset import ShapeNetDMTetDataset, GridLoader


@pytest.fixture()
def grid_files(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(6):
        g = rng.normal(size=(4, 7, 7, 7)).astype(np.float32)  # sub-resolution
        p = tmp_path / f'grid_{i:05d}.npy'
        np.save(p, g)
        paths.append(str(p))
    meta = tmp_path / 'meta.json'
    meta.write_text(json.dumps(paths))
    return str(meta), paths


def make_mask(r=8):
    m = np.ones((r, r, r), np.float32)
    m[-1] = 0.0
    return m


def test_getitem_shapes_and_sdf_sign(grid_files):
    meta, paths = grid_files
    ds = ShapeNetDMTetDataset(meta, make_mask(), aug=False)
    assert len(ds) == 6
    x = ds[0]
    assert x.shape == (8, 8, 8, 4)  # padded 7->8, channels-last
    sdf = x[:7, :7, :7, 0]
    assert set(np.unique(sdf)) <= {-1.0, 1.0}
    # padding region zero
    assert np.abs(x[7:]).max() == 0.0


def test_aug_jitters_deform_only(grid_files):
    meta, _ = grid_files
    ds0 = ShapeNetDMTetDataset(meta, make_mask(), aug=False)
    ds1 = ShapeNetDMTetDataset(meta, make_mask(), aug=True)
    a, b = ds0[1], ds1[1]
    # aug multiplies by the grid mask too; compare within the mask region
    m = make_mask()[:7, :7, :7, None]
    np.testing.assert_array_equal(a[:7, :7, :7, :1] * m, b[:7, :7, :7, :1])
    d = np.abs(a[:7, :7, :7, 1:] * m - b[:7, :7, :7, 1:])
    assert 0 < d.max() <= 0.005 / (7 / 8) + 1e-6


def test_filter_meta(grid_files, tmp_path):
    meta, _ = grid_files
    fpath = tmp_path / 'filter.json'
    fpath.write_text(json.dumps([0, 2, 4]))
    ds = ShapeNetDMTetDataset(meta, make_mask(), filter_meta_path=str(fpath))
    assert len(ds) == 3


def test_loader_batches(grid_files):
    meta, _ = grid_files
    ds = ShapeNetDMTetDataset(meta, make_mask(), aug=True)
    loader = GridLoader(ds, batch_size=2, num_workers=2, prefetch=1)
    try:
        b1 = next(loader)
        b2 = next(loader)
        assert b1.shape == (2, 8, 8, 8, 4)
        assert b1.dtype == np.float32
        assert not np.array_equal(b1, b2)
    finally:
        loader.close()
