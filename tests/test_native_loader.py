"""Native (C++) grid loader vs the Python dataset path."""

import json
import os

import numpy as np
import pytest

from meshdiffusion_tpu.native import (NativeGridLoader, build_native,
                                      native_available)


pytestmark = pytest.mark.skipif(not native_available(),
                                reason='g++ build unavailable')


@pytest.fixture()
def grid_files(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        g = rng.normal(size=(4, 7, 7, 7)).astype(np.float32)
        p = tmp_path / f'grid_{i:05d}.npy'
        np.save(p, g)
        paths.append(str(p))
    return paths


def make_mask(r=8):
    m = np.ones((r, r, r), np.float32)
    m[-1] = 0.0
    return m


def test_matches_python_dataset_noaug(grid_files, tmp_path):
    """aug off: native output == python dataset output exactly."""
    from meshdiffusion_tpu.data.dataset import ShapeNetDMTetDataset
    meta = tmp_path / 'meta.json'
    meta.write_text(json.dumps(grid_files))
    py = ShapeNetDMTetDataset(str(meta), make_mask(), aug=False)
    nat = NativeGridLoader(grid_files, make_mask(), batch_size=3, aug=False)
    batch = nat.load_indices(np.asarray([0, 3, 5]))
    for slot, idx in enumerate([0, 3, 5]):
        np.testing.assert_array_equal(batch[slot], py[idx])
    nat.close()


def test_aug_semantics(grid_files):
    """aug on: sdf sign preserved inside mask, deform jitter bounded, mask
    zeroes applied, padding zero."""
    nat = NativeGridLoader(grid_files, make_mask(), batch_size=2, aug=True,
                           seed=1)
    b = nat.load_indices(np.asarray([1, 1]))
    # two slots of the same sample get DIFFERENT jitter
    assert not np.array_equal(b[0], b[1])
    raw = np.load(grid_files[1])
    m = make_mask()[:7, :7, :7]
    sdf = b[0][:7, :7, :7, 0]
    np.testing.assert_array_equal(sdf, np.where(raw[0] < 0, -1.0, 1.0) * m)
    d = np.abs(b[0][:7, :7, :7, 1:] - np.moveaxis(raw[1:], 0, -1) * m[..., None])
    assert d.max() <= (0.005 / (7 / 8)) * 1.01 + 1e-6
    assert np.abs(b[0][7:]).max() == 0.0
    nat.close()


def test_epoch_iteration(grid_files):
    nat = NativeGridLoader(grid_files, make_mask(), batch_size=4, seed=0)
    b1 = next(nat)
    b2 = next(nat)
    assert b1.shape == (4, 8, 8, 8, 4)
    assert not np.array_equal(b1, b2)
    nat.close()


def test_f8_npy_support(tmp_path):
    g = np.random.default_rng(0).normal(size=(4, 4, 4, 4)).astype(np.float64)
    p = str(tmp_path / 'g.npy')
    np.save(p, g)
    nat = NativeGridLoader([p], np.ones((4, 4, 4), np.float32),
                           batch_size=1, aug=False)
    b = nat.load_indices(np.asarray([0]))
    np.testing.assert_allclose(b[0][..., 0],
                               np.where(g[0] < 0, -1, 1), rtol=1e-6)
    nat.close()


def test_missing_file_error(grid_files):
    nat = NativeGridLoader(grid_files + ['/nonexistent/x.npy'],
                           make_mask(), batch_size=1)
    with pytest.raises(RuntimeError, match='open failed'):
        nat.load_indices(np.asarray([len(grid_files)]))
    nat.close()
