"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports so multi-chip sharding logic is testable without TPU hardware."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config.
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope='session')
def tiny_tet_grid():
    """A small synthetic tet grid: a 6-tets-per-cube decomposition of an
    n^3 vertex lattice — independent of the bundled quartet asset."""
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    n = 8
    xs = np.linspace(-0.45, 0.45, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing='ij')
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    def vid(i, j, k):
        return (i * n + j) * n + k

    tets = []
    # standard 6-tet (Kuhn) subdivision of each cube
    corners = lambda i, j, k: [
        vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k), vid(i + 1, j + 1, k),
        vid(i, j, k + 1), vid(i + 1, j, k + 1), vid(i, j + 1, k + 1),
        vid(i + 1, j + 1, k + 1)]
    KUHN = [(0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7),
            (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7)]
    for i in range(n - 1):
        for j in range(n - 1):
            for k in range(n - 1):
                c = corners(i, j, k)
                for t in KUHN:
                    tets.append([c[t[0]], c[t[1]], c[t[2]], c[t[3]]])
    indices = np.asarray(tets, np.int32)
    return TetGrid.from_arrays(n, verts, indices)


@pytest.fixture(scope='session')
def real_tet_grid():
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    return TetGrid.load(64)


# persistent compile cache: repeat test runs skip recompiles
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache_tests')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
