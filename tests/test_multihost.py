"""Multi-process (multi-host) training entry: 2-process CPU launch.

Counterpart of the reference's DDP ambition (nvdiffrec/fit_dmtets.py:602-611
initializes NCCL but its consumer raises NotImplementedError); here the
launch actually trains: jax.distributed.initialize + per-process data
slices + psum'd gradients over the global (4, 2) mesh.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_two_process_cpu_training(tmp_path):
    R = 8
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        g = rng.standard_normal((4, R, R, R)).astype(np.float32)
        p = tmp_path / f'grid_{i:05d}.npy'
        np.save(p, g)
        paths.append(str(p))
    (tmp_path / 'meta.json').write_text(json.dumps(paths))
    np.save(tmp_path / 'mask.npy', np.ones((R, R, R), np.float32))

    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    child = os.path.join(os.path.dirname(__file__), 'multihost_child.py')
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)           # child sets its own device count
        env['MESHDIFFUSION_COORDINATOR'] = f'localhost:{port}'
        env['MESHDIFFUSION_NUM_PROCESSES'] = '2'
        env['MESHDIFFUSION_PROCESS_ID'] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, child, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out[-4000:]}'

    digests = []
    for out in outs:
        m = re.search(r'MULTIHOST_OK process=\d+ step=4 digest=(\S+)', out)
        assert m, out[-4000:]
        digests.append(float(m.group(1)))
    # SPMD: both processes hold identical replicated parameters
    assert digests[0] == pytest.approx(digests[1], rel=1e-6)
