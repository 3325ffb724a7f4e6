"""The driver-facing entry points must work from an arbitrary ambient
platform: dryrun_multichip self-provisions a virtual n-device CPU backend
in a child interpreter (the axon TPU plugin ignores JAX_PLATFORMS env)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    # run from the parent with a deliberately wrong ambient platform config:
    # the entry must still produce an n-device CPU mesh in its child.
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)       # no device-count hint from outside
    env.pop('JAX_PLATFORMS', None)
    proc = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(2)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'dryrun_multichip ok' in proc.stdout
    assert "'data': 1, 'spatial': 2" in proc.stdout or \
           "'data': 2" in proc.stdout
