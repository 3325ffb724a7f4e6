"""bench.py orchestrator: wedge-resilient retry loop around the measuring
child (round-4 item: BENCH_r03 was rc=1 because a wedged tunnel killed the
bench; the orchestrator must always exit 0 with a JSON line)."""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit('/tests/', 1)[0])
import bench  # noqa: E402


class _FakeCompleted:
    def __init__(self, rc, stdout=b''):
        self.returncode = rc
        self.stdout = stdout


class _FakeClock:
    """Virtual time: sleeps advance the clock instantly, so backoff/deadline
    logic is exercised without wall-clock cost."""

    def __init__(self):
        self.t = 0.0

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.t += max(float(s), 1e-3)


def _run_orchestrate(monkeypatch, capsys, script, env=None):
    """script: list of callables consumed per subprocess.run call; each
    returns a _FakeCompleted or raises."""
    calls = iter(script)
    monkeypatch.setattr(bench.subprocess, 'run',
                        lambda *a, **k: next(calls)(*a, **k))
    monkeypatch.setattr(bench, 'time', _FakeClock())
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    bench.orchestrate()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_success_first_try(monkeypatch, capsys):
    payload = json.dumps({'metric': 'm', 'value': 1.5, 'unit': 'u',
                          'vs_baseline': 0.2,
                          'detail': {'sample_s': 40.0}}).encode()
    result = _run_orchestrate(monkeypatch, capsys, [
        lambda *a, **k: _FakeCompleted(0),           # probe
        lambda *a, **k: _FakeCompleted(0, payload + b'\n'),  # child
    ])
    assert result['value'] == 1.5
    assert result['degraded'] is False
    assert result['detail']['attempts'] == 1
    assert result['detail']['probe_failures'] == 0


def test_wedged_probe_then_recovery(monkeypatch, capsys):
    payload = json.dumps({'metric': 'm', 'value': 2.0, 'unit': 'u',
                          'vs_baseline': 0.3}).encode()

    def probe_wedge(*a, **k):
        raise subprocess.TimeoutExpired(cmd='probe', timeout=1)

    result = _run_orchestrate(monkeypatch, capsys, [
        probe_wedge,                                  # probe 1: wedged
        probe_wedge,                                  # probe 2: wedged
        lambda *a, **k: _FakeCompleted(0),            # probe 3: ok
        lambda *a, **k: _FakeCompleted(0, payload),   # child ok
    ])
    assert result['value'] == 2.0
    assert result['degraded'] is False
    assert result['detail']['probe_failures'] == 2


def test_child_wedge_mid_run_retries(monkeypatch, capsys):
    payload = json.dumps({'metric': 'm', 'value': 1.0, 'unit': 'u',
                          'vs_baseline': 0.1}).encode()

    def child_wedge(*a, **k):
        raise subprocess.TimeoutExpired(cmd='child', timeout=1)

    result = _run_orchestrate(monkeypatch, capsys, [
        lambda *a, **k: _FakeCompleted(0),            # probe ok
        child_wedge,                                  # child wedges; killed
        lambda *a, **k: _FakeCompleted(0),            # re-probe ok
        lambda *a, **k: _FakeCompleted(0, payload),   # child ok
    ])
    assert result['degraded'] is False
    assert result['detail']['attempts'] == 2


def test_deadline_exhaustion_still_prints_json(monkeypatch, capsys):
    def probe_wedge(*a, **k):
        raise subprocess.TimeoutExpired(cmd='probe', timeout=1)

    result = _run_orchestrate(
        monkeypatch, capsys, [probe_wedge] * 64,
        env={'BENCH_DEADLINE_S': '0.01'})
    assert result['degraded'] is True
    assert result['value'] == 0.0
    assert 'error' in result


def test_non_json_child_tail_retries_then_degrades(monkeypatch, capsys):
    result = _run_orchestrate(
        monkeypatch, capsys,
        [lambda *a, **k: _FakeCompleted(0),
         lambda *a, **k: _FakeCompleted(0, b'Traceback: boom\n')] * 4,
        env={'BENCH_DEADLINE_S': '0.01'})
    assert result['degraded'] is True
