"""bench.py probe smoke tests (CPU, tiny sizes): the driver runs bench.py
on the real chip at round end — a bitrotted probe would silently cost the
round's perf artifact, so every probe body must at least execute and
return a positive number here."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra=None, timeout=280):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["ROCQ_BENCH_REPS"] = "2"
    env["ROCQ_BENCH_DF64_REPS"] = "2"
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")] + args,
        capture_output=True, text=True, timeout=timeout, env=env)
    assert out.returncode == 0, (
        f"bench {args} failed\nSTDOUT:{out.stdout}\nSTDERR:"
        f"{out.stderr[-2000:]}")
    return out.stdout


@pytest.mark.parametrize("args,key", [
    (["--size", "10"], "gates_per_sec"),
    (["--ansatz", "10"], "ansatz_gates_per_sec"),
    (["--density", "4"], "density_ops_per_sec"),
    (["--fp64", "8"], "fp64_gates_per_sec"),
    (["--df64", "8"], "df64_gates_per_sec"),
])
def test_probe_runs(args, key):
    import json
    for line in _run(args).splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if key in rec:
            assert rec[key] > 0
            return
    raise AssertionError(f"no {key} line in bench output")
