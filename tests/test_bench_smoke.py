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
    # df64 reps deliberately NOT forced: XLA:CPU compile time is
    # super-linear in the unrolled df64 gate count, so the probe's own
    # CPU guard (reps=1) is exactly what this smoke run must exercise
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


def test_orchestration_emits_incrementally():
    """The full no-args orchestration at tiny CPU sizes: every probe's
    metric must appear as its own flushed partial line AND in the final
    merged record — the round-4 failure mode (single end-of-run print,
    global timeout => empty tail) must stay dead."""
    import json
    out = _run([], env_extra={
        "ROCQ_BENCH_SIZES": "8",
        "ROCQ_BENCH_QFT_N": "6",
        "ROCQ_BENCH_QFT_BIG_N": "7",
        "ROCQ_BENCH_DENSITY_N": "3",
        "ROCQ_BENCH_DENSITY_N2": "4",
        "ROCQ_BENCH_FP64_N": "6",
        "ROCQ_BENCH_TN_DIM": "64",
        "ROCQ_BENCH_DEADLINE_S": "600",
        "ROCQ_ANSATZ_BODY": "2",
    }, timeout=600)
    lines = [json.loads(ln) for ln in out.splitlines()
             if ln.startswith("{")]
    partials = [ln for ln in lines if ln.get("bench_partial")]
    finals = [ln for ln in lines if "bench_elapsed_s" in ln]
    assert len(finals) == 1, out
    final = finals[0]
    # the driver contract fields
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in final, final
    assert final["value"] > 0, final
    # each subsystem's metric landed as a partial BEFORE the final line
    banked = {k for p in partials for k in p}
    for k in ("value", "qft_n20_ms", "ansatz_gates_per_sec",
              "density_n13_ops_per_sec", "density_n14_ops_per_sec",
              "tn_sliced_gflops", "fp64_n26_gates_per_sec",
              "df64_n26_gates_per_sec"):
        assert k in banked and k in final, (k, sorted(banked), final)


def test_cache_stamp_roundtrip(monkeypatch):
    """Cold-cache detection: the stamp matches only while no traced
    source has changed (the persistent compile cache is source-location
    sensitive, so ANY library edit must flip bench back to the cold
    ladder)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    fp1 = bench._source_fingerprint()
    assert fp1 == bench._source_fingerprint()  # deterministic

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        monkeypatch.setattr(bench, "_STAMP_PATH",
                            os.path.join(td, "stamp.json"))
        assert not bench.cache_is_warm()  # no stamp yet
        bench.write_cache_stamp()
        assert bench.cache_is_warm()
        # a source change flips it cold
        monkeypatch.setattr(bench, "_source_fingerprint", lambda: "other")
        assert not bench.cache_is_warm()
