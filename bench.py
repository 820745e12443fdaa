"""Benchmark: state-vector gate throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (this environment's axon relay backend):
  * ``block_until_ready`` does NOT synchronize — timings must be forced by
    a data-dependent scalar transfer;
  * remote compiles are slow and high-variance — the whole measurement is
    ONE jitted program (a lax.fori_loop over gate layers ending in a scalar
    norm read), compiled once, timed end-to-end on the second call;
  * sizes are probed largest-first in timeout-guarded subprocesses so
    bench.py always terminates.

Metric: single-qubit-gate applications per second. The physics bound
(BASELINE.md): each 1q gate pass reads+writes all 2^n amplitudes =>
ideal gates/sec = HBM_BW / (16 * 2^n) at complex64. ``vs_baseline`` is
achieved/ideal against that one-pass-per-gate speed-of-light model
(v5e HBM ~819 GB/s); > 1 means XLA is fusing multiple gates per HBM pass,
which the reference's one-kernel-per-gate HIP design cannot do.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HBM_BYTES_PER_SEC = 819e9  # v5e
LAYERS = 32


def reps_for(n: int) -> int:
    """Layers per fori_loop body: the multi-pair planner packs all REPS
    layers' gates into shared kernel passes (the window pass carries every
    layer's in-window gates), so HBM passes per layer shrink as REPS grows.
    Measured n=29: REPS 2/4/8/16/32 -> 544/678/795/870/934 gates/s
    (n=30: 8 -> 426, 16 -> 446); compile time also grows, so default to
    the knee (16)."""
    env = os.environ.get("ROCQ_BENCH_REPS")
    if env:
        return int(env)
    return 16
SIZES = (30, 29, 28, 26, 24)
PER_SIZE_TIMEOUT_S = 480
QFT_TIMEOUT_S = 480
QFT_N = 20
TRANSFER_OVERHEAD_S = 0.035  # measured scalar device->host cost on axon


def _enable_compile_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_at(n):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef
    from rocquantum_tpu.compiler.interpreter import (default_widths,
                                                     execute_pair, init_pair)

    reps = reps_for(n)
    ir = CircuitIR(n, name="bench_layer")
    for _ in range(reps):
        for q in range(n):
            ir.add("RY", [q], params=[ParamRef(q)])
    ops = list(ir.ops)
    low_w, high_w = default_widths(n)

    @jax.jit
    def program(params):
        # float-pair carry: half the working set of complex64 + conversion,
        # which is what fits n=30 (8 GiB of amplitudes) on one 16 GiB chip
        re, im = init_pair(n)

        def body(_, c):
            return execute_pair(c[0], c[1], ops, params, low_width=low_w,
                                high_width=high_w)

        if n >= 30:
            # unrolled: a fori_loop carry is double-buffered by XLA
            # (2 x 8 GiB = the observed 258 MiB-over OOM); straight-line
            # code lets buffer assignment chain the passes in place
            c = (re, im)
            for i in range(LAYERS // reps):
                c = body(i, c)
            re, im = c
        else:
            re, im = jax.lax.fori_loop(0, LAYERS // reps, body, (re, im))
        # scalar output forces real synchronization on transfer
        return jnp.sum(re * re + im * im)

    params = jnp.asarray(np.linspace(0.1, 1.0, n), jnp.float32)
    norm = float(program(params))  # compile + warmup
    assert abs(norm - 1.0) < 1e-2, f"norm drifted: {norm}"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(program(params))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - TRANSFER_OVERHEAD_S, 1e-9)
    return (LAYERS * n) / dt


def run_single(n):
    gps = bench_at(n)
    print(json.dumps({"n": n, "gates_per_sec": gps}))
    return 0


def bench_ansatz(n):
    """RY-column + CNOT-ring layers — the VQE hot path, riding the fused
    1q+CNOT kernel. ROCQ_ANSATZ_BODY layers share kernel passes per
    fori_loop body (the multi-layer pass-sharing lever, same as REPS for
    the 1q-layer metric)."""
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef
    from rocquantum_tpu.compiler.interpreter import (default_widths,
                                                     execute_pair, init_pair)

    layers = 8
    body_layers = int(os.environ.get("ROCQ_ANSATZ_BODY", "2"))
    ir = CircuitIR(n, name="bench_ansatz")
    for _ in range(body_layers):
        for q in range(n):
            ir.add("RY", [q], params=[ParamRef(q)])
        for q in range(n):
            ir.add("CNOT", [(q + 1) % n], controls=[q])
    ops = list(ir.ops)
    low_w, high_w = default_widths(n)

    @jax.jit
    def program(params):
        re, im = init_pair(n)

        def body(_, c):
            return execute_pair(c[0], c[1], ops, params, low_width=low_w,
                                high_width=high_w)

        re, im = jax.lax.fori_loop(0, layers // body_layers, body, (re, im))
        return jnp.sum(re * re + im * im)

    params = jnp.asarray(np.linspace(0.1, 1.0, n), jnp.float32)
    norm = float(program(params))
    assert abs(norm - 1.0) < 1e-2, norm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(program(params))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - TRANSFER_OVERHEAD_S, 1e-9)
    return (layers * 2 * n) / dt


def run_ansatz(n):
    gps = bench_ansatz(n)
    print(json.dumps({"ansatz_n": n, "ansatz_gates_per_sec": round(gps, 2)}))
    return 0


def probe_ansatz(n):
    script = os.path.abspath(__file__)
    try:
        out = subprocess.run([sys.executable, script, "--ansatz", str(n)],
                             capture_output=True, text=True,
                             timeout=PER_SIZE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "ansatz_gates_per_sec" in rec:
            return rec
    return None


def bench_qft():
    """QFT wall-clock via the Circuit API (segmented execution) — the
    reference's declared benchmark workload (benchmarks/run_benchmark.py:
    36-37, QFT 10-20)."""
    import jax
    _enable_compile_cache()
    import rocquantum_tpu as rocq
    from rocquantum_tpu.models import qft_ir

    ir = qft_ir(QFT_N)
    sim = rocq.Simulator()

    def run_once():
        c = rocq.Circuit(QFT_N, sim)
        for op in ir.ops:
            c._enqueue(op.name, op.targets, op.controls, op.params, op.matrix)
        c.flush()
        # scalar read forces synchronization on this backend
        return float(c.expval(rocq.PauliOperator({"Z0": 1.0})))

    run_once()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    # the D2-fused QFT is one kernel pass: wall-clock lands AT the ~35 ms
    # transfer floor, so the subtraction can underflow — clamp to the
    # measurement resolution
    return len(ir.ops), max(min(times) - TRANSFER_OVERHEAD_S, 1e-5)


def run_qft():
    n_ops, secs = bench_qft()
    print(json.dumps({"qft_n": QFT_N, "qft_ops": n_ops,
                      "qft_ms": round(secs * 1e3, 2)}))
    return 0


def probe_qft():
    script = os.path.abspath(__file__)
    try:
        out = subprocess.run([sys.executable, script, "--qft"],
                             capture_output=True, text=True,
                             timeout=QFT_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "qft_ms" in rec:
            return rec
    return None


def probe():
    script = os.path.abspath(__file__)
    for n in SIZES:
        try:
            out = subprocess.run(
                [sys.executable, script, "--size", str(n)],
                capture_output=True, text=True, timeout=PER_SIZE_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            continue
        if out.returncode != 0:
            continue
        for line in out.stdout.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "gates_per_sec" in rec:
                return rec["n"], rec["gates_per_sec"]
    return None, None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=None)
    parser.add_argument("--qft", action="store_true")
    parser.add_argument("--ansatz", type=int, default=None)
    args = parser.parse_args()
    if args.qft:
        return run_qft()
    if args.ansatz is not None:
        return run_ansatz(args.ansatz)
    if args.size is not None:
        return run_single(args.size)

    n_used, gates_per_sec = probe()
    if gates_per_sec is None:
        print(json.dumps({"metric": "gates_per_sec", "value": 0.0,
                          "unit": "gates/s", "vs_baseline": 0.0,
                          "error": "no size completed within budget"}))
        return 1
    ideal = HBM_BYTES_PER_SEC / (16.0 * (1 << n_used))
    record = {
        "metric": (f"1q-gate throughput, {n_used}-qubit statevector "
                   "(complex64)"),
        "value": round(gates_per_sec, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_sec / ideal, 3),
    }
    qft = probe_qft() or probe_qft()  # mixed-gate QFT; one retry (the
    # compile cache makes the second attempt cheap if the first timed out)
    if qft is not None:
        record["qft_n20_ms"] = qft["qft_ms"]
    ansatz = probe_ansatz(min(n_used, 29)) or probe_ansatz(min(n_used, 29))
    if ansatz is not None:
        record["ansatz_gates_per_sec"] = ansatz["ansatz_gates_per_sec"]
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
