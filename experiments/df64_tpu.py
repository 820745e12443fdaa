"""Double-float (hi/lo f32) engine on the REAL TPU: EFT exactness,
circuit accuracy vs the exact-f64 pair engine, and RY-layer throughput
vs the fp64 probe's workload (bench.py bench_fp64, same shape).

The df64 engine's correctness rests on the VPU's f32 add/mul being IEEE
round-to-nearest and XLA not reassociating them — stage 1 proves that ON
CHIP (two_sum / two_prod residuals exactly reproduce the f64 values).

Usage:  python experiments/df64_tpu.py [n] [reps]   (defaults 26 2)
"""
import sys, time, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from rocquantum_tpu.ops import df64, pairsim
from rocquantum_tpu.compiler.ir import CircuitIR

N = int(sys.argv[1]) if len(sys.argv) > 1 else 26
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
TRANSFER_OVERHEAD_S = 0.035

# --- stage 1: EFT exactness on the VPU --------------------------------
@jax.jit
def eft_err(key):
    a = jax.random.normal(key, (1 << 20,), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (1 << 20,),
                          jnp.float32) * 1e-3
    s, e = df64.two_sum(a, b)
    sum_err = jnp.max(jnp.abs((s.astype(jnp.float64)
                               + e.astype(jnp.float64))
                              - (a.astype(jnp.float64)
                                 + b.astype(jnp.float64))))
    p, f = df64.two_prod(a, b)
    prod_err = jnp.max(jnp.abs((p.astype(jnp.float64)
                                + f.astype(jnp.float64))
                               - (a.astype(jnp.float64)
                                  * b.astype(jnp.float64))))
    return sum_err + prod_err

err = float(eft_err(jax.random.PRNGKey(0)))
print(json.dumps({"stage": "eft", "max_err": err,
                  "exact": err == 0.0}), flush=True)

# --- stage 2: circuit accuracy vs the exact f64 pair engine ------------
n_small = 10
ir = CircuitIR(n_small, name="df64_acc")
rng = np.random.default_rng(0)
for layer in range(2):  # one program holds BOTH engines — stay compilable
    for q in range(n_small):
        ir.add("RY", [q], params=[float(rng.normal())])
        ir.add("RZ", [q], params=[float(rng.normal())])
    for q in range(n_small - 1):
        ir.add("CNOT", [q + 1], controls=[q])
    ir.add("U3", [layer % n_small], params=[0.3, -0.2, 0.8])

@jax.jit
def acc_err():
    state = df64.init_df64(n_small)
    re, im = pairsim.init_pair(n_small, dtype=jnp.float64)
    for op in ir.ops:
        state = df64.apply_op_df64(state, op)
        re, im = pairsim.apply_op_pair(re, im, op)
    gre, gim = df64.state_to_pair_f64(state)
    return jnp.max(jnp.maximum(jnp.abs(gre - re), jnp.abs(gim - im)))

aerr = float(acc_err())
print(json.dumps({"stage": "accuracy_n10", "depth": len(ir.ops),
                  "max_err": aerr, "ok": aerr < 1e-12}), flush=True)

# --- stage 3: RY-layer throughput at bench_fp64's workload shape --------
@jax.jit
def prog(params):
    state = df64.init_df64(N)
    for _ in range(REPS):
        for q in range(N):
            rows, _ = pairsim.gate_rows("RY", (params[q],),
                                        dtype=jnp.float64)
            rows_df = [[df64.split_f64(v) for v in row] for row in rows]
            a = df64._apply_real_elementwise_df(state[0], state[1],
                                                rows_df, [q])
            b = df64._apply_real_elementwise_df(state[2], state[3],
                                                rows_df, [q])
            state = (a[0], a[1], b[0], b[1])
    return df64.norm2_df64(state)

params = jnp.asarray(np.linspace(0.1, 1.0, N), jnp.float64)
t0 = time.perf_counter()
norm = float(prog(params))
print(json.dumps({"stage": "compile+first", "s": time.perf_counter() - t0,
                  "norm_drift": abs(norm - 1.0)}), flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(prog(params))
    times.append(time.perf_counter() - t0)
dt = max(min(times) - TRANSFER_OVERHEAD_S, 1e-9)
gps = REPS * N / dt
print(json.dumps({"stage": "throughput", "n": N, "reps": REPS,
                  "df64_gates_per_sec": round(gps, 2),
                  # ideal-traffic model matching bench_fp64: 4 f32 planes
                  # read+write = 32 B/amp per gate (same bytes as 2 f64)
                  "df64_gbps": round(gps * 32.0 * (1 << N) / 1e9, 1),
                  "norm_drift": float(f"{abs(norm - 1.0):.2e}"),
                  "times": [round(t, 4) for t in times]}), flush=True)
