"""TPU experiment: full-range fused Pallas layer vs old path, n=29."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef
from rocquantum_tpu.compiler.interpreter import execute, default_widths
from rocquantum_tpu.ops import statevec as sv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 29
LAYERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DOUBLE = os.environ.get("EXP_DOUBLE", "1") == "1"   # 2 layers per loop body
MODE = os.environ.get("EXP_MODE", "pallas")          # pallas | old

ir = CircuitIR(N, name="bench_layer")
reps = 2 if DOUBLE else 1
for r in range(reps):
    for q in range(N):
        ir.add("RY", [q], params=[ParamRef(q)])
ops = list(ir.ops)
low_w, high_w = default_widths(N)
use_pallas = None if MODE == "pallas" else None
if MODE == "old":
    os.environ["ROCQ_DISABLE_PALLAS"] = "1"

@jax.jit
def program(params):
    state = sv.init_state(N)
    def body(_, s):
        return execute(s, ops, params, low_width=low_w, high_width=high_w)
    state = jax.lax.fori_loop(0, LAYERS // reps, body, state)
    return jnp.sum(jnp.abs(state) ** 2)

params = jnp.asarray(np.linspace(0.1, 1.0, N), jnp.float32)
t0 = time.perf_counter()
norm = float(program(params))
print(f"compile+first run: {time.perf_counter()-t0:.1f}s norm={norm}", flush=True)
assert abs(norm - 1.0) < 1e-2, norm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(program(params))
    times.append(time.perf_counter() - t0)
dt = max(min(times) - 0.035, 1e-9)
gps = (LAYERS * N) / dt
ideal = 819e9 / (16.0 * (1 << N))
print(json.dumps({"mode": MODE, "n": N, "layers": LAYERS,
                  "double": DOUBLE, "gates_per_sec": round(gps, 2),
                  "vs_ideal": round(gps / ideal, 3),
                  "times": [round(t, 4) for t in times]}), flush=True)
