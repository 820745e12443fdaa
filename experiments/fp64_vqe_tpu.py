"""fp64 VQE-H2 adjoint gradients at 1e-6 on the REAL TPU (VERDICT r2 #5).

Runs the H2 VQE in double precision on the TPU chip via the float-PAIR
f64 path (the x64 rewriter cannot compile c128 programs — see
ops/pairsim.py), checks the adjoint gradient against parameter-shift
(computed from the same energy fn, +-pi/2 rule) to 1e-6, and records the
converged energy error vs the exact ground state.
"""
import sys, time, json
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu.config import set_precision

set_precision("double")

h2 = {"I": -0.4804 + 0.7137, "Z0": 0.3435, "Z1": -0.4347,
      "Z0 Z1": 0.5716, "X0 X1": 0.0910, "Y0 Y1": 0.0910}
EXACT = -1.13728


@rocq.kernel
def ansatz(q, t0, t1, t2, t3):
    q.ry(t0, 0)
    q.ry(t1, 1)
    q.cx(0, 1)
    q.ry(t2, 0)
    q.ry(t3, 1)


sim = rocq.Simulator(seed=0)
H = rocq.PauliOperator(h2)
rng = np.random.default_rng(0)
p0 = rng.uniform(0, 2 * np.pi, 4)

from rocquantum_tpu.api import make_energy_fn
energy = make_energy_fn(ansatz, 2, H, 4)
efn = jax.jit(energy)
vg = jax.jit(jax.value_and_grad(energy))

p = jnp.asarray(p0, jnp.float64)
e, g = vg(p)
# parameter-shift rule from the SAME energy fn (rocq.grad semantics,
# api.py parameter-shift: dE = 0.5 (E+ - E-))
g_ps = []
for i in range(4):
    ei = jnp.zeros(4, jnp.float64).at[i].set(np.pi / 2)
    g_ps.append(0.5 * (float(efn(p + ei)) - float(efn(p - ei))))
gerr = float(np.max(np.abs(np.asarray(g) - np.asarray(g_ps))))
print("grad check done:", gerr, flush=True)

from scipy.optimize import minimize
t0 = time.perf_counter()


def obj(pv):
    v, gr = vg(jnp.asarray(pv, jnp.float64))
    return float(v), np.asarray(gr)


res = minimize(obj, p0, method="L-BFGS-B", jac=True,
               options={"maxiter": 200})
dt = time.perf_counter() - t0
print(json.dumps({
    "fp64_vqe_tpu": "ok",
    "adjoint_vs_paramshift_max_err": gerr,
    "energy": float(res.fun), "exact": EXACT,
    "energy_err": abs(float(res.fun) - EXACT),
    "nfev": int(res.nfev), "seconds": round(dt, 2),
    "platform": jax.devices()[0].platform,
}), flush=True)
assert gerr < 1e-6, gerr
