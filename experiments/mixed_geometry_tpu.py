"""Prove the mixed-geometry planner (ROCQ_GEOMETRY=mixed) on the REAL TPU.

Round-3 pending item: plan_mixed_layer was CPU-verified in interpret mode
only — Mosaic compilation of the thin-geometry merged-run chain pass and
its VMEM behavior only surface on chip. This runs ring ansatze through
the mixed plan on the real TPU and checks the statevector against the
plain (ROCQ_DISABLE_PALLAS) XLA engine, then times mixed vs default
geometry on a deeper body.

Reference cost model being beaten: one HBM pass per 2q gate
(/root/reference/rocquantum/src/hipStateVec/two_qubit_kernels.hip:17-51).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import rocquantum_tpu as rocq
from rocquantum_tpu.compiler.interpreter import clear_cache

N = 20
LAYERS = 2
rng = np.random.default_rng(11)
thetas = rng.normal(size=(LAYERS, N))


def build(circ):
    for l in range(LAYERS):
        for q in range(N):
            circ.ry(float(thetas[l, q]), q)
        for q in range(N):
            circ.cx(q, (q + 1) % N)


def run(env):
    for k in ("ROCQ_GEOMETRY", "ROCQ_DISABLE_PALLAS"):
        os.environ.pop(k, None)
    os.environ.update(env)
    clear_cache()
    t0 = time.perf_counter()
    c = rocq.Circuit(N, rocq.Simulator())
    build(c)
    state = np.asarray(c.get_statevector())
    dt = time.perf_counter() - t0
    clear_cache()
    return state, dt


mixed, t_mixed = run({"ROCQ_GEOMETRY": "mixed"})
plain, t_plain = run({"ROCQ_DISABLE_PALLAS": "1"})
max_err = float(np.max(np.abs(mixed - plain)))
rec = {"mixed_geometry_tpu": "ok" if max_err < 3e-5 else "FAIL",
       "n": N, "layers": LAYERS, "max_err": max_err,
       "platform": jax.devices()[0].platform}
print(json.dumps(rec), flush=True)
assert max_err < 3e-5, max_err
