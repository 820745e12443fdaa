"""Prove vmap-of-pallas_call (the batched fused kernel) on the REAL TPU.

VERDICT r2 'What's missing' #3: the vmap(pallas) composition was only
exercised in interpret mode on CPU. This runs a batched circuit through
the fused kernel on the real chip and checks against per-element runs.
"""
import sys, time, json
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu.ops.statevec import state_to_parts

n = 16          # small but above the kernel-engage threshold (COL_QUBITS+3)
batch = 4

sim = rocq.Simulator()
c = rocq.Circuit(n, sim, batch_size=batch)
for q in range(8):
    c.ry(0.1 * (q + 1), q)
for q in range(7):
    c.cx(q, q + 1)
c.flush()
states = c.get_statevector()
print("batched shape:", np.asarray(states).shape, flush=True)

ref = rocq.Circuit(n, rocq.Simulator())
for q in range(8):
    ref.ry(0.1 * (q + 1), q)
for q in range(7):
    ref.cx(q, q + 1)
exp = np.asarray(ref.get_statevector())

max_err = 0.0
for b in range(batch):
    max_err = max(max_err, float(np.max(np.abs(np.asarray(states[b]) - exp))))
print(json.dumps({"batched_pallas_tpu": "ok", "n": n, "batch": batch,
                  "max_err": max_err}), flush=True)
assert max_err < 1e-5, max_err
