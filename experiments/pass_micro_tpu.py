"""Per-pass-type microbenchmark on the REAL TPU (n=29, unrolled).

The mixed-geometry ring-ansatz bench measured ~59 ms/pass average
(473 gates/s at body=8) against a ~15-20 ms/pass projection. This times
each pass SHAPE of the body=8 mixed plan in isolation:

  lead   - default geometry, 57-gate window body, k=3 pair bits
  lead2  - default geometry, 38-gate steady-state body, k=3 pair bits
  thin   - (8,3) geometry, 26-gate merged-run chain body, k=9 pair bits
  tall   - (10,5) geometry, 57-gate body, k=5 pair bits
  floor  - default geometry, 14-gate in-window body, no pair bits

Each program unrolls REPS copies of ONE pass and returns a scalar
(timing rule: scalar readback is the only sync on this backend;
subtract the ~35 ms transfer overhead).

Usage: python experiments/pass_micro_tpu.py [names...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from rocquantum_tpu.compiler.interpreter import _plan_mixed, _spec_anchors
from rocquantum_tpu.ops.pallas_sv import (TALL_GEOMETRY, max_kernel_qubit,
                                          max_pair_bits_for, pack_gate_mats)
from rocquantum_tpu.ops.relabel import execute_plan, plan_full_layer

N = 29
BODY = 8
REPS = 8
TRANSFER_S = 0.035

kinds, supports, mats = [], [], []
rng = np.random.default_rng(3)
for _ in range(BODY):
    for q in range(N):
        kinds.append("U")
        supports.append((q,))
        th = rng.normal()
        mats.append(np.array([[np.cos(th / 2), -np.sin(th / 2)],
                              [np.sin(th / 2), np.cos(th / 2)]],
                             np.complex64))
    for q in range(N):
        kinds.append("CNOT")
        supports.append((q, (q + 1) % N))
        mats.append(np.eye(2, dtype=np.complex64))
flags = [True] * len(kinds)
gm_np = pack_gate_mats(mats)

limit = max_kernel_qubit(N) + 1
mixed = _plan_mixed(N, kinds, supports, limit)
anchors = _spec_anchors(kinds, supports, limit)

gcol, gtile = TALL_GEOMETRY
geo_limit = min(gcol, N) + min(gtile, N - min(gcol, N))
tall = plan_full_layer(N, supports, geo_limit, pair_ok=True,
                       anchors=_spec_anchors(kinds, supports, geo_limit),
                       max_pairs=max_pair_bits_for(gcol, gtile),
                       geometry=TALL_GEOMETRY)

# a pair-free floor pass: first 14 in-window gates of the layer
floor_plan = plan_full_layer(
    N, [supports[i] for i in range(14)], limit, pair_ok=False,
    anchors=[anchors[i] for i in range(14)])

CASES = {
    "lead": [mixed[0]],
    "lead2": [mixed[2]],
    "thin": [mixed[1]],
    "tall": [tall[0]],
    "floor": floor_plan[:1],
}


def time_case(name, plan_items):
    @jax.jit
    def prog(gm):
        shape = (1 << N,)
        re = jnp.zeros(shape, jnp.float32).at[0].set(1.0)
        im = jnp.zeros(shape, jnp.float32)
        for _ in range(REPS):
            re, im = execute_plan(re, im, plan_items, gm, N,
                                  kinds=kinds, real_flags=flags)
        return jnp.sum(re * re + im * im)

    gm = jnp.asarray(gm_np)
    float(prog(gm))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(gm))
        times.append(time.perf_counter() - t0)
    per_pass_ms = (min(times) - TRANSFER_S) / REPS * 1e3
    item = plan_items[0]
    rec = {"case": name, "ms_per_pass": round(per_pass_ms, 2),
           "gates": len(item.gate_idx),
           "pairs": list(item.pair_bits),
           "geometry": getattr(item, "geometry", None),
           "gbps": round(2 * 2 * 4 * (1 << N) / (per_pass_ms / 1e3) / 1e9,
                         1)}
    print(json.dumps(rec), flush=True)


names = sys.argv[1:] or list(CASES)
for name in names:
    time_case(name, CASES[name])
