"""Lead-pass optimization sweep on the REAL TPU (n=29, unrolled REPS).

pass_micro_tpu measured the mixed plan's DEFAULT-geometry lead pass at
~106 ms (81 GB/s vs the 600 GB/s stream floor): MXU-latency-bound on the
HIGHEST-precision per-tile region dots. This sweeps the compute knobs on
that exact pass:

  novmxu      - ROCQ_DISABLE_MXU=1 (pure VPU rolls)
  w5 / w4     - ROCQ_LANE_DOT_WIDTH caps the lane dot at 2^w
  bf16x3      - 3-pass bf16 region dots (vs HIGHEST's 6)
  w5_bf16x3   - both
  real        - single-plane real-state pass (im=None): half DMA + compute
  real_w5_b3  - real plane + both compute knobs
  thin_real   - the (8,3) k=9 chain pass on one plane

Each case is one jitted program unrolling REPS copies of one pass;
timing by scalar readback minus the ~35 ms transfer overhead.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from rocquantum_tpu.compiler.interpreter import _plan_mixed, _spec_anchors
from rocquantum_tpu.ops.pallas_sv import max_kernel_qubit, pack_gate_mats
from rocquantum_tpu.ops.relabel import execute_plan

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
LEAD = [mixed[0]]    # default geometry, 57 gates, pairs (17,18,19)
THIN = [mixed[1]]    # (8,3), 26 gates, pairs 20..28

CASES = {
    "novmxu": (LEAD, {"ROCQ_DISABLE_MXU": "1"}, False),
    "w5": (LEAD, {"ROCQ_LANE_DOT_WIDTH": "5"}, False),
    "w4": (LEAD, {"ROCQ_LANE_DOT_WIDTH": "4"}, False),
    "bf16x3": (LEAD, {"ROCQ_DOT_PRECISION": "bf16x3"}, False),
    "w5_bf16x3": (LEAD, {"ROCQ_LANE_DOT_WIDTH": "5",
                         "ROCQ_DOT_PRECISION": "bf16x3"}, False),
    "real": (LEAD, {}, True),
    "real_w5_b3": (LEAD, {"ROCQ_LANE_DOT_WIDTH": "5",
                          "ROCQ_DOT_PRECISION": "bf16x3"}, True),
    "thin_real": (THIN, {}, True),
}
KNOBS = ("ROCQ_DISABLE_MXU", "ROCQ_LANE_DOT_WIDTH", "ROCQ_DOT_PRECISION")


def time_case(name, plan_items, env, real_plane):
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)

    @jax.jit
    def prog(gm):
        shape = (1 << N,)
        re = jnp.zeros(shape, jnp.float32).at[0].set(1.0)
        im = None if real_plane else jnp.zeros(shape, jnp.float32)
        for _ in range(REPS):
            re, im = execute_plan(re, im, plan_items, gm, N,
                                  kinds=kinds, real_flags=flags)
        total = jnp.sum(re * re)
        if im is not None:
            total = total + jnp.sum(im * im)
        return total

    gm = jnp.asarray(gm_np)
    norm = float(prog(gm))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(gm))
        times.append(time.perf_counter() - t0)
    per_pass_ms = (min(times) - TRANSFER_S) / REPS * 1e3
    item = plan_items[0]
    planes = 1 if real_plane else 2
    rec = {"case": name, "ms_per_pass": round(per_pass_ms, 2),
           "gates": len(item.gate_idx),
           "geometry": getattr(item, "geometry", None),
           "real_plane": real_plane, "env": env,
           "norm": round(norm, 6),
           "gbps": round(planes * 2 * 4 * (1 << N)
                         / (per_pass_ms / 1e3) / 1e9, 1)}
    print(json.dumps(rec), flush=True)


names = sys.argv[1:] or list(CASES)
for name in names:
    try:
        time_case(name, *CASES[name])
    except Exception as e:  # keep sweeping past per-case failures
        print(json.dumps({"case": name, "error": repr(e)[:300]}),
              flush=True)
