"""Full-qubit-range fused 1q layers: kernel passes + index-bit rotations.

The fused Pallas kernel (ops/pallas_sv.py) reaches qubits inside one VMEM
block — columns + tile rows (17 at the default geometry) plus one arbitrary
"pair bit" above. Gates on higher qubits are reached by RELABELING: rotating
the index-bit region [ROT_LO, n) so pending qubits land inside the kernel's
window, then rotating back at the end. Each rotation is a single rank-3 XLA
transpose whose minor dimension is 2**ROT_LO floats (>= the 128-lane
register, so the layout never pads — the hazard tests/test_layout_hazard.py
guards against).

This is the single-chip analog of the reference's rocsvSwapIndexBits
index-bit relabeling (hipStateVec.h:135-137, MULTI_GPU_GUIDE.md:44-51): the
reference localizes non-local qubits with an explicit alltoallv; here a
layout rotation localizes out-of-window qubits for the fused kernel, and
1q gates on distinct qubits commute, so a whole multi-layer run schedules
into ~one kernel pass + one rotation per 11 covered qubits.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

ROT_LO = 7  # rotations never touch bits [0, 7): 2^7 = 128-float lane register


@dataclasses.dataclass(frozen=True)
class KernelPass:
    """One fused-kernel HBM pass: ``gate_idx[k]`` (index into the caller's
    gate list) applies at physical bit ``positions[k]``."""
    gate_idx: Tuple[int, ...]
    positions: Tuple[int, ...]
    pair_bit: int  # -1 when unused


@dataclasses.dataclass(frozen=True)
class Rotation:
    """Rotate index-bit region [ROT_LO, n) DOWN by ``shift``: the bit at
    position ROT_LO + j moves to ROT_LO + ((j - shift) mod size)."""
    shift: int


def rotate_bits_down(x: jnp.ndarray, n: int, shift: int) -> jnp.ndarray:
    """Apply a downward rotation of index-bit region [ROT_LO, n) by shift.

    One rank-3 transpose: view (hi=2^(size-shift), lo=2^shift, L=2^ROT_LO),
    emit (lo, hi, L) — the minor dim stays contiguous and >= 128 floats.
    """
    size = n - ROT_LO
    shift %= size
    if shift == 0:
        return x
    hi = 1 << (size - shift)
    lo = 1 << shift
    L = 1 << ROT_LO
    lead = x.shape[:-1]
    v = x.reshape(lead + (hi, lo, L))
    k = len(lead)
    perm = tuple(range(k)) + (k + 1, k, k + 2)
    return v.transpose(perm).reshape(x.shape)


def plan_full_1q_layer(n: int, qubits: Sequence[int], reach: int,
                       pair_ok: bool = True) -> List[object]:
    """Schedule 1q gates on arbitrary qubits into KernelPass / Rotation items.

    ``reach`` is the highest in-tile qubit + 1 (col + tile bits). Gates whose
    current position is < reach go through rolls; one extra position >= reach
    per pass rides the pair-bit path. 1q gates on distinct qubits commute, so
    gates may be reordered across list positions; per-qubit order is kept
    (stable by original index). The plan always restores the identity
    labeling.
    """
    qubits = [int(q) for q in qubits]
    if any(q >= n for q in qubits):
        raise ValueError(f"qubit out of range for n={n}: {qubits}")
    size = n - ROT_LO
    rot = 0  # accumulated downward rotation

    def pos(q: int) -> int:
        if q < ROT_LO:
            return q
        return ROT_LO + ((q - ROT_LO - rot) % size)

    pending = list(range(len(qubits)))  # gate indices, original order
    plan: List[object] = []
    while pending:
        take = [i for i in pending if pos(qubits[i]) < reach]
        rest = [i for i in pending if pos(qubits[i]) >= reach]
        pair = -1
        if rest and pair_ok:
            # pair bit: the out-of-window position with the most gates
            counts: dict = {}
            for i in rest:
                counts[pos(qubits[i])] = counts.get(pos(qubits[i]), 0) + 1
            pair = max(sorted(counts), key=lambda p: counts[p])
            take += [i for i in rest if pos(qubits[i]) == pair]
            rest = [i for i in rest if pos(qubits[i]) != pair]
        take.sort()
        if not take:
            raise AssertionError("scheduler made no progress")
        plan.append(KernelPass(
            gate_idx=tuple(take),
            positions=tuple(pos(qubits[i]) for i in take),
            pair_bit=pair))
        pending = rest
        if pending:
            # rotate so the lowest pending position lands at ROT_LO
            pmin = min(pos(qubits[i]) for i in pending)
            shift = pmin - ROT_LO
            if shift == 0:
                raise AssertionError("pending qubit already in window")
            rot = (rot + shift) % size
            plan.append(Rotation(shift))
    if rot % size:
        plan.append(Rotation((-rot) % size))
    return plan


def execute_plan(re: jnp.ndarray, im: jnp.ndarray, plan: List[object],
                 gate_mats: jnp.ndarray, n: int,
                 real_flags: Sequence[bool] = None,
                 interpret: bool = False):
    """Run a plan from :func:`plan_full_1q_layer` on a float-pair state."""
    import numpy as np

    from .pallas_sv import apply_fused_1q_layer

    for item in plan:
        if isinstance(item, Rotation):
            # serialize the two transposes: scheduled concurrently they hold
            # 2 full states (in+out each) = 16 GiB at n=30 — the barrier
            # caps peak at 1.5 states
            re = rotate_bits_down(re, n, item.shift)
            re, im = jax.lax.optimization_barrier((re, im))
            im = rotate_bits_down(im, n, item.shift)
        else:
            gm = gate_mats[np.asarray(item.gate_idx)]
            pair = item.pair_bit if item.pair_bit >= 0 else None
            flags = tuple(real_flags[i] for i in item.gate_idx) \
                if real_flags is not None else None
            re, im = apply_fused_1q_layer(re, im, item.positions, gm,
                                          pair_bit=pair, real_flags=flags,
                                          interpret=interpret)
    return re, im
