"""Full-qubit-range fused 1q layers: kernel passes + index-bit rotations.

The fused Pallas kernel (ops/pallas_sv.py) reaches qubits inside one VMEM
block — columns + tile rows (17 at the default geometry) plus one arbitrary
"pair bit" above. Gates on higher qubits are reached by RELABELING: rotating
the index-bit region [ROT_LO, n) so pending qubits land inside the kernel's
window, then rotating back at the end. Rotations are one HBM pass each: a
Pallas copy kernel whose block index maps encode the bit rotation (large n;
default-layout output, no relayout copies) or a rank-3 XLA transpose whose
minor dimension stays >= the 128-float lane register (small n; the padding
hazard tests/test_fusion_passes.py guards against).

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROT_LO = 7  # rotations never touch bits [0, 7): 2^7 = 128-float lane register


@dataclasses.dataclass(frozen=True)
class KernelPass:
    """One fused-kernel HBM pass: ``gate_idx[k]`` (index into the caller's
    gate list) applies at the physical bit(s) ``positions[k]`` (a 1-tuple
    for 1q gates, (control, target) for CNOT)."""
    gate_idx: Tuple[int, ...]
    positions: Tuple[Tuple[int, ...], ...]
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
    out = v.transpose(perm).reshape(x.shape)
    # pin the flat default layout here: without this, XLA materializes the
    # transpose in a consumer-chosen layout and the downstream kernel-view
    # reshape becomes a SECOND full-state relayout copy (observed at n=30:
    # two 4 GiB temps per rotation -> HBM OOM)
    return jax.lax.optimization_barrier(out)


def _rotate_bits_down_pallas(x: jnp.ndarray, n: int, shift: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Rotation as a Pallas copy kernel — one HBM pass, default-layout
    output.

    The XLA transpose path materializes TWICE at large n: once for the
    physical transpose and once to relayout for the next kernel's view
    (observed: 2 x 4 GiB temps per rotation at n=30 -> OOM). Here the
    rotation lives entirely in the BLOCK INDEX MAPS: for a no-wrap shift,
    every output (32, 32, 128)-element tile [bits 12-16 | 7-11 | 0-6] is one
    CONTIGUOUS input block in the (Hi, B, S, L) view — axes covering input
    bits [17+s, n), [7+s, 17+s), [7, 7+s), [0, 7) — so the kernel body is a
    sublane reshape of a straight copy.

    Requires shift <= n - 17 (no wrap of the 10-bit window) and n >= 17.
    """
    size = n - ROT_LO
    s = shift % size
    if s == 0:
        return x
    assert n >= 17 and s <= n - 17, (n, s)
    hi_count = 1 << (n - 17 - s)
    # S and L fold into one trailing axis: Mosaic requires the block's last
    # two dims be (multiple of 8, multiple of 128) — a 128-wide slice of the
    # (S*L) axis IS one S value's L-run
    in_view = x.reshape(hi_count, 1 << 10, (1 << s) * (1 << ROT_LO))
    out_shape = (1 << (n - 17), 32, 32, 1 << ROT_LO)

    def kernel(in_ref, out_ref):
        out_ref[0] = in_ref[0].reshape(32, 32, 1 << ROT_LO)

    out = pl.pallas_call(
        kernel,
        grid=(hi_count, 1 << s),
        in_specs=[pl.BlockSpec((1, 1 << 10, 1 << ROT_LO),
                               lambda h, t: (h, 0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 32, 32, 1 << ROT_LO),
                               lambda h, t, _hi=hi_count: (t * _hi + h,
                                                           0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=interpret,
    )(in_view)
    return out.reshape(x.shape)


def rotate_region(x: jnp.ndarray, n: int, shift: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Rotation dispatcher: Pallas copy kernel when the no-wrap condition
    holds (always true for the planner's shifts at n >= 27), XLA transpose
    otherwise (small states, where the extra relayout copy is harmless)."""
    size = n - ROT_LO
    s = shift % size
    if s == 0:
        return x
    if x.ndim == 1 and n >= 17 and s <= n - 17:
        return _rotate_bits_down_pallas(x, n, s, interpret=interpret)
    return rotate_bits_down(x, n, s)


MAX_ROTATION_QUBITS = 29  # above this, rotation temps exceed 16 GiB HBM:
                          # XLA does not reuse buffers across the rotation
                          # custom calls (measured: 4 live 4 GiB buffers at
                          # n=30), so plans go pair-bit-only instead


def _items_to_plan(n: int, supports, items) -> List[object]:
    """Rebuild KernelPass/Rotation objects (with positions) from the native
    scheduler's compact records."""
    size = n - ROT_LO
    rot = 0

    def pos(q: int) -> int:
        if q < ROT_LO:
            return q
        return ROT_LO + ((q - ROT_LO - rot) % size)

    plan: List[object] = []
    for item in items:
        if item[0] == "rot":
            plan.append(Rotation(item[1]))
            rot = (rot + item[1]) % size
        else:
            _, pair, idx = item
            plan.append(KernelPass(
                gate_idx=idx,
                positions=tuple(tuple(pos(q) for q in supports[i])
                                for i in idx),
                pair_bit=pair))
    return plan


def plan_full_layer(n: int, supports: Sequence[Tuple[int, ...]], reach: int,
                    pair_ok: bool = True,
                    allow_rotations: bool = None) -> List[object]:
    """Schedule gates (1q or 2q, given by their qubit ``supports``) into
    KernelPass / Rotation items covering ALL n qubits.

    ``reach`` is the highest in-tile qubit + 1 (col + tile bits). Gates whose
    current positions are all < reach go through rolls; one extra position
    >= reach per pass rides the pair-bit path. Scheduling is
    dependency-aware: gates with disjoint supports commute (may share or
    swap passes), while a gate never overtakes an earlier gate touching any
    of its qubits. The plan always restores the identity labeling.

    The scheduling loop runs in native C++ (native/fusion_planner.cpp, the
    analog of the reference's host-side GateFusion.cpp) with this Python
    implementation as fallback and differential-test oracle.
    """
    supports = [tuple(int(q) for q in s) for s in supports]
    if any(q >= n for s in supports for q in s):
        raise ValueError(f"qubit out of range for n={n}: {supports}")
    if allow_rotations is None:
        allow_rotations = n <= MAX_ROTATION_QUBITS

    from ._native_planner import Unschedulable, plan_layer_native
    try:
        native = plan_layer_native(n, supports, reach, pair_ok,
                                   allow_rotations)
    except Unschedulable as exc:
        raise ValueError(str(exc)) from exc
    if native is not None:
        return _items_to_plan(n, supports, native)

    size = n - ROT_LO
    rot = 0  # accumulated downward rotation

    def pos(q: int) -> int:
        if q < ROT_LO:
            return q
        return ROT_LO + ((q - ROT_LO - rot) % size)

    pending = list(range(len(supports)))  # gate indices, original order

    def scan(pair: int):
        """List-schedule one pass: take gates in order whose qubits are not
        blocked by an earlier unscheduled gate and whose positions fit the
        window (+ pair)."""
        taken, blocked = [], set()
        for i in pending:
            s = supports[i]
            if any(q in blocked for q in s):
                blocked |= set(s)
                continue
            if all(pos(q) < reach or pos(q) == pair for q in s):
                taken.append(i)
            else:
                blocked |= set(s)
        return taken

    plan: List[object] = []
    while pending:
        take = scan(-1)
        pair = -1
        if pair_ok:
            # candidate pair bits: out-of-window positions used by pending
            # gates; pick the one scheduling the most gates
            cands = sorted({pos(q) for i in pending for q in supports[i]
                            if pos(q) >= reach})
            for p in cands:
                t = scan(p)
                if len(t) > len(take):
                    take, pair = t, p
        if not take:
            if not allow_rotations:
                raise ValueError(
                    "gate needs two out-of-window qubits; rotations are "
                    f"disabled at n={n} (pair-bit-only scheduling)")
            raise AssertionError("scheduler made no progress")
        plan.append(KernelPass(
            gate_idx=tuple(take),
            positions=tuple(tuple(pos(q) for q in supports[i])
                            for i in take),
            pair_bit=pair))
        taken_set = set(take)
        pending = [i for i in pending if i not in taken_set]
        if pending and not allow_rotations:
            continue  # next round: another pair-bit pass
        if pending:
            # rotate so the first pending gate's lowest out-of-window
            # position lands at ROT_LO (its other position, if any, is then
            # coverable by the pair bit -> progress is guaranteed)
            g0 = pending[0]
            outpos = [pos(q) for q in supports[g0] if pos(q) >= reach]
            if not outpos:
                # first pending gate already fits: it must have been blocked
                # only by reachability of later... cannot happen (no deps
                # before it); defend anyway by rotating the global minimum
                outpos = [pos(q) for i in pending for q in supports[i]
                          if pos(q) >= reach]
            shift = min(outpos) - ROT_LO
            if shift == 0:
                raise AssertionError("pending qubit already in window")
            rot = (rot + shift) % size
            plan.append(Rotation(shift))
    if rot % size:
        plan.append(Rotation((-rot) % size))
    return plan


def plan_full_1q_layer(n: int, qubits: Sequence[int], reach: int,
                       pair_ok: bool = True) -> List[object]:
    """1q-only convenience wrapper around :func:`plan_full_layer`."""
    return plan_full_layer(n, [(int(q),) for q in qubits], reach,
                           pair_ok=pair_ok)


def execute_plan(re: jnp.ndarray, im: jnp.ndarray, plan: List[object],
                 gate_mats: jnp.ndarray, n: int,
                 kinds: Sequence[str] = None,
                 real_flags: Sequence[bool] = None,
                 interpret: bool = False):
    """Run a plan from :func:`plan_full_layer` on a float-pair state.

    ``kinds[i]`` is the i-th gate's kind ("U" or "CNOT"; default all "U");
    ``gate_mats[i]`` its packed 2x2 matrix (ignored for CNOT)."""
    import numpy as np

    from .pallas_sv import apply_fused_layer

    for item in plan:
        if isinstance(item, Rotation):
            # serialize the two transposes: scheduled concurrently they hold
            # 2 full states (in+out each) = 16 GiB at n=30. A true data
            # dependency caps peak at 1.5 states — injected as an in-place
            # one-element update (a full-array multiply MATERIALIZED a 4 GiB
            # temp, and optimization_barrier alone did not stop XLA from
            # overlapping the buffers; both measured on v5e).
            re = rotate_region(re, n, item.shift, interpret=interpret)
            dep = re.reshape(-1)[0] * 0.0
            im_dep = jnp.ravel(im).at[0].add(dep).reshape(im.shape)
            im = rotate_region(im_dep, n, item.shift, interpret=interpret)
        else:
            gm = gate_mats[np.asarray(item.gate_idx)]
            pair = item.pair_bit if item.pair_bit >= 0 else None
            flags = tuple(real_flags[i] for i in item.gate_idx) \
                if real_flags is not None else None
            specs = tuple(
                ((kinds[i] if kinds is not None else "U"),) + tuple(p)
                for i, p in zip(item.gate_idx, item.positions))
            re, im = apply_fused_layer(re, im, specs, gm,
                                       pair_bit=pair, real_flags=flags,
                                       interpret=interpret)
    return re, im
