"""Full-qubit-range fused gate layers: multi-pair kernel-pass scheduling.

The fused Pallas kernel (ops/pallas_sv.py) reaches qubits inside one VMEM
block — columns + tile rows (17 at the default geometry) plus up to
MAX_PAIR_BITS arbitrary "pair bits" above (each exposed as its own size-2
block axis, so partner tiles share the block and the gate is an in-register
cross-tile combine). The planner here packs a whole gate list (1q + CNOT)
into the minimum such passes, dependency-aware.

This replaces the round-2 index-bit-ROTATION scheme (rotate the bit region
[ROT_LO, n) so pending qubits land in the window): a rotation is a full
extra HBM pass that holds two live states (the n=30 HBM-OOM of record),
while block pairing reaches the same bits with zero extra passes, fully
in place (in/out aliased). A 29-qubit 1q layer went from 3 kernel passes +
3 rotations to 4 kernel passes total; n=30 (where rotations could not run
at all) from 13 pair-bit-only passes to 5. The rotation kernels are kept
below for layout utilities and tests.

This is the single-chip analog of the reference's rocsvSwapIndexBits
index-bit relabeling (hipStateVec.h:135-137, MULTI_GPU_GUIDE.md:44-51): the
reference localizes non-local qubits with an explicit alltoallv; here the
block index maps of the pallas pass localize them for free.
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
    for 1q gates, (control, target) for CNOT). ``pair_bits`` are the
    out-of-window bits this pass reaches via block pairing (up to
    pallas_sv.max_pair_bits_for(geometry); each doubles the kernel's VMEM
    block). ``geometry`` is the (col_qubits, tile_rows_log2) the pass runs
    at (None = the default pallas_sv geometry); the tall geometry trades
    window width for pair capacity — the CNOT-chain lever."""
    gate_idx: Tuple[int, ...]
    positions: Tuple[Tuple[int, ...], ...]
    pair_bits: Tuple[int, ...] = ()
    geometry: Tuple[int, int] = None

    @property
    def pair_bit(self) -> int:
        """Single-pair back-compat view (-1 when unused)."""
        return self.pair_bits[0] if self.pair_bits else -1


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
    from .pallas_sv import _i32_map
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
                               _i32_map(lambda h, t: (h, 0, t)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 32, 32, 1 << ROT_LO),
                               _i32_map(lambda h, t, _hi=hi_count:
                                        (t * _hi + h, 0, 0, 0)),
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


def _items_to_plan(supports, items, geometry=None) -> List[object]:
    """Rebuild KernelPass objects (with positions) from the native
    scheduler's compact records."""
    plan: List[object] = []
    for item in items:
        _, pairs, idx = item
        plan.append(KernelPass(
            gate_idx=idx,
            positions=tuple(supports[i] for i in idx),
            pair_bits=tuple(pairs),
            geometry=geometry))
    return plan


def _scan_pass(pending, supports, anchors, reach, pairs, cap=None):
    """List-schedule one pass: take gates in order whose qubits are not
    blocked by an earlier unscheduled gate and whose ANCHOR qubits fit
    the window or the pair set (free/unanchored bits grid-resolve in the
    kernel). ``cap`` bounds the pass body size (gates past it block, so
    ordering stays exact) — the scoped-VMEM-stack guard for merged-run
    geometries."""
    taken, blocked = [], set()
    for i in pending:
        s = supports[i]
        if any(q in blocked for q in s):
            blocked |= set(s)
            continue
        if (all(q < reach or q in pairs for q in anchors[i])
                and (cap is None or len(taken) < cap)):
            taken.append(i)
        else:
            blocked |= set(s)
    return taken


def _grow_pass(pending, supports, anchors, reach, max_pairs, cap=None,
               seed=None):
    """Grow one pass's pair-bit set greedily: seed with the head gate's
    out-of-window bits (guarantees progress) — or an explicit ``seed`` set
    for template evaluation, where an empty take is a valid outcome — then
    add the pair bit that schedules the most extra gates (ascending
    candidate order; strict improvement only — bit-identical to the native
    scheduler when cap/seed are unset)."""
    from .pallas_sv import MAX_PAIR_GROUPS, _pair_groups

    head = pending[0]
    pairs = set(seed) if seed is not None else \
        {q for q in anchors[head] if q >= reach}
    take = _scan_pass(pending, supports, anchors, reach, pairs, cap)
    while len(pairs) < max_pairs:
        cands = sorted({q for i in pending
                        for q in anchors[i] if q >= reach} - pairs)
        best, best_take = None, take
        for p in cands:
            cand = sorted(pairs | {p})
            gs = _pair_groups(cand)
            if len(gs) > MAX_PAIR_GROUPS:
                continue  # would exceed the contiguous-run rank limit
            if len(gs) > 1 and len(cand) > 5:
                # multi-group blocks unroll 2^k tile refs in-kernel;
                # only a SINGLE contiguous run merges into the tile
                # rows (O(gates) body) at larger k
                continue
            t = _scan_pass(pending, supports, anchors, reach,
                           pairs | {p}, cap)
            if len(t) > len(best_take):
                best, best_take = p, t
        if best is None:
            break
        pairs.add(best)
        take = best_take
    return pairs, take


@dataclasses.dataclass(frozen=True)
class PassTemplate:
    """One kernel-geometry option the mixed planner may pick per pass.

    ``cost`` is the pass's relative HBM-pass price in stream-floor units
    (every pass streams the full state; tall/thin tiles pay extra grid
    overhead). ``body_cap`` bounds gates per pass — merged-run thin passes
    with 40+ gate bodies push the scoped-VMEM stack past the v5e ceiling
    and stall block double-buffering, so chain passes stay lean.
    ``seed_top_run`` additionally evaluates the pass with its pair set
    pre-seeded to the TOP contiguous run of ``max_pairs`` bits — the shape
    that swallows a high CNOT chain + its 1q column in one pass."""
    geometry: Tuple[int, int]  # None = the default pallas_sv geometry
    reach: int
    max_pairs: int
    cost: float
    body_cap: int = None
    seed_top_run: bool = False


def plan_mixed_layer(n: int, supports: Sequence[Tuple[int, ...]],
                     anchors_by_reach, templates: Sequence[PassTemplate]
                     ) -> List[object]:
    """Greedy MULTI-GEOMETRY scheduling: each pass independently picks the
    template maximizing scheduled-gates / pass-cost.

    This is the 2-passes-per-layer ring-ansatz lever (one pass per 2q gate
    is the reference's cost model, two_qubit_kernels.hip:17-51): lead
    passes stay at the default wide-window geometry (lane/mid MXU dots),
    while the high CNOT chain + its RY column ride ONE thin-geometry pass
    whose single contiguous pair run merges into the tile rows — chain
    CNOTs become row slices and the body stays O(gates) and small. At
    n=29/body=8 this plans 16 passes (8 default + 8 thin, 2.00/layer) vs
    24 for the single-geometry tall plan (3.00/layer).

    ``anchors_by_reach[reach]`` gives per-gate anchor qubits at each
    template's window reach (a CNOT's control grid-resolves only when it
    is OUT of the window, so anchors are reach-dependent)."""
    supports = [tuple(int(q) for q in s) for s in supports]
    pending = list(range(len(supports)))
    plan: List[object] = []
    while pending:
        best = None  # (score, pairs, take, template)
        for t in templates:
            anchors = anchors_by_reach[t.reach]
            seeds = [None]
            if t.seed_top_run and t.max_pairs > 0 and n - t.max_pairs \
                    >= t.reach:
                seeds.append(tuple(range(n - t.max_pairs, n)))
            for seed in seeds:
                pairs, take = _grow_pass(pending, supports, anchors,
                                         t.reach, t.max_pairs,
                                         cap=t.body_cap, seed=seed)
                if not take:
                    continue
                score = len(take) / t.cost
                if best is None or score > best[0]:
                    best = (score, pairs, take, t)
        if best is None:
            raise ValueError("no template can schedule the head gate "
                             f"(supports={supports[pending[0]]})")
        _, pairs, take, t = best
        anchors = anchors_by_reach[t.reach]
        # record only the bits gates touch; apply_fused_layer re-bridges
        # any run the pruning split into an invalid group set
        used = {q for i in take for q in anchors[i] if q >= t.reach}
        plan.append(KernelPass(
            gate_idx=tuple(take),
            positions=tuple(supports[i] for i in take),
            pair_bits=tuple(sorted(used)),
            geometry=t.geometry))
        taken_set = set(take)
        pending = [i for i in pending if i not in taken_set]
    return plan


def plan_full_layer(n: int, supports: Sequence[Tuple[int, ...]], reach: int,
                    pair_ok: bool = True,
                    allow_rotations: bool = None,
                    max_pairs: int = None,
                    free: Sequence[bool] = None,
                    anchors: Sequence[Tuple[int, ...]] = None,
                    geometry: Tuple[int, int] = None
                    ) -> List[object]:
    """Schedule gates (1q or 2q, given by their qubit ``supports``) into
    KernelPass items covering ALL n qubits.

    ``reach`` is the highest in-tile qubit + 1 (col + tile bits). Gates
    whose qubits are all < reach go through rolls; up to ``max_pairs``
    (default pallas_sv.MAX_PAIR_BITS) extra bits >= reach per pass ride the
    block-pairing path — including 2q gates with BOTH qubits out of the
    window (two pair bits). Scheduling is dependency-aware: gates with
    disjoint supports commute (may share or swap passes), while a gate
    never overtakes an earlier gate touching any of its qubits.

    Multi-pair block pairing made index-bit rotations obsolete (a rotation
    is a full extra HBM pass and holds 2 live states; pairing reaches the
    same bits in-place inside the gate pass) — ``allow_rotations`` is
    accepted for back-compat and ignored. With ``max_pairs >= 2`` every
    layer schedules without relabeling.

    Scheduling constraints are per-gate ANCHOR qubits — the qubits that
    must fit the window or the pair set. Defaults: all support qubits;
    ``free[i]`` (diagonals) anchors nothing; ``anchors`` overrides per
    gate (a CNOT with an out-of-window CONTROL anchors only its target:
    the control's bit value grid-resolves as a per-block scalar).
    Dependency blocking always uses the FULL support.

    The scheduling loop runs in native C++ (native/fusion_planner.cpp, the
    analog of the reference's host-side GateFusion.cpp) with this Python
    implementation as fallback and differential-test oracle.
    """
    del allow_rotations  # rotations superseded by multi-pair block pairing
    supports = [tuple(int(q) for q in s) for s in supports]
    if anchors is None:
        free = [bool(f) for f in free] if free is not None \
            else [False] * len(supports)
        anchors = [() if free[i] else supports[i]
                   for i in range(len(supports))]
    else:
        anchors = [tuple(int(q) for q in a) for a in anchors]
    if any(q >= n for s in supports for q in s):
        raise ValueError(f"qubit out of range for n={n}: {supports}")
    if max_pairs is None:
        from .pallas_sv import MAX_PAIR_BITS
        max_pairs = MAX_PAIR_BITS
    if not pair_ok:
        max_pairs = 0
    if any(len([q for q in a if q >= reach]) > max(max_pairs, 0)
           for a in anchors):
        raise ValueError(
            f"a gate has more out-of-window anchored qubits than max_pairs="
            f"{max_pairs} at reach={reach}: {supports}")

    from .pallas_sv import MAX_PAIR_GROUPS, _pair_groups

    if max_pairs <= MAX_PAIR_GROUPS:
        # <= 3 bits can never exceed 3 contiguous runs: the native
        # scheduler (which doesn't know the group constraint) is safe
        from ._native_planner import plan_layer_native
        native = plan_layer_native(n, supports, reach, max_pairs,
                                   anchors=anchors)
        if native is not None:
            return _items_to_plan(supports, native, geometry=geometry)

    pending = list(range(len(supports)))  # gate indices, original order

    plan: List[object] = []
    while pending:
        pairs, take = _grow_pass(pending, supports, anchors, reach,
                                 max_pairs)
        if not take:
            raise AssertionError("scheduler made no progress")
        used = {q for i in take
                for q in anchors[i] if q >= reach}
        plan.append(KernelPass(
            gate_idx=tuple(take),
            positions=tuple(supports[i] for i in take),
            pair_bits=tuple(sorted(used)),
            geometry=geometry))
        taken_set = set(take)
        pending = [i for i in pending if i not in taken_set]
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
    ``gate_mats[i]`` its packed 2x2 matrix (ignored for CNOT).
    ``im=None`` runs every pass in the kernels' REAL-STATE mode (half the
    HBM traffic; requires all-real gate matrices).
    ``re=None`` (with ``im=None``) defers the |0..0> init into the FIRST
    kernel pass (written in that pass's view geometry — no retiling copy,
    one state plane peak; pallas_sv._gen_zero_input)."""
    import numpy as np

    from .pallas_sv import apply_fused_layer

    for item in plan:
        if isinstance(item, Rotation):
            if re is None:
                # legacy rotation first: materialize (flat init) — only
                # plan_full_layer's legacy path emits these
                re = jnp.zeros((1 << n,), jnp.float32).at[0].set(1.0)
            # legacy item kind (plan_full_layer no longer emits rotations;
            # multi-pair block pairing reaches every bit in place).
            # Serialize the two transposes: scheduled concurrently they hold
            # 2 full states (in+out each) = 16 GiB at n=30. A true data
            # dependency caps peak at 1.5 states — injected as an in-place
            # one-element update (a full-array multiply MATERIALIZED a 4 GiB
            # temp, and optimization_barrier alone did not stop XLA from
            # overlapping the buffers; both measured on v5e).
            re = rotate_region(re, n, item.shift, interpret=interpret)
            if im is None:
                continue
            dep = re.reshape(-1)[0] * 0.0
            im_dep = jnp.ravel(im).at[0].add(dep).reshape(im.shape)
            im = rotate_region(im_dep, n, item.shift, interpret=interpret)
        else:
            gm = gate_mats[np.asarray(item.gate_idx)]
            flags = tuple(real_flags[i] for i in item.gate_idx) \
                if real_flags is not None else None
            specs = tuple(
                ((kinds[i] if kinds is not None else "U"),) + tuple(p)
                for i, p in zip(item.gate_idx, item.positions))
            re, im = apply_fused_layer(re, im, specs, gm,
                                       pair_bits=item.pair_bits,
                                       real_flags=flags,
                                       interpret=interpret,
                                       geometry=getattr(item, "geometry",
                                                        None),
                                       num_qubits=n)
    return re, im
