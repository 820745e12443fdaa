"""Circuit IR -> jitted XLA program.

This is the lowering path that replaces the reference's MLIR pipeline
(QuantumToSimulatorPass -> SimulatorToQIRPass -> LLVM,
rocqCompiler/MLIRCompiler.cpp:47-88) and its per-gate backend dispatch
(HipStateVecBackend.cpp): a CircuitIR traces into ONE jitted function
``f(state, params) -> state`` with the input buffer donated, so XLA fuses and
schedules the whole circuit — no per-gate launches or synchronizes (contrast
simulator.cpp:142's per-gate hipDeviceSynchronize).

Compiled executables are cached by the IR's structural key (gate structure
without parameter values), so re-running a circuit with new parameters — the
VQE inner loop — reuses the executable.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..ops import gates as _g
from ..ops import statevec as sv
from .ir import CircuitIR, GateOp, ParamRef
from .passes import (DiagBlock, FusedBlock, PallasBlock, fuse_diagonals,
                     fuse_pallas_runs, plan_fusion)
from ..utils.cache import BoundedCache

# Named gates that carry implicit control structure when emitted via the
# convenience circuit methods.
_IMPLICIT_CTRL = {"CNOT": "X", "CX": "X", "CZ": "Z",
                  "CRX": "RX", "CRY": "RY", "CRZ": "RZ",
                  "MCX": "X", "CCX": "X", "TOFFOLI": "X", "CSWAP": "SWAP"}

_ADJOINT_NAME = {"S": "SDG", "SDG": "S", "T": "TDG", "TDG": "T"}


def _resolve_params(op: GateOp, params: Optional[jnp.ndarray]):
    vals = []
    for p in op.params:
        if isinstance(p, ParamRef):
            vals.append(params[p.index])
        else:
            vals.append(p)
    return tuple(vals)


def _split_op(op: GateOp):
    """Normalize an op to (base_name_or_matrix, controls, targets)."""
    name = op.name.upper()
    controls = list(op.controls)
    targets = list(op.targets)
    if name in _IMPLICIT_CTRL:
        base = _IMPLICIT_CTRL[name]
        if not controls:
            # CNOT/CZ/CRX emitted as targets=[control, target] without an
            # explicit control list (DSL style): peel controls off targets.
            n_tgt = 2 if base == "SWAP" else 1
            controls, targets = targets[:-n_tgt], targets[-n_tgt:]
        return base, controls, targets
    return name, controls, targets


def _base_matrix(op: GateOp, params: Optional[jnp.ndarray]) -> jnp.ndarray:
    """The (uncontrolled) unitary of ``op`` as a traced 2^m x 2^m array."""
    base, _, targets = _split_op(op)
    if base == "D2M":
        # matrix holds diagonal VALUES d[bit_t0, bit_t1], not a gate matrix
        m = jnp.asarray(op.matrix, config.complex_dtype())
        if op.is_adjoint:
            m = jnp.conj(m)
        return jnp.diag(jnp.stack([m[0, 0], m[1, 0], m[0, 1], m[1, 1]]))
    if op.matrix is not None:
        mat = jnp.asarray(op.matrix, dtype=config.complex_dtype())
    else:
        vals = _resolve_params(op, params)
        name = base
        if op.is_adjoint and name in _ADJOINT_NAME:
            return jnp.asarray(
                _g.gate_matrix(_ADJOINT_NAME[name]), config.complex_dtype())
        mat = _g.gate_matrix(name, vals)
    if op.is_adjoint:
        mat = jnp.conj(mat).T
    return mat


def _dense_with_controls(mat: jnp.ndarray, n_controls: int) -> jnp.ndarray:
    """Expand U on m targets to the dense controlled unitary on
    (targets..., controls...): identity except the all-controls-one block."""
    m = mat.shape[0]
    full = jnp.eye(m << n_controls, dtype=mat.dtype)
    return full.at[-m:, -m:].set(mat)


_DIAG_VECS = {"Z": np.array([1, -1]), "S": np.array([1, 1j]),
              "SDG": np.array([1, -1j]),
              "T": np.array([1, np.exp(1j * np.pi / 4)]),
              "TDG": np.array([1, np.exp(-1j * np.pi / 4)])}


def _diag_vector(op: GateOp, params) -> jnp.ndarray:
    """(2,) diagonal of the op's base gate (controls handled by caller)."""
    base, _, _ = _split_op(op)
    if base in _DIAG_VECS:
        d = jnp.asarray(_DIAG_VECS[base], config.complex_dtype())
    elif base == "RZ":
        (theta,) = _resolve_params(op, params)
        theta = jnp.asarray(theta, config.real_dtype())
        d = jnp.stack([jnp.exp(-0.5j * theta),
                       jnp.exp(0.5j * theta)]).astype(config.complex_dtype())
    elif base in ("P", "PHASE"):
        (lam,) = _resolve_params(op, params)
        lam = jnp.asarray(lam, config.real_dtype())
        d = jnp.stack([jnp.ones((), config.complex_dtype()),
                       jnp.exp(1j * lam).astype(config.complex_dtype())])
    else:
        raise ValueError(f"gate {op.name} is not diagonal")
    if op.is_adjoint:
        d = jnp.conj(d)
    return d


def _apply_diag_block(state: jnp.ndarray, block: DiagBlock,
                      params) -> jnp.ndarray:
    """Multiply all member phase factors in (what XLA fuses into) one
    elementwise pass over the amplitudes."""
    n = sv.num_qubits_of(state)
    for op in block.ops:
        base, controls, targets = _split_op(op)
        if base == "D2M":
            m = jnp.asarray(op.matrix, config.complex_dtype())
            if op.is_adjoint:
                m = jnp.conj(m)
            # d2 axes follow DESCENDING qubit order below
            d2 = m if targets[0] > targets[1] else m.T
            desc = sorted(targets, reverse=True)
            dims = sv._exposed_view_dims(n, desc)
            bshape = [1] * len(dims)
            bshape[1] = bshape[3] = 2
            state = (state.reshape(dims) * d2.reshape(bshape)).reshape(
                state.shape)
            continue
        if base == "RZZ":
            # two-target diagonal: factor d[b0, b1] over both target axes
            (theta,) = _resolve_params(op, params)
            theta = jnp.asarray(theta, config.real_dtype())
            if op.is_adjoint:
                theta = -theta
            em = jnp.exp(-0.5j * theta).astype(config.complex_dtype())
            ep = jnp.exp(0.5j * theta).astype(config.complex_dtype())
            d2 = jnp.stack([jnp.stack([em, ep]), jnp.stack([ep, em])])
            desc = sorted(targets, reverse=True)
            dims = sv._exposed_view_dims(n, desc)
            bshape = [1] * len(dims)
            bshape[1] = bshape[3] = 2
            state = (state.reshape(dims) * d2.reshape(bshape)).reshape(
                state.shape)
            continue
        d = _diag_vector(op, params)
        qubits = list(controls) + list(targets)
        desc = sorted(qubits, reverse=True)
        dims = sv._exposed_view_dims(n, desc)
        k = len(desc)
        # factor tensor over desc-ordered qubit axes: 1 everywhere except
        # the all-controls-one slice, which carries the target diagonal
        f = jnp.ones((2,) * k, config.complex_dtype())
        idx = tuple(1 if desc[j] in set(controls) else slice(None)
                    for j in range(k))
        f = f.at[idx].set(d)  # the remaining free axis is the target
        bshape = [1] * len(dims)
        for j in range(k):
            bshape[2 * j + 1] = 2
        state = (state.reshape(dims) * f.reshape(bshape)).reshape(state.shape)
    return state


def _pallas_interpret() -> bool:
    """Force Pallas interpret mode (CPU test coverage of the full
    execute->kernel integration)."""
    import os
    return bool(os.environ.get("ROCQ_PALLAS_INTERPRET"))


def _pallas_enabled() -> bool:
    import os
    if os.environ.get("ROCQ_DISABLE_PALLAS"):
        return False
    if _pallas_interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# 1q gates whose matrices are purely real (a static, trace-time fact used
# to drop the imaginary-coefficient FMAs in the VPU-bound Pallas kernel)
_REAL_1Q = {"X", "H", "RY", "Z", "I", "ID"}


def _has_real_matrix(op: GateOp) -> bool:
    if op.matrix is not None:
        try:
            return bool(np.allclose(np.imag(np.asarray(op.matrix)), 0.0))
        except Exception:  # traced matrix (adjoint-grad): unknown -> False
            return False
    return op.name.upper() in _REAL_1Q


_D2_BASES = set(_DIAG_VECS) | {"RZ", "P", "PHASE"}


def pallas_block_specs(block: PallasBlock, params):
    """(kinds, supports, gate_mats, real_flags) for a PallasBlock's ops:
    kind "U" (dense 1q matrix), "CNOT" (control, target), or "D2" — a
    controlled-phase-family gate packed as the 2x2 of diagonal entries
    d[control_bit, target_bit] (row 0 = identity, row 1 = the base
    diagonal)."""
    mats, kinds, supports, real_flags = [], [], [], []
    eye = jnp.stack([jnp.eye(2, dtype=jnp.float32),
                     jnp.zeros((2, 2), jnp.float32)], axis=-1)
    ones = jnp.ones((2,), config.complex_dtype())
    for op in block.ops:
        base, controls, targets = _split_op(op)
        if base == "D2M":
            # generic 2q diagonal: matrix holds d[bit_t0, bit_t1] directly
            m = jnp.asarray(op.matrix, config.complex_dtype())
            if op.is_adjoint:
                m = jnp.conj(m)
            kinds.append("D2")
            supports.append((targets[0], targets[1]))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(_has_real_matrix(op))
        elif base == "X" and len(controls) == 1 and op.matrix is None:
            kinds.append("CNOT")
            supports.append((controls[0], targets[0]))
            mats.append(eye)  # placeholder, unused by the CNOT path
            real_flags.append(True)
        elif (op.matrix is None and len(controls) == 1
              and base in _D2_BASES):
            d = _diag_vector(op, params)
            m = jnp.stack([ones, d])
            kinds.append("D2")
            supports.append((controls[0], targets[0]))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(base == "Z")  # CZ is the only real member
        elif (op.matrix is None and not controls and len(targets) == 1
              and base in _D2_BASES):
            # plain 1q diagonal as D2(q, q): composes as a row/col scale in
            # the region dots and is FREE (grid-resolved) at any qubit
            d = _diag_vector(op, params)
            m = jnp.stack([jnp.stack([d[0], d[0]]),
                           jnp.stack([d[1], d[1]])])
            kinds.append("D2")
            supports.append((targets[0], targets[0]))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(base == "Z")
        elif op.matrix is None and base == "RZZ" and not controls:
            (theta,) = _resolve_params(op, params)
            theta = jnp.asarray(theta, config.real_dtype())
            if op.is_adjoint:
                theta = -theta
            em = jnp.exp(-0.5j * theta).astype(config.complex_dtype())
            ep = jnp.exp(0.5j * theta).astype(config.complex_dtype())
            m = jnp.stack([jnp.stack([em, ep]), jnp.stack([ep, em])])
            kinds.append("D2")
            supports.append((targets[0], targets[1]))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(False)
        elif len(controls) == 1 and len(targets) == 1:
            # controlled dense 1q (CRX/CRY/controlled-matrix/Kraus-channel
            # factor): kind "CU" — the 2x2 applies where the control bit is
            # 1; an out-of-window control is FREE (grid/pair-resolved), so
            # only the target anchors (the reference runs these through
            # apply_controlled_matrix, bindings.cpp:429)
            m = _base_matrix(op, params)
            kinds.append("CU")
            supports.append((controls[0], targets[0]))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(_has_real_matrix(op))
        else:
            m = _base_matrix(op, params)
            kinds.append("U")
            supports.append((targets[0],))
            mats.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)
                        .astype(jnp.float32))
            real_flags.append(_has_real_matrix(op))
    return kinds, supports, jnp.stack(mats), real_flags


def _spec_anchors(kinds, supports, limit):
    """Per-gate ANCHOR qubits — what must fit the kernel window or the
    pass's pair set. Diagonals (D2) anchor nothing; a CNOT's out-of-window
    CONTROL is a grid-resolved scalar, so only its target anchors."""
    anchors = []
    for k, s in zip(kinds, supports):
        if k == "D2":
            anchors.append(())
        elif k in ("CNOT", "CU") and s[0] >= limit:
            anchors.append((s[1],))
        else:
            anchors.append(tuple(s))
    return anchors


def _classify_spec(op: GateOp):
    """Structure-only (kind, support) for one fused-kernel-eligible op —
    the host-side twin of :func:`pallas_block_specs`'s branch order without
    building any gate matrix. Used for pass-count planning; parameter
    values never change a plan."""
    base, controls, targets = _split_op(op)
    if base == "D2M":
        return "D2", (targets[0], targets[1])
    if base == "X" and len(controls) == 1 and op.matrix is None:
        return "CNOT", (controls[0], targets[0])
    if op.matrix is None and len(controls) == 1 and base in _D2_BASES:
        return "D2", (controls[0], targets[0])
    if (op.matrix is None and not controls and len(targets) == 1
            and base in _D2_BASES):
        return "D2", (targets[0], targets[0])
    if op.matrix is None and base == "RZZ" and not controls:
        return "D2", (targets[0], targets[1])
    if len(controls) == 1 and len(targets) == 1:
        return "CU", (controls[0], targets[0])
    return "U", (targets[0],)


def planned_pass_count(ops: Sequence, num_qubits: int) -> int:
    """Planned Pallas KERNEL PASSES for ``ops`` run fused on one device.
    Host-side and structure-only. Non-kernel plan items count ZERO: raw
    einsum ops compile cheaply at any count the op-budget chunking allows
    (the ~190-op einsum-only density program compiles in seconds) — it is
    the unrolled kernel passes that blow up the compile helper.

    This is the density engine's segmentation metric: the remote compile
    service dies on the many-pass x many-controlled-spec combination while
    same-spec-count programs with few passes (and many-pass programs with
    few controlled specs) compile fine, so a pure op/spec count cannot
    separate the fatal programs from the fine ones — flushes split at the
    REAL planned pass count instead (ROADMAP "compile-helper OOM").

    This models the default-geometry plan only; execution may re-plan with
    TALL_GEOMETRY and pick a SHORTER plan, and the planner fuses across
    dense-fallback drain boundaries — so the count can overshoot and
    over-split. That direction is safe (extra smaller programs, never a
    fatal bigger one)."""
    from ..ops.pallas_sv import COL_QUBITS, max_kernel_qubit
    from ..ops.relabel import plan_full_layer

    ops = list(ops)
    if not (_pallas_enabled() and num_qubits >= COL_QUBITS + 3):
        return 0
    limit = max_kernel_qubit(num_qubits) + 1
    items = fuse_pallas_runs(ops, num_qubits - 1, num_qubits=num_qubits,
                             relabel_reach=limit)
    items = fuse_diagonals(items)
    items = plan_fusion(items, max_fuse=2)
    total = 0
    for item in items:
        if not isinstance(item, PallasBlock):
            continue
        kinds, supports = zip(*(_classify_spec(op) for op in item.ops))
        anchors = _spec_anchors(kinds, supports, limit)
        constrained = [q for a in anchors for q in a]
        if not constrained or max(constrained) < limit:
            total += 1
            continue
        try:
            plan = plan_full_layer(num_qubits, list(supports), limit,
                                   pair_ok=num_qubits > limit,
                                   anchors=anchors)
        except ValueError:
            total += len(item.ops)
            continue
        total += len(plan)
    return total


def _plan_mixed(n, kinds, supports, limit):
    """Build the multi-geometry template plan (ROCQ_GEOMETRY=mixed): one
    PassTemplate per kernel geometry, anchors recomputed at each window
    reach (a CNOT control grid-resolves only when out of that window).
    Costs are relative stream-floor units measured on v5e (tall tiles pay
    ~15% grid overhead; thin merged-run passes ~8%). ROCQ_THIN_BODY_CAP
    bounds thin bodies (40+ gate merged bodies push the scoped-VMEM stack
    past the ceiling and stall double-buffering; default 26)."""
    from ..ops.pallas_sv import (MAX_PAIR_BITS, TALL_GEOMETRY, THIN_GEOMETRY,
                                 max_pair_bits_for)
    from ..ops.relabel import PassTemplate, plan_mixed_layer

    from ..ops.pallas_sv import GEOMETRY_COSTS

    thin_cap = int(os.environ.get("ROCQ_THIN_BODY_CAP", "26"))
    templates = [PassTemplate(None, limit, MAX_PAIR_BITS,
                              GEOMETRY_COSTS[None])]
    for geo, cap, seed in ((TALL_GEOMETRY, None, False),
                           (THIN_GEOMETRY, thin_cap, True)):
        gcol, gtile = geo
        reach = min(gcol, n) + min(gtile, n - min(gcol, n))
        if reach >= limit or n <= reach:
            continue  # no pair capacity won at this n
        templates.append(PassTemplate(geo, reach,
                                      max_pair_bits_for(gcol, gtile),
                                      GEOMETRY_COSTS[geo], cap, seed))
    if len(templates) == 1:
        return None
    anchors_by_reach = {t.reach: _spec_anchors(kinds, supports, t.reach)
                        for t in templates}
    try:
        return plan_mixed_layer(n, supports, anchors_by_reach, templates)
    except ValueError:
        return None


def _run_pallas_specs(re, im, kinds, supports, gm, real_flags,
                      interpret: bool = False, num_qubits: int = None):
    """Run prepared gate specs through the fused kernel on a float-pair
    state whose length defines the qubit count (a full state, or one shard
    under shard_map). ``im=None`` = the known-real state plane (all-real
    gates only; half the HBM traffic). ``re=None`` defers the |0..0> init
    into the first kernel pass (``num_qubits`` required) — the init plane
    is written in that pass's own view geometry, so no retiling copy and
    a one-plane peak (the n=31 enabler)."""
    from ..ops.pallas_sv import apply_fused_layer, max_kernel_qubit
    from ..ops.relabel import execute_plan, plan_full_layer

    n = num_qubits if re is None else re.shape[-1].bit_length() - 1
    limit = max_kernel_qubit(n) + 1
    anchors = _spec_anchors(kinds, supports, limit)
    constrained = [q for a in anchors for q in a]
    if not constrained or max(constrained) < limit:
        # unanchored qubits grid-resolve in the kernel — one direct pass
        specs = tuple((k,) + tuple(s) for k, s in zip(kinds, supports))
        return apply_fused_layer(re, im, specs, gm, real_flags=real_flags,
                                 interpret=interpret, num_qubits=n)
    plan = plan_full_layer(n, supports, limit, pair_ok=n > limit,
                           anchors=anchors)
    # Smaller-tile geometry alternatives buy more pair bits per pass
    # (pallas_sv.TALL_GEOMETRY: k=5) — a high-qubit CNOT chain that costs
    # ~4 default-geometry passes fits 3 tall ones. Pick the shortest plan
    # (pass count == HBM traffic; every pass streams the full state); ties
    # prefer the wider geometry (wider windows keep more work on the
    # lane/mid MXU dots). THIN_GEOMETRY (k=9, 2 passes/layer) measured
    # SLOWER on v5e (300 vs 532 gates/s on the n=29 ring ansatz): its
    # 40-gate merged bodies push the scoped-VMEM stack past 100 MiB, which
    # starves block double-buffering — so it is not auto-selected.
    from ..ops.pallas_sv import (TALL_GEOMETRY, THIN_GEOMETRY,
                                 max_pair_bits_for)
    geo_candidates = (TALL_GEOMETRY,)
    env_geo = os.environ.get("ROCQ_GEOMETRY", "").lower()
    if env_geo == "thin":       # experiment knob: force-try the k=9 shape
        geo_candidates = (THIN_GEOMETRY,)
    elif env_geo == "tall+thin":
        geo_candidates = (TALL_GEOMETRY, THIN_GEOMETRY)
    if len(plan) > 2:
        for geo in geo_candidates:
            gcol, gtile = geo
            geo_limit = min(gcol, n) + min(gtile, n - min(gcol, n))
            if n <= geo_limit:
                continue
            geo_anchors = _spec_anchors(kinds, supports, geo_limit)
            try:
                geo_plan = plan_full_layer(
                    n, supports, geo_limit, pair_ok=True,
                    anchors=geo_anchors,
                    max_pairs=max_pair_bits_for(gcol, gtile),
                    geometry=geo)
            except ValueError:
                continue
            if len(geo_plan) < len(plan):
                plan = geo_plan
        if env_geo == "mixed":
            # Per-PASS geometry choice (relabel.plan_mixed_layer): lead
            # passes keep the default wide window, the high CNOT chain +
            # its 1q column ride lean thin-geometry merged-run passes —
            # 2.00 passes/layer on the n=29 ring ansatz vs 3.00 for the
            # whole-plan tall geometry. Compared against the best
            # single-geometry plan on the SAME weighted cost model.
            from ..ops.pallas_sv import GEOMETRY_COSTS

            def wcost(p):
                return sum(GEOMETRY_COSTS[getattr(item, "geometry", None)]
                           for item in p)

            mixed = _plan_mixed(n, kinds, supports, limit)
            if mixed is not None and wcost(mixed) < wcost(plan):
                plan = mixed
    # Mixed-geometry relief: a pass with NO pair bits doesn't need the tall
    # tiles (they exist to buy pair capacity) — and tall WINDOW passes pay
    # ~2x in grid overhead (16384 steps of 128 KiB tiles vs 4096 of
    # 512 KiB; measured 37 vs ~31 ms unrolled, stream floor 14.3). Demote
    # pair-free passes whose anchors fit the default window back to the
    # default geometry; chain passes keep the tall tiles.
    import dataclasses
    relieved = []
    for item in plan:
        if (getattr(item, "geometry", None) is not None
                and not getattr(item, "pair_bits", ())):
            ok = True
            for spec_kind, pos in zip((kinds[i] for i in item.gate_idx),
                                      item.positions):
                anch = (pos[1:] if spec_kind in ("CNOT", "CU")
                        and pos[0] >= limit else pos)
                if spec_kind != "D2" and any(q >= limit for q in anch):
                    ok = False
                    break
            if ok:
                item = dataclasses.replace(item, geometry=None)
        relieved.append(item)
    return execute_plan(re, im, relieved, gm, n, kinds=kinds,
                        real_flags=real_flags, interpret=interpret)


def _apply_pallas_block_pair(re: jnp.ndarray, im: jnp.ndarray,
                             block: PallasBlock, params,
                             interpret: bool = False,
                             num_qubits: int = None):
    """Pair-native core: run a 1q+CNOT gate run through the fused Pallas
    kernel on a (re, im) float32 state. In-window runs cost ONE HBM pass;
    runs touching higher qubits are scheduled as kernel passes + index-bit
    rotations (ops/relabel.py). ``re=None`` = deferred |0..0> init (see
    :func:`_run_pallas_specs`; requires ``num_qubits``)."""
    kinds, supports, gm, real_flags = pallas_block_specs(block, params)
    if not all(real_flags):
        if re is None:
            # complex gates need the pair path: materialize the deferred
            # init (real plane; zero imaginary)
            re = init_real(num_qubits)
        if im is None:
            # a complex gate entered a known-real state: materialize the
            # imaginary plane and continue on the full pair path
            im = jnp.zeros_like(re)
    return _run_pallas_specs(re, im, kinds, supports, gm, real_flags,
                             interpret=interpret, num_qubits=num_qubits)


# ---------------------------------------------------------------------------
# df64 (double-float) fused execution: the hi/lo-f32 twin of the pair path.
# Everything here is STRICTLY REAL arithmetic — complex128 programs abort
# the TPU x64 rewriter (see ops/pairsim.py), so gate coefficients come from
# pairsim's real f64 row builders and are split hi/lo (ops/df64.split_f64)
# instead of going through _base_matrix/_diag_vector's complex forms.
# ---------------------------------------------------------------------------

def _diag_parts_df(op: GateOp, params):
    """(2,) diagonal of the op's base gate as REAL f64 scalar lists
    ``(re, im|None)`` — the real-arithmetic twin of :func:`_diag_vector`."""
    base, _, _ = _split_op(op)
    sign = -1.0 if op.is_adjoint else 1.0
    if base in _DIAG_VECS:
        d = np.conj(_DIAG_VECS[base]) if op.is_adjoint else _DIAG_VECS[base]
        re = [float(d[0].real), float(d[1].real)]
        if np.any(np.imag(d)):
            return re, [float(d[0].imag), float(d[1].imag)]
        return re, None
    if base == "RZ":
        (theta,) = _resolve_params(op, params)
        from ..ops.pairsim import acc_cos_sin_f64
        theta = jnp.asarray(theta, jnp.float64) * sign
        # accurate-array trig: scalar f64 transcendentals silently run at
        # f32 accuracy on the TPU x64 stack (pairsim.acc_cos_sin_f64)
        c, s = acc_cos_sin_f64(theta, half=True)
        return [c, c], [-s, s]
    if base in ("P", "PHASE"):
        (lam,) = _resolve_params(op, params)
        from ..ops.pairsim import acc_cos_sin_f64
        lam = jnp.asarray(lam, jnp.float64) * sign
        c, s = acc_cos_sin_f64(lam)
        return [1.0, c], [0.0, s]
    raise ValueError(f"gate {op.name} is not diagonal")


def _base_rows_df(op: GateOp, params):
    """The op's BASE 2x2 as f64 scalar rows ``(m_re, m_im|None)`` (controls
    handled by the caller's spec kind)."""
    from ..ops import pairsim
    base, _, _ = _split_op(op)
    if op.matrix is not None:
        if isinstance(op.matrix, np.ndarray):
            m_re, m_im = pairsim._rows_from_numpy(
                np.asarray(op.matrix, np.complex128))
        else:  # traced matrix: scalar extraction, like op_rows_targets
            m = jnp.asarray(op.matrix)
            dim = m.shape[0]
            m_re = [[jnp.real(m[i, j]).astype(jnp.float64)
                     for j in range(dim)] for i in range(dim)]
            m_im = [[jnp.imag(m[i, j]).astype(jnp.float64)
                     for j in range(dim)] for i in range(dim)]
    else:
        m_re, m_im = pairsim.gate_rows(base, _resolve_params(op, params),
                                       dtype=jnp.float64)
    if op.is_adjoint:
        m_re, m_im = pairsim._rows_adjoint(m_re, m_im)
    return m_re, m_im


def pallas_block_specs_df64(block: PallasBlock, params):
    """(kinds, supports, gate_mats, real_flags) for a PallasBlock in the
    df64 kernel's (K, 2, 2, 4) hi/lo layout — the branch structure of
    :func:`pallas_block_specs` with every matrix built by real f64
    arithmetic and split hi/lo (ops/pallas_df64.pack_rows_df64)."""
    from ..ops.pallas_df64 import pack_rows_df64
    rows, kinds, supports, real_flags = [], [], [], []
    eye_rows = ([[1.0, 0.0], [0.0, 1.0]], None)
    for op in block.ops:
        base, controls, targets = _split_op(op)
        if base == "D2M":
            m = np.asarray(op.matrix, np.complex128)
            if op.is_adjoint:
                m = np.conj(m)
            m_re = [[float(m[i, j].real) for j in range(2)]
                    for i in range(2)]
            m_im = None if not np.any(m.imag) else \
                [[float(m[i, j].imag) for j in range(2)] for i in range(2)]
            kinds.append("D2")
            supports.append((targets[0], targets[1]))
        elif base == "X" and len(controls) == 1 and op.matrix is None:
            kinds.append("CNOT")
            supports.append((controls[0], targets[0]))
            m_re, m_im = eye_rows  # placeholder, unused by the CNOT path
        elif (op.matrix is None and len(controls) == 1
              and base in _D2_BASES):
            d_re, d_im = _diag_parts_df(op, params)
            m_re = [[1.0, 1.0], [d_re[0], d_re[1]]]
            m_im = None if d_im is None else \
                [[0.0, 0.0], [d_im[0], d_im[1]]]
            kinds.append("D2")
            supports.append((controls[0], targets[0]))
        elif (op.matrix is None and not controls and len(targets) == 1
              and base in _D2_BASES):
            d_re, d_im = _diag_parts_df(op, params)
            m_re = [[d_re[0], d_re[0]], [d_re[1], d_re[1]]]
            m_im = None if d_im is None else \
                [[d_im[0], d_im[0]], [d_im[1], d_im[1]]]
            kinds.append("D2")
            supports.append((targets[0], targets[0]))
        elif op.matrix is None and base == "RZZ" and not controls:
            (theta,) = _resolve_params(op, params)
            theta = jnp.asarray(theta, jnp.float64)
            if op.is_adjoint:
                theta = -theta
            c, s = jnp.cos(theta / 2), jnp.sin(theta / 2)
            m_re = [[c, c], [c, c]]
            m_im = [[-s, s], [s, -s]]
            kinds.append("D2")
            supports.append((targets[0], targets[1]))
        elif len(controls) == 1 and len(targets) == 1:
            m_re, m_im = _base_rows_df(op, params)
            kinds.append("CU")
            supports.append((controls[0], targets[0]))
        else:
            m_re, m_im = _base_rows_df(op, params)
            kinds.append("U")
            supports.append((targets[0],))
        rows.append((m_re, m_im))
        real_flags.append(m_im is None)
    return kinds, supports, pack_rows_df64(rows), real_flags


def _run_pallas_specs_df64(planes, kinds, supports, gm, real_flags,
                           interpret: bool = False):
    """The df64 twin of :func:`_run_pallas_specs`: plan kernel passes with
    the shared scheduler (ops/relabel.plan_full_layer) and run each through
    ops/pallas_df64.apply_fused_layer_df64. ``planes[2] is None`` selects
    the REAL-state carry (2 planes instead of 4 — half the HBM traffic)."""
    from ..ops.pallas_df64 import apply_fused_layer_df64
    from ..ops.pallas_sv import (TALL_GEOMETRY, max_kernel_qubit,
                                 max_pair_bits_for)
    from ..ops.relabel import plan_full_layer

    rh, rl, ih, il = planes
    n = rh.shape[-1].bit_length() - 1
    limit = max_kernel_qubit(n) + 1
    anchors = _spec_anchors(kinds, supports, limit)
    constrained = [q for a in anchors for q in a]
    if not constrained or max(constrained) < limit:
        specs = tuple((k,) + tuple(s) for k, s in zip(kinds, supports))
        return apply_fused_layer_df64(rh, rl, ih, il, specs, gm,
                                      real_flags=real_flags,
                                      interpret=interpret)
    plan = plan_full_layer(n, supports, limit, pair_ok=n > limit,
                           anchors=anchors)
    if len(plan) > 2 and os.environ.get("ROCQ_GEOMETRY", "").lower() != \
            "default":
        # tall geometry buys pair capacity, same bake-off as the f32 path
        gcol, gtile = TALL_GEOMETRY
        geo_limit = min(gcol, n) + min(gtile, n - min(gcol, n))
        if n > geo_limit:
            geo_anchors = _spec_anchors(kinds, supports, geo_limit)
            try:
                geo_plan = plan_full_layer(
                    n, supports, geo_limit, pair_ok=True,
                    anchors=geo_anchors,
                    max_pairs=max_pair_bits_for(gcol, gtile),
                    geometry=TALL_GEOMETRY)
                if len(geo_plan) < len(plan):
                    plan = geo_plan
            except ValueError:
                pass
    # pair-free pass relief: same rule as the f32 path (tall window passes
    # pay ~2x grid overhead; tiles exist only to buy pair capacity)
    import dataclasses
    relieved = []
    for item in plan:
        if (getattr(item, "geometry", None) is not None
                and not getattr(item, "pair_bits", ())):
            ok = True
            for spec_kind, pos in zip((kinds[i] for i in item.gate_idx),
                                      item.positions):
                anch = (pos[1:] if spec_kind in ("CNOT", "CU")
                        and pos[0] >= limit else pos)
                if spec_kind != "D2" and any(q >= limit for q in anch):
                    ok = False
                    break
            if ok:
                item = dataclasses.replace(item, geometry=None)
        relieved.append(item)
    for item in relieved:
        gm_i = gm[np.asarray(item.gate_idx)]
        flags = tuple(real_flags[i] for i in item.gate_idx)
        specs = tuple((kinds[i],) + tuple(p)
                      for i, p in zip(item.gate_idx, item.positions))
        rh, rl, ih, il = apply_fused_layer_df64(
            rh, rl, ih, il, specs, gm_i, real_flags=flags,
            pair_bits=item.pair_bits,
            geometry=getattr(item, "geometry", None), interpret=interpret)
    return rh, rl, ih, il


def _apply_pallas_block_df64(planes, block: PallasBlock, params,
                             interpret: bool = False):
    kinds, supports, gm, real_flags = pallas_block_specs_df64(block, params)
    if planes[2] is None and not all(real_flags):
        # a complex gate entered a known-real state: materialize the
        # imaginary planes and continue on the 4-plane path
        planes = (planes[0], planes[1], jnp.zeros_like(planes[0]),
                  jnp.zeros_like(planes[1]))
    return _run_pallas_specs_df64(planes, kinds, supports, gm, real_flags,
                                  interpret=interpret)


def _apply_pallas_block_df64_sharded(planes, block: PallasBlock, params,
                                     sharding):
    """Sharded df64 fused-kernel path — the four-plane (or two-plane
    real-carry) twin of :func:`_apply_pallas_block_sharded`: shard_map the
    compensated-f32 kernels over the mesh, each device streaming its LOCAL
    hi/lo plane slices through VMEM. Gates here touch only local index
    bits (the sharded scheduler localized the rest), so the pass is one
    local-HBM sweep with zero ICI traffic."""
    from jax.sharding import PartitionSpec as P

    kinds, supports, gm, real_flags = pallas_block_specs_df64(block, params)
    interpret = _pallas_interpret()
    if planes[2] is None and not all(real_flags):
        planes = (planes[0], planes[1], jnp.zeros_like(planes[0]),
                  jnp.zeros_like(planes[1]))
    real_carry = planes[2] is None

    if real_carry:
        def local_fn2(rh, rl, g):
            out = _run_pallas_specs_df64((rh, rl, None, None), kinds,
                                         supports, g, real_flags,
                                         interpret=interpret)
            return out[0], out[1]

        rh, rl = jax.shard_map(
            local_fn2, mesh=sharding.mesh,
            in_specs=(sharding.spec, sharding.spec, P()),
            out_specs=(sharding.spec, sharding.spec),
            check_vma=False)(planes[0], planes[1], gm)
        return rh, rl, None, None

    def local_fn4(rh, rl, ih, il, g):
        return _run_pallas_specs_df64((rh, rl, ih, il), kinds, supports, g,
                                      real_flags, interpret=interpret)

    return jax.shard_map(
        local_fn4, mesh=sharding.mesh,
        in_specs=(sharding.spec,) * 4 + (P(),),
        out_specs=(sharding.spec,) * 4,
        check_vma=False)(*planes, gm)


def execute_df64(planes, ops: Sequence,
                 params: Optional[jnp.ndarray] = None,
                 fuse: bool = True, max_fuse: int = 2,
                 use_pallas: Optional[bool] = None, sharding=None):
    """``execute_pair`` on a df64 (hi/lo f32) four-plane state: PallasBlocks
    run the fused compensated-f32 kernels (ops/pallas_df64) in one HBM pass
    per planned kernel pass; every other item applies exactly per-op via
    ops/df64 (one pass per gate, still ~1e-16-per-op accurate).

    ``planes = (re_hi, re_lo, im_hi, im_lo)``; ``planes[2] is None``
    declares the state KNOWN-REAL — all-real blocks then stream 2 planes
    instead of 4, and the first complex gate materializes the imaginary
    planes. Returns planes with the same convention.

    ``sharding``: a NamedSharding over the flat amplitude axis — the
    caller (Circuit.flush) has already localized gates onto non-device-
    selecting bits via schedule_for_sharding; PallasBlocks then shard_map
    the kernels (zero ICI traffic per pass), per-op fallbacks partition
    under SPMD (rolls on local bits stay local; SWAP_BITS relabels lower
    to all-to-all transposes, same contract as the f32/pair engines)."""
    n = planes[0].shape[-1].bit_length() - 1
    items = list(ops)
    if use_pallas is None:
        use_pallas = fuse and _pallas_enabled()
    if use_pallas:
        from ..ops.pallas_sv import COL_QUBITS, max_kernel_qubit
        n_loc = n if sharding is None else \
            n - (_sv_shard_count(sharding) - 1).bit_length()
        if n_loc >= COL_QUBITS + 3:
            items = fuse_pallas_runs(items, n_loc - 1, num_qubits=n_loc,
                                     relabel_reach=max_kernel_qubit(n_loc)
                                     + 1)
    if fuse:
        items = fuse_diagonals(items)
    plan = plan_fusion(items, max_fuse=max_fuse) if fuse else items
    from ..ops import df64 as dfm

    def pin(planes):
        if sharding is None:
            return planes
        return tuple(p if p is None
                     else jax.lax.with_sharding_constraint(p, sharding)
                     for p in planes)

    for item in plan:
        if isinstance(item, PallasBlock):
            if sharding is not None:
                planes = _apply_pallas_block_df64_sharded(planes, item,
                                                          params, sharding)
            else:
                planes = _apply_pallas_block_df64(
                    planes, item, params, interpret=_pallas_interpret())
            planes = pin(planes)
            continue
        members = list(item.ops) if isinstance(item, (DiagBlock, FusedBlock)) \
            else [item]
        if planes[2] is None:
            planes = (planes[0], planes[1], jnp.zeros_like(planes[0]),
                      jnp.zeros_like(planes[1]))
        for op in members:
            if op.name == "SWAP_BITS":
                planes = tuple(
                    sv.swap_index_bits(p, op.targets[0], op.targets[1],
                                       use_transpose=True) for p in planes)
            elif op.name == "PERMUTE_BITS":
                d, s = ((op.controls, op.targets) if op.is_adjoint
                        else (op.targets, op.controls))
                planes = tuple(sv.permute_index_bits(p, d, s)
                               for p in planes)
            else:
                planes = dfm.apply_op_df64(planes, op,
                                           _resolve_params(op, params))
            planes = pin(planes)
    return planes


def _apply_pallas_block_sharded(state: jnp.ndarray, block: PallasBlock,
                                params, sharding) -> jnp.ndarray:
    """Sharded fused-kernel path: shard_map the kernel over the mesh — each
    device streams its LOCAL amplitude slice through VMEM (gates here touch
    only local index bits; the sharded scheduler localized the rest), so the
    fused pass costs one local-HBM sweep and zero ICI traffic."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    kinds, supports, gm, real_flags = pallas_block_specs(block, params)
    interpret = _pallas_interpret()

    def local_fn(s, g):
        re = jnp.real(s).astype(jnp.float32)
        im = jnp.imag(s).astype(jnp.float32)
        re, im = _run_pallas_specs(re, im, kinds, supports, g, real_flags,
                                   interpret=interpret)
        return config.complex_from_parts(re, im, s.dtype)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation; the kernel is purely local (no collectives), so the
    # sharding of the output is fully described by out_specs
    return shard_map(local_fn, mesh=sharding.mesh,
                     in_specs=(sharding.spec, P()),
                     out_specs=sharding.spec, check_vma=False)(state, gm)


def _sv_shard_count(sharding) -> int:
    """Number of shards along the amplitude axis of a flat-state sharding."""
    try:
        ax = sharding.spec[0]
    except (AttributeError, IndexError, TypeError):
        return 1
    if ax is None:
        return 1
    names = (ax,) if isinstance(ax, str) else tuple(ax)
    count = 1
    for nm in names:
        count *= sharding.mesh.shape[nm]
    return count


def _apply_pallas_block(state: jnp.ndarray, block: PallasBlock,
                        params, interpret: bool = False) -> jnp.ndarray:
    re = jnp.real(state).astype(jnp.float32)
    im = jnp.imag(state).astype(jnp.float32)
    re, im = _apply_pallas_block_pair(re, im, block, params,
                                      interpret=interpret)
    return config.complex_from_parts(re, im, state.dtype)


def apply_op(state: jnp.ndarray, op: GateOp,
             params: Optional[jnp.ndarray] = None,
             sharded: bool = False) -> jnp.ndarray:
    """Apply one GateOp (controlled slice-update fast path preserved)."""
    if op.name == "SWAP_BITS":
        # physical index-bit relabel: under sharding the transpose form is
        # required (it lowers to the ICI all-to-all); on one device the
        # fused-einsum SWAP avoids a padded materialized transpose
        return sv.swap_index_bits(state, op.targets[0], op.targets[1],
                                  use_transpose=sharded)
    if op.name == "PERMUTE_BITS":
        # batched relabel (scheduler prefetch): one transpose for the
        # whole swap set — one ICI all-to-all round under sharding.
        # Adjoint = the inverse permutation (swap dsts/srcs).
        d, s = ((op.controls, op.targets) if op.is_adjoint
                else (op.targets, op.controls))
        return sv.permute_index_bits(state, d, s)
    base, controls, targets = _split_op(op)
    mat = _base_matrix(op, params)
    return sv.apply_controlled_matrix(state, mat, controls, targets)


def _np_gate_matrix(name: str, params) -> np.ndarray:
    """Host (numpy) gate matrices for static-parameter fusion."""
    key = name.upper()
    if key in _g.FIXED:
        return np.asarray(_g.FIXED[key], np.complex128)
    if key == "RZZ":
        th = float(params[0])
        em, ep = np.exp(-0.5j * th), np.exp(0.5j * th)
        return np.diag([em, ep, ep, em])
    if key in ("RX", "RY", "RZ", "P", "PHASE", "U3"):
        theta = float(params[0])
        c, s = np.cos(theta / 2), np.sin(theta / 2)
        if key == "RX":
            return np.array([[c, -1j * s], [-1j * s, c]])
        if key == "RY":
            return np.array([[c, -s], [s, c]])
        if key == "RZ":
            return np.diag([np.exp(-0.5j * theta), np.exp(0.5j * theta)])
        if key in ("P", "PHASE"):
            return np.diag([1.0, np.exp(1j * theta)])
        t, phi, lam = (float(p) for p in params)
        ct, st = np.cos(t / 2), np.sin(t / 2)
        return np.array([[ct, -np.exp(1j * lam) * st],
                         [np.exp(1j * phi) * st,
                          np.exp(1j * (phi + lam)) * ct]])
    raise KeyError(key)


def _np_apply_rows(acc: np.ndarray, mat: np.ndarray, local, k: int) -> np.ndarray:
    """numpy: left-apply ``mat`` on the row-index bits ``local`` of acc."""
    m = len(local)
    tin = acc.reshape((2,) * k + (acc.shape[1],))
    mt = mat.reshape((2,) * (2 * m))
    row_axis = {k - 1 - q: i for i, q in enumerate(local)}
    labels = list(range(k + 1))
    row_label = [k + 1 + i for i in range(m)]
    mat_labels = ([row_label[m - 1 - j] for j in range(m)]
                  + [k - 1 - local[m - 1 - j] for j in range(m)])
    out_labels = [row_label[row_axis[a]] if a in row_axis else a
                  for a in range(k)] + [k]
    out = np.einsum(mt, mat_labels, tin, labels, out_labels)
    return out.reshape(acc.shape)


def _static_fused_matrix(block: FusedBlock) -> Optional[np.ndarray]:
    """Host-side product when every member has static params — the fused
    matrix bakes into the program as ONE constant (GateFusion.cpp's
    host-side products, generalized). Returns None when any member is
    parameterized or adjoint-of-parameterized."""
    bq = list(block.qubits)
    pos = {q: i for i, q in enumerate(bq)}
    k = len(bq)
    acc = np.eye(1 << k, dtype=np.complex128)
    for op in block.ops:
        # static means concrete host floats only — ParamRefs AND traced
        # values (the adjoint-grad path embeds tracers directly) disqualify
        if any(not isinstance(p, (int, float, np.integer, np.floating))
               for p in op.params):
            return None
        base, controls, targets = _split_op(op)
        if op.matrix is not None:
            mat = np.asarray(op.matrix, np.complex128)
        else:
            try:
                mat = _np_gate_matrix(base, op.params)
            except KeyError:
                return None
        if op.is_adjoint:
            mat = mat.conj().T
        if controls:
            m = mat.shape[0]
            full = np.eye(m << len(controls), dtype=np.complex128)
            full[-m:, -m:] = mat
            mat = full
            targets = targets + controls
        acc = _np_apply_rows(acc, mat, [pos[q] for q in targets], k)
    return acc


def _fused_matrix(block: FusedBlock, params: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Multiply the block's member unitaries into one dense matrix over
    block.qubits (analog of GateFusion's host-side 4x4 products,
    GateFusion.cpp:89-156, generalized and qubit-order-correct). Static
    blocks are computed on host and baked as constants; parameterized
    blocks build the matrix in-program (traced)."""
    static = _static_fused_matrix(block)
    if static is not None:
        return jnp.asarray(static, config.complex_dtype())
    bq = list(block.qubits)
    pos = {q: i for i, q in enumerate(bq)}
    k = len(bq)
    acc = jnp.eye(1 << k, dtype=config.complex_dtype())
    for op in block.ops:
        base, controls, targets = _split_op(op)
        mat = _base_matrix(op, params)
        if controls:
            mat = _dense_with_controls(mat, len(controls))
            targets = targets + controls
        local = [pos[q] for q in targets]
        # Left-multiply the embedded unitary: treat acc's columns as a batch
        # of states and apply the member gate to the row index.
        acc = jax.vmap(lambda col: sv.apply_matrix(col, mat, local),
                       in_axes=1, out_axes=1)(acc)
    return acc


def execute(state: jnp.ndarray, ops: Sequence, params: Optional[jnp.ndarray] = None,
            fuse: bool = True, max_fuse: int = 2,
            low_width: int = 0, high_width: int = 0,
            sharding=None, use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Trace a list of GateOps into gate applications on ``state``.

    ``low_width``/``high_width`` > 0 additionally consolidate runs of gates
    supported on the bottom/top index bits into single matmul blocks — the
    MXU-native formulation (see passes.consolidate_low/high).
    ``use_pallas`` (default: auto — on TPU, unsharded) routes runs of 1q
    gates through the fused single-pass kernel.
    """
    items = list(ops)
    if use_pallas is None:
        # the fused kernel computes in float32 — never route double-precision
        # states through it (chemistry-accuracy fp64 must stay fp64)
        use_pallas = (fuse and _pallas_enabled()
                      and state.dtype == jnp.complex64)
    if use_pallas:
        from ..ops.pallas_sv import COL_QUBITS, max_kernel_qubit
        n = sv.num_qubits_of(state)
        if sharding is not None:
            # sharded: the kernel runs per-shard under shard_map — only
            # LOCAL index bits (below the device-selecting top bits) are
            # reachable; the sharded scheduler already localized gates
            n_loc = n - (_sv_shard_count(sharding) - 1).bit_length()
        else:
            n_loc = n
        # need >= 8-row tiles (sublane-aligned; smaller shapes unvalidated
        # on hardware) and enough state for the conversion passes to pay off
        if n_loc >= COL_QUBITS + 3:
            # pallas runs claim gates FIRST (incl. diagonals — "D2" masked
            # multiplies), so H + controlled-phase cascades fuse into one
            # kernel pass; leftover diagonals fuse below
            items = fuse_pallas_runs(items, n_loc - 1, num_qubits=n_loc,
                                     relabel_reach=max_kernel_qubit(n_loc) + 1)
    if fuse:
        items = fuse_diagonals(items)
    plan = plan_fusion(items, max_fuse=max_fuse) if fuse else items
    if low_width:
        from .passes import consolidate_low
        plan = consolidate_low(plan, low_width)
    if high_width:
        from .passes import consolidate_high
        n = sv.num_qubits_of(state)
        plan = consolidate_high(plan, high_width, n)
    for item in plan:
        if isinstance(item, PallasBlock):
            if sharding is not None:
                state = _apply_pallas_block_sharded(state, item, params,
                                                    sharding)
            else:
                state = _apply_pallas_block(state, item, params,
                                            interpret=_pallas_interpret())
        elif isinstance(item, DiagBlock):
            state = _apply_diag_block(state, item, params)
        elif isinstance(item, FusedBlock):
            mat = _fused_matrix(item, params)
            state = sv.apply_matrix(state, mat, list(item.qubits))
        else:
            state = apply_op(state, item, params,
                             sharded=sharding is not None)
        if sharding is not None:
            # pin the layout after every op so the partitioner never falls
            # back to all-gathering the state
            state = jax.lax.with_sharding_constraint(state, sharding)
    return state


def _tiled_init_wanted(n: int) -> bool:
    """Kernel-layout |0...0> init: only where the fused kernels will
    consume it (real TPU, kernel-sized n) — the XLA ``pad`` init there
    carries the flat {T(1024)} layout and forces a physical retiling copy
    into the kernels' (R, C) view, which at n=31 is the 8 GiB temp that
    OOMed the chip (ROADMAP r4 capacity edge)."""
    from ..ops.pallas_sv import COL_QUBITS
    if n < COL_QUBITS + 3 or _pallas_interpret() or not _pallas_enabled():
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def init_pair(n: int):
    """|0...0> as a (re, im) float32 pair — HALF the working-set of the
    complex64 + conversion path, which is what lets n=30 (8 GiB of state)
    fit one 16 GiB v5e chip. At kernel sizes on TPU the planes are written
    in the fused kernels' tiled layout (init_zero_state_tiled) so no
    retiling copy ever materializes."""
    if _tiled_init_wanted(n):
        from ..ops.pallas_sv import init_zero_state_tiled
        return init_zero_state_tiled(n), jnp.zeros((1 << n,), jnp.float32)
    re = jnp.zeros((1 << n,), jnp.float32).at[0].set(1.0)
    im = jnp.zeros((1 << n,), jnp.float32)
    return re, im


def init_real(n: int):
    """|0...0> as a bare REAL float32 plane, for ``execute_pair(re, None,
    ...)``: circuits whose gates are all real (RY/X/Z/H/CNOT/CZ — e.g. the
    hardware-efficient RealAmplitudes ansatz family) keep a real state, so
    the fused kernels stream ONE plane instead of two: half the HBM
    traffic of the complex64 cost model per pass."""
    if _tiled_init_wanted(n):
        from ..ops.pallas_sv import init_zero_state_tiled
        return init_zero_state_tiled(n)
    return jnp.zeros((1 << n,), jnp.float32).at[0].set(1.0)


def execute_pair(re: jnp.ndarray, im: jnp.ndarray, ops: Sequence,
                 params: Optional[jnp.ndarray] = None,
                 fuse: bool = True, max_fuse: int = 2,
                 low_width: int = 0, high_width: int = 0,
                 use_pallas: Optional[bool] = None,
                 num_qubits: Optional[int] = None):
    """``execute`` on a float-pair state: PallasBlocks run pair-native
    (no complex materialization — with the kernels' in/out aliasing the
    whole pass is in-place in HBM); other items convert locally.

    For circuits that fuse entirely into PallasBlocks (1q layers), peak HBM
    is one state; the complex-carry path peaks at 2x at the conversion
    boundary, which is exactly the 258 MiB-over-budget OOM observed at
    n=30 on a 16 GiB chip.

    ``im=None`` declares the state KNOWN-REAL (see :func:`init_real`):
    all-real PallasBlocks then run single-plane (half traffic); the first
    complex gate materializes a zero imaginary plane and continues on the
    pair path. Returns ``(re, None)`` only if the state stayed real.

    ``re=None`` (with ``im=None`` and ``num_qubits``) DEFERS the |0..0>
    init: if the first plan item is a fused Pallas block, the init plane
    is generated in-kernel in that block's first-pass view geometry —
    no layout-mismatched init array, no retiling copy, ONE-plane peak
    HBM (what fits n=31 on a 16 GiB chip). Otherwise the plain init
    materializes here and execution proceeds unchanged.
    """
    if re is None and num_qubits is None:
        raise ValueError("execute_pair(re=None, ...) requires num_qubits")
    n = num_qubits if re is None else re.shape[-1].bit_length() - 1
    items = list(ops)
    if use_pallas is None:
        use_pallas = fuse and _pallas_enabled()
    if use_pallas:
        from ..ops.pallas_sv import COL_QUBITS, max_kernel_qubit
        if n >= COL_QUBITS + 3:
            items = fuse_pallas_runs(items, n - 1, num_qubits=n,
                                     relabel_reach=max_kernel_qubit(n) + 1)
    if fuse:
        items = fuse_diagonals(items)
    plan = plan_fusion(items, max_fuse=max_fuse) if fuse else items
    if low_width:
        from .passes import consolidate_low
        plan = consolidate_low(plan, low_width)
    if high_width:
        from .passes import consolidate_high
        plan = consolidate_high(plan, high_width, n)
    if re is None and not (plan and isinstance(plan[0], PallasBlock)):
        # deferred init has nowhere to fuse: materialize and run normally
        re = init_real(n)
    for item in plan:
        if isinstance(item, PallasBlock):
            re, im = _apply_pallas_block_pair(re, im, item, params,
                                              interpret=_pallas_interpret(),
                                              num_qubits=n)
            continue
        if im is None:
            im = jnp.zeros_like(re)
        state = config.complex_from_parts(re, im)
        if isinstance(item, DiagBlock):
            state = _apply_diag_block(state, item, params)
        elif isinstance(item, FusedBlock):
            mat = _fused_matrix(item, params)
            state = sv.apply_matrix(state, mat, list(item.qubits))
        else:
            state = apply_op(state, item, params)
        re = jnp.real(state).astype(jnp.float32)
        im = jnp.imag(state).astype(jnp.float32)
    return re, im


# Compile-service budget: >~300-op single programs can OOM the remote
# compiler, so both Circuit.flush and compile_ir split at this many
# post-fusion plan items per jitted program.
MAX_SEGMENT_ITEMS = 96


def segment_ops(ops: Sequence, num_qubits: int, max_items: int = 96,
                n_global: int = 0, fuse: bool = True) -> list:
    """Split an op list into segments of at most ``max_items`` POST-FUSION
    plan items (a PallasBlock costs ~its pass count, not its member count):
    the compile-service budget is about COMPILED program size, and a fused
    220-op QFT is ~one op. Segment boundaries follow plan-item order (a
    valid execution order), so member ops concatenate correctly."""
    from .passes import DiagBlock as _DB, FusedBlock as _FB, \
        PallasBlock as _PB
    ops = list(ops)
    if len(ops) <= max_items:
        return [ops]
    if not fuse:
        # unfused executions compile one op per gate: raw slicing
        return [ops[i:i + max_items] for i in range(0, len(ops), max_items)]
    items = ops
    if _pallas_enabled():
        from ..ops.pallas_sv import COL_QUBITS, max_kernel_qubit
        n_loc = num_qubits - n_global
        if n_loc >= COL_QUBITS + 3:
            items = fuse_pallas_runs(items, n_loc - 1, num_qubits=n_loc,
                                     relabel_reach=max_kernel_qubit(n_loc)
                                     + 1)
    items = fuse_diagonals(items)
    items = plan_fusion(items, max_fuse=2)

    def cost(item):
        if isinstance(item, _PB):
            # ~one compiled op per kernel pass; passes pack ~10+ gates
            return (len(item.ops) + 9) // 10 + 1
        return 1

    def members(item):
        return list(item.ops) if isinstance(item, (_PB, _DB, _FB)) \
            else [item]

    segments, cur, count = [], [], 0
    for item in items:
        c = cost(item)
        if cur and count + c > max_items:
            segments.append(cur)
            cur, count = [], 0
        cur.extend(members(item))
        count += c
    if cur:
        segments.append(cur)
    return segments


# ---------------------------------------------------------------------------
# Executable cache
# ---------------------------------------------------------------------------

_EXEC_CACHE = BoundedCache()

# Matmul-consolidation width caps. Measured on v5e (n=24 RY layer): widths
# of 9 keep the 2^w-wide matmuls memory-bound (14x over the per-gate einsum
# baseline); 12 tips compute-bound and loses most of the gain.
_MAX_LOW_WIDTH = 9
_MAX_HIGH_WIDTH = 9


def default_widths(n: int, sharded: bool = False):
    """(low_width, high_width) defaults for an n-qubit circuit. High-region
    consolidation is disabled when sharded: the top index bits select the
    device, and a dense matmul across them would force an all-gather."""
    low = min(_MAX_LOW_WIDTH, n)
    if sharded:
        return low, 0
    high = min(_MAX_HIGH_WIDTH, n - low)
    return low, high


def parametrize(ops: Sequence[GateOp]):
    """Rewrite concrete float params into ParamRef slots, returning
    (rewritten_ops, param_values). This is what lets eager reference-style
    circuits (concrete angles) share compiled executables across parameter
    updates (QuantumProgram.update_params semantics, api.py:391-417)."""
    import dataclasses as _dc
    new_ops, values = [], []
    for op in ops:
        new_params = []
        for p in op.params:
            if isinstance(p, ParamRef):
                new_params.append(p)
            else:
                new_params.append(ParamRef(len(values)))
                values.append(float(p))
        new_ops.append(_dc.replace(op, params=tuple(new_params)))
    return new_ops, values


def compile_ir(ir: CircuitIR, fuse: bool = True, max_fuse: int = 2,
               donate: bool = True, sharding=None, low_width: Optional[int] = None,
               high_width: Optional[int] = None, batched: bool = False,
               batch_sharding=None):
    """Return a jitted ``f(state, params) -> state`` for this IR, cached by
    structural key. With ``sharding`` (a NamedSharding over the amplitude
    axis), the program runs SPMD over the mesh: XLA inserts the ICI
    collectives for gates touching device-selecting qubits (the reference's
    hand-rolled rcclAlltoallv path, MULTI_GPU_GUIDE.md:44-51).

    ``batched=True`` vmaps the circuit over a leading batch axis — the
    reference's ``batchSize`` threading (hipStateVec.h:61) — and composes
    with sharding: per-op constraints pin the amplitude axis inside the
    vmap while ``batch_sharding`` (e.g. P('dp', 'sv') over a 2-D mesh) pins
    the (batch, 2^n) array at the boundary."""
    if low_width is None or high_width is None:
        dlw, dhw = default_widths(ir.num_qubits, sharded=sharding is not None)
        low_width = dlw if low_width is None else low_width
        high_width = dhw if high_width is None else high_width
    # structural_key maps concrete params to ("dyn",) so STRUCTURE-keyed
    # consumers (the adjoint cache) stay stable across parameter values —
    # but the executable BAKES concrete params (_resolve_params reads
    # op.params), so the exec cache must also key on their VALUES or two
    # IRs differing only in angles would share one wrong program.
    baked = tuple(float(p) for op in ir.ops for p in op.params
                  if not isinstance(p, ParamRef))
    key = (ir.structural_key(), baked, fuse, max_fuse, donate, sharding,
           low_width, high_width, batched, batch_sharding,
           config.get_precision(), _pallas_enabled(), _pallas_interpret())
    cached = _EXEC_CACHE.get(key)
    if cached is not None:
        return cached

    # Self-segmentation: one >~300-op jitted program can OOM the compile
    # service, so long IRs auto-split into chained per-segment executables
    # (the same post-fusion item rule Circuit.flush uses) — raw
    # compile_ir/Compiler.compile callers no longer need the manual 96-op
    # rule. The returned callable dispatches each segment from the host.
    n_glob = 0
    if sharding is not None and getattr(sharding, "device_set", None):
        n_dev = len(sharding.device_set)
        n_glob = max(n_dev - 1, 0).bit_length()
    segments = segment_ops(list(ir.ops), ir.num_qubits,
                           max_items=MAX_SEGMENT_ITEMS, n_global=n_glob,
                           fuse=fuse)
    if len(segments) > 1:
        seg_fns = [
            compile_ir(CircuitIR(ir.num_qubits, seg,
                                 name=f"{ir.name}.seg{i}"),
                       fuse=fuse, max_fuse=max_fuse, donate=donate,
                       sharding=sharding, low_width=low_width,
                       high_width=high_width, batched=batched,
                       batch_sharding=batch_sharding)
            for i, seg in enumerate(segments)]

        def chained(state, params):
            for f in seg_fns:
                state = f(state, params)
            return state

        _EXEC_CACHE[key] = chained
        return chained
    ops = list(ir.ops)

    def run_one(state, params):
        out = execute(state, ops, params, fuse=fuse, max_fuse=max_fuse,
                      low_width=low_width, high_width=high_width,
                      sharding=sharding)
        if sharding is not None:
            out = jax.lax.with_sharding_constraint(out, sharding)
        return out

    if batched:
        def run(state, params):
            out = jax.vmap(lambda s: run_one(s, params))(state)
            if batch_sharding is not None:
                out = jax.lax.with_sharding_constraint(out, batch_sharding)
            return out
    else:
        run = run_one

    io_sharding = batch_sharding if batched else sharding
    if io_sharding is not None:
        fn = jax.jit(run, in_shardings=(io_sharding, None),
                     out_shardings=io_sharding,
                     donate_argnums=(0,) if donate else ())
    else:
        fn = jax.jit(run, donate_argnums=(0,) if donate else ())
    _EXEC_CACHE[key] = fn
    return fn


def compile_pair32_ir(ir: CircuitIR, fuse: bool = True, max_fuse: int = 2):
    """Return a jitted ``f((re, im_or_None), params) -> (re, im_or_None)``
    over :func:`execute_pair` — the Pallas float-pair engine as the Circuit
    flush backend for f32, unsharded, unbatched states.

    Carrying the state as a float pair removes the complex<->pair
    conversion passes `compile_ir`'s complex path pays around every
    PallasBlock, halves peak HBM (what fits n=30 on a 16 GiB chip), and —
    when the incoming ``im`` is None and the segment's gates are all real —
    runs the kernels' single-plane REAL-STATE mode at half the remaining
    traffic. Output realness is a static trace-time fact: the jitted
    program returns ``(re, None)`` iff the state stayed real."""
    baked = tuple(float(p) for op in ir.ops for p in op.params
                  if not isinstance(p, ParamRef))
    key = (ir.structural_key(), baked, fuse, max_fuse, "pair32",
           _pallas_enabled(), _pallas_interpret())
    cached = _EXEC_CACHE.get(key)
    if cached is not None:
        return cached
    segments = segment_ops(list(ir.ops), ir.num_qubits,
                           max_items=MAX_SEGMENT_ITEMS, fuse=fuse)
    if len(segments) > 1:
        seg_fns = [compile_pair32_ir(CircuitIR(ir.num_qubits, seg,
                                               name=f"{ir.name}.seg{i}"),
                                     fuse=fuse, max_fuse=max_fuse)
                   for i, seg in enumerate(segments)]

        def chained(pair, params):
            for f in seg_fns:
                pair = f(pair, params)
            return pair

        _EXEC_CACHE[key] = chained
        return chained
    ops = list(ir.ops)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(pair, params):
        re, im = pair
        return execute_pair(re, im, ops, params, fuse=fuse,
                            max_fuse=max_fuse)

    _EXEC_CACHE[key] = run
    return run


def compile_df64_fused_ir(ir: CircuitIR, fuse: bool = True,
                          max_fuse: int = 2, sharding=None):
    """Return a jitted ``f((re, im_or_None), params) -> (re, im_or_None)``
    over :func:`execute_df64` on an exact-f64 pair state — the double-float
    engine as a Circuit flush backend (``rocquantum_tpu.set_precision
    ('df64')`` / ROCQ_DF64=1).

    The program splits each f64 plane into a hi/lo f32 pair (exact to the
    df64 working precision, ~2^-49 relative), runs the circuit on the fused
    compensated-f32 Pallas kernels (whole gate LAYERS per HBM pass, native
    f32 VPU arithmetic — the two levers the exact-f64 pair engine can never
    have on v5e, docs/FP64_GUIDE.md), and promotes back to exact f64 at the
    boundary. ``im is None`` carries a KNOWN-REAL state at half the
    traffic, exactly like compile_pair32_ir.

    ``sharding`` compiles the SHARDED df64 program: gates must already be
    localized (Circuit.flush runs schedule_for_sharding first); fused
    blocks shard_map the kernels, the state planes stay pinned to the
    sharding throughout (the engine-global precision-switch parity the
    reference's hipStateVec.h:7-15 regime implies)."""
    baked = tuple(float(p) for op in ir.ops for p in op.params
                  if not isinstance(p, ParamRef))
    key = (ir.structural_key(), baked, fuse, max_fuse, "df64",
           _pallas_enabled(), _pallas_interpret(), sharding)
    cached = _EXEC_CACHE.get(key)
    if cached is not None:
        return cached
    n_global = 0 if sharding is None else \
        (_sv_shard_count(sharding) - 1).bit_length()
    segments = segment_ops(list(ir.ops), ir.num_qubits,
                           max_items=MAX_SEGMENT_ITEMS, fuse=fuse,
                           n_global=n_global)
    if len(segments) > 1:
        seg_fns = [compile_df64_fused_ir(CircuitIR(ir.num_qubits, seg,
                                                   name=f"{ir.name}.seg{i}"),
                                         fuse=fuse, max_fuse=max_fuse,
                                         sharding=sharding)
                   for i, seg in enumerate(segments)]

        def chained(pair, params):
            for f in seg_fns:
                pair = f(pair, params)
            return pair

        _EXEC_CACHE[key] = chained
        return chained
    ops = list(ir.ops)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(pair, params):
        from ..ops import df64 as dfm
        re, im = pair
        rh = re.astype(jnp.float32)
        rl = (re - rh.astype(jnp.float64)).astype(jnp.float32)
        if im is None:
            planes = (rh, rl, None, None)
        else:
            ih = im.astype(jnp.float32)
            il = (im - ih.astype(jnp.float64)).astype(jnp.float32)
            planes = (rh, rl, ih, il)
        if sharding is not None:
            planes = tuple(
                p if p is None
                else jax.lax.with_sharding_constraint(p, sharding)
                for p in planes)
        planes = execute_df64(planes, ops, params, fuse=fuse,
                              max_fuse=max_fuse, sharding=sharding)
        out_re = dfm.promote_f64(planes[0], planes[1])
        out_im = None if planes[2] is None \
            else dfm.promote_f64(planes[2], planes[3])
        if sharding is not None:
            out_re = jax.lax.with_sharding_constraint(out_re, sharding)
            if out_im is not None:
                out_im = jax.lax.with_sharding_constraint(out_im, sharding)
        return out_re, out_im

    _EXEC_CACHE[key] = run
    return run


def clear_cache():
    _EXEC_CACHE.clear()
