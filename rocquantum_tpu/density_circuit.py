"""DensityCircuit: the main-API circuit handle on the density-matrix engine.

Completes the front-end matrix: the reference exposed density-matrix
simulation only through the DSL backend and raw binding
(rocq/backends.py DensityMatrixBackend, py_hip_density_mat.cpp); this class
gives it the same queue/flush/measure/sample/expval surface as
:class:`rocquantum_tpu.api.Circuit`, plus noise-channel application and
NoiseModel attachment.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

import functools

from . import config
from .api import PauliOperator, Simulator, _GateMethods
from .ops import density as dmops
from .utils.cache import BoundedCache


# Module-level jitted helpers: a fresh ``jax.jit(lambda ...)`` per call is
# a NEW function identity — every invocation pays a retrace plus a remote
# compile-cache round trip (~100 ms each on the axon relay; the r4 density
# flush spent 440 ms/flush on exactly this).
@functools.partial(jax.jit, static_argnums=0)
def _init_rho_real(n: int):
    """REAL plane of |0...0><0...0| (the f32 pair carry's entry state)."""
    return jnp.real(dmops.init_density(n))


@jax.jit
def _complex_to_pair(r):
    return jnp.real(r), jnp.imag(r)


@jax.jit
def _pair_to_complex(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _real_to_complex64(re):
    return re.astype(jnp.complex64)


_DM_INIT_CACHE = BoundedCache()

_DM_RUN_CACHE = BoundedCache()

# flush-plan cache: queue STRUCTURE -> (sub partition lengths, fused-pair
# plan). Re-planning the pass-budget split costs ~60 ms host-side per
# flush at the n=13 bench workload (planned_pass_count re-plans the
# growing op list per item) and the fused-pair op rebuild another ~30 ms —
# structure-identical flushes skip both (same move as api.Circuit's
# _FLUSH_PLAN_CACHE).
_DM_PLAN_CACHE = BoundedCache()


def _slot_rule(name, vals, mat_key):
    """Which runtime-slot rule a parameterized gate's conjugate side uses
    (None: params must be baked concrete — matrix gates, names without a
    sign rule). Shared by the plan key and the plan builder so their
    value-hoisting enumerations agree."""
    if not vals or mat_key is not None:
        return None
    key = name.upper()
    if key in _CONJ_SELF:
        return "self"
    if key in _CONJ_NEGATE:
        return "negate"
    if key == "U3" and len(vals) == 3:
        return "u3"
    return None

# conjugation rules for named gates (U rho U†: the COLUMN side applies
# conj(U); with the op's is_adjoint flag kept, (conj U)† == conj(U†))
_CONJ_SELF = {"H", "X", "Z", "RY", "CRY", "CNOT", "CX", "CZ", "SWAP",
              "MCX", "CCX", "TOFFOLI", "CSWAP", "I", "ID"}
_CONJ_NAME = {"S": "SDG", "SDG": "S", "T": "TDG", "TDG": "T"}
_CONJ_NEGATE = {"RX", "RZ", "P", "PHASE", "CRX", "CRZ"}


def _gate_items_2n(n, name, tgt, ctrl, vals, mat_key, adj):
    """(row_op, col_op) GateOps on the flattened 2n-qubit view of rho, or
    (None, None) when the gate has no named conjugation rule (caller falls
    back to the per-gate dense path). Row (ket) bits are the HIGH n bits."""
    from .compiler.ir import GateOp

    row_t = tuple(q + n for q in tgt)
    row_c = tuple(q + n for q in ctrl)
    if mat_key is not None:
        m = np.frombuffer(mat_key[0], np.complex128).reshape(mat_key[1])
        row = GateOp("UNITARY", row_t, row_c, (), m, adj)
        col = GateOp("UNITARY", tuple(tgt), tuple(ctrl), (),
                     np.conj(m), adj)
        return row, col
    key = name.upper()
    row = GateOp(key, row_t, row_c, tuple(vals), None, adj)
    if key in _CONJ_SELF:
        return row, GateOp(key, tuple(tgt), tuple(ctrl), tuple(vals), None,
                           adj)
    if key in _CONJ_NAME:
        return row, GateOp(_CONJ_NAME[key], tuple(tgt), tuple(ctrl), (),
                           None, adj)
    if key in _CONJ_NEGATE:
        return row, GateOp(key, tuple(tgt), tuple(ctrl),
                           tuple(-v for v in vals), None, adj)
    if key == "Y":
        return row, GateOp("UNITARY", tuple(tgt), tuple(ctrl), (),
                           np.conj(np.array([[0, -1j], [1j, 0]])), adj)
    if key == "U3" and len(vals) == 3:
        return row, GateOp(key, tuple(tgt), tuple(ctrl),
                           (vals[0], -vals[1], -vals[2]), None, adj)
    return None, None


def _gate_items_2n_sched(n, name, tgt, ctrl, vals, mat_key, adj):
    """(row_op, col_op) like :func:`_gate_items_2n`, but ``vals`` may be the
    flush's ("slots", i...) marker: parameter slots are re-encoded as
    ("sslots", (slot, sign), ...) so the col side's sign flips survive until
    the traced resolution inside ``run`` (the sharded path schedules ops
    BEFORE tracing, so it cannot embed traced values)."""
    from .compiler.ir import GateOp

    if not (vals and vals[0] == "slots"):
        return _gate_items_2n(n, name, tgt, ctrl, vals, mat_key, adj)
    slots = vals[1:]
    key = name.upper()
    row_params = ("sslots",) + tuple((i, 1.0) for i in slots)
    row = GateOp(key, tuple(q + n for q in tgt), tuple(q + n for q in ctrl),
                 row_params, None, adj)
    if key in _CONJ_SELF:
        col_params = row_params
    elif key in _CONJ_NEGATE:
        col_params = ("sslots",) + tuple((i, -1.0) for i in slots)
    elif key == "U3" and len(slots) == 3:
        col_params = ("sslots", (slots[0], 1.0), (slots[1], -1.0),
                      (slots[2], -1.0))
    else:
        return None, None
    col = GateOp(key, tuple(tgt), tuple(ctrl), col_params, None, adj)
    return row, col


class DensityCircuit(_GateMethods):
    """Gate+channel queue over a density matrix; flush compiles the queued
    segment into one jitted program (structure-cached, angles dynamic).

    With ``mesh`` (a jax.sharding.Mesh with an 'sv' axis), rho — the
    flattened 2n-qubit view — is SHARDED over the mesh: the top index bits
    (high ROW qubits) select the device, and the flush routes the whole
    segment through the qubit-locality scheduler
    (compiler/sharded_schedule.py), relabeling index bits via all-to-all so
    gates and Kraus channels always touch local bits — never the
    all-gather fallback of the bare XLA partitioner. This extends the
    reference's multi-GPU design (MULTI_GPU_GUIDE.md:19-59, statevector
    only) to the density engine."""

    def __init__(self, num_qubits: int, simulator: Simulator,
                 noise_model=None, mesh=None):
        if not isinstance(simulator, Simulator):
            raise TypeError("A valid Simulator instance is required.")
        if num_qubits < 0:
            raise ValueError("Number of qubits must be non-negative.")
        self.num_qubits = num_qubits
        self.simulator = simulator
        self.noise_model = noise_model
        self.batch_size = 1
        self.mesh = mesh
        self._layout2n: List[int] = list(range(2 * num_qubits))
        self._queue: List[tuple] = []
        self._rho: Optional[jax.Array] = None
        if mesh is not None:
            from .parallel.sharded import num_global_qubits
            n_global = num_global_qubits(mesh)
            if n_global >= 2 * num_qubits:
                raise ValueError(
                    f"mesh has {n_global} device-selecting bits but rho has "
                    f"only {2 * num_qubits} index bits")

    def _sharding(self):
        if self.mesh is None:
            return None
        from .parallel.sharded import state_sharding
        return state_sharding(self.mesh)

    # -- queueing -------------------------------------------------------------

    def _enqueue(self, name, targets, controls=(), params=(), matrix=None,
                 is_adjoint=False):
        mat_key = None
        if matrix is not None:
            m = np.ascontiguousarray(matrix, np.complex128)
            mat_key = (m.tobytes(), m.shape)
        self._queue.append(("gate", name.upper(), tuple(targets),
                            tuple(controls),
                            tuple(float(p) for p in params), mat_key,
                            bool(is_adjoint)))
        if self.noise_model is not None:
            for ch in self.noise_model.get_channels():
                if ch["op"] is not None and ch["op"] != name.lower():
                    continue
                qs = ch["qubits"] if ch["qubits"] is not None else \
                    list(targets) + list(controls)
                self.apply_channel(ch["type"], ch["prob"], qs)

    def apply_channel(self, channel_type: str, probability: float,
                      qubits: List[int]):
        """Queue a named noise channel (hipDensityMatApplyChannel surface)."""
        if channel_type.lower() not in dmops.CHANNELS:
            raise ValueError(f"Unknown noise channel: {channel_type!r}")
        self._queue.append(("channel", channel_type.lower(),
                            float(probability), tuple(qubits)))

    def apply_kraus(self, kraus_ops, qubits: List[int]):
        mats = tuple((np.ascontiguousarray(k, np.complex128).tobytes(),
                      np.asarray(k).shape) for k in kraus_ops)
        self._queue.append(("kraus", mats, tuple(qubits)))

    # -- execution --------------------------------------------------------------

    def _use_pair(self) -> bool:
        """fp64 density circuits run the float-pair engine (ops/pairdm.py):
        complex128 programs abort this TPU stack's x64 rewriter — sharded
        circuits included (both parts over 'sv'; relabels stay all-to-all
        transposes). Sticky once rho exists."""
        if self._rho is not None:
            return isinstance(self._rho, tuple)
        return config.get_precision() == "double"

    def _init_rho(self):
        n = self.num_qubits
        sh = self._sharding()
        pair = self._use_pair()
        key = (n, sh, pair, config.get_precision())
        fn = _DM_INIT_CACHE.get(key)
        if fn is None:
            if pair:
                from .ops import pairdm

                def mk():
                    re, im = pairdm.init_density_pair(n)
                    if sh is not None:
                        re = jax.lax.with_sharding_constraint(re, sh)
                        im = jax.lax.with_sharding_constraint(im, sh)
                    return re, im

                fn = jax.jit(mk)
            elif sh is None:
                fn = jax.jit(lambda: dmops.init_density(n))
            else:
                fn = jax.jit(lambda: dmops.init_density(n), out_shardings=sh)
            _DM_INIT_CACHE[key] = fn
        return fn()

    # Per-program op budget: gates expand to 2 ops on the 2n view and a
    # factored channel to ~4, and one >300-op jitted program OOM-kills the
    # remote XLA compile service — so a long queue flushes as a CHAIN of
    # programs (same rule as Circuit's 96-item segments).
    _SEGMENT_OPS = 90

    # Kernel-pass budget per compiled program on the fused-kernel path: the
    # remote compile service OOMs (SIGKILL) on the many-pass x
    # many-controlled-spec combination the 2n-view density programs produce
    # (3 planned passes x ~39 CU/CNOT specs per chunk at the n=13 rho bench
    # workload), while programs with a similar spec count but few passes —
    # or many passes but few controlled specs — compile fine. A pure
    # op/spec count cannot separate
    # them (tried and reverted), so flushes split at the REAL planned pass
    # count (interpreter.planned_pass_count). ROCQ_DM_PASS_BUDGET overrides.
    # Chip-measured at the n=13 bench workload: unsplit (3-pass x ~39-CU
    # programs) SIGKILLs the helper; the split programs compile fine.
    _PASS_BUDGET = 2

    def _plan_key(self, queue):
        """(plan_key, hoisted queue values) for the flush-plan cache.
        Slot-rule gate angles hoist out of the key (structure sharing
        across parameter values); channel probabilities and matrix bytes
        stay IN the key — they bake into factorized superoperators."""
        parts, values = [], []
        for item in queue:
            if item[0] == "gate" and _slot_rule(item[1], item[4], item[5]):
                parts.append(item[:4] + (("slots", len(item[4])),)
                             + item[5:])
                values.extend(item[4])
            else:
                parts.append(item)
        from .compiler.interpreter import _pallas_enabled, _pallas_interpret
        env = (_pallas_enabled(), _pallas_interpret(),
               bool(os.environ.get("ROCQ_DISABLE_PAIR32")),
               os.environ.get("ROCQ_DM_PASS_BUDGET"),
               config.df64_enabled())
        return (tuple(parts), self.num_qubits, self.mesh,
                tuple(self._layout2n), config.get_precision(),
                self._use_pair(), self._rho is None, env), values

    def flush(self):
        if not self._queue:
            if self._rho is None:
                self._rho = self._init_rho()
            return
        queue, self._queue = list(self._queue), []
        plan_key, qvalues = self._plan_key(queue)
        plan = _DM_PLAN_CACHE.get(plan_key)
        if plan is None:
            subs = self._plan_subs(queue)
            pair_plan = self._build_pair32_plan(subs)
            _DM_PLAN_CACHE[plan_key] = (tuple(len(s) for s in subs),
                                        pair_plan)
        else:
            lens, pair_plan = plan
            subs, i = [], 0
            for length in lens:
                subs.append(queue[i:i + length])
                i += length
        if pair_plan is not None:
            self._exec_pair32_plan(pair_plan, qvalues)
            return
        for sub in subs:
            self._flush_items(sub)

    def _plan_subs(self, queue):
        """Chunk the queue by per-program op cost, then split each chunk at
        the kernel-pass budget."""
        def cost(item):
            k = item[0]
            if k == "gate":
                return 2
            if k == "channel":
                return 4 * len(item[3])
            return 4  # kraus
        chunks, cur, acc = [], [], 0
        for item in queue:
            c = cost(item)
            if cur and acc + c > self._SEGMENT_OPS:
                chunks.append(cur)
                cur, acc = [], 0
            cur.append(item)
            acc += c
        if cur:
            chunks.append(cur)
        return [sub for chunk in chunks
                for sub in self._split_chunk_by_passes(chunk)]

    def _build_pair32_plan(self, subs):
        """f32 fused-pair plan for a pass-budget-split sub chain: carry rho
        as (re, im) float planes ACROSS the sub programs (compile_pair32_ir
        on the 2n-qubit view) instead of a complex array, eliminating the
        complex<->pair conversion passes every split program would
        otherwise pay on entry/exit — and, while rho stays real (|0><0| is,
        and many channels/gates preserve realness), the kernels run the
        single-plane REAL-STATE mode at half the HBM traffic.

        In df64 mode (``set_precision("df64")``) the SAME 2n-view sub IRs
        compile onto the double-float engine instead
        (compile_df64_fused_ir): rho carried as the exact-f64 pair between
        flushes, hi/lo f32 planes through the fused compensated-f32
        kernels inside — the density twin of the Circuit df64 flush
        (VERDICT r4 #4; the reference's precision switch is engine-global,
        hipStateVec.h:7-15).

        Returns (fns, ref_map, mode) — the compiled chain plus the recipe
        mapping hoisted queue values to the runtime param vector (the
        conjugate side's sign flips become extra negated entries) — or
        None when any item lacks a 2n-view kernel form, the split is
        trivial, the circuit is sharded/exact-fp64, or
        ROCQ_DISABLE_PAIR32 is set (the caller then uses the per-sub
        complex/pair path, like the Circuit analog in api.py flush)."""
        df64 = config.df64_enabled()
        if (self.mesh is not None or (self._use_pair() and not df64)
                or os.environ.get("ROCQ_DISABLE_PAIR32")):
            return None
        if len(subs) <= 1 and not df64:
            return None
        from .compiler.interpreter import (_pallas_enabled,
                                           compile_df64_fused_ir,
                                           compile_pair32_ir)
        if not _pallas_enabled():
            return None
        from .compiler.ir import CircuitIR, GateOp, ParamRef

        n, n2 = self.num_qubits, 2 * self.num_qubits
        ref_map: List[Tuple[int, float]] = []  # param[j] = sign * qvalues[i]
        base = 0  # position in the hoisted queue-values vector
        sub_irs = []
        for sub in subs:
            ops = []
            for item in sub:
                rule = _slot_rule(item[1], item[4], item[5]) \
                    if item[0] == "gate" else None
                if rule is None:
                    item_ops = self._item_ops_2n(item)
                    if item_ops is None:
                        return None  # dense fallback item: complex path
                    ops.extend(item_ops)
                    continue
                _, name, tgt, ctrl, vals, _, adj = item
                key = name.upper()
                row_refs = []
                for j in range(len(vals)):
                    ref_map.append((base + j, 1.0))
                    row_refs.append(ParamRef(len(ref_map) - 1))
                row_refs = tuple(row_refs)
                if rule == "self":
                    col_refs = row_refs
                elif rule == "negate":
                    col_refs = []
                    for j in range(len(vals)):
                        ref_map.append((base + j, -1.0))
                        col_refs.append(ParamRef(len(ref_map) - 1))
                    col_refs = tuple(col_refs)
                else:  # u3: col = (v0, -v1, -v2)
                    ref_map.append((base + 1, -1.0))
                    ref_map.append((base + 2, -1.0))
                    col_refs = (row_refs[0], ParamRef(len(ref_map) - 2),
                                ParamRef(len(ref_map) - 1))
                base += len(vals)
                ops.append(GateOp(key, tuple(q + n for q in tgt),
                                  tuple(q + n for q in ctrl), row_refs,
                                  None, adj))
                ops.append(GateOp(key, tuple(tgt), tuple(ctrl), col_refs,
                                  None, adj))
            sub_irs.append(CircuitIR(n2, ops))
        if df64:
            fns = [compile_df64_fused_ir(ir) for ir in sub_irs]
            return (fns, tuple(ref_map), "df64")
        fns = [compile_pair32_ir(ir) for ir in sub_irs]
        return (fns, tuple(ref_map), "pair32")

    def _exec_pair32_plan(self, plan, qvalues):
        """Run a cached fused-pair plan against the hoisted queue values."""
        fns, ref_map, mode = plan
        n = self.num_qubits
        params = (jnp.asarray([s * qvalues[i] for i, s in ref_map],
                              dtype=config.real_dtype()) if ref_map
                  else jnp.zeros((0,), dtype=config.real_dtype()))
        if mode == "df64":
            # rho is held as the exact-f64 pair (the pairdm state form);
            # |0><0| is REAL, so a fresh chain enters single-plane
            if self._rho is None:
                pair = (jnp.zeros((1 << (2 * n),), jnp.float64)
                        .at[0].set(1.0), None)
            else:
                pair = tuple(self._rho)
            for fn in fns:
                pair = fn(pair, params)
            re, im = pair
            if im is None:
                # the pairdm readback twins expect both planes
                im = jnp.zeros_like(re)
            self._rho = (re, im)
            return
        if self._rho is None:
            # |0><0| is REAL: enter the chain single-plane (im=None)
            pair = (_init_rho_real(n), None)
        else:
            pair = tuple(_complex_to_pair(self._rho))
        for fn in fns:
            pair = fn(pair, params)
        re, im = pair
        if im is None:
            self._rho = _real_to_complex64(re)
        else:
            self._rho = _pair_to_complex(re, im)

    def _item_ops_2n(self, item):
        """Host-side 2n-view GateOps for one queue item (concrete params),
        or None when the item falls back to the per-gate dense path.
        Planning only — execution rebuilds these inside the traced run."""
        from .compiler.ir import GateOp
        n = self.num_qubits
        kind = item[0]
        if kind == "gate":
            _, name, tgt, ctrl, vals, mat_key, adj = item
            row, col = _gate_items_2n(n, name, tgt, ctrl, vals, mat_key, adj)
            return None if row is None else [row, col]
        if kind == "channel":
            _, channel, prob, tgt = item
            ks = dmops.CHANNELS[channel.lower()](prob)
            s = dmops.kraus_superoperator(ks, xp=np)
            out = []
            for q in tgt:
                fops = dmops.superop_kernel_ops(s, q, q + n)
                out.extend(fops if fops is not None else
                           [GateOp("UNITARY", (q, q + n), (), (), s)])
            return out
        _, mats, tgt = item
        ks = [np.frombuffer(b, np.complex128).reshape(shape)
              for b, shape in mats]
        s = dmops.kraus_superoperator(ks, xp=np)
        fops = dmops.superop_kernel_ops(s, tgt[0], tgt[0] + n) \
            if len(tgt) == 1 else None
        if fops is not None:
            return fops
        pos = tuple(tgt) + tuple(q + n for q in tgt)
        return [GateOp("UNITARY", pos, (), (), s)]

    def _split_chunk_by_passes(self, chunk):
        """Split a flush chunk so each compiled program's planned
        kernel-pass count stays within the pass budget — only on unsharded
        fused-kernel paths (the ones whose big programs OOM the compile
        helper); the sharded scheduler segments its own drains."""
        from .compiler.interpreter import _pallas_enabled, planned_pass_count
        from .ops.pallas_sv import COL_QUBITS
        if (self.mesh is not None
                or (self._use_pair() and not config.df64_enabled())
                or not _pallas_enabled()
                or 2 * self.num_qubits < COL_QUBITS + 3
                or len(chunk) <= 1):
            # fp64 pair flushes apply exact sequential ops (no fused
            # kernels) — splitting cannot prevent the OOM this targets and
            # only multiplies remote compiles
            return [chunk]
        try:
            budget = int(os.environ.get("ROCQ_DM_PASS_BUDGET",
                                        self._PASS_BUDGET))
        except ValueError:
            budget = self._PASS_BUDGET
        budget = max(budget, 0)  # 0 = split at every planned pass
        n2 = 2 * self.num_qubits
        out, cur, cur_ops = [], [], []
        for item in chunk:
            ops = self._item_ops_2n(item) or []
            if cur and planned_pass_count(cur_ops + ops, n2) > budget:
                out.append(cur)
                cur, cur_ops = [], []
            cur.append(item)
            cur_ops.extend(ops)
        if cur:
            out.append(cur)
        return out

    def _flush_items(self, queue):
        # split angles into a runtime vector for structure-keyed caching
        key_items, values = [], []
        for item in queue:
            if item[0] == "gate" and item[4]:
                slots = tuple(range(len(values), len(values) + len(item[4])))
                values.extend(item[4])
                key_items.append(item[:4] + (("slots",) + slots,) + item[5:])
            else:
                key_items.append(item)
        key_items = tuple(key_items)
        if self.mesh is not None:
            return self._flush_sharded(key_items, values)
        if self._use_pair():
            return self._flush_items_pair(key_items, values)
        cache_key = (self.num_qubits, key_items, config.get_precision())
        fn = _DM_RUN_CACHE.get(cache_key)
        if fn is None:
            n = self.num_qubits

            def run(rho, params):
                from .compiler.interpreter import execute as _exec
                from .compiler.ir import GateOp
                pending2n: List = []  # GateOps on the 2n-qubit flat view

                def drain(rho):
                    if pending2n:
                        rho = _exec(rho, list(pending2n), None)
                        pending2n.clear()
                    return rho

                for item in key_items:
                    kind = item[0]
                    if kind == "gate":
                        _, name, tgt, ctrl, vals, mat_key, adj = item
                        if vals and vals[0] == "slots":
                            vals = [params[i] for i in vals[1:]]
                        row, col = _gate_items_2n(n, name, tgt, ctrl, vals,
                                                  mat_key, adj)
                        if row is not None:
                            # consecutive unitaries run through the fused
                            # interpreter (diagonal fusion / Pallas layers /
                            # consolidation) on the 2n-qubit view — the
                            # reference applied one kernel per gate side
                            pending2n.extend((row, col))
                            continue
                        rho = drain(rho)
                        rho = dmops.apply_gate_dm(rho, name, list(tgt),
                                                  list(ctrl), list(vals),
                                                  adjoint=adj)
                    elif kind == "channel":
                        # channels ride the SAME fused interpreter stream as
                        # the gates: factored into kernel-native ops
                        # (CNOT/U/CU or one D2 diagonal) when the
                        # superoperator block-diagonalizes — so a whole
                        # noise layer fuses into the surrounding Pallas
                        # passes — else one dense 4x4 per target
                        _, channel, prob, tgt = item
                        ks = dmops.CHANNELS[channel.lower()](prob)
                        s = dmops.kraus_superoperator(ks, xp=np)
                        for q in tgt:
                            fops = dmops.superop_kernel_ops(s, q, q + n)
                            pending2n.extend(fops if fops is not None else
                                             [GateOp("UNITARY", (q, q + n),
                                                     (), (), s)])
                    else:  # kraus
                        _, mats, tgt = item
                        ks = [np.frombuffer(b, np.complex128).reshape(shape)
                              for b, shape in mats]
                        s = dmops.kraus_superoperator(ks, xp=np)
                        fops = dmops.superop_kernel_ops(
                            s, tgt[0], tgt[0] + n) if len(tgt) == 1 else None
                        if fops is not None:
                            pending2n.extend(fops)
                        else:
                            pos = tuple(tgt) + tuple(q + n for q in tgt)
                            pending2n.append(GateOp("UNITARY", pos, (), (), s))
                return drain(rho)

            fn = jax.jit(run, donate_argnums=(0,))
            _DM_RUN_CACHE[cache_key] = fn
        if self._rho is None:
            self._rho = self._init_rho()
        params = jnp.asarray(values, dtype=config.real_dtype())
        self._rho = fn(self._rho, params)

    def _flush_items_pair(self, key_items, values):
        """fp64 float-pair twin of the run loop: exact sequential pair ops
        (no fused interpreter / superop factorization — those compute in
        f32); params stay runtime inputs for structure-keyed caching."""
        from .compiler.ir import GateOp
        from .ops import pairdm

        cache_key = ("pair", self.num_qubits, key_items)
        fn = _DM_RUN_CACHE.get(cache_key)
        if fn is None:
            n = self.num_qubits

            def run(re, im, params):
                for item in key_items:
                    kind = item[0]
                    if kind == "gate":
                        _, name, tgt, ctrl, vals, mat_key, adj = item
                        if vals and vals[0] == "slots":
                            vals = tuple(params[i] for i in vals[1:])
                        mat = None
                        if mat_key is not None:
                            mat = np.frombuffer(
                                mat_key[0], np.complex128).reshape(mat_key[1])
                        op = GateOp(name, tuple(tgt), tuple(ctrl), (), mat,
                                    adj)
                        re, im = pairdm.apply_op_pair_dm(
                            re, im, op, n, params_resolved=tuple(vals))
                    elif kind == "channel":
                        _, channel, prob, tgt = item
                        re, im = pairdm.apply_channel_pair_dm(
                            re, im, channel, prob, list(tgt), n)
                    else:  # kraus
                        _, mats, tgt = item
                        ks = [np.frombuffer(b, np.complex128).reshape(shape)
                              for b, shape in mats]
                        re, im = pairdm.apply_kraus_pair_dm(
                            re, im, ks, list(tgt), n)
                return re, im

            fn = jax.jit(run, donate_argnums=(0, 1))
            _DM_RUN_CACHE[cache_key] = fn
        if self._rho is None:
            self._rho = self._init_rho()
        params = jnp.asarray(values, dtype=config.real_dtype())
        self._rho = fn(*self._rho, params)

    def _flush_sharded(self, key_items, values):
        """Sharded flush: schedule the segment's 2n-qubit ops through the
        qubit-locality scheduler (SWAP_BITS relabels -> all-to-all, never
        all-gather) and execute under the rho sharding. Kraus channels ride
        placeholder ops so their row/col bits get localized like any gate's,
        then apply positionally (dmops.apply_kraus_at)."""
        import dataclasses as _dc

        from .compiler.ir import GateOp
        from .compiler.sharded_schedule import SWAP_BITS, schedule_for_sharding
        from .parallel.sharded import num_global_qubits

        n = self.num_qubits
        n2 = 2 * n
        sharding = self._sharding()
        pseudo: List[GateOp] = []
        kraus_table: List[tuple] = []  # ("channel", name, p, m)|("mats", mats, None, m)
        for item in key_items:
            kind = item[0]
            if kind == "gate":
                _, name, tgt, ctrl, vals, mat_key, adj = item
                row, col = _gate_items_2n_sched(n, name, tgt, ctrl, vals,
                                                mat_key, adj)
                if row is None:
                    raise NotImplementedError(
                        f"gate {name!r} has no named conjugation rule; the "
                        "sharded density path supports named and matrix "
                        "gates")
                pseudo.extend((row, col))
            elif kind == "channel":
                _, channel, prob, tgt = item
                ks = dmops.CHANNELS[channel.lower()](prob)
                s = dmops.kraus_superoperator(ks, xp=np)
                for q in tgt:
                    fops = dmops.superop_kernel_ops(s, q, q + n)
                    if fops is not None:
                        # factored channels are ordinary gates/diagonals:
                        # they ride the locality scheduler (and D2 factors
                        # are comm-free on global bits) instead of forcing
                        # a drain + positional Kraus apply
                        pseudo.extend(fops)
                        continue
                    idx = len(kraus_table)
                    kraus_table.append(("channel", channel, prob, 1))
                    pseudo.append(GateOp(f"__KRAUS_{idx}__", (q + n, q)))
            else:  # kraus
                _, mats, tgt = item
                ks = [np.frombuffer(b, np.complex128).reshape(shape)
                      for b, shape in mats]
                s = dmops.kraus_superoperator(ks, xp=np)
                fops = dmops.superop_kernel_ops(
                    s, tgt[0], tgt[0] + n) if len(tgt) == 1 else None
                if fops is not None:
                    pseudo.extend(fops)
                    continue
                idx = len(kraus_table)
                kraus_table.append(("mats", mats, None, len(tgt)))
                pseudo.append(GateOp(
                    f"__KRAUS_{idx}__",
                    tuple(q + n for q in tgt) + tuple(tgt)))
        sched, new_layout = schedule_for_sharding(
            pseudo, n2, num_global_qubits(self.mesh), self._layout2n)
        if self._use_pair():
            return self._run_sharded_pair(sched, new_layout, kraus_table,
                                          key_items, values, sharding)
        cache_key = ("sharded", n, key_items, tuple(self._layout2n),
                     self.mesh, config.get_precision())
        fn = _DM_RUN_CACHE.get(cache_key)
        if fn is None:
            def run(rho, params):
                from .compiler.interpreter import execute as _exec
                pending: List[GateOp] = []

                def drain(rho):
                    if pending:
                        rho = _exec(rho, list(pending), None,
                                    sharding=sharding)
                        pending.clear()
                    return rho

                for op in sched:
                    if op.name.startswith("__KRAUS_"):
                        rho = drain(rho)
                        idx = int(op.name[len("__KRAUS_"):-2])
                        rec = kraus_table[idx]
                        if rec[0] == "channel":
                            ks = [jnp.asarray(m, rho.dtype)
                                  for m in dmops.CHANNELS[rec[1]](rec[2])]
                        else:
                            ks = [jnp.asarray(
                                np.frombuffer(b, np.complex128).reshape(sh),
                                rho.dtype) for b, sh in rec[1]]
                        m = rec[3]
                        rho = dmops.apply_kraus_at(rho, ks,
                                                   list(op.targets[:m]),
                                                   list(op.targets[m:]))
                        rho = jax.lax.with_sharding_constraint(rho, sharding)
                        continue
                    if op.params and op.params[0] == "sslots":
                        vals = tuple(s * params[i] for i, s in op.params[1:])
                        op = _dc.replace(op, params=vals)
                    pending.append(op)
                return drain(rho)

            fn = jax.jit(run, donate_argnums=(0,), out_shardings=sharding)
            _DM_RUN_CACHE[cache_key] = fn
        if self._rho is None:
            self._rho = self._init_rho()
        params = jnp.asarray(values, dtype=config.real_dtype())
        self._rho = fn(self._rho, params)
        self._layout2n = list(new_layout)

    def _run_sharded_pair(self, sched, new_layout, kraus_table, key_items,
                          values, sharding):
        """fp64 sharded executor: the SAME scheduled op stream, run on the
        (re, im) pair — SWAP_BITS relabels as constrained transposes
        (all-to-all), gates/diagonals as exact flat pair math (diagonals
        comm-free), Kraus channels positionally via the dense superop
        rows."""
        import dataclasses as _dc

        from .compiler.sharded_schedule import SWAP_BITS
        from .ops import pairdm, pairsim
        from .ops import statevec as _sv

        cache_key = ("sharded-pair", self.num_qubits, key_items,
                     tuple(self._layout2n), self.mesh)
        fn = _DM_RUN_CACHE.get(cache_key)
        if fn is None:
            def run(re, im, params):
                for op in sched:
                    if op.name.startswith("__KRAUS_"):
                        idx = int(op.name[len("__KRAUS_"):-2])
                        rec = kraus_table[idx]
                        if rec[0] == "channel":
                            ks = dmops.CHANNELS[rec[1]](rec[2])
                        else:
                            ks = [np.frombuffer(b, np.complex128).reshape(sh)
                                  for b, sh in rec[1]]
                        m = rec[3]
                        re, im = pairdm.apply_kraus_at_pair_dm(
                            re, im, ks, list(op.targets[:m]),
                            list(op.targets[m:]))
                    elif op.name == SWAP_BITS:
                        a, b = op.targets
                        re = _sv.swap_index_bits(re, a, b,
                                                 use_transpose=True)
                        im = _sv.swap_index_bits(im, a, b,
                                                 use_transpose=True)
                    elif op.name == "PERMUTE_BITS":
                        d, s = ((op.controls, op.targets) if op.is_adjoint
                                else (op.targets, op.controls))
                        re = _sv.permute_index_bits(re, d, s)
                        im = _sv.permute_index_bits(im, d, s)
                    else:
                        if op.params and op.params[0] == "sslots":
                            vals = tuple(s * params[i]
                                         for i, s in op.params[1:])
                            op = _dc.replace(op, params=vals)
                        re, im = pairsim.apply_op_pair(re, im, op)
                    re = jax.lax.with_sharding_constraint(re, sharding)
                    im = jax.lax.with_sharding_constraint(im, sharding)
                return re, im

            fn = jax.jit(run, donate_argnums=(0, 1))
            _DM_RUN_CACHE[cache_key] = fn
        if self._rho is None:
            self._rho = self._init_rho()
        params = jnp.asarray(values, dtype=config.real_dtype())
        self._rho = fn(*self._rho, params)
        self._layout2n = list(new_layout)

    def _restore_layout(self):
        """Undo the locality relabeling so readbacks address logical bits."""
        if self.mesh is None or \
                self._layout2n == list(range(2 * self.num_qubits)):
            return
        from .compiler.interpreter import execute as _exec
        from .compiler.sharded_schedule import unpermute_ops

        # this path only runs SHARDED (mesh guard above): merge the whole
        # restore into ONE PERMUTE_BITS relabel (one ICI round)
        ops = unpermute_ops(self._layout2n, merge=True)
        sharding = self._sharding()

        if self._use_pair():
            from .ops import statevec as _sv

            def run_pair(re, im):
                for op in ops:
                    if op.name == "PERMUTE_BITS":
                        re = _sv.permute_index_bits(re, op.targets,
                                                    op.controls)
                        im = _sv.permute_index_bits(im, op.targets,
                                                    op.controls)
                    else:
                        a, b = op.targets
                        re = _sv.swap_index_bits(re, a, b,
                                                 use_transpose=True)
                        im = _sv.swap_index_bits(im, a, b,
                                                 use_transpose=True)
                    re = jax.lax.with_sharding_constraint(re, sharding)
                    im = jax.lax.with_sharding_constraint(im, sharding)
                return re, im

            self._rho = jax.jit(run_pair, donate_argnums=(0, 1))(*self._rho)
            self._layout2n = list(range(2 * self.num_qubits))
            return

        def run(rho):
            rho = _exec(rho, ops, None, sharding=sharding)
            return rho

        self._rho = jax.jit(run, donate_argnums=(0,),
                            out_shardings=sharding)(self._rho)
        self._layout2n = list(range(2 * self.num_qubits))

    @property
    def state(self) -> jax.Array:
        self.flush()
        self._restore_layout()
        return self._rho

    def reset(self):
        self._queue.clear()
        self._layout2n = list(range(2 * self.num_qubits))
        self._rho = None  # re-decide pair-vs-complex for the new state
        self._rho = self._init_rho()

    # -- measurement / readback ----------------------------------------------

    def measure(self, qubit: int) -> Tuple[int, float]:
        self.flush()
        self._restore_layout()
        self._validate_qubit_index(qubit)
        if self._use_pair():
            from .ops import pairdm
            n = self.num_qubits
            p1 = float(pairdm.prob_one_pair_dm_jit(self._rho[0], qubit, n))
            outcome = 1 if self.simulator.host_random() < p1 else 0
            self._rho = pairdm.collapse_pair_dm_jit(*self._rho, qubit,
                                                    outcome, n)
            if self.mesh is not None:  # re-pin (donation + in_shardings)
                sh = self._sharding()
                self._rho = tuple(jax.device_put(p, sh) for p in self._rho)
            return outcome, (p1 if outcome == 1 else 1.0 - p1)
        p1 = float(dmops.prob_one_dm_jit(self._rho, qubit))
        outcome = 1 if self.simulator.host_random() < p1 else 0
        prob = p1 if outcome == 1 else 1.0 - p1
        self._rho = dmops.collapse_dm_jit(self._rho, qubit, outcome)
        if self.mesh is not None:
            # re-pin to the rho sharding: the generic collapse jit's output
            # layout otherwise breaks buffer donation on the next flush
            self._rho = jax.device_put(self._rho, self._sharding())
        return outcome, prob

    def sample(self, measured_qubits: List[int], num_shots: int) -> np.ndarray:
        self.flush()
        self._restore_layout()
        if self._use_pair():
            from .ops import pairdm
            out = pairdm.sample_pair_dm_jit(
                self._rho[0], qubits=tuple(measured_qubits),
                shots=num_shots, key=self.simulator.next_key())
            return np.asarray(out)
        out = dmops.sample_dm_jit(self._rho, qubits=tuple(measured_qubits),
                                  shots=num_shots,
                                  key=self.simulator.next_key())
        return np.asarray(out)

    def get_density_matrix(self) -> np.ndarray:
        self.flush()
        self._restore_layout()
        dim = 1 << self.num_qubits
        if self._use_pair():
            re, im = self._rho
            return (np.asarray(re).reshape(dim, dim).astype(np.complex128)
                    + 1j * np.asarray(im).reshape(dim, dim))
        mat = dmops.to_matrix(self._rho)
        re, im = _complex_to_pair(mat)
        return np.asarray(re).astype(np.complex128) + 1j * np.asarray(im)

    def purity(self) -> float:
        self.flush()
        # purity is basis-independent: no layout restore needed
        if self._use_pair():
            from .ops import pairdm
            return float(pairdm.purity_pair_dm_jit(*self._rho))
        return float(dmops.purity_dm_jit(self._rho))

    def expval(self, pauli_operator: PauliOperator) -> float:
        if not isinstance(pauli_operator, PauliOperator):
            raise TypeError("Input must be a PauliOperator object.")
        self.flush()
        self._restore_layout()
        if self._use_pair():
            from .ops import pairdm
            terms_key = tuple(tuple(ops) for ops, _ in pauli_operator.terms)
            coeffs = tuple(float(c) for _, c in pauli_operator.terms)
            return float(pairdm.expval_terms_pair_dm_jit(
                *self._rho, terms=terms_key, coeffs=coeffs,
                n=self.num_qubits))
        total = 0.0
        for ops, coeff in pauli_operator.terms:
            if not ops:
                total += coeff
            elif all(p == "Z" for p, _ in ops):
                total += coeff * float(dmops.expval_pauli_product_z_dm_jit(
                    self._rho, qubits=tuple(q for _, q in ops)))
            else:
                total += coeff * float(dmops.expval_pauli_string_dm_jit(
                    self._rho, ops=tuple(ops)))
        return total
