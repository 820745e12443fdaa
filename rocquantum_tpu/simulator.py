"""Standalone QuantumSimulator facade.

API-parity rebuild of the reference's self-contained simulator that feeds
the Qiskit/Cirq/PennyLane plugins
(reference: include/rocquantum/QuantumSimulator.h:11-43 — modern API
apply_gate/apply_matrix/measure/reset/get_statevector; legacy
ApplyGate/Execute/GetStateVector API simulator.cpp:190-208; ``QSim`` alias
:42; name->matrix table simulator.cpp:28-48).

Unlike the reference (per-gate kernel launch + hipDeviceSynchronize,
simulator.cpp:142 — SURVEY flags this as a known perf sin), gates are queued
and the whole program JITs once per circuit structure at first readback.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .compiler.ir import CircuitIR, GateOp
from .compiler.interpreter import compile_ir, parametrize
from .ops import statevec as sv

# gate name -> (targets, params) layout, mirroring simulator.cpp:28-48
_KNOWN_GATES = {"H", "X", "Y", "Z", "S", "SDG", "T", "TDG", "I",
                "RX", "RY", "RZ", "CNOT", "CX", "CZ", "SWAP",
                "CRX", "CRY", "CRZ", "CCX", "MCX", "CSWAP"}


class QuantumSimulator:
    """JAX-backed statevector simulator with the reference's plugin-facing
    method surface."""

    def __init__(self, num_qubits: int, seed: int = 0):
        if num_qubits <= 0:
            raise ValueError("num_qubits must be positive")
        self.num_qubits = num_qubits
        self._queue: List[GateOp] = []
        self._state: Optional[jax.Array] = None
        self._rng_key = jax.random.PRNGKey(seed)
        self._init = None

    # -- state helpers -------------------------------------------------------

    def _init_state(self):
        if self._init is None:
            n = self.num_qubits
            self._init = jax.jit(lambda: sv.init_state(n))
        return self._init()

    def _flush(self):
        if self._state is None:
            self._state = self._init_state()
        if not self._queue:
            return
        from .api import MAX_SEGMENT_OPS
        ops, values = parametrize(self._queue)
        params = jnp.asarray(values, dtype=config.real_dtype()) if values \
            else jnp.zeros((0,), dtype=config.real_dtype())
        for start in range(0, len(ops), MAX_SEGMENT_OPS):
            fn = compile_ir(CircuitIR(
                self.num_qubits, ops[start:start + MAX_SEGMENT_OPS]))
            self._state = fn(self._state, params)
        self._queue.clear()

    def _next_key(self):
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    # -- modern API (QuantumSimulator.h:20-33) -------------------------------

    def reset(self):
        self._queue.clear()
        self._state = self._init_state()

    def apply_gate(self, gate_name: str, qubits: Sequence[int],
                   params: Sequence[float] = ()):
        name = gate_name.upper()
        if name not in _KNOWN_GATES:
            raise ValueError(f"Unknown gate: {gate_name}")
        qubits = [int(q) for q in qubits]
        params = [float(p) for p in params]
        if name in ("CNOT", "CX", "CZ", "CRX", "CRY", "CRZ"):
            ctrl, tgt = qubits[:-1], qubits[-1:]
            self._queue.append(GateOp(name if name != "CX" else "CNOT",
                                      tuple(tgt), tuple(ctrl), tuple(params)))
        elif name in ("CCX", "MCX"):
            self._queue.append(GateOp("MCX", (qubits[-1],),
                                      tuple(qubits[:-1]), ()))
        elif name == "CSWAP":
            self._queue.append(GateOp("CSWAP", tuple(qubits[1:]),
                                      (qubits[0],), ()))
        else:
            self._queue.append(GateOp(name, tuple(qubits), (), tuple(params)))

    def apply_matrix(self, matrix: np.ndarray, qubits: Sequence[int]):
        matrix = np.asarray(matrix)
        m = len(qubits)
        if matrix.shape != (1 << m, 1 << m):
            raise ValueError(f"matrix shape {matrix.shape} does not match "
                             f"{m} qubits")
        self._queue.append(GateOp("UNITARY", tuple(int(q) for q in qubits), (),
                                  (), np.ascontiguousarray(matrix,
                                                           np.complex128)))

    def measure(self, qubits: Sequence[int], shots: int) -> List[int]:
        """Sample ``shots`` outcomes over ``qubits`` without collapsing
        (simulator.cpp:153-184's probability + host sampling, on device)."""
        self._flush()
        out = sv.sample_jit(self._state, qubits=tuple(int(q) for q in qubits),
                            shots=int(shots), key=self._next_key())
        return [int(x) for x in np.asarray(out)]

    def get_statevector(self) -> np.ndarray:
        self._flush()
        re, im = sv.state_to_parts_jit(self._state)
        return np.asarray(re).astype(np.complex128) + 1j * np.asarray(im)

    def get_probabilities(self, qubits: Optional[Sequence[int]] = None) -> np.ndarray:
        self._flush()
        if qubits is None:
            qubits = range(self.num_qubits)
        return np.asarray(sv.marginal_probs_jit(
            self._state, qubits=tuple(int(q) for q in qubits)))

    def sample_counts(self, shots: int,
                      qubits: Optional[Sequence[int]] = None) -> Dict[int, int]:
        if qubits is None:
            qubits = range(self.num_qubits)
        return dict(Counter(self.measure(list(qubits), shots)))

    # -- legacy API (simulator.cpp:190-208; bindings.cpp:31-102) -------------

    def ApplyGate(self, gate_name: str, target_qubit: int):
        self.apply_gate(gate_name, [target_qubit])

    def ApplyCNOT(self, control: int, target: int):
        self.apply_gate("CNOT", [control, target])

    def Execute(self):
        self._flush()

    def GetStateVector(self) -> np.ndarray:
        return self.get_statevector()


# Legacy alias (QuantumSimulator.h:42)
QSim = QuantumSimulator
