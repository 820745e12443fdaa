"""DSL simulation backends: 'state_vector' and 'density_matrix'.

API-parity rebuild of the reference rocq/backends.py (get_backend factory
:114-153, StateVectorBackend/DensityMatrixBackend dispatch :51-112), with the
mock C++ fallbacks replaced by the real JAX engines. Gate/noise calls are
queued and the whole sequence executes as one jitted XLA program at first
readback.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..ops import density as dmops
from ..ops import statevec as sv
from ..utils.cache import BoundedCache

_GATE_PARAM_ORDER = {"rx": ("theta",), "ry": ("theta",), "rz": ("phi",)}

_RUN_CACHE = BoundedCache()


def _canon_op(op_name: str, targets: Sequence[int], params: Optional[Dict]):
    """DSL op -> (name, targets, controls, param values)."""
    op = op_name.lower()
    params = params or {}
    order = _GATE_PARAM_ORDER.get(op, ())
    vals = [params[k] for k in order] if order else list(params.values())
    if op in ("cnot", "cx"):
        return ("CNOT", [targets[1]], [targets[0]], [])
    if op == "cz":
        return ("CZ", [targets[1]], [targets[0]], [])
    if op == "ccx":
        return ("MCX", [targets[2]], [targets[0], targets[1]], [])
    if op == "mcx":
        return ("MCX", [targets[-1]], list(targets[:-1]), [])
    if op == "cswap":
        return ("CSWAP", [targets[1], targets[2]], [targets[0]], [])
    return (op.upper(), list(targets), [], vals)


class _BaseBackend:
    """Abstract backend (reference rocq/backends.py:37-49)."""

    def __init__(self, num_qubits: int):
        self.num_qubits = num_qubits
        self._queue: List[tuple] = []
        self._key = jax.random.PRNGKey(0)

    def apply_gate(self, op_name, targets, params=None):
        name, tgt, ctrl, vals = _canon_op(op_name, targets, params)
        self._queue.append(("gate", name, tuple(tgt), tuple(ctrl),
                            tuple(float(v) for v in vals)))

    def apply_noise(self, channel, targets, prob):
        raise NotImplementedError

    def validate_noise_support(self):
        raise NotImplementedError

    def get_state(self):
        raise NotImplementedError

    def _parametrized_queue(self):
        """Split gate angles out of the queue into a runtime vector so the
        compiled program is cached by STRUCTURE (VQE loops over a DSL
        backend must not recompile per parameter value). Channel
        probabilities stay baked (fixed per noise model)."""
        key_items, values = [], []
        for item in self._queue:
            if item[0] == "gate" and item[4]:
                _, name, tgt, ctrl, vals = item
                slots = tuple(range(len(values), len(values) + len(vals)))
                values.extend(vals)
                key_items.append(("gate", name, tgt, ctrl, ("slots",) + slots))
            else:
                key_items.append(item)
        return tuple(key_items), values

    def _queue_key(self, key_items):
        return (type(self).__name__, self.num_qubits, key_items,
                config.get_precision())


class StateVectorBackend(_BaseBackend):
    """State-vector simulation (reference rocq/backends.py:51-85)."""

    def apply_noise(self, channel, targets, prob):
        raise NotImplementedError(
            "Noise models are only supported by the 'density_matrix' backend.")

    def validate_noise_support(self):
        raise NotImplementedError(
            "Noise models are only supported by the 'density_matrix' backend.")

    def _final_state(self):
        key_items, values = self._parametrized_queue()
        key = self._queue_key(key_items)
        fn = _RUN_CACHE.get(key)
        if fn is None:
            from ..compiler.ir import GateOp, ParamRef
            n = self.num_qubits
            ops = []
            for item in key_items:
                _, name, tgt, ctrl, vals = item
                if vals and vals[0] == "slots":
                    vals = tuple(ParamRef(i) for i in vals[1:])
                ops.append(GateOp(name, tuple(tgt), tuple(ctrl), tuple(vals)))
            if config.get_precision() == "double":
                # fp64: the float-pair engine (complex128 aborts the TPU
                # x64 rewriter — docs/FP64_GUIDE.md)
                from ..compiler.ir import CircuitIR
                from ..ops import pairsim
                run_pair = pairsim.compile_pair_ir(CircuitIR(n, ops))
                init = jax.jit(lambda: pairsim.init_pair(n))

                def fn(params):
                    return run_pair(*init(), params)
            else:
                from ..compiler.interpreter import execute, default_widths
                lw, hw = default_widths(n)

                def run(params):
                    state = sv.init_state(n)
                    return execute(state, ops, params, low_width=lw,
                                   high_width=hw)

                fn = jax.jit(run)
            _RUN_CACHE[key] = fn
        return fn(jnp.asarray(values, dtype=config.real_dtype()))

    def get_state(self) -> np.ndarray:
        state = self._final_state()
        if isinstance(state, tuple):
            re, im = state
        else:
            re, im = sv.state_to_parts_jit(state)
        return np.asarray(re).astype(np.complex128) + 1j * np.asarray(im)

    get_state_vector = get_state

    def sample(self, qubits, shots, seed=0):
        state = self._final_state()
        if isinstance(state, tuple):
            from ..ops import pairsim
            out = pairsim.sample_pair_jit(*state, qubits=tuple(qubits),
                                          shots=shots,
                                          key=jax.random.PRNGKey(seed))
        else:
            out = sv.sample_jit(state, qubits=tuple(qubits),
                                shots=shots, key=jax.random.PRNGKey(seed))
        return np.asarray(out)

    def expectation_pauli(self, ops) -> float:
        state = self._final_state()
        if not ops:
            return 1.0
        if isinstance(state, tuple):
            from ..ops import pairsim
            return float(pairsim.expval_pauli_string_pair_jit(
                *state, ops=tuple(ops)))
        return float(sv.expval_pauli_string_jit(state, ops=tuple(ops)))


class DensityMatrixBackend(_BaseBackend):
    """Density-matrix simulation with noise channels
    (reference rocq/backends.py:87-112)."""

    def apply_noise(self, channel_type, targets, prob):
        channel = channel_type.lower()
        if channel not in dmops.CHANNELS:
            raise ValueError(
                f"Noise channel '{channel_type}' is not supported by the "
                "DensityMatrixBackend.")
        self._queue.append(("noise", channel, tuple(targets), float(prob)))

    def validate_noise_support(self):
        return None

    def _final_state(self):
        key_items, values = self._parametrized_queue()
        key = self._queue_key(key_items)
        fn = _RUN_CACHE.get(key)
        if fn is None:
            n = self.num_qubits
            if config.get_precision() == "double":
                from ..compiler.ir import GateOp
                from ..ops import pairdm

                def run_pair(params):
                    re, im = pairdm.init_density_pair(n)
                    for item in key_items:
                        if item[0] == "gate":
                            _, name, tgt, ctrl, vals = item
                            if vals and vals[0] == "slots":
                                vals = tuple(params[i] for i in vals[1:])
                            re, im = pairdm.apply_op_pair_dm(
                                re, im, GateOp(name, tuple(tgt),
                                               tuple(ctrl), ()), n,
                                params_resolved=tuple(vals))
                        else:
                            _, channel, tgt, prob = item
                            re, im = pairdm.apply_channel_pair_dm(
                                re, im, channel, prob, list(tgt), n)
                    return re, im

                fn = jax.jit(run_pair)
            else:
                def run(params):
                    rho = dmops.init_density(n)
                    for item in key_items:
                        if item[0] == "gate":
                            _, name, tgt, ctrl, vals = item
                            if vals and vals[0] == "slots":
                                vals = [params[i] for i in vals[1:]]
                            rho = dmops.apply_gate_dm(rho, name, list(tgt),
                                                      list(ctrl), list(vals))
                        else:
                            _, channel, tgt, prob = item
                            rho = dmops.apply_channel(rho, channel, prob,
                                                      list(tgt))
                    return rho

                fn = jax.jit(run)
            _RUN_CACHE[key] = fn
        return fn(jnp.asarray(values, dtype=config.real_dtype()))

    def get_state(self) -> np.ndarray:
        state = self._final_state()
        dim = 1 << self.num_qubits
        if isinstance(state, tuple):
            re, im = state
            return (np.asarray(re).reshape(dim, dim).astype(np.complex128)
                    + 1j * np.asarray(im).reshape(dim, dim))
        rho = dmops.to_matrix(state)
        re, im = jax.jit(lambda r: (jnp.real(r), jnp.imag(r)))(rho)
        return np.asarray(re).astype(np.complex128) + 1j * np.asarray(im)

    get_density_matrix = get_state

    def sample(self, qubits, shots, seed=0):
        state = self._final_state()
        if isinstance(state, tuple):
            from ..ops import pairdm
            out = pairdm.sample_pair_dm_jit(
                state[0], qubits=tuple(qubits), shots=shots,
                key=jax.random.PRNGKey(seed))
        else:
            out = dmops.sample_dm_jit(state, qubits=tuple(qubits),
                                      shots=shots,
                                      key=jax.random.PRNGKey(seed))
        return np.asarray(out)

    def expectation_pauli(self, ops) -> float:
        state = self._final_state()
        if not ops:
            return 1.0
        if isinstance(state, tuple):
            from ..ops import pairdm
            return float(pairdm.expval_pauli_string_pair_dm_jit(
                *state, ops=tuple(ops), n=self.num_qubits))
        return float(dmops.expval_pauli_string_dm_jit(state, ops=tuple(ops)))


def get_backend(backend_name: str, num_qubits: int):
    """Backend factory (reference rocq/backends.py:114-153; error message is
    part of the tested contract, tests/test_framework.py:44-48)."""
    SUPPORTED_BACKENDS = ["state_vector", "density_matrix"]
    if backend_name not in SUPPORTED_BACKENDS:
        raise ValueError(
            f"Unsupported backend '{backend_name}'. Supported backends are: "
            f"{SUPPORTED_BACKENDS}")
    if backend_name == "state_vector":
        return StateVectorBackend(num_qubits)
    return DensityMatrixBackend(num_qubits)
