"""Minimal cirq API stub for exercising the rocquantum_tpu cirq simulator
plugin without cirq installed. Covers the surface cirq_simulator.py
consumes: gate singletons, LineQubit, Circuit, measure, unitary(),
ParamResolver/resolve_parameters/to_resolvers, and the simulator ABCs."""

__rocq_stub__ = True
__version__ = "0.0-rocq-stub"

import numpy as _np


class LineQubit:
    def __init__(self, x):
        self.x = x

    @classmethod
    def range(cls, n):
        return [cls(i) for i in range(n)]

    def __lt__(self, other):
        return self.x < other.x

    def __eq__(self, other):
        return isinstance(other, LineQubit) and self.x == other.x

    def __hash__(self):
        return hash(("LineQubit", self.x))

    def __repr__(self):
        return f"q({self.x})"


class Gate:
    def __init__(self, name, matrix):
        self.name = name
        self._matrix = _np.asarray(matrix)

    def __call__(self, *qubits):
        return Operation(self, qubits)

    def on(self, *qubits):
        return Operation(self, qubits)

    def _unitary_(self):
        return self._matrix

    def __repr__(self):
        return self.name


class MeasurementGate(Gate):
    def __init__(self, num_qubits, key):
        self.num_qubits = num_qubits
        self.key = key
        self.name = f"measure({key})"

    def __call__(self, *qubits):
        return Operation(self, qubits)


class Operation:
    def __init__(self, gate, qubits):
        self.gate = gate
        self.qubits = tuple(qubits)


_s2 = 1 / _np.sqrt(2.0)
X = Gate("X", [[0, 1], [1, 0]])
Y = Gate("Y", [[0, -1j], [1j, 0]])
Z = Gate("Z", [[1, 0], [0, -1]])
H = Gate("H", [[_s2, _s2], [_s2, -_s2]])
S = Gate("S", [[1, 0], [0, 1j]])
T = Gate("T", [[1, 0], [0, _np.exp(1j * _np.pi / 4)]])
CNOT = Gate("CNOT", [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1],
                     [0, 0, 1, 0]])
CZ = Gate("CZ", _np.diag([1, 1, 1, -1]))


def measure(*qubits, key="m"):
    return MeasurementGate(len(qubits), key)(*qubits)


def ry(rads):
    c, s = _np.cos(rads / 2), _np.sin(rads / 2)
    return Gate(f"ry({rads})", [[c, -s], [s, c]])


def rx(rads):
    c, s = _np.cos(rads / 2), _np.sin(rads / 2)
    return Gate(f"rx({rads})", [[c, -1j * s], [-1j * s, c]])


def unitary(op_or_gate):
    gate = getattr(op_or_gate, "gate", op_or_gate)
    return _np.asarray(gate._unitary_())


class Circuit:
    def __init__(self, ops=()):
        self._ops = []
        for item in ops:
            self._ops.append(item)

    def append(self, op):
        self._ops.append(op)

    def all_operations(self):
        return iter(self._ops)

    def all_qubits(self):
        qs = []
        for op in self._ops:
            for q in op.qubits:
                if q not in qs:
                    qs.append(q)
        return set(qs)


class ParamResolver(dict):
    pass


def resolve_parameters(circuit, resolver):
    return circuit  # stub gates carry concrete matrices already


def to_resolvers(params):
    if params is None:
        return [ParamResolver()]
    if isinstance(params, ParamResolver):
        return [params]
    return list(params)


class SimulatesFinalState:
    pass


class SimulatesSamples:
    pass
