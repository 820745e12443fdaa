"""Minimal qiskit API stub for exercising the rocquantum_tpu Qiskit
provider without qiskit installed (VERDICT r1: plugin code paths must
execute). Mimics exactly the surface backend.py consumes: QuantumCircuit
construction/gates/measure, instruction records, find_bit, and the
providers/transpiler/result submodules.

Marked with ``__rocq_stub__`` so tests can tell stub from real framework.
"""

__rocq_stub__ = True
__version__ = "0.0-rocq-stub"

import numpy as _np


class _Bit:
    def __init__(self, index):
        self.index = index


class _BitLocation:
    def __init__(self, index):
        self.index = index


class _Operation:
    def __init__(self, name, params=(), matrix=None):
        self.name = name
        self.params = list(params)
        self._matrix = matrix

    def to_matrix(self):
        return _np.asarray(self._matrix)


class _Instruction:
    def __init__(self, operation, qubits, clbits=()):
        self.operation = operation
        self.qubits = list(qubits)
        self.clbits = list(clbits)


class QuantumCircuit:
    def __init__(self, num_qubits, num_clbits=0, name="circuit"):
        self.num_qubits = num_qubits
        self.num_clbits = num_clbits
        self.name = name
        self.qubits = [_Bit(i) for i in range(num_qubits)]
        self.clbits = [_Bit(i) for i in range(num_clbits)]
        self.data = []

    def find_bit(self, bit):
        return _BitLocation(bit.index)

    def _add(self, name, qubits, params=(), clbits=(), matrix=None):
        self.data.append(_Instruction(
            _Operation(name, params, matrix),
            [self.qubits[q] for q in qubits],
            [self.clbits[c] for c in clbits]))

    def h(self, q):
        self._add("h", [q])

    def x(self, q):
        self._add("x", [q])

    def y(self, q):
        self._add("y", [q])

    def z(self, q):
        self._add("z", [q])

    def s(self, q):
        self._add("s", [q])

    def t(self, q):
        self._add("t", [q])

    def cx(self, c, t):
        self._add("cx", [c, t])

    def cz(self, a, b):
        self._add("cz", [a, b])

    def swap(self, a, b):
        self._add("swap", [a, b])

    def ccx(self, c1, c2, t):
        self._add("ccx", [c1, c2, t])

    def rx(self, theta, q):
        self._add("rx", [q], [theta])

    def ry(self, theta, q):
        self._add("ry", [q], [theta])

    def rz(self, theta, q):
        self._add("rz", [q], [theta])

    def unitary(self, matrix, qubits, label="unitary"):
        self._add("unitary", list(qubits), matrix=matrix)

    def barrier(self, *args):
        self._add("barrier", list(args) if args else [])

    def measure(self, qubits, clbits):
        if isinstance(qubits, int):
            qubits, clbits = [qubits], [clbits]
        for q, c in zip(qubits, clbits):
            self._add("measure", [q], clbits=[c])
