"""Minimal pennylane API stub for exercising the rocquantum_tpu PennyLane
device plugin without pennylane installed. Covers the surface
pennylane_device.py consumes: the QubitDevice base (wires/wire_map/
marginal_prob/states_to_binary), operation records, and qml.matrix.
The qnode machinery is NOT stubbed — stub-mode tests drive the device's
apply()/state/generate_samples API directly (which is the plugin code)."""

__rocq_stub__ = True
__version__ = "0.0-rocq-stub"

import numpy as _np

from . import devices  # noqa: E402,F401  (re-export submodule)


class Operation:
    def __init__(self, name, wires, parameters=(), matrix=None):
        self.name = name
        self.wires = wires if isinstance(wires, (list, tuple)) else [wires]
        self.parameters = list(parameters)
        self._matrix = matrix


def Hadamard(wires):
    return Operation("Hadamard", wires)


def PauliX(wires):
    return Operation("PauliX", wires)


def PauliY(wires):
    return Operation("PauliY", wires)


def PauliZ(wires):
    return Operation("PauliZ", wires)


def CNOT(wires):
    return Operation("CNOT", wires)


def CZ(wires):
    return Operation("CZ", wires)


def RX(theta, wires):
    return Operation("RX", wires, [theta])


def RY(theta, wires):
    return Operation("RY", wires, [theta])


def RZ(theta, wires):
    return Operation("RZ", wires, [theta])


def QubitUnitary(matrix, wires):
    return Operation("QubitUnitary", wires, matrix=_np.asarray(matrix))


def matrix(op):
    if op._matrix is None:
        raise ValueError(f"no matrix recorded for {op.name}")
    return op._matrix
