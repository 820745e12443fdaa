"""Advanced-gate tests with REAL assertions.

The reference's tests/test_advanced_gates.py was a blueprint: it built
circuits and computed numpy reference states but ended in `assert True`
placeholders pending get_statevector (reference :46, :65, :84). Here the
same scenarios assert for real (self-consistent little-endian convention).
"""

import numpy as np
import pytest

import rocquantum_tpu as rocq


@pytest.fixture
def simulator():
    return rocq.Simulator()


def test_crx(simulator):
    """Controlled-RX: control q0=1 rotates the target."""
    num_qubits = 2
    angle = np.pi / 2
    circuit = rocq.Circuit(num_qubits, simulator)
    circuit.x(0)                 # prepare control=1 (state index 1)
    circuit.crx(angle, 0, 1)
    psi = circuit.get_statevector()

    c = np.cos(angle / 2)
    s = -1j * np.sin(angle / 2)
    expected = np.zeros(4, complex)
    # |q1 q0> = |01>: control active, target rotates: c|01> + s|11>
    expected[0b01] = c
    expected[0b11] = s
    np.testing.assert_allclose(psi, expected, atol=1e-6)


def test_crx_control_zero(simulator):
    circuit = rocq.Circuit(2, simulator)
    circuit.crx(np.pi / 2, 0, 1)    # control |0>: no-op
    np.testing.assert_allclose(circuit.get_statevector(),
                               np.eye(4)[0], atol=1e-6)


def test_ccx(simulator):
    """Toffoli |q0=1,q1=1,q2=0> -> target flips."""
    circuit = rocq.Circuit(3, simulator)
    circuit.x(0)
    circuit.x(1)
    circuit.ccx(0, 1, 2)
    expected = np.zeros(8, complex)
    expected[0b111] = 1.0
    np.testing.assert_allclose(circuit.get_statevector(), expected,
                               atol=1e-6)


def test_cswap(simulator):
    """Fredkin with control=1 swaps targets: q1=1,q2=0 -> q1=0,q2=1."""
    circuit = rocq.Circuit(3, simulator)
    circuit.x(0)   # control
    circuit.x(1)   # target1
    circuit.cswap(0, 1, 2)
    expected = np.zeros(8, complex)
    expected[0b101] = 1.0   # q0=1, q1=0, q2=1
    np.testing.assert_allclose(circuit.get_statevector(), expected,
                               atol=1e-6)


def test_cswap_control_zero(simulator):
    circuit = rocq.Circuit(3, simulator)
    circuit.x(1)
    circuit.cswap(0, 1, 2)   # control 0: no swap
    expected = np.zeros(8, complex)
    expected[0b010] = 1.0
    np.testing.assert_allclose(circuit.get_statevector(), expected,
                               atol=1e-6)
