"""QuantumSimulator facade tests (reference tests/test_bindings.py Bell-state
+ counts contract; legacy QSim API of root test_bindings.py)."""

import numpy as np
import pytest

from rocquantum_tpu.simulator import QuantumSimulator, QSim
from rocquantum_tpu.density_state import DensityMatrixState, Pauli
from rocquantum_tpu.utils.hamiltonian import compute_hamiltonian_expectation


class TestModernAPI:
    def test_bell_statevector(self):
        sim = QuantumSimulator(2)
        sim.apply_gate("H", [0])
        sim.apply_gate("CNOT", [0, 1])
        psi = sim.get_statevector()
        expected = np.zeros(4, complex)
        expected[0] = expected[3] = 2**-0.5
        np.testing.assert_allclose(psi, expected, atol=1e-6)
        assert psi.dtype == np.complex128

    def test_bell_counts_within_tolerance(self):
        # tests/test_bindings.py: 2000 shots within 10% of 50/50
        sim = QuantumSimulator(2)
        sim.apply_gate("H", [0])
        sim.apply_gate("CNOT", [0, 1])
        samples = sim.measure([0, 1], 2000)
        counts = np.bincount(samples, minlength=4)
        assert counts[1] == 0 and counts[2] == 0
        assert abs(counts[0] / 2000 - 0.5) < 0.1
        assert abs(counts[3] / 2000 - 0.5) < 0.1

    def test_apply_matrix(self):
        sim = QuantumSimulator(1)
        sim.apply_matrix(np.array([[0, 1], [1, 0]]), [0])
        np.testing.assert_allclose(sim.get_statevector(), [0, 1], atol=1e-6)

    def test_parameterized(self):
        sim = QuantumSimulator(1)
        sim.apply_gate("RY", [0], [np.pi / 3])
        probs = sim.get_probabilities()
        assert abs(probs[0] - np.cos(np.pi / 6) ** 2) < 1e-6

    def test_reset(self):
        sim = QuantumSimulator(1)
        sim.apply_gate("X", [0])
        sim.Execute()
        sim.reset()
        np.testing.assert_allclose(sim.get_statevector(), [1, 0], atol=1e-6)

    def test_unknown_gate(self):
        sim = QuantumSimulator(1)
        with pytest.raises(ValueError):
            sim.apply_gate("FROB", [0])


class TestLegacyAPI:
    def test_qsim_alias_and_legacy_methods(self):
        sim = QSim(2)
        sim.ApplyGate("H", 0)
        sim.ApplyCNOT(0, 1)
        sim.Execute()
        psi = sim.GetStateVector()
        assert abs(abs(psi[0]) - 2**-0.5) < 1e-6
        assert abs(abs(psi[3]) - 2**-0.5) < 1e-6


class TestDensityMatrixState:
    def test_bell_density(self):
        st = DensityMatrixState(2)
        st.apply_h(0)
        st.apply_cnot(0, 1)
        rho = st.get_density_matrix()
        psi = np.zeros(4, complex)
        psi[0] = psi[3] = 2**-0.5
        np.testing.assert_allclose(rho, np.outer(psi, psi.conj()), atol=1e-6)

    def test_apply_gate_matrix_with_adjoint(self):
        S = np.array([[1, 0], [0, 1j]], complex)
        st = DensityMatrixState(1)
        st.apply_h(0)
        st.apply_gate(S, 0)
        st.apply_gate(S, 0, adjoint=True)
        rho = st.get_density_matrix()
        np.testing.assert_allclose(rho, 0.5 * np.ones((2, 2)), atol=1e-6)

    def test_expectations(self):
        st = DensityMatrixState(1)
        st.apply_ry(0.8, 0)
        assert abs(st.compute_expectation(Pauli.Z, 0) - np.cos(0.8)) < 1e-6
        assert abs(st.compute_expectation("X", 0) - np.sin(0.8)) < 1e-6

    def test_z_product(self):
        st = DensityMatrixState(2)
        st.apply_h(0)
        st.apply_cnot(0, 1)
        assert abs(st._compute_z_product_expectation([0, 1]) - 1.0) < 1e-6

    def test_channels(self):
        st = DensityMatrixState(1)
        st.apply_bit_flip_channel(0, 0.2)
        rho = st.get_density_matrix()
        np.testing.assert_allclose(rho, np.diag([0.8, 0.2]), atol=1e-6)


class TestHamiltonianUtils:
    def test_positional_pauli_strings(self):
        # reference utils/hamiltonian.py: 'IXYZ' acts positionally
        st = DensityMatrixState(2)
        st.apply_h(0)
        st.apply_cnot(0, 1)
        h = [("ZZ", 0.5), ("XX", 0.25), ("II", 1.0)]
        val = compute_hamiltonian_expectation(h, st)
        # Bell: <ZZ>=1, <XX>=1, <II>=1
        assert abs(val - (0.5 + 0.25 + 1.0)) < 1e-6

    def test_invalid_pauli(self):
        st = DensityMatrixState(1)
        with pytest.raises(ValueError):
            compute_hamiltonian_expectation([("Q", 1.0)], st)
