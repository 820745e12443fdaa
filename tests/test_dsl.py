"""Tests for the rocq DSL package (qvec / gates / kernel / execute /
NoiseModel / operators).

Contract pinned by the reference's own suite (tests/test_framework.py):
kernel recording structure, backend factory validation, noise rejection on
the state-vector backend, and operator expectation — with the reference's
mocked 42.0 replaced by real values.
"""

import numpy as np
import pytest

from rocquantum_tpu import dsl as rocq


class TestKernelRecording:
    def test_kernel_creation_and_structure(self):
        @rocq.kernel
        def my_kernel(theta: float):
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])
            rocq.rz(theta, q[1])

        assert isinstance(my_kernel, rocq.QuantumKernel)
        assert my_kernel.name == "my_kernel"
        assert len(my_kernel.gate_sequence) == 3
        assert my_kernel.num_qubits == 2

    def test_qvec_validation(self):
        with pytest.raises(ValueError):
            rocq.qvec(0)
        with pytest.raises(ValueError):
            rocq.qvec(-3)

    def test_gate_outside_kernel_raises(self):
        with pytest.raises(RuntimeError):
            rocq.h(0)


class TestExecute:
    def test_backend_factory_validation(self):
        @rocq.kernel
        def dummy_kernel():
            q = rocq.qvec(1)
            rocq.h(q[0])

        with pytest.raises(ValueError) as excinfo:
            rocq.execute(dummy_kernel, backend="invalid_backend")
        assert "Unsupported backend 'invalid_backend'" in str(excinfo.value)
        assert "['state_vector', 'density_matrix']" in str(excinfo.value)

    def test_state_vector_backend_noise_rejection(self):
        @rocq.kernel
        def dummy_kernel():
            q = rocq.qvec(1)
            rocq.h(q[0])

        noise = rocq.NoiseModel()
        noise.add_channel("depolarizing", 0.1)
        with pytest.raises(NotImplementedError) as excinfo:
            rocq.execute(dummy_kernel, backend="state_vector",
                         noise_model=noise)
        assert str(excinfo.value) == (
            "Noise models are only supported by the 'density_matrix' backend.")

    def test_statevector_execution_bell(self):
        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        state = rocq.execute(bell, backend="state_vector")
        expected = np.zeros(4, complex)
        expected[0] = expected[3] = 2**-0.5
        np.testing.assert_allclose(state, expected, atol=1e-6)

    def test_parameterized_execution(self):
        @rocq.kernel
        def rot(theta):
            q = rocq.qvec(1)
            rocq.ry(theta, q[0])

        state = rocq.execute(rot, backend="state_vector", theta=np.pi)
        np.testing.assert_allclose(np.abs(state), [0, 1], atol=1e-6)

    def test_unbound_parameter_raises(self):
        @rocq.kernel
        def rot(theta):
            q = rocq.qvec(1)
            rocq.ry(theta, q[0])

        with pytest.raises(ValueError):
            rocq.execute(rot, backend="state_vector")

    def test_density_matrix_with_noise(self):
        @rocq.kernel
        def flip():
            q = rocq.qvec(1)
            rocq.x(q[0])

        noise = rocq.NoiseModel()
        noise.add_channel("bit_flip", 0.2)
        rho = rocq.execute(flip, backend="density_matrix", noise_model=noise)
        np.testing.assert_allclose(rho, np.diag([0.2, 0.8]), atol=1e-6)

    def test_noise_after_op_filter(self):
        @rocq.kernel
        def two_gates():
            q = rocq.qvec(1)
            rocq.x(q[0])
            rocq.h(q[0])

        noise = rocq.NoiseModel()
        noise.add_channel("phase_flip", 0.5, after_op="cnot")  # never matches
        rho = rocq.execute(two_gates, backend="density_matrix",
                           noise_model=noise)
        psi = np.array([1, -1]) / np.sqrt(2)
        np.testing.assert_allclose(rho, np.outer(psi, psi), atol=1e-6)

    def test_shots_sampling(self):
        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        shots = rocq.execute(bell, backend="state_vector", shots=500)
        counts = np.bincount(shots, minlength=4)
        assert counts[1] == 0 and counts[2] == 0


class TestOperators:
    def test_operator_algebra(self):
        op = 0.5 * rocq.PauliOperator("Z0")
        assert op.coefficient == 0.5
        total = op + rocq.PauliOperator("X0 X1", 0.25)
        assert isinstance(total, rocq.SumOperator)
        assert "Z0" in total.to_string()

    def test_expectation_value_real(self):
        # reference test asserted the mocked 42.0 (tests/test_framework.py:96);
        # here the real value: <Z0> on |+> = 0
        @rocq.kernel
        def prep_state():
            q = rocq.qvec(1)
            rocq.h(q[0])

        h_op = 0.5 * rocq.PauliOperator("Z0")
        val = rocq.get_expectation_value(prep_state, h_op,
                                         backend="state_vector")
        assert abs(val) < 1e-6
        x_op = rocq.PauliOperator("X0")
        val = rocq.get_expectation_value(prep_state, x_op,
                                         backend="state_vector")
        assert abs(val - 1.0) < 1e-6

    def test_expectation_sum_operator(self):
        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        ham = rocq.PauliOperator("Z0 Z1", -1.0) + rocq.PauliOperator("X0 X1", 0.5)
        val = rocq.get_expectation_value(bell, ham, backend="state_vector")
        assert abs(val - (-1.0 + 0.5)) < 1e-6

    def test_expectation_density_backend(self):
        @rocq.kernel
        def prep():
            q = rocq.qvec(1)
            rocq.ry(0.9, q[0])

        noise = rocq.NoiseModel()
        noise.add_channel("depolarizing", 0.1)
        val = rocq.get_expectation_value(prep, rocq.PauliOperator("Z0"),
                                         backend="density_matrix",
                                         noise_model=noise)
        expected = np.cos(0.9) * (1 - 4 * 0.1 / 3)
        assert abs(val - expected) < 1e-6

    def test_hermitian_operator(self):
        @rocq.kernel
        def prep():
            q = rocq.qvec(1)
            rocq.x(q[0])

        num_op = rocq.HermitianOperator(np.diag([0.0, 1.0]), targets=[0])
        val = rocq.get_expectation_value(prep, num_op, backend="state_vector")
        assert abs(val - 1.0) < 1e-6


class TestKernelLowering:
    def test_kernel_ir_dump(self):
        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        text = bell.mlir()
        assert "H" in text and "CNOT" in text

    def test_kernel_qir_and_stablehlo(self):
        # the reference example.py:21-27 verification ported verbatim
        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        qir = bell.qir()
        assert "__quantum__qis__h__body" in qir
        assert "__quantum__qis__cnot__body" in qir
        assert "call void @__quantum__qis__h__body" in qir
        hlo = bell.stablehlo()
        assert "stablehlo" in hlo or "func" in hlo
