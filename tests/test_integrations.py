"""Ecosystem plugin tests (reference integrations/*/tests): Bell-state
statevector + counts per plugin. Skip when the host framework is absent
(same pytest.skip pattern as the reference suites)."""

import numpy as np
import pytest


class TestQiskitProvider:
    def test_bell_counts_and_statevector(self):
        pytest.importorskip("qiskit", reason="qiskit not installed")
        from qiskit import QuantumCircuit as QiskitCircuit
        from rocquantum_tpu.integrations.qiskit_provider import (
            RocQuantumProvider)

        provider = RocQuantumProvider()
        backend = provider.get_backend("rocq_simulator")

        qc = QiskitCircuit(2, 2)
        qc.h(0)
        qc.cx(0, 1)
        qc.measure([0, 1], [0, 1])
        result = backend.run(qc, shots=1000)
        counts = result.get_counts()
        assert set(counts) <= {"00", "11"}
        total = sum(counts.values())
        assert abs(counts.get("00", 0) / total - 0.5) < 0.1

    def test_rz_phase(self):
        pytest.importorskip("qiskit", reason="qiskit not installed")
        from qiskit import QuantumCircuit as QiskitCircuit
        from rocquantum_tpu.integrations.qiskit_provider import (
            RocQuantumBackend)

        backend = RocQuantumBackend()
        qc = QiskitCircuit(1)
        qc.h(0)
        qc.rz(np.pi / 2, 0)
        backend.run(qc, shots=10)
        psi = backend.get_statevector()
        # global-phase-free check of the relative phase
        ratio = psi[1] / psi[0]
        assert abs(ratio - 1j) < 1e-5


class TestCirqSimulator:
    def test_bell(self):
        cirq = pytest.importorskip("cirq", reason="cirq not installed")
        from rocquantum_tpu.integrations.cirq_simulator import (
            RocQuantumSimulator)

        q0, q1 = cirq.LineQubit.range(2)
        circuit = cirq.Circuit([cirq.H(q0), cirq.CNOT(q0, q1),
                                cirq.measure(q0, q1, key="m")])
        sim = RocQuantumSimulator()
        result = sim._run(circuit, cirq.ParamResolver({}), repetitions=500)
        bits = result["m"]
        assert set((bits[:, 0] ^ bits[:, 1]).tolist()) == {0}


class TestPennyLaneDevice:
    def test_bell_state(self):
        qml = pytest.importorskip("pennylane", reason="pennylane not installed")
        from rocquantum_tpu.integrations.pennylane_device import RocQDevice

        dev = RocQDevice(wires=2)
        if getattr(qml, "__rocq_stub__", False):
            # stub mode: no qnode machinery — drive the device API directly
            # (apply/state IS the plugin translation layer under test)
            dev.apply([qml.Hadamard(wires=0), qml.CNOT(wires=[0, 1])])
            state = dev.state
        else:
            @qml.qnode(dev)
            def bell():
                qml.Hadamard(wires=0)
                qml.CNOT(wires=[0, 1])
                return qml.state()

            state = bell()
        assert abs(abs(state[0]) - 2**-0.5) < 1e-5
        assert abs(abs(state[3]) - 2**-0.5) < 1e-5

    def test_rx_probability_and_samples(self):
        qml = pytest.importorskip("pennylane", reason="pennylane not installed")
        from rocquantum_tpu.integrations.pennylane_device import RocQDevice

        theta = 0.9
        dev = RocQDevice(wires=1, shots=4000)
        dev.apply([qml.RX(theta, wires=0)])
        probs = dev.analytic_probability()
        assert abs(probs[1] - np.sin(theta / 2) ** 2) < 1e-5
        samples = dev.generate_samples()
        assert samples.shape == (4000, 1)
        assert abs(samples.mean() - np.sin(theta / 2) ** 2) < 0.05

    def test_qubit_unitary_fallback(self):
        qml = pytest.importorskip("pennylane", reason="pennylane not installed")
        from rocquantum_tpu.integrations.pennylane_device import RocQDevice

        dev = RocQDevice(wires=1)
        u = np.array([[0, 1], [1, 0]], dtype=complex)  # X as a raw matrix
        dev.apply([qml.QubitUnitary(u, wires=0)])
        assert abs(abs(dev.state[1]) - 1.0) < 1e-5
