"""Ecosystem plugin tests (reference integrations/*/tests): Bell-state
statevector + counts per plugin. Skip when the host framework is absent
(same pytest.skip pattern as the reference suites)."""

import numpy as np
import pytest

qiskit = pytest.importorskip("qiskit", reason="qiskit not installed")


class TestQiskitProvider:
    def test_bell_counts_and_statevector(self):
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
