"""Ecosystem device plugins (Qiskit / Cirq / PennyLane), each import-gated on
its host framework. All three feed off the shared JAX QuantumSimulator
facade (rocquantum_tpu.simulator), replacing the reference's
rocquantum_bind C++ module."""
