"""Quantum teleportation with mid-circuit measurement + classical control
(reference examples/dynamic_circuit_example.py; asserts <Z> of the
teleported qubit equals cos(theta))."""

import numpy as np

import rocquantum_tpu as rocq


def run_teleportation_example():
    simulator = rocq.Simulator(seed=7)
    message_angle = np.pi / 3.0

    teleport_circuit = rocq.Circuit(3, simulator)
    teleport_circuit.ry(message_angle, 0)      # message on q0
    teleport_circuit.h(1)                      # Bell pair q1-q2
    teleport_circuit.cx(1, 2)
    teleport_circuit.cx(0, 1)                  # Bell measurement basis
    teleport_circuit.h(0)

    m1, _ = teleport_circuit.measure(0)
    m2, _ = teleport_circuit.measure(1)
    print(f"Measurement outcomes: m1={m1}, m2={m2}")
    if m2 == 1:
        teleport_circuit.x(2)
    if m1 == 1:
        teleport_circuit.z(2)

    teleported = teleport_circuit.expval(rocq.PauliOperator("Z2"))
    analytical = np.cos(message_angle)
    print(f"<Z> teleported = {teleported:.8f}, analytical = {analytical:.8f}")
    assert np.isclose(teleported, analytical, atol=1e-5), \
        "Teleportation failed!"
    print("SUCCESS")


if __name__ == "__main__":
    run_teleportation_example()
