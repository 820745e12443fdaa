"""Shot sampling from a Bell state (reference examples/sampling_example.py;
asserts P(00), P(11) = 0.5 +/- 0.05 at 1000 shots and no uncorrelated
outcomes)."""

from collections import Counter

import numpy as np

import rocquantum_tpu as rocq


def create_bell_state(circuit):
    circuit.h(0)
    circuit.cx(0, 1)


def run_sampling_example():
    num_qubits, num_shots = 2, 1000
    simulator = rocq.Simulator()
    circuit = rocq.Circuit(num_qubits, simulator)
    create_bell_state(circuit)

    results = circuit.sample([0, 1], num_shots)
    counts = Counter(results.tolist())
    for outcome in range(4):
        print(f"Outcome {outcome:02b}: {counts.get(outcome, 0)}")

    assert counts.get(1, 0) == 0 and counts.get(2, 0) == 0
    prob_00 = counts.get(0, 0) / num_shots
    prob_11 = counts.get(3, 0) / num_shots
    assert np.isclose(prob_00, 0.5, atol=0.05)
    assert np.isclose(prob_11, 0.5, atol=0.05)
    print("Verification PASSED")


if __name__ == "__main__":
    run_sampling_example()
