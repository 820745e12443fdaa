"""Toffoli via generic multi-controlled unitary (reference
examples/multi_control_gate_example.py, with the self-consistent
little-endian truth table — see SURVEY: the reference's expected indices
assumed big-endian kets, inconsistent with its own state prep)."""

from collections import Counter

import numpy as np

import rocquantum_tpu as rocq

pauli_x = np.array([[0, 1], [1, 0]], dtype=np.complex64)

# little-endian: index bit q = qubit q. Controls 0,1; target 2.
test_cases = {3: 7, 5: 5, 6: 6, 7: 3}


def run_multi_control_gate_example():
    for initial_idx, expected_idx in test_cases.items():
        simulator = rocq.Simulator()
        circuit = rocq.Circuit(3, simulator)
        for i in range(3):
            if (initial_idx >> i) & 1:
                circuit.x(i)
        circuit.apply_controlled_unitary([0, 1], [2], pauli_x)

        results = circuit.sample([0, 1, 2], 100)
        counts = Counter(results.tolist())
        final_state_idx = list(counts.keys())[0]
        print(f"|{initial_idx:03b}> -> |{final_state_idx:03b}> "
              f"(expected |{expected_idx:03b}>)")
        assert len(counts) == 1
        assert final_state_idx == expected_idx
    print("Verification PASSED")


if __name__ == "__main__":
    run_multi_control_gate_example()
