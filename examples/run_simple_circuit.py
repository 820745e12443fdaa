"""Minimal circuit walkthrough (reference examples/run_simple_circuit.py)."""

import numpy as np

import rocquantum_tpu as rocq


def main():
    sim = rocq.Simulator()
    c = rocq.Circuit(2, sim)
    c.h(0)
    c.cx(0, 1)
    print("statevector:", np.round(c.get_statevector(), 4))
    outcome, prob = c.measure(0)
    print(f"measured qubit 0 -> {outcome} (p={prob:.3f})")
    assert abs(prob - 0.5) < 1e-6
    print("SUCCESS")


if __name__ == "__main__":
    main()
