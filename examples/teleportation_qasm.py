"""Quantum teleportation expressed in OpenQASM 3 — custom gate definitions,
mid-circuit measurement, and classically-controlled corrections — executed
shot-batched through the local backend.

The reference could run dynamic circuits only through its Python API
(examples/dynamic_circuit_example.py); here the SAME physics round-trips
through QASM text, the parser (gate defs + `if` blocks), and the batched
dynamic executor. Acceptance check: <Z> of the teleported qubit = cos(theta)
(reference dynamic_circuit_example.py:84).
"""

import numpy as np

from rocquantum_tpu.backends.local import LocalTPUBackend

THETA = np.pi / 3
SHOTS = 3000

QASM = f"""
OPENQASM 3.0;
include "stdgates.inc";

// the state to teleport, and a Bell pair as a reusable gate
gate prep(theta) a {{ ry(theta) a; }}
gate bellpair a, b {{ h a; cx a, b; }}

qubit[3] q;
bit[2] c;

prep({THETA}) q[0];        // message qubit
bellpair q[1], q[2];       // shared entanglement
cx q[0], q[1];             // Bell measurement basis change
h q[0];
c[0] = measure q[0];
c[1] = measure q[1];
if (c[1] == 1) {{ x q[2]; }}   // classically-controlled corrections
if (c[0] == 1) {{ z q[2]; }}
"""


def main():
    backend = LocalTPUBackend(shots_seed=11)
    job = backend.submit_job(QASM, shots=SHOTS)
    assert backend.get_job_status(job) == "completed"
    counts = backend.get_job_result(job)
    total = sum(counts.values())
    # q[2] is the leftmost bit of the 3-bit outcome strings
    p0 = sum(v for k, v in counts.items() if k[0] == "0") / total
    ez = 2.0 * p0 - 1.0
    expected = np.cos(THETA)
    print(f"teleported <Z> = {ez:+.4f}   expected cos(pi/3) = {expected:+.4f}")
    assert abs(ez - expected) < 0.07, (ez, expected)
    print("teleportation via QASM dynamic circuit: OK")


if __name__ == "__main__":
    main()
