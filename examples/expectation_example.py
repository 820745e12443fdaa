"""GHZ expectation values (reference examples/expectation_example.py:55-58:
<Z0 Z1>=1, <X1 Y2>=0, <X0 Y1 Z2>=0)."""

import numpy as np

import rocquantum_tpu as rocq


def run_expectation_example():
    simulator = rocq.Simulator()

    @rocq.kernel
    def ghz(q):
        q.h(0)
        q.cx(0, 1)
        q.cx(0, 2)

    prog = rocq.build(ghz, 3, simulator)
    exp_zz = rocq.get_expval(prog, rocq.PauliOperator("Z0 Z1"))
    exp_ixy = rocq.get_expval(prog, rocq.PauliOperator("X1 Y2"))
    exp_xyz = rocq.get_expval(prog, rocq.PauliOperator("X0 Y1 Z2"))
    print(f"<Z0 Z1>    = {exp_zz:.6f} (expect 1)")
    print(f"<I0 X1 Y2> = {exp_ixy:.6f} (expect 0)")
    print(f"<X0 Y1 Z2> = {exp_xyz:.6f} (expect 0)")
    assert np.isclose(exp_zz, 1.0)
    assert np.isclose(exp_ixy, 0.0, atol=1e-6)
    assert np.isclose(exp_xyz, 0.0, atol=1e-6)
    print("All tested expectation values are correct.")


if __name__ == "__main__":
    run_expectation_example()
