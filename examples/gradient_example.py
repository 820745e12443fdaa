"""Gradients: parameter-shift rule vs adjoint differentiation (reference
examples/gradient_example.py; both must agree and match the analytic value
-sin(theta) for <Z0> after RY(theta))."""

import numpy as np

import rocquantum_tpu as rocq


@rocq.kernel
def ansatz(q, theta):
    q.ry(theta, 0)


def main():
    sim = rocq.Simulator()
    observable = rocq.PauliOperator("Z0")
    theta0 = 0.7

    g_shift = rocq.grad(ansatz, 1, sim, [theta0], observable)
    g_adj = rocq.adjoint_grad(ansatz, 1, sim, [theta0], observable)
    analytic = -np.sin(theta0)

    print(f"parameter-shift: {g_shift[0]:.8f}")
    print(f"adjoint:         {g_adj[0]:.8f}")
    print(f"analytic:        {analytic:.8f}")
    assert abs(g_shift[0] - analytic) < 1e-5
    assert abs(g_adj[0] - analytic) < 1e-5
    print("SUCCESS")


if __name__ == "__main__":
    main()
