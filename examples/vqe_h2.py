"""VQE for the H2 molecule ground state (reference examples/vqe_h2.py).

Uses a chemically-correct 2-qubit Hamiltonian (O'Malley et al. PRX 2016
BK-reduced coefficients + nuclear repulsion) whose exact ground energy
matches the reference's documented target of -1.13728 Ha — the reference's
own coefficient set had ground energy -1.0357 (documented divergence).
Gradients are true adjoint differentiation (one value_and_grad program)
instead of the reference's parameter-shift double executions.
"""

import time

import numpy as np
from scipy.optimize import minimize

import rocquantum_tpu as rocq

h2_hamiltonian = {
    "I": -0.4804 + 0.7137,
    "Z0": 0.3435,
    "Z1": -0.4347,
    "Z0 Z1": 0.5716,
    "X0 X1": 0.0910,
    "Y0 Y1": 0.0910,
}

THEORETICAL_ENERGY = -1.13728


@rocq.kernel
def ansatz(q, t0, t1, t2, t3):
    q.ry(t0, 0)
    q.ry(t1, 1)
    q.cx(0, 1)
    q.ry(t2, 0)
    q.ry(t3, 1)


def run_vqe():
    sim = rocq.Simulator(seed=0)
    hamiltonian = rocq.PauliOperator(h2_hamiltonian)

    def value_and_grad(params):
        return rocq.adjoint_grad(ansatz, 2, sim, params, hamiltonian,
                                 return_value=True)

    rng = np.random.default_rng(0)
    initial_params = rng.uniform(0, 2 * np.pi, 4)
    start = time.perf_counter()
    result = minimize(fun=value_and_grad, x0=initial_params,
                      method="L-BFGS-B", jac=True,
                      options={"maxiter": 200})
    elapsed = time.perf_counter() - start

    err = abs(result.fun - THEORETICAL_ENERGY)
    print(f"Final energy:       {result.fun:.5f} Ha")
    print(f"Theoretical energy: {THEORETICAL_ENERGY:.5f} Ha")
    print(f"Error:              {err:.5f} Ha")
    print(f"Time:               {elapsed:.3f} s "
          f"({result.nfev} energy+gradient evaluations)")
    assert err < 2e-3, "VQE did not converge to the H2 ground state"
    print("SUCCESS")


if __name__ == "__main__":
    run_vqe()
