"""Noisy VQE for H2 on the density-matrix engine (reference
examples/vqe_h2_noisy.py: 1% depolarizing noise per qubit after each gate,
identity offset; noisy optimum lies above the noiseless ground energy)."""

import numpy as np
from scipy.optimize import minimize

from rocquantum_tpu import dsl as rocq
from rocquantum_tpu.dsl import NoiseModel, PauliOperator, get_expectation_value

h2_terms = [("Z0", 0.3435), ("Z1", -0.4347), ("Z0 Z1", 0.5716),
            ("X0 X1", 0.0910), ("Y0 Y1", 0.0910)]
IDENTITY_OFFSET = -0.4804 + 0.7137
NOISELESS_GROUND = -1.1375


def make_kernel():
    @rocq.kernel
    def ansatz(t0, t1, t2, t3):
        q = rocq.qvec(2)
        rocq.ry(t0, q[0])
        rocq.ry(t1, q[1])
        rocq.cnot(q[0], q[1])
        rocq.ry(t2, q[0])
        rocq.ry(t3, q[1])
    return ansatz


def run_noisy_vqe():
    ansatz = make_kernel()
    noise = NoiseModel()
    noise.add_channel("depolarizing", 0.01)  # 1% after every gate

    def energy(params):
        bindings = dict(zip(["t0", "t1", "t2", "t3"], params))
        total = IDENTITY_OFFSET
        for pauli_string, coeff in h2_terms:
            op = PauliOperator(pauli_string)
            total += coeff * get_expectation_value(
                ansatz, op, backend="density_matrix", noise_model=noise,
                **bindings)
        return total

    result = minimize(energy, x0=np.full(4, 0.1), method="COBYLA",
                      options={"maxiter": 150})
    print(f"Noisy optimal energy:  {result.fun:.5f} Ha")
    print(f"Noiseless ground:      {NOISELESS_GROUND:.5f} Ha")
    assert result.fun >= NOISELESS_GROUND - 1e-6, \
        "noisy energy cannot beat the noiseless ground state"
    assert result.fun < -1.0, "optimization made no progress"
    print("SUCCESS")


if __name__ == "__main__":
    run_noisy_vqe()
