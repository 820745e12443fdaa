"""VQE for a 4-qubit LiH-style Hamiltonian, exercising tensor-network
slicing via a forced memory limit (reference examples/vqe_lih.py:22-33)."""

import numpy as np

import rocquantum_tpu as rocq
from rocquantum_tpu.solvers import SciPyOptimizer, VQE_Solver
from rocquantum_tpu.tensornet import TensorNetwork

# Simplified 4-qubit LiH Hamiltonian (parity-mapped subset)
lih_hamiltonian = {
    "I": -7.4989,
    "Z0": 0.1619, "Z1": 0.0149, "Z2": 0.1244, "Z3": 0.0149,
    "Z0 Z1": 0.1226, "Z1 Z2": 0.0541, "Z2 Z3": 0.1226,
    "X0 X1": 0.0353, "X2 X3": 0.0353,
}


@rocq.kernel
def lih_ansatz(q, t0, t1, t2, t3):
    for i, t in enumerate((t0, t1, t2, t3)):
        q.ry(t, i)
    q.cx(0, 1)
    q.cx(1, 2)
    q.cx(2, 3)


def exact_ground(terms, n=4):
    import functools
    I = np.eye(2); X = np.array([[0, 1], [1, 0]]); Z = np.diag([1, -1])
    Y = np.array([[0, -1j], [1j, 0]])
    P = {"I": I, "X": X, "Y": Y, "Z": Z}
    H = np.zeros((2**n, 2**n), complex)
    for s, c in terms.items():
        mats = [I] * n
        if s != "I":
            for comp in s.split():
                mats[int(comp[1:])] = P[comp[0]]
        H += c * functools.reduce(np.kron, reversed(mats))
    return float(np.linalg.eigvalsh(H)[0])


def run_vqe_lih():
    sim = rocq.Simulator(seed=3)
    solver = VQE_Solver(sim, SciPyOptimizer({"method": "L-BFGS-B"}),
                        use_adjoint_gradients=True)
    res = solver.solve(rocq.PauliOperator(lih_hamiltonian), lih_ansatz, 4,
                       np.full(4, 0.2))
    exact = exact_ground(lih_hamiltonian)
    print(f"VQE energy:   {res['optimal_energy']:.5f} Ha")
    print(f"Exact ground: {exact:.5f} Ha")
    assert res["optimal_energy"] >= exact - 1e-6
    assert res["optimal_energy"] - exact < 0.05

    # memory-limited sliced contraction on the optimal state's tensors
    # (reference forced a global memory limit to trigger slicing)
    rng = np.random.default_rng(0)
    tn = TensorNetwork()
    tn.add_tensor(rng.normal(size=(2, 2, 2, 16)), ["a", "b", "c", "d"])
    tn.add_tensor(rng.normal(size=(16, 2, 2, 16)), ["d", "e", "f", "g"])
    tn.add_tensor(rng.normal(size=(16, 2, 2, 2)), ["g", "h", "i", "j"])
    out = tn.contract({"memory_limit": 2048})
    print(f"Sliced contraction used {tn.last_num_slices} slices; "
          f"result rank {len(out.labels)}")
    assert tn.last_num_slices > 1
    print("SUCCESS")


if __name__ == "__main__":
    run_vqe_lih()
