"""Bell state on the density-matrix engine with and without noise
(reference examples/bell_state_density_matrix.py)."""

import numpy as np

from rocquantum_tpu.density_state import DensityMatrixState


def main():
    st = DensityMatrixState(2)
    st.apply_h(0)
    st.apply_cnot(0, 1)
    rho = st.get_density_matrix()
    psi = np.zeros(4, complex)
    psi[0] = psi[3] = 2**-0.5
    assert np.allclose(rho, np.outer(psi, psi.conj()), atol=1e-6)
    print("ideal Bell density matrix OK")

    noisy = DensityMatrixState(2)
    noisy.apply_h(0)
    noisy.apply_cnot(0, 1)
    noisy.apply_depolarizing_channel([0, 1], 0.05)
    zz = noisy._compute_z_product_expectation([0, 1])
    print(f"<Z0 Z1> with 5% depolarizing: {zz:.6f}")
    assert 0.5 < zz < 1.0  # damped but still correlated
    print("SUCCESS")


if __name__ == "__main__":
    main()
