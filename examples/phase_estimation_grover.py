"""Quantum phase estimation + Grover search from the models zoo.

QPE reads out phi = 13/64 exactly on a 6-qubit counting register (the
controlled-U^(2^j) cascade and the inverse QFT both ride the kernel's
one-pass "D2" controlled-phase path); Grover amplifies a marked 7-qubit
state to ~0.996 probability in pi/4*sqrt(128) rounds. The reference
shipped neither algorithm; both exercise the multi-controlled-Z and
diagonal-fusion machinery end to end."""

import numpy as np
import jax
import jax.numpy as jnp

from rocquantum_tpu.compiler.interpreter import execute
from rocquantum_tpu.models import grover_ir, qpe_ir
from rocquantum_tpu.ops import statevec as sv


def main():
    # -- phase estimation: phi exactly representable in m bits ------------
    m = 6
    phase = 13 / 64
    ir = qpe_ir(m, phase)

    @jax.jit
    def run_qpe():
        state = execute(sv.init_state(m + 1), list(ir.ops), None)
        return sv.marginal_probs(state, tuple(range(m)))

    probs = np.asarray(run_qpe())
    estimate = int(probs.argmax())
    print(f"QPE: phase={phase:.6f}  estimate={estimate}/{1 << m} "
          f"(P={probs.max():.4f})")
    assert estimate == round(phase * (1 << m))
    assert probs.max() > 0.99

    # -- Grover: single marked state on 7 qubits --------------------------
    n, marked = 7, 42
    gir = grover_ir(n, marked)

    @jax.jit
    def run_grover():
        state = execute(sv.init_state(n), list(gir.ops), None)
        return jnp.abs(state) ** 2

    pg = np.asarray(run_grover())
    print(f"Grover: marked={marked}  P(marked)={pg[marked]:.4f} "
          f"after {gir.name} rounds")
    assert int(pg.argmax()) == marked
    assert pg[marked] > 0.95
    print("OK")


if __name__ == "__main__":
    main()
