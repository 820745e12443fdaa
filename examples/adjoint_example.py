"""Adjoint (dagger) of a kernel via the IR transform (reference
examples/adjoint_example.py + AdjointGenerationPass). U followed by
adjoint(U) must restore |0...0>."""

import numpy as np

import rocquantum_tpu as rocq


@rocq.kernel
def prep(q):
    q.h(0)
    q.t(0)
    q.rx(0.37, 0)
    q.cx(0, 1)
    q.s(1)


def main():
    sim = rocq.Simulator()
    adj = rocq.adjoint(prep)  # reversed ops, each daggered

    c = rocq.Circuit(2, sim)
    base = getattr(prep, "__wrapped__", prep)
    base(c)
    adj(c)
    psi = c.get_statevector()
    print("final state:", np.round(psi, 6))
    assert np.allclose(psi, [1, 0, 0, 0], atol=1e-5)

    # Kernel-object form (reference api.py:654-692 surface)
    k = rocq.Kernel("prep", rocq.trace_kernel(prep, 2))
    k_adj = rocq.adjoint(k)
    print(k_adj.ir.dump())
    assert k_adj.name == "prep.adj"
    print("SUCCESS")


if __name__ == "__main__":
    main()
