"""Trotterized Hamiltonian evolution vs exact matrix exponential."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu.models import trotter_ir, evolve
from rocquantum_tpu.ops import statevec as sv


def dense_h(terms, n):
    import functools
    I = np.eye(2); X = np.array([[0, 1], [1, 0]]); Z = np.diag([1, -1])
    Y = np.array([[0, -1j], [1j, 0]])
    P = {"X": X, "Y": Y, "Z": Z}
    H = np.zeros((2**n, 2**n), complex)
    for ops, c in terms:
        mats = [I] * n
        for p, q in ops:
            mats[q] = P[p]
        H += c * functools.reduce(np.kron, reversed(mats))
    return H


@pytest.mark.parametrize("order,steps,tol", [(1, 200, 2e-2), (2, 40, 2e-3)])
def test_trotter_vs_expm(order, steps, tol):
    from scipy.linalg import expm
    n, t = 3, 0.7
    h = rocq.PauliOperator({"Z0 Z1": 0.9, "X0": 0.5, "X1": -0.3,
                            "Y1 Z2": 0.4})
    H = dense_h([(ops, c) for ops, c in h.terms if ops], n)

    state = jax.jit(lambda: sv.apply_gate(sv.init_state(n), "H", [0]))()
    out = evolve(state, h, t, steps=steps, order=order)
    got = np.asarray(jnp.real(out)) + 1j * np.asarray(jnp.imag(out))

    psi0 = np.zeros(2**n, complex)
    psi0[0] = psi0[1] = 2**-0.5
    expected = expm(-1j * H * t) @ psi0
    err = np.linalg.norm(got - expected)
    assert err < tol, f"order={order} err={err}"


def test_time_scaling_shares_compile():
    h = rocq.PauliOperator({"Z0 Z1": 1.0, "X0": 0.2})
    ir, params_for = trotter_ir(h, 2, steps=5, order=2)
    assert ir.num_params == len(params_for(1.0))
    # same circuit, different times
    from rocquantum_tpu.compiler.interpreter import compile_ir
    fn = compile_ir(ir, donate=False)
    s0 = jax.jit(lambda: sv.init_state(2))()
    a = fn(s0, jnp.asarray(params_for(0.1)))
    b = fn(jax.jit(lambda: sv.init_state(2))(), jnp.asarray(params_for(0.5)))
    assert not np.allclose(np.asarray(jnp.real(a)), np.asarray(jnp.real(b)))
