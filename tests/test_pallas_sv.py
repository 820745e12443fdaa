"""Pallas fused-gate kernel: interpret-mode correctness vs the einsum path
(same strategy as the reference's kernel-vs-CPU-reference permute tests,
test_PermutationKernels.cpp:116-177)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.ops import statevec as sv
from rocquantum_tpu.ops import gates as g
from rocquantum_tpu.ops.pallas_sv import (apply_fused_1q_layer,
                                          fused_layer_complex,
                                          max_kernel_qubit, pack_gate_mats)


def rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex64)


def reference_apply(state, qubits, mats):
    out = jnp.asarray(state)
    for q, m in zip(qubits, mats):
        out = sv.apply_matrix(out, jnp.asarray(m, jnp.complex64), [q])
    return np.asarray(out)


@pytest.mark.parametrize("n", [8, 14, 16])
def test_full_layer_matches_einsum(n):
    rng = np.random.default_rng(1)
    state = rand_state(n, 2)
    qubits = list(range(min(n, max_kernel_qubit(n) + 1)))
    mats = []
    for _ in qubits:
        th = rng.normal()
        mats.append(np.array(
            [[np.cos(th / 2), -np.sin(th / 2)],
             [np.sin(th / 2), np.cos(th / 2)]], np.complex64))
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_complex_gates_and_subsets():
    n = 10
    state = rand_state(n, 5)
    qubits = [0, 3, 7, 9]
    mats = [np.asarray(g.H), np.asarray(g.S), np.asarray(g.T),
            np.asarray(g.Y)]
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_row_space_qubits():
    # qubits above COL_QUBITS exercise the row-pairing branch
    n = 16
    state = rand_state(n, 7)
    qubits = [12, 13]  # COL_QUBITS = 12 -> row space
    mats = [np.asarray(g.H), np.asarray(g.X)]
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rejects_out_of_range_qubit():
    n = 16
    state = jnp.asarray(rand_state(n))
    re = jnp.real(state)
    im = jnp.imag(state)
    with pytest.raises(ValueError):
        apply_fused_1q_layer(re, im, [max_kernel_qubit(n) + 1],
                             jnp.zeros((1, 2, 2, 2), jnp.float32),
                             interpret=True)
