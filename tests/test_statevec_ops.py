"""Unit tests for the core state-vector primitives.

Assertions mirror the reference's engine tests: analytic state comparisons
(tests/test_bindings.py Bell state), exhaustive small-n permutation checks
(SURVEY hard-parts: bit-order parity), and truth tables
(examples/multi_control_gate_example.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.ops import statevec as sv
from rocquantum_tpu.ops import gates as g


def np_apply_matrix(state, mat, targets, n):
    """Reference-model gate application in numpy: explicit pair/group gather
    using the bit conventions of multi_qubit_kernels.hip:37-115."""
    m = len(targets)
    out = np.array(state, dtype=np.complex128, copy=True)
    non_targets = [q for q in range(n) if q not in targets]
    for base_bits in range(1 << (n - m)):
        base = 0
        for i, q in enumerate(non_targets):
            if (base_bits >> i) & 1:
                base |= 1 << q
        idxs = []
        for j in range(1 << m):
            idx = base
            for k, q in enumerate(targets):
                if (j >> k) & 1:
                    idx |= 1 << q
            idxs.append(idx)
        vec = np.array([state[i] for i in idxs])
        new = mat @ vec
        for j, i in enumerate(idxs):
            out[i] = new[j]
    return out


def rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(1 << n,)) + 1j * rng.normal(size=(1 << n,))
    v = v / np.linalg.norm(v)
    return v.astype(np.complex64)


class TestApplyMatrix:
    def test_x_on_zero_state(self):
        state = sv.init_state(1)
        out = sv.apply_matrix(state, jnp.asarray(g.X, jnp.complex64), [0])
        np.testing.assert_allclose(np.asarray(out), [0, 1], atol=1e-6)

    def test_h_makes_plus(self):
        state = sv.init_state(1)
        out = sv.apply_matrix(state, jnp.asarray(g.H, jnp.complex64), [0])
        np.testing.assert_allclose(np.asarray(out), [2**-0.5, 2**-0.5], atol=1e-6)

    @pytest.mark.parametrize("n", [2, 3, 4, 5])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_single_qubit_matches_numpy_reference(self, n, seed):
        rng = np.random.default_rng(seed + 100)
        mat = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        state = rand_state(n, seed)
        for q in range(n):
            expected = np_apply_matrix(state, mat, [q], n)
            got = sv.apply_matrix(jnp.asarray(state),
                                  jnp.asarray(mat, jnp.complex64), [q])
            np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    @pytest.mark.parametrize("n", [3, 4, 5])
    def test_two_qubit_all_pairs_match_numpy_reference(self, n):
        rng = np.random.default_rng(7)
        mat = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        state = rand_state(n, 3)
        for q0 in range(n):
            for q1 in range(n):
                if q0 == q1:
                    continue
                expected = np_apply_matrix(state, mat, [q0, q1], n)
                got = sv.apply_matrix(jnp.asarray(state),
                                      jnp.asarray(mat, jnp.complex64), [q0, q1])
                np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5,
                                           err_msg=f"targets=[{q0},{q1}]")

    def test_three_qubit_generic(self):
        n = 5
        rng = np.random.default_rng(11)
        mat = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
        state = rand_state(n, 5)
        targets = [3, 0, 2]
        expected = np_apply_matrix(state, mat, targets, n)
        got = sv.apply_matrix(jnp.asarray(state), jnp.asarray(mat, jnp.complex64), targets)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_swap_gate(self):
        # SWAP |01> -> |10>: qubit0=1,qubit1=0 (index 1) -> index 2
        state = sv.basis_state(2, 1)
        out = sv.apply_matrix(state, jnp.asarray(g.SWAP, jnp.complex64), [0, 1])
        np.testing.assert_allclose(np.asarray(out), [0, 0, 1, 0], atol=1e-6)


class TestControlled:
    def test_cnot_bell(self):
        state = sv.init_state(2)
        state = sv.apply_gate(state, "H", [0])
        state = sv.apply_gate(state, "CNOT", [0, 1])  # control 0, target 1
        expected = np.zeros(4, np.complex64)
        expected[0] = expected[3] = 2**-0.5
        np.testing.assert_allclose(np.asarray(state), expected, atol=1e-6)

    def test_cnot_truth_table(self):
        # control=1, target=0
        for cval in (0, 1):
            for tval in (0, 1):
                idx = (cval << 1) | tval
                state = sv.basis_state(2, idx)
                out = sv.apply_controlled_matrix(
                    state, jnp.asarray(g.X, jnp.complex64), [1], [0])
                expect_idx = (cval << 1) | (tval ^ cval)
                np.testing.assert_allclose(
                    np.asarray(out), np.eye(4)[expect_idx], atol=1e-6)

    def test_toffoli_truth_table(self):
        # controls 0,1; target 2 (examples/multi_control_gate_example.py).
        # NB: the reference example's expected indices assume big-endian kets,
        # inconsistent with its own little-endian state prep — we use the
        # self-consistent little-endian truth table (SURVEY §7 "reference
        # bugs are not spec").
        cases = {3: 7, 5: 5, 6: 6, 7: 3}
        for init_idx, expect_idx in cases.items():
            state = sv.basis_state(3, init_idx)
            out = sv.apply_gate(state, "MCX", [2], controls=[0, 1])
            np.testing.assert_allclose(np.asarray(out), np.eye(8)[expect_idx],
                                       atol=1e-6, err_msg=f"init={init_idx}")

    def test_cswap(self):
        # control=0, swap qubits 1,2: |0,1,0> with control 1 -> index 0b011=3
        state = sv.basis_state(3, 0b011)  # q0=1 (ctrl), q1=1, q2=0
        out = sv.apply_gate(state, "CSWAP", [1, 2], controls=[0])
        np.testing.assert_allclose(np.asarray(out), np.eye(8)[0b101], atol=1e-6)

    def test_controlled_matches_dense_construction(self):
        n = 4
        rng = np.random.default_rng(2)
        u = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        state = rand_state(n, 9)
        # dense controlled-U on (control=2, target=0) via full 16x16 matrix
        full = np.zeros((16, 16), np.complex128)
        for col in range(16):
            if (col >> 2) & 1:
                t = col & 1
                for tnew in (0, 1):
                    row = (col & ~1) | tnew
                    full[row, col] += u[tnew, t]
            else:
                full[col, col] = 1.0
        expected = full @ state
        got = sv.apply_controlled_matrix(jnp.asarray(state),
                                         jnp.asarray(u, jnp.complex64), [2], [0])
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestMeasurement:
    def test_prob_and_collapse(self):
        state = sv.init_state(2)
        state = sv.apply_gate(state, "H", [0])
        state = sv.apply_gate(state, "CNOT", [0, 1])
        p1 = float(sv.prob_one(state, 0))
        assert abs(p1 - 0.5) < 1e-6
        collapsed = sv.collapse(state, 0, 1)
        np.testing.assert_allclose(np.asarray(collapsed), [0, 0, 0, 1], atol=1e-6)

    def test_marginal_probs_ordering(self):
        # |q1=1, q0=0> = index 2. marginal over [0,1]: outcome int packs q0
        # in bit0 -> outcome 2.
        state = sv.basis_state(2, 2)
        marg = np.asarray(sv.marginal_probs(state, [0, 1]))
        np.testing.assert_allclose(marg, [0, 0, 1, 0], atol=1e-6)
        # reversed qubit list: outcome packs q1 in bit0 -> outcome 1
        marg = np.asarray(sv.marginal_probs(state, [1, 0]))
        np.testing.assert_allclose(marg, [0, 1, 0, 0], atol=1e-6)

    def test_sample_bell_statistics(self):
        state = sv.init_state(2)
        state = sv.apply_gate(state, "H", [0])
        state = sv.apply_gate(state, "CNOT", [0, 1])
        key = jax.random.PRNGKey(0)
        shots = 2000
        out = np.asarray(sv.sample(state, [0, 1], shots, key))
        counts = np.bincount(out, minlength=4)
        assert counts[1] == 0 and counts[2] == 0
        assert abs(counts[0] / shots - 0.5) < 0.05
        assert abs(counts[3] / shots - 0.5) < 0.05


class TestExpectation:
    def test_ghz_expectations(self):
        # GHZ: <Z0 Z1> = 1, <X1 Y2> = 0, <X0 Y1 Z2> = 0
        # (examples/expectation_example.py:55-58)
        state = sv.init_state(3)
        state = sv.apply_gate(state, "H", [0])
        state = sv.apply_gate(state, "CNOT", [0, 1])
        state = sv.apply_gate(state, "CNOT", [0, 2])
        assert abs(float(sv.expval_pauli_product_z(state, [0, 1])) - 1.0) < 1e-6
        assert abs(float(sv.expval_pauli_string(state, [("X", 1), ("Y", 2)]))) < 1e-6
        assert abs(float(sv.expval_pauli_string(
            state, [("X", 0), ("Y", 1), ("Z", 2)]))) < 1e-6
        # <X0 X1 X2> = 1 for GHZ
        assert abs(float(sv.expval_pauli_string(
            state, [("X", 0), ("X", 1), ("X", 2)])) - 1.0) < 1e-6

    def test_expval_z_after_ry(self):
        theta = np.pi / 3
        state = sv.init_state(1)
        state = sv.apply_gate(state, "RY", [0], params=[theta])
        assert abs(float(sv.expval_z(state, 0)) - np.cos(theta)) < 1e-6

    def test_expval_xy(self):
        state = sv.init_state(1)
        state = sv.apply_gate(state, "H", [0])
        assert abs(float(sv.expval_x(state, 0)) - 1.0) < 1e-6
        assert abs(float(sv.expval_y(state, 0))) < 1e-6


class TestSwapIndexBits:
    def test_swap_matches_relabel(self):
        n = 4
        state = rand_state(n, 13)
        out = np.asarray(sv.swap_index_bits(jnp.asarray(state), 0, 2))
        for i in range(1 << n):
            b0, b2 = (i >> 0) & 1, (i >> 2) & 1
            j = (i & ~0b0101) | (b0 << 2) | (b2 << 0)
            assert out[j] == pytest.approx(complex(state[i]), abs=1e-6)


class TestParameterizedGates:
    def test_rotation_gates_unitary_and_traced(self):
        for name in ("RX", "RY", "RZ"):
            theta = 0.7
            m = np.asarray(sv.apply_gate(sv.init_state(1), name, [0], params=[theta]))
            assert abs(np.linalg.norm(m) - 1.0) < 1e-6

        # gates must be jit-traceable in the angle
        def f(theta):
            s = sv.init_state(1)
            s = sv.apply_gate(s, "RY", [0], params=[theta])
            return sv.expval_z(s, 0)

        jf = jax.jit(f)
        assert abs(float(jf(np.pi / 3)) - np.cos(np.pi / 3)) < 1e-6
        g_ = jax.grad(f)(jnp.float32(np.pi / 3))
        assert abs(float(g_) + np.sin(np.pi / 3)) < 1e-5


class TestCompileIrSelfSegmentation:
    def test_long_ir_self_segments_and_matches(self, monkeypatch):
        # VERDICT r2 #4: raw compile_ir callers must not need the manual
        # 96-op rule — long IRs chain per-segment executables automatically
        import jax
        import jax.numpy as jnp
        from rocquantum_tpu.compiler import interpreter as interp
        from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef

        monkeypatch.setattr(interp, "MAX_SEGMENT_ITEMS", 16)
        interp.clear_cache()
        n = 6
        rng = np.random.default_rng(3)
        ir = CircuitIR(n, name="long")
        k = 0
        for i in range(120):
            q = int(rng.integers(n))
            if i % 5 == 4:
                ir.add("CNOT", [(q + 1) % n], controls=[q])
            else:
                ir.add("RY", [q], params=[ParamRef(k)])
                k += 1
        fn = interp.compile_ir(ir, donate=False)
        params = jnp.asarray(rng.normal(size=(k,)), jnp.float32)
        state = jax.jit(lambda: sv.init_state(n))()
        out = fn(state, params)

        def ref(state, params):
            for op in ir.ops:
                state = interp.apply_op(state, op, params)
            return state

        want = jax.jit(ref)(jax.jit(lambda: sv.init_state(n))(), params)
        np.testing.assert_allclose(np.asarray(jnp.abs(out - want)).max(),
                                   0.0, atol=2e-5)
        interp.clear_cache()


def test_compile_ir_distinguishes_baked_param_values():
    """Two IRs identical in structure but differing in CONCRETE (non-
    ParamRef) angles must not share a cached executable (regression: the
    exec cache keyed on structural_key alone, which masks concrete values
    — the second caller silently got the first caller's angles)."""
    import jax.numpy as jnp
    from rocquantum_tpu.compiler.ir import CircuitIR
    from rocquantum_tpu.compiler.interpreter import compile_ir

    z = jnp.zeros((0,), jnp.float32)
    outs = []
    for theta in (0.3, 1.1):
        ir = CircuitIR(1)
        ir.add("RY", [0], params=[theta])
        fn = compile_ir(ir, donate=False)
        outs.append(np.asarray(fn(jax.jit(lambda: sv.init_state(1))(), z)))
    assert abs(outs[0][0].real - np.cos(0.15)) < 1e-6
    assert abs(outs[1][0].real - np.cos(0.55)) < 1e-6
