"""Tests for the rocq programming model (Simulator/Circuit/PauliOperator/
kernel/build/get_expval/adjoint/grad).

Mirrors the reference's acceptance examples: Bell sampling
(examples/sampling_example.py), teleportation dynamic circuit
(examples/dynamic_circuit_example.py), GHZ expectations
(examples/expectation_example.py), Toffoli truth table
(examples/multi_control_gate_example.py), and gradient checks
(examples/gradient_example.py).
"""

import numpy as np
import pytest

import rocquantum_tpu as rocq


@pytest.fixture
def sim():
    return rocq.Simulator(seed=7)


class TestCircuitBasics:
    def test_bell_statevector(self, sim):
        c = rocq.Circuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        psi = c.get_statevector()
        expected = np.zeros(4, complex)
        expected[0] = expected[3] = 2**-0.5
        np.testing.assert_allclose(psi, expected, atol=1e-6)

    def test_bell_sampling_statistics(self, sim):
        c = rocq.Circuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        results = c.sample([0, 1], 2000)
        counts = np.bincount(results, minlength=4)
        assert counts[1] == 0 and counts[2] == 0
        assert abs(counts[0] / 2000 - 0.5) < 0.05
        assert abs(counts[3] / 2000 - 0.5) < 0.05

    def test_validation_errors(self, sim):
        c = rocq.Circuit(2, sim)
        with pytest.raises(ValueError):
            c.h(2)
        with pytest.raises(ValueError):
            c.cx(0, 0)
        with pytest.raises(ValueError):
            c.sample([], 10)
        with pytest.raises(ValueError):
            c.sample([0], 0)
        with pytest.raises(ValueError):
            rocq.Circuit(-1, sim)
        with pytest.raises(TypeError):
            rocq.Circuit(2, "not a simulator")

    def test_apply_unitary(self, sim):
        c = rocq.Circuit(1, sim)
        c.apply_unitary([0], np.array([[0, 1], [1, 0]]))
        np.testing.assert_allclose(c.get_statevector(), [0, 1], atol=1e-6)

    def test_apply_controlled_unitary_toffoli(self, sim):
        # examples/multi_control_gate_example.py, self-consistent
        # little-endian convention
        pauli_x = np.array([[0, 1], [1, 0]], dtype=np.complex64)
        cases = {3: 7, 5: 5, 6: 6, 7: 3}
        for init_idx, expected_idx in cases.items():
            c = rocq.Circuit(3, rocq.Simulator())
            for i in range(3):
                if (init_idx >> i) & 1:
                    c.x(i)
            c.apply_controlled_unitary([0, 1], [2], pauli_x)
            results = c.sample([0, 1, 2], 100)
            counts = set(results.tolist())
            assert counts == {expected_idx}, f"init={init_idx}"

    def test_reset(self, sim):
        c = rocq.Circuit(2, sim)
        c.x(0)
        c.flush()
        c.reset()
        np.testing.assert_allclose(c.get_statevector(), [1, 0, 0, 0], atol=1e-6)

    def test_all_named_gates_execute(self, sim):
        c = rocq.Circuit(3, sim)
        c.x(0); c.y(1); c.z(2); c.h(0); c.s(1); c.sdg(1); c.t(2); c.tdg(2)
        c.rx(0.1, 0); c.ry(0.2, 1); c.rz(0.3, 2)
        c.cx(0, 1); c.cz(1, 2); c.swap(0, 2)
        c.crx(0.4, 0, 1); c.cry(0.5, 1, 2); c.crz(0.6, 2, 0)
        c.ccx(0, 1, 2); c.cswap(0, 1, 2); c.mcx([0, 1], 2)
        psi = c.get_statevector()
        assert abs(np.linalg.norm(psi) - 1.0) < 1e-5


class TestDynamicCircuits:
    def test_teleportation(self):
        """Quantum teleportation with mid-circuit measurement + classical
        control (examples/dynamic_circuit_example.py:78-84: <Z> = cos θ)."""
        message_angle = np.pi / 3.0
        for seed in range(5):  # several RNG branches
            sim = rocq.Simulator(seed=seed)
            c = rocq.Circuit(3, sim)
            c.ry(message_angle, 0)
            c.h(1)
            c.cx(1, 2)
            c.cx(0, 1)
            c.h(0)
            m1, _ = c.measure(0)
            m2, _ = c.measure(1)
            if m2 == 1:
                c.x(2)
            if m1 == 1:
                c.z(2)
            expval = c.expval(rocq.PauliOperator("Z2"))
            assert np.isclose(expval, np.cos(message_angle), atol=1e-5), \
                f"seed={seed} m1={m1} m2={m2}"

    def test_measure_deterministic(self, sim):
        c = rocq.Circuit(1, sim)
        c.x(0)
        outcome, prob = c.measure(0)
        assert outcome == 1
        assert abs(prob - 1.0) < 1e-6


class TestPauliOperator:
    def test_parse_and_repr(self):
        op = rocq.PauliOperator({"Z0 Z1": -1.0, "X0": -0.5})
        assert len(op.terms) == 2
        assert op.terms[0] == ([("Z", 0), ("Z", 1)], -1.0)

    def test_identity(self):
        op = rocq.PauliOperator({"I": 2.5})
        assert op.terms == [([], 2.5)]

    def test_algebra(self):
        a = rocq.PauliOperator("Z0")
        b = rocq.PauliOperator("X1")
        c = a + 2.0 * b
        assert len(c.terms) == 2
        assert c.terms[1][1] == 2.0

    def test_invalid(self):
        with pytest.raises(ValueError):
            rocq.PauliOperator("Q0")
        with pytest.raises(ValueError):
            rocq.PauliOperator("Zx")


class TestKernelBuildExpval:
    def test_ghz_expectations(self, sim):
        @rocq.kernel
        def ghz(q):
            q.h(0)
            q.cx(0, 1)
            q.cx(0, 2)

        prog = rocq.build(ghz, 3, sim)
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("Z0 Z1")) - 1.0) < 1e-6
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("X1 Y2"))) < 1e-6
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("X0 Y1 Z2"))) < 1e-6
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("X0 X1 X2")) - 1.0) < 1e-6
        # single X / Y / Z dispatch paths
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("Z0"))) < 1e-6
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("X0"))) < 1e-6
        assert abs(rocq.get_expval(prog, rocq.PauliOperator("Y1"))) < 1e-6

    def test_parameterized_kernel_and_update_params(self, sim):
        @rocq.kernel
        def ansatz(q, theta):
            q.ry(theta, 0)

        prog = rocq.build(ansatz, 1, sim, 0.0)
        z = rocq.PauliOperator("Z0")
        assert abs(rocq.get_expval(prog, z) - 1.0) < 1e-6
        prog.update_params(np.pi)
        assert abs(rocq.get_expval(prog, z) + 1.0) < 1e-5

    def test_generate_ir(self):
        @rocq.kernel
        def bell(q):
            q.h(0)
            q.cx(0, 1)

        ir_text = bell.generate_ir((2,))
        assert "H" in ir_text and "CNOT" in ir_text

    def test_identity_offset_term(self, sim):
        @rocq.kernel
        def nothing(q):
            pass

        prog = rocq.build(nothing, 2, sim)
        h = rocq.PauliOperator({"I": -1.5, "Z0": 0.25})
        assert abs(rocq.get_expval(prog, h) - (-1.25)) < 1e-6


class TestGradients:
    def test_parameter_shift_matches_analytic(self, sim):
        @rocq.kernel
        def ansatz(q, theta):
            q.ry(theta, 0)

        z = rocq.PauliOperator("Z0")
        theta0 = 0.7
        g = rocq.grad(ansatz, 1, sim, [theta0], z)
        assert abs(g[0] + np.sin(theta0)) < 1e-5

    def test_adjoint_grad_matches_parameter_shift(self, sim):
        @rocq.kernel
        def ansatz(q, t0, t1):
            q.ry(t0, 0)
            q.ry(t1, 1)
            q.cx(0, 1)

        h = rocq.PauliOperator({"Z0 Z1": -1.0, "X0": -0.5})
        params = [0.3, -0.8]
        g_shift = rocq.grad(ansatz, 2, sim, params, h)
        g_adj = rocq.adjoint_grad(ansatz, 2, sim, params, h)
        np.testing.assert_allclose(g_adj, g_shift, atol=1e-4)

    def test_adjoint_grad_value(self, sim):
        @rocq.kernel
        def ansatz(q, theta):
            q.ry(theta, 0)

        z = rocq.PauliOperator("Z0")
        val, g = rocq.adjoint_grad(ansatz, 1, sim, [0.7], z, return_value=True)
        assert abs(val - np.cos(0.7)) < 1e-5
        assert abs(g[0] + np.sin(0.7)) < 1e-5


class TestAdjoint:
    def test_adjoint_kernel_inverts(self, sim):
        @rocq.kernel
        def prep(q):
            q.h(0)
            q.t(0)
            q.s(0)
            q.rx(0.37, 0)
            q.cx(0, 1)

        adj = rocq.adjoint(prep)
        c = rocq.Circuit(2, sim)
        base = getattr(prep, "__wrapped__", prep)
        base(c)
        adj(c)
        psi = c.get_statevector()
        np.testing.assert_allclose(psi, [1, 0, 0, 0], atol=1e-5)

    def test_adjoint_kernel_object(self):
        ir = rocq.trace_kernel(lambda q: (q.h(0), q.t(0))[-1] and None, 1)
        k = rocq.Kernel("prep", ir)
        adj = rocq.adjoint(k)
        assert adj.name == "prep.adj"
        assert len(adj.ir.ops) == len(ir.ops)
        # order reversed and T daggered
        assert adj.ir.ops[0].name == "T" and adj.ir.ops[0].is_adjoint

    def test_adjoint_type_error(self):
        with pytest.raises(TypeError):
            rocq.adjoint(42)


class TestFusionEquivalence:
    def test_fused_equals_unfused(self):
        """Random circuit gives identical state with fusion on/off."""
        rng = np.random.default_rng(5)
        sim1, sim2 = rocq.Simulator(), rocq.Simulator()
        c1 = rocq.Circuit(4, sim1, fuse=True)
        c2 = rocq.Circuit(4, sim2, fuse=False)
        for c in (c1, c2):
            rng = np.random.default_rng(5)
            for _ in range(30):
                kind = rng.integers(0, 5)
                q = int(rng.integers(0, 4))
                q2 = int((q + 1 + rng.integers(0, 3)) % 4)
                if kind == 0:
                    c.h(q)
                elif kind == 1:
                    c.rx(float(rng.normal()), q)
                elif kind == 2:
                    c.cx(q, q2)
                elif kind == 3:
                    c.t(q)
                else:
                    c.crz(float(rng.normal()), q, q2)
        np.testing.assert_allclose(c1.get_statevector(), c2.get_statevector(),
                                   atol=1e-5)


class TestQasm:
    def test_bell_qasm(self):
        @rocq.kernel
        def bell(q):
            q.h(0)
            q.cx(0, 1)

        ir = rocq.trace_kernel(bell, 2)
        from rocquantum_tpu.compiler import to_qasm3
        qasm = to_qasm3(ir)
        assert "OPENQASM 3.0;" in qasm
        assert "h q[0];" in qasm
        assert "cx q[0], q[1];" in qasm
        assert "c = measure q;" in qasm


class TestBatch:
    def test_batched_circuit(self, sim):
        c = rocq.Circuit(2, sim, batch_size=3)
        c.h(0)
        c.cx(0, 1)
        c.flush()
        assert c.state.shape == (3, 4)
        states = c.get_statevector()  # one row per batch element
        assert states.shape == (3, 4)
        np.testing.assert_allclose(np.abs(states[:, 0]), 2**-0.5, atol=1e-6)
        np.testing.assert_allclose(np.abs(states[:, 3]), 2**-0.5, atol=1e-6)

    def test_batched_expval(self, sim):
        c = rocq.Circuit(2, sim, batch_size=3)
        c.h(0)
        c.cx(0, 1)
        vals = c.expval(rocq.PauliOperator("Z0 Z1"))
        assert vals.shape == (3,)
        np.testing.assert_allclose(vals, 1.0, atol=1e-6)

    def test_batched_sampling(self, sim):
        c = rocq.Circuit(2, sim, batch_size=3)
        c.h(0)
        c.cx(0, 1)
        out = c.sample([0, 1], 100)
        assert out.shape == (3, 100)
        assert set(np.unique(out)) <= {0, 3}

    def test_sample_counts_format(self, sim):
        c = rocq.Circuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        counts = c.sample_counts([0, 1], 300)
        assert set(counts) <= {"00", "11"}
        assert sum(counts.values()) == 300


def test_flush_plan_cache_structure_reuse(monkeypatch):
    """Structure-identical flushes skip re-planning (the r3 QFT bench paid
    ~10 ms host planning per flush): same plan object is reused across
    angle values, results stay correct, and pre-existing ParamRefs bypass
    the cache."""
    import numpy as np
    import rocquantum_tpu as rocq
    from rocquantum_tpu import api as api_mod

    sim = rocq.Simulator()

    def build(theta):
        c = rocq.Circuit(3, sim)
        c.h(0)
        c.ry(theta, 1)
        c.cx(0, 2)
        c.flush()
        return c

    api_mod._FLUSH_PLAN_CACHE.clear()
    c1 = build(0.3)
    key1, vals1 = None, None
    c2 = rocq.Circuit(3, sim)
    c2.h(0)
    c2.ry(0.9, 1)
    c2.cx(0, 2)
    key2, vals2 = c2._flush_plan_key()
    assert key2 is not None and vals2 == [0.9]
    assert api_mod._FLUSH_PLAN_CACHE.get(key2) is not None  # hit from c1
    c2.flush()
    # correctness across the cached plan: <Z1> = cos(theta)
    z1_a = c1.expval(rocq.PauliOperator("Z1"))
    z1_b = c2.expval(rocq.PauliOperator("Z1"))
    assert abs(z1_a - np.cos(0.3)) < 1e-5
    assert abs(z1_b - np.cos(0.9)) < 1e-5
    # a queue holding a ParamRef must bypass the plan cache
    from rocquantum_tpu.compiler.ir import ParamRef
    c3 = rocq.Circuit(3, sim)
    c3._enqueue("RY", (1,), (), (ParamRef(0),))
    key3, vals3 = c3._flush_plan_key()
    assert key3 is None and vals3 is None


def test_compile_program_replay_and_sweep():
    """compile_program (the serving hot path): repeat runs replay the
    cached chain with no re-enqueue/re-hash; parameter-value overrides
    sweep without recompiles; results match the per-run Circuit API."""
    import jax.numpy as jnp
    from rocquantum_tpu.compiler.ir import CircuitIR

    n = 4
    ir = CircuitIR(n)
    ir.add("H", [0])
    ir.add("RY", [1], params=[0.3])
    ir.add("CNOT", [2], controls=[0])
    ir.add("RZ", [3], params=[0.5])
    obs = rocq.PauliOperator("Z1")

    prog = rocq.compile_program(ir, rocq.Simulator(seed=2), observable=obs)
    v1 = prog.run()
    v2 = prog.run()  # replay: identical
    assert abs(v1 - v2) < 1e-7
    assert abs(v1 - np.cos(0.3)) < 1e-5

    # parameter sweep: same structure, new values, no re-hash
    assert prog.num_params == 2
    v3 = prog.run([0.9, 0.5])
    assert abs(v3 - np.cos(0.9)) < 1e-5
    with pytest.raises(ValueError):
        prog.run([0.1])  # wrong arity

    # reference: the plain Circuit API
    c = rocq.Circuit(n, rocq.Simulator(seed=2))
    c.h(0)
    c.ry(0.9, 1)
    c.cx(0, 2)
    c.rz(0.5, 3)
    assert abs(v3 - c.expval(obs)) < 1e-6

    # no observable: run() returns the positioned Circuit handle
    prog2 = rocq.compile_program(ir, rocq.Simulator(seed=2))
    h = prog2.run()
    ref = rocq.Circuit(ir.num_qubits, rocq.Simulator())
    for op in ir.ops:
        ref._enqueue(op.name, op.targets, op.controls, op.params, op.matrix,
                     op.is_adjoint)
    ref.flush()
    np.testing.assert_allclose(h.get_statevector(), ref.get_statevector(),
                               atol=1e-6)


def test_compile_program_rejects_param_refs():
    from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef
    ir = CircuitIR(2)
    ir.add("RY", [0], params=[ParamRef(0)])
    with pytest.raises(ValueError):
        rocq.compile_program(ir, rocq.Simulator())
