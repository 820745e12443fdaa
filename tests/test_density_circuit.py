"""DensityCircuit (main-API noise-capable circuit handle) tests."""

import numpy as np
import pytest

import rocquantum_tpu as rocq
from rocquantum_tpu.density_circuit import DensityCircuit
from rocquantum_tpu.dsl import NoiseModel


class TestDensityCircuit:
    def test_bell(self):
        c = DensityCircuit(2, rocq.Simulator())
        c.h(0)
        c.cx(0, 1)
        rho = c.get_density_matrix()
        psi = np.zeros(4, complex)
        psi[0] = psi[3] = 2**-0.5
        np.testing.assert_allclose(rho, np.outer(psi, psi.conj()), atol=1e-6)
        assert abs(c.purity() - 1.0) < 1e-5

    def test_noise_model_attachment(self):
        noise = NoiseModel()
        noise.add_channel("depolarizing", 0.1)
        c = DensityCircuit(1, rocq.Simulator(), noise_model=noise)
        c.ry(0.9, 0)
        expected = np.cos(0.9) * (1 - 4 * 0.1 / 3)
        assert abs(c.expval(rocq.PauliOperator("Z0")) - expected) < 1e-6
        assert c.purity() < 1.0

    def test_explicit_channel_and_kraus(self):
        c = DensityCircuit(1, rocq.Simulator())
        c.x(0)
        c.apply_channel("amplitude_damping", 0.25, [0])
        rho = c.get_density_matrix()
        np.testing.assert_allclose(rho, np.diag([0.25, 0.75]), atol=1e-6)

        c2 = DensityCircuit(1, rocq.Simulator())
        p = 0.2
        c2.apply_kraus([np.sqrt(1 - p) * np.eye(2),
                        np.sqrt(p) * np.array([[0, 1], [1, 0]])], [0])
        np.testing.assert_allclose(c2.get_density_matrix(),
                                   np.diag([1 - p, p]), atol=1e-6)

    def test_measure_and_collapse(self):
        sim = rocq.Simulator(seed=4)
        c = DensityCircuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        outcome, prob = c.measure(0)
        assert abs(prob - 0.5) < 1e-6
        # post-collapse the two qubits are perfectly correlated
        out = c.sample([0, 1], 200)
        assert set(np.unique(out)) == {0 if outcome == 0 else 3}

    def test_sampling_noisy(self):
        c = DensityCircuit(1, rocq.Simulator(seed=1))
        c.x(0)
        c.apply_channel("bit_flip", 0.3, [0])
        out = c.sample([0], 4000)
        frac1 = np.mean(out)
        assert abs(frac1 - 0.7) < 0.05

    def test_parameter_cache_structure(self):
        # two circuits differing only in angles share a compiled program
        from rocquantum_tpu.density_circuit import _DM_RUN_CACHE
        before = len(_DM_RUN_CACHE)
        for theta in (0.1, 0.2, 0.3):
            c = DensityCircuit(1, rocq.Simulator())
            c.ry(theta, 0)
            c.flush()
        assert len(_DM_RUN_CACHE) == before + 1

    def test_unitary_matrix_op(self):
        c = DensityCircuit(1, rocq.Simulator())
        c.apply_unitary([0], np.array([[0, 1], [1, 0]]))
        np.testing.assert_allclose(c.get_density_matrix(),
                                   np.diag([0, 1]), atol=1e-6)


class TestFusedGateRuns:
    def test_gate_runs_match_dense_path_with_pallas(self, monkeypatch):
        """Unitary runs route through the fused interpreter on the 2n-qubit
        view (incl. the Pallas kernel in interpret mode): rho must equal the
        per-gate dense path, mid-run channels included."""
        monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
        import rocquantum_tpu as rocq
        from rocquantum_tpu.density_circuit import DensityCircuit

        def build(env_on):
            sim = rocq.Simulator()
            c = DensityCircuit(8, sim)   # 2n = 16-qubit view
            for q in range(8):
                c.ry(0.1 * (q + 1), q)
            c.s(1)
            c.t(2)
            c.y(3)
            for q in range(7):
                c.cx(q, q + 1)
            c.apply_channel("depolarizing", 0.02, [0])
            c.rz(0.7, 4)
            c.rx(-0.3, 5)
            c.crz(0.4, 0, 6)
            c.flush()
            return c.get_density_matrix()

        with_pallas = build(True)
        monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
        from rocquantum_tpu.density_circuit import _DM_RUN_CACHE
        _DM_RUN_CACHE.clear()
        without = build(False)
        np.testing.assert_allclose(with_pallas, without, atol=1e-5)
        # physicality: trace 1, hermitian
        assert abs(np.trace(with_pallas) - 1.0) < 1e-5
        np.testing.assert_allclose(with_pallas,
                                   with_pallas.conj().T, atol=1e-5)


def test_long_queue_flush_segments_into_chained_programs():
    """A queue past the per-program op budget flushes as a CHAIN of jitted
    programs (one >300-op program OOM-kills the remote compile service) and
    matches the reference computed directly on rho."""
    import jax
    import rocquantum_tpu as rocq
    from rocquantum_tpu.density_circuit import DensityCircuit
    from rocquantum_tpu.ops import density as dmops

    n = 3
    dc = DensityCircuit(n, rocq.Simulator())
    rho = jax.jit(lambda: dmops.init_density(n))()
    rng = np.random.default_rng(0)
    for i in range(120):  # gates cost 2, channels 4: ~10 segments
        q = int(rng.integers(0, n))
        th = float(rng.normal())
        dc.ry(th, q)
        rho = dmops.apply_gate_dm(rho, "RY", [q], [], [th])
        if i % 5 == 0:
            dc.apply_channel("depolarizing", 0.02, [q])
            rho = dmops.apply_channel(rho, "depolarizing", 0.02, [q])
    dc.flush()
    got = np.asarray(dmops.to_matrix(dc.state))
    want = np.asarray(dmops.to_matrix(rho))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pass_budget_split_shape(monkeypatch):
    """Pass-aware segmentation (ROADMAP "compile-helper OOM"): at the TPU
    bench workload shape (n=13 rho), the fused-kernel flush splits into
    programs whose PLANNED kernel-pass count stays within the budget.
    Host-side planning only — no execution at 2n=26 on CPU."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    import rocquantum_tpu as rocq
    from rocquantum_tpu.compiler.interpreter import planned_pass_count
    from rocquantum_tpu.density_circuit import DensityCircuit

    n = 13
    dc = DensityCircuit(n, rocq.Simulator())
    for _ in range(2):
        for q in range(n):
            dc.ry(0.3 + 0.01 * q, q)
        for q in range(n):
            dc.apply_channel("depolarizing", 0.02, [q])
    queue = list(dc._queue)
    subs = dc._split_chunk_by_passes(queue)
    assert len(subs) > 1
    budget = dc._PASS_BUDGET
    for sub in subs:
        ops = []
        for item in sub:
            ops.extend(dc._item_ops_2n(item) or [])
        assert planned_pass_count(ops, 2 * n) <= budget
    # the split is a partition in order
    assert [i for s in subs for i in s] == queue


def test_pass_budget_split_matches_unsplit(monkeypatch):
    """A budget of 0 forces a split at every planned kernel pass; the
    resulting program chain must match the unsplit einsum path."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ROCQ_DM_PASS_BUDGET", "0")
    import rocquantum_tpu as rocq
    from rocquantum_tpu.density_circuit import DensityCircuit, _DM_RUN_CACHE

    n = 8  # 2n = 16-qubit view: above the kernel threshold
    sim = rocq.Simulator()

    def build():
        dc = DensityCircuit(n, sim)
        for q in range(n):
            dc.ry(0.3 + 0.01 * q, q)
        for q in range(n):
            dc.apply_channel("depolarizing", 0.02, [q])
        return dc

    dc = build()
    assert len(dc._split_chunk_by_passes(list(dc._queue))) > 1
    dc.flush()
    split_rho = dc.get_density_matrix()

    monkeypatch.delenv("ROCQ_DM_PASS_BUDGET")
    monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
    _DM_RUN_CACHE.clear()
    dc2 = build()
    dc2.flush()
    np.testing.assert_allclose(split_rho, dc2.get_density_matrix(),
                               atol=1e-5)


def test_fused_pair_split_chain(monkeypatch):
    """The pass-budget split rides the f32 (re, im) pair carry ACROSS the
    sub programs (_flush_subs_fused_pair): verify it engages, that the
    conjugate-side sign handling (RZ negate, U3 mixed, S->SDG baked) is
    right, and that entering with an existing complex rho works."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ROCQ_DM_PASS_BUDGET", "0")
    import rocquantum_tpu as rocq
    from rocquantum_tpu import density_circuit as dcm

    n = 8
    sim = rocq.Simulator()

    def load(dc):
        for q in range(n):
            dc.h(q)
        for q in range(n):
            dc.rz(0.2 + 0.03 * q, q)
        dc._enqueue("U3", (1,), (), (0.4, 0.5, 0.6))
        dc.s(2)
        for q in range(0, n - 1, 2):
            dc.cx(q, q + 1)
        for q in range(n):
            dc.apply_channel("phase_flip", 0.05, [q])

    engaged = {}
    orig = dcm.DensityCircuit._exec_pair32_plan

    def spy(self, plan, qvalues):
        engaged["subs"] = len(plan[0])
        return orig(self, plan, qvalues)

    monkeypatch.setattr(dcm.DensityCircuit, "_exec_pair32_plan", spy)
    dc = dcm.DensityCircuit(n, sim)
    load(dc)
    dc.flush()
    assert engaged.get("subs", 0) > 1  # the fused-pair chain actually ran
    # second flush enters with an existing complex rho
    dc.ry(0.7, 0)
    dc.rz(-0.1, 3)
    dc.apply_channel("depolarizing", 0.02, [0])
    rho_fused = dc.get_density_matrix()

    monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
    monkeypatch.delenv("ROCQ_DM_PASS_BUDGET")
    dcm._DM_RUN_CACHE.clear()
    dc2 = dcm.DensityCircuit(n, sim)
    load(dc2)
    dc2.flush()
    dc2.ry(0.7, 0)
    dc2.rz(-0.1, 3)
    dc2.apply_channel("depolarizing", 0.02, [0])
    np.testing.assert_allclose(rho_fused, dc2.get_density_matrix(),
                               atol=1e-5)
    tr = np.trace(rho_fused)
    assert abs(tr - 1.0) < 1e-5


def test_density_df64_plan(monkeypatch):
    """Density df64 (VERDICT r4 #4): in ``set_precision("df64")`` mode the
    flush compiles the 2n-view item stream onto the double-float engine
    (compile_df64_fused_ir through _build_pair32_plan), carrying rho as
    the exact-f64 pair — and matches the exact pairdm engine to df64
    accuracy. The circuit is kept SHORT: the per-op df64 fallback's
    XLA:CPU compile cost is super-linear in gate count (bench.py guard)."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    import jax.numpy as jnp
    import rocquantum_tpu as rocq
    from rocquantum_tpu import config
    from rocquantum_tpu import density_circuit as dcm

    n = 3
    old = config.get_precision()
    config.set_precision("df64")
    try:
        engaged = {}
        orig = dcm.DensityCircuit._exec_pair32_plan

        def spy(self, plan, qvalues):
            engaged["mode"] = plan[2]
            return orig(self, plan, qvalues)

        monkeypatch.setattr(dcm.DensityCircuit, "_exec_pair32_plan", spy)

        def load(dc):
            dc.h(0)
            dc.ry(0.3, 1)
            dc.cx(0, 2)
            dc.rz(0.4, 2)
            dc.apply_channel("depolarizing", 0.05, [1])

        dc = dcm.DensityCircuit(n, rocq.Simulator(seed=1))
        load(dc)
        dc.flush()
        assert engaged.get("mode") == "df64", engaged
        assert isinstance(dc._rho, tuple)
        assert dc._rho[0].dtype == jnp.float64
        z = dc.expval(rocq.PauliOperator("Z0"))

        # exact pairdm reference (same precision contract, no df64 engine)
        config.set_precision("double")
        dc2 = dcm.DensityCircuit(n, rocq.Simulator(seed=1))
        load(dc2)
        dc2.flush()
        z2 = dc2.expval(rocq.PauliOperator("Z0"))
        assert abs(z - z2) < 1e-10, (z, z2)
        np.testing.assert_allclose(dc.get_density_matrix(),
                                   dc2.get_density_matrix(), atol=1e-10)
    finally:
        config.set_precision(old)
