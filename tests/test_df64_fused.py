"""Fused df64 flush path: ``set_precision("df64")`` routes fp64 Circuit
flushes through the compensated-f32 Pallas kernels (interpret mode on CPU)
and matches the exact-f64 pair engine to the df64 accuracy contract
(~1e-13 end-to-end). The route past the fp64 hardware ceiling
(docs/FP64_GUIDE.md); reference parity: the ROCQ_PRECISION_DOUBLE regime
(rocquantum/include/rocquantum/hipStateVec.h:7-15) at fused-kernel speed."""

import numpy as np
import pytest
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu import config
from rocquantum_tpu.compiler.ir import CircuitIR, GateOp
from rocquantum_tpu.compiler.interpreter import (compile_df64_fused_ir,
                                                 execute_df64)
from rocquantum_tpu.ops import df64, pairsim


@pytest.fixture
def df64_mode(monkeypatch):
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    old = config.get_precision()
    config.set_precision("df64")
    yield
    config.set_precision(old)


def test_set_precision_df64_semantics():
    old = config.get_precision()
    try:
        config.set_precision("df64")
        assert config.get_precision() == "double"  # state/readback contract
        assert config.df64_enabled()
        config.set_precision("double")
        assert not config.df64_enabled()
    finally:
        config.set_precision(old)


def _mixed_circuit(c):
    """All fused-kernel spec kinds: U, CNOT, CU, D2 (controlled diag, 1q
    diag, RZZ) across low/mid/high qubits of an n>=15 register."""
    n = c.num_qubits
    c.h(0)
    for q in range(n):
        c.ry(0.1 + 0.05 * q, q)
    c.cx(0, 1)
    c.cx(n - 1, 2)          # free (out-of-window) control
    c.crx(0.37, 3, n - 2)   # CU on a high target
    c.rz(0.21, n - 1)       # 1q diagonal at the top (comm-free D2)
    c.s(4)
    c.cz(1, n - 3)
    c.rzz(0.45, 2, n - 1)
    c.t(n - 4)
    c.swap(1, 2)
    return c


def test_df64_flush_matches_exact_pair_engine(df64_mode):
    n = 15
    c = _mixed_circuit(rocq.Circuit(n, rocq.Simulator(seed=3)))
    psi = c.get_statevector()
    assert isinstance(c._state, tuple)
    assert c._state[0].dtype == jnp.float64

    # same circuit on the exact-f64 pair engine
    config.set_precision("double")
    c2 = _mixed_circuit(rocq.Circuit(n, rocq.Simulator(seed=3)))
    want = c2.get_statevector()
    np.testing.assert_allclose(psi, want, atol=5e-13)


def test_df64_real_circuit_keeps_real_carry(df64_mode):
    n = 15
    c = rocq.Circuit(n, rocq.Simulator(seed=1))
    for q in range(n):
        c.ry(0.2 + 0.03 * q, q)
    for q in range(n - 1):
        c.cx(q, q + 1)
    c.flush()
    assert c._state[1] is None  # all-real circuit: 2-plane carry
    psi = c.get_statevector()

    config.set_precision("double")
    c2 = rocq.Circuit(n, rocq.Simulator(seed=1))
    for q in range(n):
        c2.ry(0.2 + 0.03 * q, q)
    for q in range(n - 1):
        c2.cx(q, q + 1)
    np.testing.assert_allclose(psi, c2.get_statevector(), atol=5e-13)


def test_df64_flush_plan_replay(df64_mode):
    """Second structurally-identical circuit takes the cached flush plan
    (mode 'df64') and still lands on the right state."""
    def build(theta):
        c = rocq.Circuit(15, rocq.Simulator(seed=2))
        for q in range(15):
            c.ry(theta + 0.01 * q, q)
        c.cx(0, 14)
        c.flush()
        return c

    c1 = build(0.3)
    psi1 = c1.get_statevector()
    c2 = build(0.9)           # same structure, new params -> cached plan
    psi2 = c2.get_statevector()
    assert not np.allclose(psi1, psi2)

    config.set_precision("double")
    c3 = rocq.Circuit(15, rocq.Simulator(seed=2))
    for q in range(15):
        c3.ry(0.9 + 0.01 * q, q)
    c3.cx(0, 14)
    np.testing.assert_allclose(psi2, c3.get_statevector(), atol=5e-13)


def test_df64_measurement_and_expval(df64_mode):
    c = rocq.Circuit(15, rocq.Simulator(seed=0))
    c.h(0)
    c.cx(0, 1)
    for q in range(2, 15):
        c.ry(0.11 * q, q)
    h = rocq.PauliOperator({"Z0 Z1": 1.0, "X0 X1": 0.5, "I": 0.25})
    ev = c.expval(h)
    outcome, prob = c.measure(0)
    assert outcome in (0, 1)
    assert abs(prob - 0.5) < 1e-10
    assert abs(ev - (1.0 + 0.5 + 0.25)) < 1e-10  # Bell: ZZ=XX=1


@pytest.mark.parametrize("seed", [11, 12])
def test_execute_df64_fuzz_vs_pair(seed, df64_mode):
    """Random mixed IRs through execute_df64 (fused kernels, interpret)
    match exact sequential pair application."""
    n = 15
    rng = np.random.default_rng(seed)
    names_1q = ["H", "RY", "RZ", "RX", "S", "T", "X", "Z"]
    ir = CircuitIR(n)
    for _ in range(25):
        kind = rng.integers(0, 4)
        q = int(rng.integers(0, n))
        q2 = int((q + 1 + rng.integers(0, n - 1)) % n)
        if kind == 0:
            nm = names_1q[rng.integers(0, len(names_1q))]
            ps = [float(rng.normal())] if nm in ("RY", "RZ", "RX") else []
            ir.add(nm, [q], params=ps)
        elif kind == 1:
            ir.add("CNOT", [q2], controls=[q])
        elif kind == 2:
            ir.add("CRY", [q2], controls=[q], params=[float(rng.normal())])
        else:
            ir.add("CZ", [q2], controls=[q])

    re = jnp.zeros((1 << n,), jnp.float64).at[0].set(1.0)
    im = jnp.zeros((1 << n,), jnp.float64)
    want_re, want_im = re, im
    for op in ir.ops:
        want_re, want_im = pairsim.apply_op_pair(want_re, want_im, op)

    fn = compile_df64_fused_ir(ir)
    got_re, got_im = fn((re, im), jnp.zeros((0,), jnp.float64))
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re),
                               atol=5e-13)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im),
                               atol=5e-13)


def test_execute_df64_without_pallas_falls_back_exact(df64_mode,
                                                      monkeypatch):
    """ROCQ_DISABLE_PALLAS: execute_df64 applies ops via the per-gate df64
    path — same result, no kernels."""
    monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
    n = 6
    ir = CircuitIR(n)
    ir.add("H", [0])
    ir.add("CNOT", [1], controls=[0])
    ir.add("RY", [3], params=[0.7])
    planes = df64.init_df64(n)
    planes = execute_df64(planes, list(ir.ops),
                          jnp.zeros((0,), jnp.float64))
    got_re = df64.promote_f64(planes[0], planes[1])

    re = jnp.zeros((1 << n,), jnp.float64).at[0].set(1.0)
    im = jnp.zeros_like(re)
    for op in ir.ops:
        re, im = pairsim.apply_op_pair(re, im, op)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(re),
                               atol=1e-14)
