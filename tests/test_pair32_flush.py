"""The f32 float-pair Circuit flush path (compile_pair32_ir).

When Pallas is available (TPU, or interpret mode here), an f32 unsharded
unbatched Circuit carries its state as a (re, im) float pair — and as
(re, None) while the circuit stays REAL — instead of complex64, removing
the complex<->pair conversion passes and halving HBM traffic. These tests
pin the routing decision, the realness tag through every user-visible
operation (readback, measurement, sampling, expectation), and the
ROCQ_DISABLE_PAIR32 kill switch. Reference surface being mirrored:
python/rocq/api.py Circuit (the engine swap must be invisible).
"""

import numpy as np
import pytest

import rocquantum_tpu as rocq
from rocquantum_tpu.compiler.interpreter import clear_cache

N = 15  # >= COL_QUBITS + 3 so the Pallas engine engages


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    clear_cache()
    yield
    clear_cache()


def _build_real(c):
    for q in range(N):
        c.ry(0.1 + 0.05 * q, q)
    for q in range(N - 1):
        c.cx(q, q + 1)


def _reference_state(build, monkeypatch):
    monkeypatch.setenv("ROCQ_DISABLE_PAIR32", "1")
    clear_cache()
    c = rocq.Circuit(N, rocq.Simulator())
    build(c)
    psi = np.asarray(c.get_statevector())
    monkeypatch.delenv("ROCQ_DISABLE_PAIR32")
    clear_cache()
    return psi


def test_real_circuit_carries_single_plane(monkeypatch):
    expected = _reference_state(_build_real, monkeypatch)
    c = rocq.Circuit(N, rocq.Simulator())
    assert c._use_pair()  # f32 + pallas => pair carry
    _build_real(c)
    c.flush()
    re, im = c._state
    assert re.dtype == np.float32
    assert im is None  # RY/CNOT circuits are real: single-plane carry
    np.testing.assert_allclose(np.asarray(c.get_statevector()), expected,
                               atol=1e-5)


def test_complex_gate_materializes_imag_plane(monkeypatch):
    def build(c):
        _build_real(c)
        c.s(0)
        c.rz(0.3, 1)

    expected = _reference_state(build, monkeypatch)
    c = rocq.Circuit(N, rocq.Simulator())
    build(c)
    c.flush()
    re, im = c._state
    assert im is not None
    np.testing.assert_allclose(np.asarray(c.get_statevector()), expected,
                               atol=1e-5)


def test_measure_sample_expval_on_real_carry():
    sim = rocq.Simulator(seed=3)
    c = rocq.Circuit(N, sim)
    _build_real(c)
    # expval + marginals + sampling all run on the (re, None) carry
    z0 = c.expval(rocq.PauliOperator({"Z0": 1.0}))
    assert -1.0 <= z0 <= 1.0
    probs = c.get_probabilities([0, 1])
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    shots = c.sample([0, 1], 50)
    assert shots.shape[0] == 50
    # mid-circuit measurement collapses and STAYS real-carried
    outcome, p = c.measure(0)
    assert outcome in (0, 1)
    re, im = c._state
    assert im is None
    # post-collapse state still normalized
    np.testing.assert_allclose(
        float(np.vdot(np.asarray(c.get_statevector()),
                      np.asarray(c.get_statevector())).real), 1.0,
        atol=1e-5)


def test_disable_pair32_restores_complex_carry(monkeypatch):
    monkeypatch.setenv("ROCQ_DISABLE_PAIR32", "1")
    clear_cache()
    c = rocq.Circuit(N, rocq.Simulator())
    assert not c._use_pair()
    _build_real(c)
    c.flush()
    assert not isinstance(c._state, tuple)  # complex array, not a pair
