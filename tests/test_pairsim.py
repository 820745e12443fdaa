"""Float-pair (fp64-safe) simulation path: equivalence vs the complex
engine, and pair-mode adjoint gradients (the chemistry-accuracy path the
TPU x64 rewriter forces — see ops/pairsim.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu import config
from rocquantum_tpu.compiler.ir import CircuitIR
from rocquantum_tpu.compiler.interpreter import execute
from rocquantum_tpu.ops import pairsim
from rocquantum_tpu.ops import statevec as sv


@pytest.fixture
def double_precision():
    old = config.get_precision()
    config.set_precision("double")
    yield
    config.set_precision(old)


def _random_ir(n, rng, depth=30):
    ir = CircuitIR(n)
    for _ in range(depth):
        kind = rng.integers(0, 6)
        q = int(rng.integers(0, n))
        q2 = int((q + 1 + rng.integers(0, n - 1)) % n)
        if kind == 0:
            ir.add(str(rng.choice(["H", "X", "Y", "Z", "S", "T"])), [q])
        elif kind == 1:
            ir.add(str(rng.choice(["RX", "RY", "RZ", "P"])), [q],
                   params=[float(rng.normal())])
        elif kind == 2:
            ir.add("CNOT", [q2], controls=[q])
        elif kind == 3:
            ir.add("U3", [q], params=[float(rng.normal()),
                                      float(rng.normal()),
                                      float(rng.normal())])
        elif kind == 4:
            ir.add("RZZ", [q, q2], params=[float(rng.normal())])
        else:
            ir.add("RY", [q2], controls=[q], params=[float(rng.normal())])
    return ir


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pair_matches_complex_engine(seed, double_precision):
    n = 5
    rng = np.random.default_rng(seed)
    ir = _random_ir(n, rng)

    state = jax.jit(lambda: execute(sv.init_state(n), list(ir.ops), None,
                                    use_pallas=False))()
    re, im = pairsim.init_pair(n)

    def run_pair(re, im):
        for op in ir.ops:
            re, im = pairsim.apply_op_pair(re, im, op)
        return re, im

    re, im = jax.jit(run_pair)(re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, np.asarray(state), atol=1e-12)


def test_pair_adjoint_ops(double_precision):
    from rocquantum_tpu.compiler.ir import GateOp
    n = 3
    rng = np.random.default_rng(3)
    fwd = [GateOp("U3", (0,), (), (0.3, 0.7, 0.2)),
           GateOp("RZ", (1,), (2,), (0.5,)),
           GateOp("S", (2,))]
    re, im = pairsim.init_pair(n)
    re, im = jax.jit(lambda r, i: pairsim.apply_op_pair(
        *pairsim.apply_op_pair(r, i, fwd[0]), fwd[1]))(re, im)
    # apply op then its adjoint: identity
    for op in fwd:
        adj = GateOp(op.name, op.targets, op.controls, op.params,
                     op.matrix, is_adjoint=True)
        r2, i2 = jax.jit(lambda r, i: pairsim.apply_op_pair(
            *pairsim.apply_op_pair(r, i, op), adj))(re, im)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(re),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(im),
                                   atol=1e-12)


def test_pair_expectations_match(double_precision):
    n = 4
    rng = np.random.default_rng(7)
    ir = _random_ir(n, rng, depth=20)
    state = jax.jit(lambda: execute(sv.init_state(n), list(ir.ops), None,
                                    use_pallas=False))()

    def run_pair():
        re, im = pairsim.init_pair(n)
        for op in ir.ops:
            re, im = pairsim.apply_op_pair(re, im, op)
        return re, im

    re, im = jax.jit(run_pair)()
    for string in ([("Z", 0)], [("Z", 0), ("Z", 2)], [("X", 1)],
                   [("Y", 2)], [("X", 0), ("Y", 1), ("Z", 3)]):
        want = float(sv.expval_pauli_string(state, string))
        got = float(jax.jit(lambda r, i: pairsim.expval_pauli_string_pair(
            r, i, string))(re, im))
        assert abs(want - got) < 1e-12, (string, want, got)


def test_energy_fn_pair_mode_gradients(double_precision):
    """make_energy_fn under double precision: the pair program's jax.grad
    matches parameter-shift and the complex-path rocq.grad to 1e-9."""
    h2 = {"I": -0.4804, "Z0": 0.3435, "Z1": -0.4347,
          "Z0 Z1": 0.5716, "X0 X1": 0.0910, "Y0 Y1": 0.0910}

    @rocq.kernel
    def ansatz(q, t0, t1, t2, t3):
        q.ry(t0, 0)
        q.rx(t1, 1)
        q.cx(0, 1)
        q.ry(t2, 0)
        q.rz(t3, 1)

    H = rocq.PauliOperator(h2)
    from rocquantum_tpu.api import make_energy_fn
    energy = make_energy_fn(ansatz, 2, H, 4)
    fn = jax.jit(jax.value_and_grad(energy))
    p = jnp.asarray(np.random.default_rng(0).uniform(0, 6, 4), jnp.float64)
    v, g = fn(p)
    for i in range(4):
        ei = jnp.zeros(4, jnp.float64).at[i].set(np.pi / 2)
        ps = 0.5 * (float(energy(p + ei)) - float(energy(p - ei)))
        assert abs(float(g[i]) - ps) < 1e-9
    gps = rocq.grad(ansatz, 2, rocq.Simulator(), np.asarray(p), H)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gps), atol=1e-9)
