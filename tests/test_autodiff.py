"""O(1)-memory reversible adjoint differentiation tests: the custom-VJP
sweep must match plain reverse-mode AD (which stores every intermediate)
and the analytic values."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import rocquantum_tpu as rocq
from rocquantum_tpu.autodiff import make_reversible_execute, reversible_energy_fn
from rocquantum_tpu.compiler.ir import CircuitIR, GateOp, ParamRef
from rocquantum_tpu.compiler.interpreter import execute
from rocquantum_tpu.ops import statevec as sv


def build_ops(n, depth, seed):
    rng = np.random.default_rng(seed)
    ops, k = [], 0
    for _ in range(depth):
        kind = rng.integers(0, 3)
        q = int(rng.integers(0, n))
        q2 = int((q + 1 + rng.integers(0, n - 1)) % n)
        if kind == 0:
            ops.append(GateOp(str(rng.choice(["RX", "RY", "RZ"])), (q,), (),
                              (ParamRef(k),)))
            k += 1
        elif kind == 1:
            ops.append(GateOp("H", (q,), ()))
        else:
            ops.append(GateOp("CNOT", (q2,), (q,)))
    return ops, k


class TestReversibleVJP:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_plain_autodiff(self, seed):
        n = 5
        ops, n_params = build_ops(n, 14, seed)
        if n_params == 0:
            pytest.skip("no parameters drawn")
        run = make_reversible_execute(ops)
        rng = np.random.default_rng(seed + 50)
        params = jnp.asarray(rng.normal(size=n_params), jnp.float32)

        def loss_rev(p):
            s = sv.init_state(n)
            s = run(s, p)
            return sv.expval_z(s, 0) + 0.5 * sv.expval_pauli_string(
                s, [("X", 1)])

        def loss_plain(p):
            s = sv.init_state(n)
            s = execute(s, ops, p, fuse=False, use_pallas=False)
            return sv.expval_z(s, 0) + 0.5 * sv.expval_pauli_string(
                s, [("X", 1)])

        v_rev, g_rev = jax.value_and_grad(loss_rev)(params)
        v_plain, g_plain = jax.value_and_grad(loss_plain)(params)
        assert abs(float(v_rev) - float(v_plain)) < 1e-6
        np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_plain),
                                   atol=2e-5, err_msg=f"seed={seed}")

    def test_analytic_single_ry(self):
        ops = [GateOp("RY", (0,), (), (ParamRef(0),))]
        run = make_reversible_execute(ops)

        def loss(p):
            s = sv.init_state(1)
            return sv.expval_z(run(s, p), 0)

        theta = 0.7
        g = jax.grad(loss)(jnp.asarray([theta], jnp.float32))
        assert abs(float(g[0]) + np.sin(theta)) < 1e-6

    def test_shared_parameter(self):
        # one slot used by two gates: gradients must accumulate
        ops = [GateOp("RY", (0,), (), (ParamRef(0),)),
               GateOp("RY", (0,), (), (ParamRef(0),))]
        run = make_reversible_execute(ops)

        def loss(p):
            return sv.expval_z(run(sv.init_state(1), p), 0)

        theta = 0.3
        g = jax.grad(loss)(jnp.asarray([theta], jnp.float32))
        # <Z> = cos(2 theta) -> d/dtheta = -2 sin(2 theta)
        assert abs(float(g[0]) + 2 * np.sin(2 * theta)) < 1e-5


class TestReversibleEnergy:
    def test_vqe_energy_and_grad(self):
        @rocq.kernel
        def ansatz(q, t0, t1, t2, t3):
            q.ry(t0, 0)
            q.ry(t1, 1)
            q.cx(0, 1)
            q.ry(t2, 0)
            q.ry(t3, 1)

        h = rocq.PauliOperator({"I": 0.2333, "Z0": 0.3435, "Z1": -0.4347,
                                "Z0 Z1": 0.5716, "X0 X1": 0.0910,
                                "Y0 Y1": 0.0910})
        energy = reversible_energy_fn(ansatz, 2, h, 4)
        params = jnp.asarray([0.37, -0.21, 0.9, 0.05], jnp.float32)
        v, g = jax.value_and_grad(energy)(params)
        # cross-check with the standard adjoint path
        sim = rocq.Simulator()
        v2, g2 = rocq.adjoint_grad(ansatz, 2, sim,
                                   np.asarray(params), h, return_value=True)
        assert abs(float(v) - v2) < 1e-5
        np.testing.assert_allclose(np.asarray(g), g2, atol=2e-5)
