"""Aux subsystems: checkpoint/resume, profiling, circuit model zoo."""

import os

import numpy as np
import pytest
import jax

import rocquantum_tpu as rocq
from rocquantum_tpu.models import (ghz_ir, hardware_efficient_ansatz_ir,
                                   qaoa_maxcut_ir, qft_ir, random_circuit_ir)
from rocquantum_tpu.compiler.interpreter import compile_ir
from rocquantum_tpu.ops import statevec as sv
from rocquantum_tpu.utils.checkpoint import (load_metadata, load_state,
                                             restore_circuit_checkpoint,
                                             save_circuit_checkpoint,
                                             save_state)
from rocquantum_tpu.utils.profiling import PhaseTimer


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path):
        path = str(tmp_path / "state.npz")
        import jax.numpy as jnp
        state = jax.jit(lambda: sv.apply_gate(sv.init_state(3), "H", [0]))()
        save_state(path, state, {"tag": "test"})
        loaded = load_state(path)
        np.testing.assert_allclose(np.asarray(jnp.real(loaded)),
                                   np.asarray(jnp.real(state)), atol=1e-7)
        assert load_metadata(path)["tag"] == "test"

    def test_circuit_checkpoint_resume(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        sim = rocq.Simulator()
        c = rocq.Circuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        save_circuit_checkpoint(path, c)

        c2 = rocq.Circuit(2, rocq.Simulator())
        restore_circuit_checkpoint(path, c2)
        np.testing.assert_allclose(c2.get_statevector(), c.get_statevector(),
                                   atol=1e-7)
        # resumed circuit continues evolving
        c2.x(0)
        assert abs(np.linalg.norm(c2.get_statevector()) - 1) < 1e-6

    def test_qubit_mismatch(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        c = rocq.Circuit(2, rocq.Simulator())
        save_circuit_checkpoint(path, c)
        c3 = rocq.Circuit(3, rocq.Simulator())
        with pytest.raises(ValueError):
            restore_circuit_checkpoint(path, c3)

    def test_sharded_checkpoint(self, tmp_path):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from rocquantum_tpu.parallel import make_mesh, sharded_init_state
        path = str(tmp_path / "sharded.npz")
        mesh = make_mesh(8)
        state = sharded_init_state(6, mesh)
        save_state(path, state)
        loaded = load_state(path, mesh=mesh)
        assert len(loaded.sharding.device_set) == 8


class TestProfiling:
    def test_phase_timer(self):
        timer = PhaseTimer()
        with timer.phase("a"):
            pass
        with timer.phase("a"):
            pass
        with timer.phase("b"):
            pass
        s = timer.summary()
        assert s["a"]["count"] == 2
        assert s["b"]["count"] == 1
        timer.reset()
        assert timer.summary() == {}


class TestModels:
    def test_qft_matches_dft(self):
        import jax.numpy as jnp
        n = 6
        rng = np.random.default_rng(0)
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v = (v / np.linalg.norm(v)).astype(np.complex64)
        fn = compile_ir(qft_ir(n), donate=False)

        @jax.jit
        def run(re, im):
            s = (re + 1j * im).astype(jnp.complex64)
            out = fn(s, jnp.zeros((0,), jnp.float32))
            return jnp.real(out), jnp.imag(out)

        re, im = run(jnp.asarray(v.real), jnp.asarray(v.imag))
        got = np.asarray(re) + 1j * np.asarray(im)
        expected = np.fft.ifft(v, norm="ortho")
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_ghz(self):
        import jax.numpy as jnp
        fn = compile_ir(ghz_ir(4), donate=False)
        out = fn(jax.jit(lambda: sv.init_state(4))(),
                 jnp.zeros((0,), jnp.float32))
        psi = np.asarray(jnp.real(out))
        assert abs(psi[0] - 2**-0.5) < 1e-6
        assert abs(psi[15] - 2**-0.5) < 1e-6

    def test_parameterized_families(self):
        import jax.numpy as jnp
        hea = hardware_efficient_ansatz_ir(3, 2)
        assert hea.num_params == 6
        qaoa = qaoa_maxcut_ir(4, 2)
        assert qaoa.num_params == 4
        fn = compile_ir(hea, donate=False)
        out = fn(jax.jit(lambda: sv.init_state(3))(),
                 jnp.zeros((6,), jnp.float32))
        assert abs(float(jnp.sum(jnp.abs(out) ** 2)) - 1) < 1e-5

    def test_random_circuit_norm(self):
        import jax.numpy as jnp
        ir = random_circuit_ir(4, 10, seed=3)
        ops, values = __import__(
            "rocquantum_tpu.compiler.interpreter",
            fromlist=["parametrize"]).parametrize(ir.ops)
        from rocquantum_tpu.compiler.ir import CircuitIR
        fn = compile_ir(CircuitIR(4, ops), donate=False)
        out = fn(jax.jit(lambda: sv.init_state(4))(),
                 jnp.asarray(values, jnp.float32))
        assert abs(float(jnp.sum(jnp.abs(out) ** 2)) - 1) < 1e-5


import jax.numpy as jnp  # noqa: E402
