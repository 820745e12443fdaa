"""Compiler pipeline facade tests (C5/C6/C7 parity surface)."""

import numpy as np
import pytest

from rocquantum_tpu.compiler import Compiler, MLIRCompiler, CircuitIR
from rocquantum_tpu.compiler.passes import FusedBlock


def bell_qasm():
    return "\n".join([
        "OPENQASM 3.0;",
        "qubit[2] q;",
        "bit[2] c;",
        "h q[0];",
        "cx q[0], q[1];",
        "c = measure q;",
    ])


class TestCompiler:
    def test_module_roundtrip(self):
        comp = Compiler()
        assert comp.load_module_from_string(bell_qasm())
        text = comp.get_module_string()
        assert "H" in text and "CNOT" in text

    def test_load_invalid(self):
        comp = Compiler()
        assert not comp.load_module_from_string("not a module")

    def test_emit_qir_llvm_calls(self):
        # port of the reference's example.py:21-27 verification: the QIR
        # text must contain the mangled intrinsic calls
        comp = MLIRCompiler(num_qubits=2)
        qir = comp.emit_qir(bell_qasm())
        assert "__quantum__qis__h__body" in qir
        assert "__quantum__qis__cnot__body" in qir
        assert "call void @__quantum__qis__h__body" in qir
        assert "declare void @__quantum__qis__cnot__body" in qir

    def test_emit_qir_params_adjoint_controls(self):
        from rocquantum_tpu.compiler.ir import ParamRef
        ir = CircuitIR(3, name="k")
        ir.add("RZ", [0], params=[0.5])
        ir.add("RY", [1], params=[ParamRef(0)])
        ir.add("S", [2], is_adjoint=True)
        ir.add("X", [2], controls=[0, 1])  # -> ccx
        comp = Compiler()
        comp.load_module(ir)
        qir = comp.emit_qir()
        assert "call void @__quantum__qis__rz__body(double 5.0" in qir
        assert "define void @k(double %p0)" in qir
        assert "double %p0" in qir and "__quantum__qis__ry__body" in qir
        assert "__quantum__qis__s__adj" in qir
        assert "__quantum__qis__ccx__body" in qir
        # qubit encoding: null for q0, inttoptr otherwise
        assert "%Qubit* null" in qir
        assert "inttoptr (i64 2 to %Qubit*)" in qir

    def test_emit_stablehlo(self):
        comp = MLIRCompiler(num_qubits=2)
        hlo = comp.emit_stablehlo(bell_qasm())
        assert "func" in hlo  # StableHLO module text

    def test_adjoint_pass(self):
        comp = Compiler()
        comp.load_module_from_string(bell_qasm())
        assert comp.run_adjoint_generation_pass()
        adj = comp.adjoint_module
        assert adj.ops[0].name == "CNOT"
        assert adj.ops[-1].name == "H"

    def test_fusion_pass_inspection(self):
        ir = CircuitIR(2)
        ir.add("H", [0])
        ir.add("T", [0])
        ir.add("CNOT", [1], controls=[0])
        comp = Compiler()
        comp.load_module(ir)
        plan = comp.run_fusion_pass()
        assert any(isinstance(p, FusedBlock) for p in plan)

    def test_compile_and_execute(self):
        import jax
        import jax.numpy as jnp
        from rocquantum_tpu.ops import statevec as sv

        comp = Compiler()
        comp.load_module_from_string(bell_qasm())
        fn = comp.compile(donate=False)
        out = fn(jax.jit(lambda: sv.init_state(2))(),
                 jnp.zeros((0,), jnp.float32))
        psi = np.asarray(jnp.real(out))
        assert abs(psi[0] - 2**-0.5) < 1e-6
        assert abs(psi[3] - 2**-0.5) < 1e-6


class TestSliceReadback:
    def test_statevector_slice(self):
        import rocquantum_tpu as rocq
        c = rocq.Circuit(3, rocq.Simulator())
        c.h(0)
        c.cx(0, 1)
        full = c.get_statevector()
        sl = c.get_statevector_slice(2, 4)
        np.testing.assert_allclose(sl, full[2:6], atol=1e-7)
        with pytest.raises(ValueError):
            c.get_statevector_slice(6, 4)

    def test_create_device_matrix(self):
        import rocquantum_tpu as rocq
        sim = rocq.Simulator()
        mat = sim.create_device_matrix(np.array([[0, 1], [1, 0]],
                                                np.complex64))
        assert mat.shape == (2, 2)
        with pytest.raises(TypeError):
            sim.create_device_matrix([[0, 1], [1, 0]])
