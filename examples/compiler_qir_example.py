"""Kernel -> QIR + portable compiler IR (reference example.py: kernel.qir()
emitting LLVM IR with __quantum__qis__h__body calls — reproduced verbatim —
plus the StableHLO lowering of the executable XLA program)."""

from rocquantum_tpu import dsl as rocq
from rocquantum_tpu.compiler import Compiler


def main():
    @rocq.kernel
    def bell():
        q = rocq.qvec(2)
        rocq.h(q[0])
        rocq.cnot(q[0], q[1])

    # textual circuit IR (the MLIR-module analog)
    print(bell.mlir())

    # QIR (LLVM IR) emission — the reference example.py:21-27 verification
    qir = bell.qir()
    print("\n--- Generated QIR (LLVM IR) ---")
    print(qir)
    assert "__quantum__qis__h__body" in qir
    assert "__quantum__qis__cnot__body" in qir
    assert "call void @__quantum__qis__h__body" in qir

    # lowering to StableHLO (the portable IR of the execution path)
    hlo = bell.stablehlo()
    assert "func" in hlo
    print(f"StableHLO module: {len(hlo.splitlines())} lines")

    # the Compiler facade drives the same pipeline from OpenQASM text
    comp = Compiler()
    assert comp.load_module_from_string(
        "OPENQASM 3.0;\nqubit[2] q;\nbit[2] c;\n"
        "h q[0];\ncx q[0], q[1];\nc = measure q;")
    assert comp.run_adjoint_generation_pass()
    print("\nadjoint module:")
    print(comp.adjoint_module.dump())
    print("SUCCESS")


if __name__ == "__main__":
    main()
