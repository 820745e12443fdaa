"""Kernel -> portable compiler IR (reference example.py: kernel.qir()
emitting QIR with __quantum__qis__h__body calls; here the lowering target is
StableHLO — the portable IR of the XLA stack)."""

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

    # lowering to StableHLO (the QIR analog)
    hlo = bell.qir()
    assert "func" in hlo
    print(f"\nStableHLO module: {len(hlo.splitlines())} lines")

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
