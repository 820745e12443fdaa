"""``rocquantum_bind`` — binding-name compatibility shim (B2).

The reference exposed a pybind11 module of this name
(reference: bindings.cpp — MLIRCompiler :17-29, QuantumSimulator with modern
+ legacy API :31-102, QSim alias :105). User code importing it gets the
JAX-backed equivalents.
"""

from rocquantum_tpu.simulator import QuantumSimulator, QSim  # noqa: F401
from rocquantum_tpu.compiler.pipeline import MLIRCompiler  # noqa: F401
