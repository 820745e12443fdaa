"""``rocq_hip`` — binding-name compatibility shim (B3).

The reference exposed a pybind11 module of this name
(reference: rocquantum/src/python/py_hip_density_mat.cpp —
DensityMatrixState :44-97, Pauli enum :99-103). User code importing it gets
the JAX-backed density-matrix state.
"""

from rocquantum_tpu.density_state import DensityMatrixState, Pauli  # noqa: F401
