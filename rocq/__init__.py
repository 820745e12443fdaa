"""``rocq`` — reference-compatible top-level package.

Mirrors the reference's dual use of the name: ``import rocq`` exposes the
CUDA-Q-style DSL (reference rocq/__init__.py), while ``rocq.api`` is the
Simulator/Circuit programming model (reference python/rocq/api.py). Both are
thin aliases onto rocquantum_tpu.
"""

import sys as _sys

# DSL surface (reference rocq/__init__.py:11-15)
from rocquantum_tpu.dsl import (  # noqa: F401
    NoiseModel,
    kernel,
    execute,
    QuantumKernel,
    QuantumOperator,
    HermitianOperator,
    SumOperator,
    get_expectation_value,
    qvec,
    h, x, y, z, s, sdg, t, tdg, rx, ry, rz, cnot, cx, cz, swap, ccx, mcx,
    get_backend,
)

# PauliOperator: the unified main-API class (accepts both the dict form of
# python/rocq/api.py and the ("X0 Y1", coeff) form of rocq/operator.py)
from rocquantum_tpu.api import PauliOperator  # noqa: F401

# main-API surface (so `rocq.Simulator`, `rocq.Circuit`, ... also work, as in
# examples/sampling_example.py which uses rocq.Simulator from `import rocq`)
from rocquantum_tpu.api import (  # noqa: F401
    Simulator,
    Circuit,
    QuantumProgram,
    Kernel,
    build,
    get_expval,
    adjoint,
    grad,
    adjoint_grad,
)

# `import rocq.api as rocq` / `from rocq import api` (reference python/rocq)
from rocquantum_tpu import api  # noqa: F401

_sys.modules[__name__ + ".api"] = api

# `from rocq import backends` (DSL backends)
from rocquantum_tpu.dsl import backends  # noqa: F401

_sys.modules[__name__ + ".backends"] = backends

from rocquantum_tpu.tensornet import TensorNetwork  # noqa: F401
