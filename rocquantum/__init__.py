"""``rocquantum`` — reference-compatible top-level package.

Covers the reference's third front-end flavor (``import rocquantum as
rocq``, examples/vqe_h2.py): the DSL kernel decorator + free gates at top
level, plus ``get_expval(kernel, pauli_string, params)`` /
``grad(kernel, pauli_string, params)`` taking positional Pauli strings
('ZZ', 'XX' — character i acts on qubit i). Submodules mirror the reference
package layout (circuit, core, backends, solvers, qec, utils,
python.rocq).
"""

import sys as _sys

import numpy as _np

from rocquantum_tpu.dsl import (  # noqa: F401
    kernel, execute, QuantumKernel, NoiseModel, qvec,
    h, x, y, z, s, sdg, t, tdg, rx, ry, rz, cnot, cx, cz, swap, ccx, mcx,
)
from rocquantum_tpu.dsl.backends import get_backend, StateVectorBackend


def _positional_ops(pauli_string: str):
    ops = []
    for i, p in enumerate(pauli_string.strip().upper()):
        if p == "I":
            continue
        if p not in "XYZ":
            raise ValueError(f"Invalid Pauli '{p}' in '{pauli_string}'")
        ops.append((p, i))
    return ops


def _run_kernel(kernel_obj: QuantumKernel, params):
    be = get_backend("state_vector", max(kernel_obj.num_qubits, 1))
    bindings = dict(zip(kernel_obj.param_names, [list(params)]
                        if len(kernel_obj.param_names) == 1 else list(params)))
    for g in kernel_obj.bound_sequence(bindings):
        be.apply_gate(g["op"], g["targets"], g["params"])
    return be


def get_expval(kernel_obj: QuantumKernel, pauli_string: str, params) -> float:
    """<P> for a positional Pauli string after running the kernel
    (reference examples/vqe_h2.py:99 usage)."""
    be = _run_kernel(kernel_obj, params)
    ops = _positional_ops(pauli_string)
    return be.expectation_pauli(ops) if ops else 1.0


def grad(kernel_obj: QuantumKernel, pauli_string: str, params):
    """Parameter-shift gradient of get_expval w.r.t. each parameter
    (reference examples/vqe_h2.py:120 usage)."""
    params = _np.asarray(params, dtype=float)
    out = _np.zeros_like(params)
    for i in range(len(params)):
        plus = params.copy()
        plus[i] += _np.pi / 2
        minus = params.copy()
        minus[i] -= _np.pi / 2
        out[i] = 0.5 * (get_expval(kernel_obj, pauli_string, plus)
                        - get_expval(kernel_obj, pauli_string, minus))
    return out


# --- submodule aliases matching the reference package layout -------------
# Eagerly import the full rocquantum_tpu tree and alias every module under
# this package name, so deep imports like
# `from rocquantum.qec.codes.repetition_code import ...` work AND the loaded
# modules keep their true __package__ (their own relative imports resolve
# against rocquantum_tpu, not this shim).
import importlib as _importlib  # noqa: E402
import pkgutil as _pkgutil  # noqa: E402

import rocquantum_tpu as _rtpu  # noqa: E402

for _m in _pkgutil.walk_packages(_rtpu.__path__, "rocquantum_tpu."):
    try:
        _importlib.import_module(_m.name)
    except ImportError:
        pass  # optional deps (qiskit/cirq/pennylane plugins)
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("rocquantum_tpu.") and _mod is not None:
        _sys.modules.setdefault("rocquantum" + _name[len("rocquantum_tpu"):],
                                _mod)

from rocquantum_tpu import qcircuit as circuit  # noqa: E402
from rocquantum_tpu import core  # noqa: E402
from rocquantum_tpu import backends  # noqa: E402
from rocquantum_tpu import solvers  # noqa: E402
from rocquantum_tpu import qec  # noqa: E402
from rocquantum_tpu import utils  # noqa: E402
from rocquantum_tpu import api as _api  # noqa: E402

_sys.modules[__name__ + ".circuit"] = circuit
_sys.modules[__name__ + ".core"] = core
_sys.modules[__name__ + ".backends"] = backends
_sys.modules[__name__ + ".solvers"] = solvers
_sys.modules[__name__ + ".qec"] = qec
_sys.modules[__name__ + ".utils"] = utils

# reference import path `rocquantum.python.rocq` (qec/framework.py:19,
# solvers/vqe_solver.py:16) = the main programming model
import types as _types

_python_pkg = _types.ModuleType(__name__ + ".python")
_python_pkg.rocq = _api
_sys.modules[__name__ + ".python"] = _python_pkg
_sys.modules[__name__ + ".python.rocq"] = _api

QuantumCircuit = circuit.QuantumCircuit
set_target = core.set_target
get_active_backend = core.get_active_backend
