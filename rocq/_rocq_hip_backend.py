"""``rocq._rocq_hip_backend`` — binding-name compatibility shim (B1 subset).

The reference's main pybind11 module (reference: python/rocq/bindings.cpp)
exposed handles, device buffers, per-gate apply functions, and the tensor-
network objects. The rebuilt rocq API talks to the JAX engines natively, so
this shim provides the subset that reference user code touches directly
(examples/slicing_example.py and friends): status enum, handle, GateOp,
RocTensor / RocTensorNetwork, and statevector readback.
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np

from rocquantum_tpu.compiler.ir import GateOp  # noqa: F401  (B1 GateOp :685)
from rocquantum_tpu.compiler.passes import plan_fusion as _plan_fusion
from rocquantum_tpu.compiler.pipeline import MLIRCompiler  # noqa: F401
from rocquantum_tpu.tensornet import Tensor, TensorNetwork, tensor_svd  # noqa: F401


class rocqStatus(enum.Enum):
    SUCCESS = 0
    ERROR_INVALID_VALUE = 1
    ERROR_ALLOCATION = 2
    NOT_IMPLEMENTED = 3


class RocsvHandle:
    """Opaque simulator handle (bindings.cpp:101-139). JAX owns device
    state; the handle carries configuration only."""

    def __init__(self):
        from rocquantum_tpu.api import Simulator
        self.simulator = Simulator()

    def get_num_gpus(self) -> int:
        import jax
        return len(jax.devices())


class RocTensor:
    """Labeled tensor handle (bindings.cpp:497): dims now, data optional,
    labels assigned as an attribute (reference slicing_example.py style)."""

    def __init__(self, dims: List[int], py_data_np_array: Optional[np.ndarray] = None):
        self.dims = list(dims)
        self.labels: List[str] = []
        self._data = py_data_np_array

    def materialize(self) -> Tensor:
        data = self._data
        if data is None:
            rng = np.random.default_rng(0)
            data = rng.normal(size=self.dims).astype(np.complex64) \
                if self.dims else np.zeros((), np.complex64)
        return Tensor.from_numpy(np.asarray(data), list(self.labels))


class RocTensorNetwork:
    """Tensor-network handle (bindings.cpp:640) with dict-config contract."""

    def __init__(self, handle: Optional[RocsvHandle] = None):
        self.handle = handle
        self._tn = TensorNetwork()

    def add_tensor(self, tensor: RocTensor):
        self._tn.add_tensor(tensor.materialize())

    def contract(self, optimizer_config=None, result: Optional[RocTensor] = None):
        out = self._tn.contract(optimizer_config)
        if result is not None:
            result.dims = list(out.shape)
            result.labels = list(out.labels)
            result._data = out.to_numpy()
        return out

    @property
    def last_num_slices(self):
        return self._tn.last_num_slices


def rocTensorNetworkAddTensor(tn: RocTensorNetwork, tensor: RocTensor):
    tn.add_tensor(tensor)
    return rocqStatus.SUCCESS


def rocTensorNetworkContract(tn: RocTensorNetwork, config, result: RocTensor):
    tn.contract(config, result)
    return rocqStatus.SUCCESS


class GateFusion:
    """CPU-side fusion planner handle (bindings.cpp:685-699; GateFusion.cpp).
    processQueue returns the fused plan rather than mutating device state."""

    def process_queue(self, ops, max_fuse: int = 2):
        return _plan_fusion(list(ops), max_fuse=max_fuse)

    processQueue = process_queue


def get_state_vector(handle, circuit_or_state, num_elements: int = None):
    """Statevector readback (bindings.cpp:466-485)."""
    if hasattr(circuit_or_state, "get_statevector"):
        return circuit_or_state.get_statevector()
    raise TypeError("pass a Circuit")
