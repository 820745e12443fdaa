"""Basic tensor-network contraction (reference examples/tensornet_example.py)."""

import numpy as np

import rocquantum_tpu as rocq
from rocquantum_tpu.tensornet import TensorNetwork


def main():
    sim = rocq.Simulator()
    tn = TensorNetwork(simulator=sim)

    tensor_a = np.random.rand(2, 2).astype(np.complex64)
    tensor_b = np.random.rand(2, 2).astype(np.complex64)
    tn.add_tensor(tensor_a, ["a", "b"])
    tn.add_tensor(tensor_b, ["b", "c"])

    result = tn.contract()
    print(result)
    assert np.allclose(result.to_numpy(), tensor_a @ tensor_b, atol=1e-5)
    print("SUCCESS")


if __name__ == "__main__":
    main()
