"""Memory-limited contraction with slicing (reference
examples/slicing_example.py: a 1KB-ish limit forces the pathfinder to slice;
unlike the reference — which stopped at NOT_IMPLEMENTED — the sliced
contraction executes and matches the unsliced result)."""

import numpy as np

from rocquantum_tpu.tensornet import TensorNetwork


def run_slicing_example():
    rng = np.random.default_rng(0)
    t0 = rng.normal(size=(2, 2, 2, 16)).astype(np.complex64)
    t1 = rng.normal(size=(16, 2, 2, 16)).astype(np.complex64)
    t2 = rng.normal(size=(16, 2, 2, 2)).astype(np.complex64)

    def build():
        tn = TensorNetwork()
        tn.add_tensor(t0, ["a", "b", "c", "d"])
        tn.add_tensor(t1, ["d", "e", "f", "g"])
        tn.add_tensor(t2, ["g", "h", "i", "j"])
        return tn

    reference = build().contract()
    tn = build()
    sliced = tn.contract({"repetitions": 8, "memory_limit": 2048})
    print(f"Sliced over {tn.last_num_slices} slices; "
          f"output labels {sliced.labels}")
    assert tn.last_num_slices > 1
    assert np.allclose(sliced.to_numpy(), reference.to_numpy(), rtol=2e-3)
    print("Sliced result matches unsliced. SUCCESS")


if __name__ == "__main__":
    run_slicing_example()
