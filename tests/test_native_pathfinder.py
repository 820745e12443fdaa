"""Native C++ pathfinder must produce bit-identical plans to the Python
fallback (same greedy cost rule, Pathfinder.cpp:174-269 analog)."""

import numpy as np
import pytest

from rocquantum_tpu.tensornet import _native_pathfinder as npf
from rocquantum_tpu.tensornet.pathfinder import find_greedy_path


def random_network(seed, n_tensors=10, n_labels=16):
    rng = np.random.default_rng(seed)
    pool = [f"l{i}" for i in range(n_labels)]
    dims = {l: int(rng.choice([2, 3, 4, 8])) for l in pool}
    labels, shapes = [], []
    for _ in range(n_tensors):
        k = int(rng.integers(1, 5))
        ls = tuple(rng.choice(pool, size=k, replace=False))
        labels.append(ls)
        shapes.append(tuple(dims[l] for l in ls))
    return labels, shapes


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_python(seed):
    labels, shapes = random_network(seed)
    native = npf.find_greedy_path(labels, shapes)
    if native is None:
        pytest.skip("native pathfinder unavailable (no g++?)")
    python = find_greedy_path(labels, shapes)
    assert [(s.i, s.j) for s in native.steps] == \
        [(s.i, s.j) for s in python.steps]
    assert native.total_flops == pytest.approx(python.total_flops)
    assert native.largest_intermediate == python.largest_intermediate


def test_single_tensor():
    native = npf.find_greedy_path([("a",)], [(4,)])
    if native is None:
        pytest.skip("native pathfinder unavailable")
    assert native.steps == []
