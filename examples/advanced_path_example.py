"""Pathfinder algorithm comparison (reference
examples/advanced_path_example.py: KaHyPar-vs-greedy; here the advanced
planners are opt_einsum's real optimal/auto algorithms, and the greedy scan
optionally runs in native C++)."""

import numpy as np

from rocquantum_tpu.tensornet import (OptimizerConfig, Pathfinder,
                                      PathfinderAlgorithm, TensorNetwork,
                                      permute)


def build_network(tn_or_lists):
    rng = np.random.default_rng(1)
    specs = [
        (("a", "b"), (8, 32)), (("b", "c", "d"), (32, 8, 16)),
        (("d", "e"), (16, 32)), (("e", "f", "c"), (32, 4, 8)),
        (("f", "g"), (4, 8)),
    ]
    labels, shapes = zip(*specs)
    tensors = [rng.normal(size=s).astype(np.complex64) for s in shapes]
    return list(labels), list(shapes), tensors


def main():
    labels, shapes, tensors = build_network(None)
    results = {}
    for algo in (PathfinderAlgorithm.GREEDY, PathfinderAlgorithm.OPTIMAL,
                 PathfinderAlgorithm.AUTO):
        plan = Pathfinder(OptimizerConfig(algorithm=algo)).find_optimal_path(
            labels, shapes)
        print(f"{algo.value:>8}: {len(plan.steps)} steps, "
              f"{plan.total_flops:.3g} FLOPs, "
              f"largest intermediate {plan.largest_intermediate}")
        tn = TensorNetwork()
        for t, ls in zip(tensors, labels):
            tn.add_tensor(t, list(ls))
        out = tn.contract(OptimizerConfig(algorithm=algo))
        # different plans may order the free indices differently; compare in
        # canonical (sorted-label) axis order
        results[algo] = permute(out, sorted(out.labels)).to_numpy()

    base = results[PathfinderAlgorithm.GREEDY]
    for algo, v in results.items():
        assert np.allclose(v, base, rtol=1e-3), f"{algo} result differs"
    print("All pathfinder algorithms agree. SUCCESS")


if __name__ == "__main__":
    main()
