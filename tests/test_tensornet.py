"""Tensor-network engine tests.

Mirrors the reference's hand-rolled hipTensorNet harness
(test_hipTensorNet_rocTensorUtil.cpp: struct/einsum-parse/permute/contract/
chain tests; test_hipTensorNet_slicing.cpp:208-212 sliced-vs-unsliced
correctness; test_PermutationKernels.cpp CPU-reference permutes).
"""

import numpy as np
import pytest
import jax

from rocquantum_tpu.tensornet import (
    Tensor, TensorNetwork, contract_pair, contract_einsum, tensor_svd,
    permute, parse_einsum_spec, Pathfinder, OptimizerConfig,
    PathfinderAlgorithm)
from rocquantum_tpu.tensornet.pathfinder import find_greedy_path


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        np.complex64)


class TestTensor:
    def test_construction_and_validation(self):
        t = Tensor.from_numpy(rand((2, 3)), ["a", "b"])
        assert t.labels == ("a", "b")
        assert t.dim_of("b") == 3
        with pytest.raises(ValueError):
            Tensor.from_numpy(rand((2, 3)), ["a"])
        with pytest.raises(ValueError):
            Tensor.from_numpy(rand((2, 3)), ["a", "a"])

    def test_permute_matches_numpy(self):
        x = rand((2, 3, 4), 1)
        t = Tensor.from_numpy(x, ["a", "b", "c"])
        p = permute(t, ["c", "a", "b"])
        np.testing.assert_allclose(p.to_numpy(), np.transpose(x, (2, 0, 1)),
                                   atol=1e-6)
        with pytest.raises(ValueError):
            permute(t, ["a", "b", "x"])

    def test_parse_einsum_spec(self):
        inputs, out = parse_einsum_spec("ab,bc->ac")
        assert inputs == (("a", "b"), ("b", "c"))
        assert out == ("a", "c")
        with pytest.raises(ValueError):
            parse_einsum_spec("ab,bc")


class TestPairContraction:
    def test_matmul(self):
        a, b = rand((4, 5), 1), rand((5, 6), 2)
        t = contract_pair(Tensor.from_numpy(a, "ab"), Tensor.from_numpy(b, "bc"))
        assert t.labels == ("a", "c")
        np.testing.assert_allclose(t.to_numpy(), a @ b, atol=1e-4)

    def test_shared_label_kept_when_external(self):
        a, b = rand((4, 5), 1), rand((5, 6), 2)
        t = contract_pair(Tensor.from_numpy(a, "ab"), Tensor.from_numpy(b, "bc"),
                          keep=["b"])
        assert set(t.labels) == {"a", "b", "c"}

    def test_contract_einsum(self):
        a, b = rand((3, 4), 3), rand((4, 3), 4)
        t = contract_einsum("ij,jk->ik", Tensor.from_numpy(a, "xy"),
                            Tensor.from_numpy(b, "yz"))
        np.testing.assert_allclose(t.to_numpy(), a @ b, atol=1e-4)


class TestPathfinder:
    def test_greedy_chain(self):
        # chain a-b-c-d: greedy contracts cheapest pairs first
        labels = [("a", "b"), ("b", "c"), ("c", "d")]
        shapes = [(8, 4), (4, 16), (16, 2)]
        plan = find_greedy_path(labels, shapes)
        assert len(plan.steps) == 2
        assert plan.total_flops > 0
        assert plan.largest_intermediate >= 16

    def test_all_algorithms_same_result(self):
        tensors = [Tensor.from_numpy(rand(sh, i), ls) for i, (sh, ls) in
                   enumerate([((4, 8), ("a", "b")), ((8, 4), ("b", "c")),
                              ((4, 8), ("c", "d"))])]
        results = {}
        for algo in (PathfinderAlgorithm.GREEDY, PathfinderAlgorithm.OPTIMAL,
                     PathfinderAlgorithm.AUTO, PathfinderAlgorithm.KAHYPAR):
            tn = TensorNetwork()
            for t in tensors:
                tn.add_tensor(t)
            out = tn.contract(OptimizerConfig(algorithm=algo))
            results[algo] = out.to_numpy()
        base = results[PathfinderAlgorithm.GREEDY]
        for algo, v in results.items():
            np.testing.assert_allclose(v, base, atol=1e-3, err_msg=str(algo))


class TestTensorNetwork:
    def test_two_tensor_network(self):
        # examples/tensornet_example.py
        a, b = rand((2, 2), 5), rand((2, 2), 6)
        tn = TensorNetwork()
        tn.add_tensor(a, ["a", "b"])
        tn.add_tensor(b, ["b", "c"])
        out = tn.contract()
        np.testing.assert_allclose(out.to_numpy(), a @ b, atol=1e-5)

    def test_chain_contraction(self):
        mats = [rand((6, 6), i) for i in range(4)]
        tn = TensorNetwork()
        names = "abcde"
        for i, m in enumerate(mats):
            tn.add_tensor(m, [names[i], names[i + 1]])
        out = tn.contract()
        expected = mats[0] @ mats[1] @ mats[2] @ mats[3]
        np.testing.assert_allclose(out.to_numpy(), expected, rtol=2e-3)

    def test_full_contraction_to_scalar(self):
        a = rand((3, 4), 7)
        tn = TensorNetwork()
        tn.add_tensor(a, ["i", "j"])
        tn.add_tensor(a.conj().transpose(), ["j", "i"])
        out = tn.contract()
        assert out.labels == ()
        np.testing.assert_allclose(out.to_numpy(),
                                   np.sum(np.abs(a) ** 2), rtol=1e-4)

    def test_hyperedge_label(self):
        # label used by 3 tensors must be contracted only at the last use
        x = rand((4,), 8)
        tn = TensorNetwork()
        tn.add_tensor(x, ["k"])
        tn.add_tensor(x, ["k"])
        tn.add_tensor(np.ones(4, np.complex64), ["k"])
        out = tn.contract()
        np.testing.assert_allclose(out.to_numpy(), np.sum(x * x), rtol=1e-4)


class TestSlicing:
    def test_sliced_equals_unsliced(self):
        """test_hipTensorNet_slicing.cpp:208-212 — the slicing acceptance
        test: identical result with and without a memory limit."""
        # T0(a,b,c,d) T1(d,e,f,g) T2(g,h,i,j) like slicing_example.py
        t0 = rand((2, 2, 2, 16), 1)
        t1 = rand((16, 2, 2, 16), 2)
        t2 = rand((16, 2, 2, 2), 3)

        def build():
            tn = TensorNetwork()
            tn.add_tensor(t0, ["a", "b", "c", "d"])
            tn.add_tensor(t1, ["d", "e", "f", "g"])
            tn.add_tensor(t2, ["g", "h", "i", "j"])
            return tn

        full = build().contract()
        tn = build()
        sliced = tn.contract({"memory_limit": 2048})  # forces slicing
        assert tn.last_num_slices > 1
        assert sliced.labels == full.labels
        np.testing.assert_allclose(sliced.to_numpy(), full.to_numpy(),
                                   rtol=2e-3)

    def test_impossible_memory_limit_raises(self):
        tn = TensorNetwork()
        tn.add_tensor(rand((8, 8), 1), ["a", "b"])
        tn.add_tensor(rand((8, 8), 2), ["b", "c"])
        with pytest.raises(MemoryError):
            tn.contract({"memory_limit": 4})  # < 1 element: nothing can fit

    def test_multi_label_slicing(self):
        t0 = rand((8, 8, 8), 1)
        t1 = rand((8, 8, 8), 2)
        tn = TensorNetwork()
        tn.add_tensor(t0, ["a", "b", "k"])
        tn.add_tensor(t1, ["k", "c", "d"])
        full_tn = TensorNetwork()
        full_tn.add_tensor(t0, ["a", "b", "k"])
        full_tn.add_tensor(t1, ["k", "c", "d"])
        full = full_tn.contract()
        sliced = tn.contract({"memory_limit": 8 * 8 * 8})  # 512 elems < 4096
        np.testing.assert_allclose(sliced.to_numpy(), full.to_numpy(),
                                   rtol=2e-3)


class TestSVD:
    def test_svd_reconstruction(self):
        x = rand((6, 8), 11)
        t = Tensor.from_numpy(x, ["m", "n"])
        u, s, v = tensor_svd(t, ["m"], ["n"])
        assert u.labels == ("m", "_s") and v.labels == ("_s", "n")
        recon = u.to_numpy() @ np.diag(s.to_numpy()) @ v.to_numpy()
        np.testing.assert_allclose(recon, x, atol=1e-4)

    def test_svd_higher_rank(self):
        x = rand((2, 3, 4, 5), 12)
        t = Tensor.from_numpy(x, ["a", "b", "c", "d"])
        u, s, v = tensor_svd(t, ["a", "c"], ["b", "d"])
        assert u.data.shape == (2, 4, 8)
        assert v.data.shape == (8, 3, 5)
        # reconstruct and compare
        recon = np.einsum("acs,s,sbd->abcd", u.to_numpy(), s.to_numpy(),
                          v.to_numpy())
        np.testing.assert_allclose(recon, x, atol=1e-4)

    def test_svd_validation(self):
        t = Tensor.from_numpy(rand((2, 2), 0), ["a", "b"])
        with pytest.raises(ValueError):
            tensor_svd(t, ["a"], ["a"])


class TestSlicingMemoryAndNumSlices:
    """Round-2 additions: slicing must actually BOUND peak temp memory (the
    r1 unrolled-stack version materialized every slab simultaneously), and
    OptimizerConfig.num_slices (hipTensorNet_api.h:35) must be consumed."""

    @staticmethod
    def _pair_network(dim=32):
        tn = TensorNetwork()
        rng = np.random.default_rng(7)
        a = (rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
             ).astype(np.complex64)
        b = (rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
             ).astype(np.complex64)
        tn.add_tensor(a, ["a", "k"])
        tn.add_tensor(b, ["k", "b"])
        return tn, a, b

    def test_num_slices_honored_without_memory_limit(self):
        tn, a, b = self._pair_network()
        out = tn.contract({"num_slices": 4})
        assert tn.last_num_slices >= 4
        np.testing.assert_allclose(out.to_numpy(), a @ b, rtol=2e-3)

    def test_num_slices_combines_with_memory_limit(self):
        tn, a, b = self._pair_network()
        out = tn.contract({"memory_limit": 32 * 32 * 8, "num_slices": 8})
        assert tn.last_num_slices >= 8
        np.testing.assert_allclose(out.to_numpy(), a @ b, rtol=2e-3)

    def test_sliced_peak_temp_memory_is_bounded(self):
        # a contraction whose output is 2^22 elements (32 MiB complex64):
        # sliced into 64 slabs, XLA temp allocation must stay well below the
        # unsliced version's (which holds output-sized einsum temps)
        dim = 1 << 11
        rng = np.random.default_rng(1)
        a = rng.normal(size=(dim, 16)).astype(np.float32).astype(np.complex64)
        b = rng.normal(size=(16, dim)).astype(np.float32).astype(np.complex64)

        def build():
            tn = TensorNetwork()
            tn.add_tensor(a, ["a", "k"])
            tn.add_tensor(b, ["k", "b"])
            return tn

        out_bytes = dim * dim * 8
        unsliced = build().compiled_memory_stats()
        tn = build()
        sliced = tn.compiled_memory_stats({"memory_limit": out_bytes // 64})
        assert tn.last_num_slices >= 64
        # temp memory beyond the (unavoidable) output buffer must be at most
        # a couple of slabs, far below one full extra output copy
        slab = out_bytes // 64
        assert sliced.temp_size_in_bytes <= out_bytes + 4 * slab, (
            sliced.temp_size_in_bytes, out_bytes)
        # and the sliced program must not use MORE temp than unsliced
        assert sliced.temp_size_in_bytes <= unsliced.temp_size_in_bytes \
            + 4 * slab

    def test_sliced_equals_unsliced_chunked(self):
        # chunked (non-elementwise) slicing path: limit forces chunks of 8
        tn, a, b = self._pair_network()
        out = tn.contract({"memory_limit": 32 * 32 * 8 // 4})
        assert tn.last_num_slices >= 4
        np.testing.assert_allclose(out.to_numpy(), a @ b, rtol=2e-3)


class TestInputSlabAccounting:
    """The automatic memory-limit trigger accounts for INPUT operand sizes,
    not just the output (beyond the reference, whose findSlicingPoint
    checked only the output size, hipTensorNet.cpp:318-396): a
    huge-inputs/scalar-output contraction must slice under a limit."""

    def test_big_inputs_small_output_slices(self):
        rng = np.random.default_rng(5)
        dim = 64
        x = rng.normal(size=(dim, dim)).astype(np.complex64)
        y = rng.normal(size=(dim, dim)).astype(np.complex64)
        tn = TensorNetwork()
        tn.add_tensor(x, ["i", "j"])
        tn.add_tensor(y, ["j", "i"])
        ref = tn.contract()
        assert tn.last_num_slices == 1
        tn2 = TensorNetwork()
        tn2.add_tensor(x, ["i", "j"])
        tn2.add_tensor(y, ["j", "i"])
        # output is 1 element; inputs are 4096 elements each -> the limit
        # (1024 elements of complex64) must force contracted-index slicing
        out = tn2.contract({"memory_limit": 1024 * 8})
        assert tn2.last_num_slices > 1
        np.testing.assert_allclose(np.asarray(out.data),
                                   np.asarray(ref.data), rtol=1e-5)

    def test_input_slabs_bounded_under_limit(self):
        # every chosen slab (inputs and output) must fit the limit
        rng = np.random.default_rng(6)
        x = rng.normal(size=(32, 32, 8)).astype(np.complex64)
        y = rng.normal(size=(32, 32, 8)).astype(np.complex64)
        tn = TensorNetwork()
        tn.add_tensor(x, ["i", "j", "k"])
        tn.add_tensor(y, ["j", "i", "m"])
        limit_elems = 512
        out = tn.contract({"memory_limit": limit_elems * 8})
        assert tn.last_num_slices > 1
        ref = np.einsum("ijk,jim->km", x, y)
        np.testing.assert_allclose(np.asarray(out.data), ref, rtol=1e-4)


class TestContractedIndexSlicing:
    """Contracted-index slicing (partial-sum accumulation): num_slices works
    even when the output has no (or not enough) free labels — the
    expectation/amplitude regime. Extends the reference, whose
    selectSliceIndex only considered free indices (hipTensorNet.cpp:398-448)."""

    @staticmethod
    def _scalar_network(dim=64):
        rng = np.random.default_rng(11)
        x = (rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
             ).astype(np.complex64)
        y = (rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
             ).astype(np.complex64)
        tn = TensorNetwork()
        tn.add_tensor(x, ["i", "j"])
        tn.add_tensor(y, ["j", "i"])
        return tn, x, y

    def test_scalar_output_num_slices(self):
        # zero free labels: slices must come from the contracted indices
        tn, x, y = self._scalar_network()
        out = tn.contract({"num_slices": 8})
        assert tn.last_num_slices >= 8
        assert out.labels == ()
        np.testing.assert_allclose(out.to_numpy(), np.einsum("ij,ji->", x, y),
                                   rtol=2e-3)

    def test_contracted_slicing_beyond_free_capacity(self):
        # free label has dim 2 -> at most 2 free slices; num_slices=16 must
        # spill into the contracted label
        rng = np.random.default_rng(12)
        a = (rng.normal(size=(2, 64)) + 1j * rng.normal(size=(2, 64))
             ).astype(np.complex64)
        b = rng.normal(size=(64,)).astype(np.complex64)
        tn = TensorNetwork()
        tn.add_tensor(a, ["f", "k"])
        tn.add_tensor(b, ["k"])
        out = tn.contract({"num_slices": 16})
        assert tn.last_num_slices >= 16
        np.testing.assert_allclose(out.to_numpy(), a @ b, rtol=2e-3)


class TestDistributedSlicing:
    """Slice loop sharded over a mesh axis (one psum merges the partials) —
    TN slicing as the cross-device scaling mechanism."""

    def _mesh(self, n=8):
        import jax
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"need {n} devices")
        return Mesh(np.array(devs[:n]), ("slices",))

    def test_distributed_scalar_matches_single(self):
        mesh = self._mesh()
        tn = TestContractedIndexSlicing._scalar_network()[0]
        ref = tn.contract({"num_slices": 8})
        tn2 = TestContractedIndexSlicing._scalar_network()[0]
        out = tn2.contract({"num_slices": 8}, mesh=mesh, axis_name="slices")
        assert tn2.last_num_slices >= 8
        np.testing.assert_allclose(out.to_numpy(), ref.to_numpy(), rtol=2e-3)

    def test_distributed_free_slicing_matches_single(self):
        # free-label slabs land in disjoint regions; psum still merges
        mesh = self._mesh()
        rng = np.random.default_rng(13)
        a = (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
             ).astype(np.complex64)
        b = (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
             ).astype(np.complex64)

        def build():
            tn = TensorNetwork()
            tn.add_tensor(a, ["a", "k"])
            tn.add_tensor(b, ["k", "b"])
            return tn

        ref = build().contract()
        out = build().contract({"num_slices": 8}, mesh=mesh,
                               axis_name="slices")
        np.testing.assert_allclose(out.to_numpy(), ref.to_numpy(), rtol=2e-3)

    def test_distributed_uneven_slices(self):
        # total slices not divisible by device count: tail devices clamp
        mesh = self._mesh()
        rng = np.random.default_rng(14)
        a = (rng.normal(size=(3, 64)) + 1j * rng.normal(size=(3, 64))
             ).astype(np.complex64)
        b = rng.normal(size=(64,)).astype(np.complex64)
        tn = TensorNetwork()
        tn.add_tensor(a, ["f", "k"])
        tn.add_tensor(b, ["k"])
        out = tn.contract({"num_slices": 12}, mesh=mesh, axis_name="slices")
        np.testing.assert_allclose(out.to_numpy(), a @ b, rtol=2e-3)
