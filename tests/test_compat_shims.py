"""Reference-compatibility shims: user code written against the reference's
three front ends must work unchanged against the `rocq` / `rocquantum`
top-level packages."""

import numpy as np
import pytest


class TestRocqShim:
    def test_dsl_surface(self):
        import rocq
        noise = rocq.NoiseModel()
        noise.add_channel("depolarizing", 0.01)

        @rocq.kernel
        def bell():
            q = rocq.qvec(2)
            rocq.h(q[0])
            rocq.cnot(q[0], q[1])

        state = rocq.execute(bell, backend="state_vector")
        assert abs(abs(state[0]) - 2**-0.5) < 1e-6

    def test_api_surface(self):
        import rocq.api as rocq_api
        sim = rocq_api.Simulator()
        c = rocq_api.Circuit(2, sim)
        c.h(0)
        c.cx(0, 1)
        psi = c.get_statevector()
        assert abs(abs(psi[3]) - 2**-0.5) < 1e-6

    def test_mixed_surface_sampling_example_style(self):
        # reference examples/sampling_example.py uses `import rocq` +
        # rocq.Simulator/Circuit even though the reference rocq package
        # lacked them; the shim provides both
        import rocq
        sim = rocq.Simulator()
        circuit = rocq.Circuit(2, sim)
        circuit.h(0)
        circuit.cx(0, 1)
        results = circuit.sample([0, 1], 500)
        assert set(np.unique(results)) <= {0, 3}

    def test_pauli_operator_both_forms(self):
        import rocq
        a = rocq.PauliOperator("Z0 Z1")              # api string form
        b = rocq.PauliOperator({"X0": 0.5})          # api dict form
        c = rocq.PauliOperator("X0 Y1", 0.25)        # DSL (string, coeff)
        assert a.terms[0][1] == 1.0
        assert b.terms[0][1] == 0.5
        assert c.terms[0][1] == 0.25

    def test_dsl_expectation_with_api_operator(self):
        import rocq

        @rocq.kernel
        def plus():
            q = rocq.qvec(1)
            rocq.h(q[0])

        val = rocq.get_expectation_value(plus, rocq.PauliOperator("X0"),
                                         backend="state_vector")
        assert abs(val - 1.0) < 1e-6


class TestRocquantumShim:
    def test_vqe_h2_style_usage(self):
        # reference examples/vqe_h2.py flavor: params-list kernel +
        # positional pauli strings
        import rocquantum as rocq

        @rocq.kernel
        def ansatz(params):
            rocq.ry(params[0], 0)
            rocq.ry(params[1], 1)
            rocq.cnot(0, 1)

        val = rocq.get_expval(ansatz, "ZZ", [0.0, 0.0])
        assert abs(val - 1.0) < 1e-6
        g = rocq.grad(ansatz, "ZZ", [0.3, 0.2])
        # CNOT(0->1) conjugates Z0Z1 to Z1, so <ZZ> = cos(t1):
        # d/dt0 = 0, d/dt1 = -sin(t1)
        assert abs(g[0]) < 1e-5
        assert abs(g[1] + np.sin(0.2)) < 1e-5

    def test_submodules(self):
        import rocquantum
        from rocquantum.circuit import QuantumCircuit
        from rocquantum.core import set_target, get_active_backend
        c = QuantumCircuit(2)
        c.h(0)
        c.cx(0, 1)
        assert "OPENQASM" in c.to_qasm()
        set_target("local")
        assert get_active_backend() is not None

    def test_python_rocq_import_path(self):
        # reference qec/framework.py:19 import path
        import rocquantum.python.rocq as roc_q
        sim = roc_q.Simulator()
        assert isinstance(sim, roc_q.Simulator)

    def test_solvers_via_shim(self):
        import rocquantum
        from rocquantum.solvers import VQE_Solver  # noqa: F401
        from rocquantum.qec import ThreeQubitRepetitionCode  # noqa: F401
        from rocquantum.utils import compute_hamiltonian_expectation  # noqa: F401


class TestBindingShims:
    def test_rocquantum_bind(self):
        import rocquantum_bind
        sim = rocquantum_bind.QSim(2)
        sim.ApplyGate("H", 0)
        sim.ApplyCNOT(0, 1)
        sim.Execute()
        psi = sim.GetStateVector()
        assert abs(abs(psi[0]) - 2**-0.5) < 1e-6
        comp = rocquantum_bind.MLIRCompiler(num_qubits=2)
        assert comp.initialize_module("m", 2)

    def test_rocq_hip(self):
        import rocq_hip
        st = rocq_hip.DensityMatrixState(1)
        st.apply_h(0)
        assert abs(st.compute_expectation(rocq_hip.Pauli.X, 0) - 1.0) < 1e-6

    def test_rocq_hip_backend_tensornet(self):
        # reference examples/slicing_example.py usage pattern
        from rocq import _rocq_hip_backend as backend
        import numpy as np

        tensor0 = backend.RocTensor([2, 2, 2, 16], py_data_np_array=None)
        tensor0.labels = ["a", "b", "c", "d"]
        tensor1 = backend.RocTensor([16, 2, 2, 16], py_data_np_array=None)
        tensor1.labels = ["d", "e", "f", "g"]
        tensor2 = backend.RocTensor([16, 2, 2, 2], py_data_np_array=None)
        tensor2.labels = ["g", "h", "i", "j"]
        result = backend.RocTensor([], py_data_np_array=None)

        handle = backend.RocsvHandle()
        tn = backend.RocTensorNetwork(handle)
        backend.rocTensorNetworkAddTensor(tn, tensor0)
        backend.rocTensorNetworkAddTensor(tn, tensor1)
        backend.rocTensorNetworkAddTensor(tn, tensor2)
        tn.contract({"repetitions": 8, "memory_limit": 2048}, result)
        assert tn.last_num_slices > 1   # the reference stopped at
        assert result._data is not None  # NOT_IMPLEMENTED here; we execute


class TestB1PerGateSurface:
    """The reference's direct binding layer (python/rocq/bindings.cpp:160-495)
    driven the way reference user code drives it: handle -> allocate ->
    per-gate apply_* -> measure/expectation/sample/readback."""

    def _bell(self, be):
        h = be.RocsvHandle()
        d = be.allocate_state_internal(h, 2)
        assert be.initialize_state(h, d, 2) == be.rocqStatus.SUCCESS
        assert be.apply_h(h, d, 2, 0) == be.rocqStatus.SUCCESS
        assert be.apply_cnot(h, d, 2, 0, 1) == be.rocqStatus.SUCCESS
        return h, d

    def test_bell_flow_statevector_and_sampling(self):
        import rocq._rocq_hip_backend as be
        h, d = self._bell(be)
        sv = be.get_state_vector_full(h, d, 2)
        expected = np.zeros(4, np.complex64)
        expected[0] = expected[3] = 2**-0.5
        assert np.allclose(sv, expected, atol=1e-6)
        shots = 2000
        results = be.sample(h, d, 2, [0, 1], shots)
        assert results.dtype == np.uint64 and len(results) == shots
        counts = {int(v): int(c) for v, c in
                  zip(*np.unique(results, return_counts=True))}
        assert set(counts) <= {0, 3}
        assert abs(counts.get(0, 0) - shots / 2) < shots / 10
        assert abs(counts.get(3, 0) - shots / 2) < shots / 10

    def test_every_named_gate_enqueues(self):
        import rocq._rocq_hip_backend as be
        h = be.RocsvHandle()
        d = be.allocate_state_internal(h, 4)
        S = be.rocqStatus.SUCCESS
        assert be.apply_x(h, d, 4, 0) == S
        assert be.apply_y(h, d, 4, 1) == S
        assert be.apply_z(h, d, 4, 2) == S
        assert be.apply_s(h, d, 4, 0) == S
        assert be.apply_sdg(h, d, 4, 0) == S
        assert be.apply_t(h, d, 4, 1) == S
        assert be.apply_rx(h, d, 4, 0, 0.3) == S
        assert be.apply_ry(h, d, 4, 1, 0.4) == S
        assert be.apply_rz(h, d, 4, 2, 0.5) == S
        assert be.apply_cz(h, d, 4, 0, 1) == S
        assert be.apply_swap(h, d, 4, 1, 2) == S
        assert be.apply_crx(h, d, 4, 0, 1, 0.2) == S
        assert be.apply_cry(h, d, 4, 1, 2, 0.2) == S
        assert be.apply_crz(h, d, 4, 2, 3, 0.2) == S
        assert be.apply_mcx(h, d, 4, [0, 1], 3) == S
        assert be.apply_cswap(h, d, 4, 0, 1, 2) == S
        psi = be.get_state_vector_full(h, d, 4)
        assert abs(np.linalg.norm(psi) - 1.0) < 1e-5

    def test_apply_matrix_and_controlled_matrix(self):
        import rocq._rocq_hip_backend as be
        h = be.RocsvHandle()
        d = be.allocate_state_internal(h, 2)
        H = (np.array([[1, 1], [1, -1]]) / np.sqrt(2)).astype(np.complex64)
        mat = be.create_device_matrix_from_numpy(H)
        assert mat.nbytes() == H.nbytes
        be.apply_matrix(h, d, 2, [0], mat, 2)
        X = be.create_device_matrix_from_numpy(
            np.array([[0, 1], [1, 0]], np.complex64))
        be.apply_controlled_matrix(h, d, 2, [0], [1], X)
        psi = be.get_state_vector_full(h, d, 2)
        expected = np.zeros(4, np.complex64)
        expected[0] = expected[3] = 2**-0.5
        assert np.allclose(psi, expected, atol=1e-6)

    def test_measure_collapses(self):
        import rocq._rocq_hip_backend as be
        h, d = self._bell(be)
        outcome, prob = be.measure(h, d, 2, 0)
        assert outcome in (0, 1)
        assert abs(prob - 0.5) < 1e-6
        # post-collapse the two qubits are perfectly correlated
        o2, p2 = be.measure(h, d, 2, 1)
        assert o2 == outcome and abs(p2 - 1.0) < 1e-6

    def test_expectations(self):
        import rocq._rocq_hip_backend as be
        h, d = self._bell(be)
        assert abs(be.get_expectation_value_z(h, d, 2, 0)) < 1e-6
        assert abs(be.get_expectation_value_x(h, d, 2, 0)) < 1e-6
        assert abs(be.get_expectation_value_pauli_product_z(
            h, d, 2, [0, 1]) - 1.0) < 1e-6
        assert abs(be.get_expectation_pauli_string(
            h, d, 2, "XX", [0, 1]) - 1.0) < 1e-6
        assert be.get_expectation_value_pauli_product_z(h, d, 2, []) == 1.0
        # |+> on qubit 0 of a fresh state: <X0> = 1
        d2 = be.allocate_state_internal(h, 1)
        be.apply_h(h, d2, 1, 0)
        assert abs(be.get_expectation_value_x(h, d2, 1, 0) - 1.0) < 1e-6

    def test_state_vector_slice(self):
        import rocq._rocq_hip_backend as be
        h, d = self._bell(be)
        full = be.get_state_vector_full(h, d, 2)
        sl = be.get_state_vector_slice(h, d, 2, 1, 0)
        assert np.allclose(full, sl)


def test_pinned_buffer_family():
    """hipStateVec.h:296-325 pinned-memory surface: grow-only ensure,
    pointer readback, free. On TPU this is a documented numpy-scratch
    shim (no user-managed pinned host memory exists)."""
    from rocq import _rocq_hip_backend as b

    h = b.RocsvHandle()
    assert b.rocsv_get_pinned_buffer_pointer(h) is None
    assert b.rocsv_ensure_pinned_buffer(h, 1024) is b.rocqStatus.SUCCESS
    buf = b.rocsv_get_pinned_buffer_pointer(h)
    assert buf.nbytes == 1024
    # large enough -> reused, not reallocated or shrunk
    assert b.rocsv_ensure_pinned_buffer(h, 512) is b.rocqStatus.SUCCESS
    assert b.rocsv_get_pinned_buffer_pointer(h) is buf
    assert b.rocsv_ensure_pinned_buffer(h, 2048) is b.rocqStatus.SUCCESS
    assert b.rocsv_get_pinned_buffer_pointer(h).nbytes == 2048
    assert b.rocsv_free_pinned_buffer(h) is b.rocqStatus.SUCCESS
    assert b.rocsv_get_pinned_buffer_pointer(h) is None
    assert (b.rocsv_ensure_pinned_buffer(h, -1)
            is b.rocqStatus.ERROR_INVALID_VALUE)
