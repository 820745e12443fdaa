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
