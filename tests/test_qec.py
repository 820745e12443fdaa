"""QEC framework tests: repetition-code syndrome extraction + decoding for
every single-X-error case (reference examples/qec flow, made deterministic)."""

import numpy as np
import pytest

import rocquantum_tpu as rocq
from rocquantum_tpu.qec import (QEC_Experiment, RepetitionCodeDecoder,
                                ThreeQubitRepetitionCode)


def make_error_kernel(error_qubit):
    @rocq.kernel
    def initial_state(q):
        # logical |0>_L = |000>; inject an X error on one data qubit
        if error_qubit is not None:
            q.x(error_qubit)
    return initial_state


EXPECTED = {
    None: ([0, 0], "PauliOperator(Empty)"),
    0: ([1, 0], "X0"),
    1: ([1, 1], "X1"),
    2: ([0, 1], "X2"),
}


class TestRepetitionCode:
    @pytest.mark.parametrize("error_qubit", [None, 0, 1, 2])
    def test_single_error_syndromes(self, error_qubit):
        sim = rocq.Simulator(seed=5)
        experiment = QEC_Experiment(sim)
        result = experiment.run_single_round(
            code=ThreeQubitRepetitionCode(),
            decoder=RepetitionCodeDecoder(),
            initial_state_kernel=make_error_kernel(error_qubit),
            num_qubits=5,
            ancilla_qubit_indices=[3, 4],
        )
        exp_syndrome, exp_corr = EXPECTED[error_qubit]
        assert result["syndrome"] == exp_syndrome
        if exp_corr == "PauliOperator(Empty)":
            assert result["correction_applied"] == exp_corr
        else:
            assert exp_corr in result["correction_applied"]
        assert "logical_Z" in result["logical_operators"]

    def test_experiment_validates_simulator(self):
        with pytest.raises(TypeError):
            QEC_Experiment("not a simulator")

    def test_logical_operators(self):
        ops = ThreeQubitRepetitionCode().define_logical_operators()
        assert ops["logical_Z"].terms[0] == ([("Z", 0)], 1.0)
        assert ops["logical_X"].terms[0][0] == [("X", 0), ("X", 1), ("X", 2)]
