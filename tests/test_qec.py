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


class TestSteaneCode:
    """[[7,1,3]]: single X, Z, and Y errors decode to the right correction
    (framework generalizes beyond the reference's repetition-only catalog)."""

    @staticmethod
    def _logical_zero_kernel(error=None):
        # CSS encoder for |0>_L: H on the generator pivots, CX to the rest
        def kern(q):
            for piv, rest in ((0, (2, 4, 6)), (1, (2, 5, 6)),
                              (3, (4, 5, 6))):
                q.h(piv)
                for d in rest:
                    q.cx(piv, d)
            if error is not None:
                kind, qubit = error
                getattr(q, kind)(qubit)
        return kern

    def _syndrome(self, error):
        import rocquantum_tpu as rocq
        from rocquantum_tpu.qec.codes.steane_code import SteaneCode
        from rocquantum_tpu.qec.decoders.steane_decoder import SteaneDecoder
        from rocquantum_tpu.qec.framework import QEC_Experiment

        sim = rocq.Simulator(seed=1)
        exp = QEC_Experiment(sim)
        result = exp.run_single_round(
            SteaneCode(), SteaneDecoder(),
            rocq.kernel(self._logical_zero_kernel(error)),
            num_qubits=13, ancilla_qubit_indices=list(range(7, 13)))
        return result

    def test_no_error_trivial_syndrome(self):
        r = self._syndrome(None)
        assert r["syndrome"] == [0] * 6
        assert r["correction_applied"] == str(
            __import__("rocquantum_tpu").PauliOperator())

    @pytest.mark.parametrize("qubit", [0, 3, 6])
    def test_single_x_error_located(self, qubit):
        r = self._syndrome(("x", qubit))
        assert f"X{qubit}" in r["correction_applied"]
        assert r["syndrome"][3:] == [0, 0, 0]  # X commutes with X checks

    @pytest.mark.parametrize("qubit", [1, 4, 5])
    def test_single_z_error_located(self, qubit):
        r = self._syndrome(("z", qubit))
        assert f"Z{qubit}" in r["correction_applied"]
        assert r["syndrome"][:3] == [0, 0, 0]

    def test_y_error_fires_both_check_types(self):
        r = self._syndrome(("y", 2))
        assert "Y2" in r["correction_applied"]
