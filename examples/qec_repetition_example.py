"""Single QEC round on the 3-qubit repetition code (reference examples/qec):
inject each single bit-flip error, extract the syndrome, decode."""

import rocquantum_tpu as rocq
from rocquantum_tpu.qec import (QEC_Experiment, RepetitionCodeDecoder,
                                ThreeQubitRepetitionCode)


def main():
    expected = {None: [0, 0], 0: [1, 0], 1: [1, 1], 2: [0, 1]}
    for error_qubit, exp_syndrome in expected.items():
        @rocq.kernel
        def initial_state(q, _eq=error_qubit):
            if _eq is not None:
                q.x(_eq)

        sim = rocq.Simulator(seed=1)
        result = QEC_Experiment(sim).run_single_round(
            code=ThreeQubitRepetitionCode(),
            decoder=RepetitionCodeDecoder(),
            initial_state_kernel=initial_state,
            num_qubits=5,
            ancilla_qubit_indices=[3, 4])
        print(f"error on {error_qubit}: syndrome={result['syndrome']} "
              f"correction={result['correction_applied']}")
        assert result["syndrome"] == exp_syndrome
    print("SUCCESS")


if __name__ == "__main__":
    main()
