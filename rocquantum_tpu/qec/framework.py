"""Quantum error correction framework.

API-parity rebuild of reference rocquantum/qec/framework.py: the
QuantumErrorCode / Decoder ABCs and the QEC_Experiment orchestrator using
the "circuit fragmentation" strategy — one circuit per stabilizer, measure
the ancilla, decode the syndrome (:49-89).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable, Dict, List

from .. import api as roc_q
from ..api import PauliOperator, QuantumProgram

AnsatzKernel = Callable[..., None]


class QuantumErrorCode(ABC):
    """Blueprint for an error-correcting code."""

    @abstractmethod
    def generate_stabilizer_circuits(
            self, initial_state_kernel: AnsatzKernel, num_qubits: int,
            simulator: roc_q.Simulator) -> List[QuantumProgram]:
        """One circuit fragment per stabilizer measurement."""

    @abstractmethod
    def define_logical_operators(self) -> Dict[str, PauliOperator]:
        """Logical operators of the code."""


class Decoder(ABC):
    """Blueprint for a syndrome decoder."""

    @abstractmethod
    def decode(self, syndrome: List[int]) -> PauliOperator:
        """Map a syndrome to a correction operator."""


class QEC_Experiment:
    """Single-round QEC orchestrator (circuit fragmentation)."""

    def __init__(self, simulator: roc_q.Simulator):
        if not isinstance(simulator, roc_q.Simulator):
            raise TypeError("A valid roc_q.Simulator instance is required.")
        self.simulator = simulator

    def run_single_round(self, code: QuantumErrorCode, decoder: Decoder,
                         initial_state_kernel: AnsatzKernel, num_qubits: int,
                         ancilla_qubit_indices: List[int]) -> Dict[str, Any]:
        stabilizer_circuits = code.generate_stabilizer_circuits(
            initial_state_kernel, num_qubits, self.simulator)

        syndrome = []
        for i, stab_program in enumerate(stabilizer_circuits):
            ancilla_idx = ancilla_qubit_indices[i]
            outcome, _ = stab_program.circuit_ref.measure(ancilla_idx)
            syndrome.append(outcome)

        correction_operator = decoder.decode(syndrome)

        return {
            "syndrome": syndrome,
            "correction_applied": str(correction_operator),
            "logical_operators": code.define_logical_operators(),
        }
