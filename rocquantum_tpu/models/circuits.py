"""Canonical circuit families (the framework's "model zoo").

The QFT builder is the reference's benchmark workload
(reference: benchmarks/run_benchmark.py:36-37 — QFT at 10-20 qubits); the
rest are standard families used across the examples, tests and benchmarks.
All builders return a CircuitIR (optionally parameterized with ParamRef
slots) ready for compile_ir / Circuit replay.
"""

from __future__ import annotations

import math
import numpy as np

from ..compiler.ir import CircuitIR, ParamRef


def qft_ir(n: int, include_swaps: bool = True) -> CircuitIR:
    """Quantum Fourier transform: H + controlled-phase cascade + bit
    reversal."""
    ir = CircuitIR(n, name=f"qft{n}")
    for i in range(n - 1, -1, -1):
        ir.add("H", [i])
        for j in range(i - 1, -1, -1):
            angle = math.pi / (1 << (i - j))
            ir.add("P", [i], controls=[j], params=[angle])
    if include_swaps:
        for i in range(n // 2):
            ir.add("SWAP", [i, n - 1 - i])
    return ir


def ghz_ir(n: int) -> CircuitIR:
    ir = CircuitIR(n, name=f"ghz{n}")
    ir.add("H", [0])
    for t in range(1, n):
        ir.add("CNOT", [t], controls=[0])
    return ir


def hardware_efficient_ansatz_ir(n: int, layers: int,
                                 entangler: str = "ring") -> CircuitIR:
    """RY column + CNOT entangler per layer; parameters are ParamRef slots
    (n*layers of them)."""
    ir = CircuitIR(n, name=f"hea{n}x{layers}")
    k = 0
    for _ in range(layers):
        for q in range(n):
            ir.add("RY", [q], params=[ParamRef(k)])
            k += 1
        if entangler == "ring":
            for q in range(n):
                ir.add("CNOT", [(q + 1) % n], controls=[q])
        else:  # linear
            for q in range(n - 1):
                ir.add("CNOT", [q + 1], controls=[q])
    return ir


def qaoa_maxcut_ir(n: int, p: int, edges=None) -> CircuitIR:
    """QAOA for MaxCut on a ring (or given edge list); 2p ParamRef slots
    (gamma_0, beta_0, gamma_1, ...)."""
    if edges is None:
        edges = [(q, (q + 1) % n) for q in range(n)]
    ir = CircuitIR(n, name=f"qaoa{n}p{p}")
    for q in range(n):
        ir.add("H", [q])
    k = 0
    for _ in range(p):
        gamma = ParamRef(k)
        k += 1
        for (a, b) in edges:
            # exp(-i gamma Z_a Z_b) = CNOT - RZ(2 gamma) - CNOT
            ir.add("CNOT", [b], controls=[a])
            ir.add("RZ", [b], params=[gamma])  # angle scaling folded by caller
            ir.add("CNOT", [b], controls=[a])
        beta = ParamRef(k)
        k += 1
        for q in range(n):
            ir.add("RX", [q], params=[beta])
    return ir


def random_circuit_ir(n: int, depth: int, seed: int = 0,
                      two_qubit_prob: float = 0.4) -> CircuitIR:
    """Random circuit with a fixed gate alphabet (benchmark / fuzz input)."""
    rng = np.random.default_rng(seed)
    ir = CircuitIR(n, name=f"random{n}x{depth}")
    one_q = ["H", "X", "Y", "Z", "S", "T"]
    for _ in range(depth):
        for q in range(n):
            if n > 1 and rng.random() < two_qubit_prob:
                other = int((q + 1 + rng.integers(0, n - 1)) % n)
                ir.add("CNOT", [other], controls=[q])
            elif rng.random() < 0.5:
                ir.add(str(rng.choice(one_q)), [q])
            else:
                ir.add("RY", [q], params=[float(rng.normal())])
    return ir
