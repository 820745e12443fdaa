"""Minimal OpenQASM 3.0 parser for the subset emitted by compiler/qasm.py.

The reference had QASM emission only (circuit.py:68-96); parsing lets the
local backend and tests round-trip Type A job payloads.
"""

from __future__ import annotations

import re

from .ir import CircuitIR

_GATE_RE = re.compile(
    r"^(?P<name>[a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\((?P<params>[^)]*)\))?\s*"
    r"(?P<args>q\[\d+\](?:\s*,\s*q\[\d+\])*)\s*;$")
_CTRL_RE = re.compile(
    r"^ctrl\((?P<n>\d+)\)\s*@\s*(?P<name>[a-z]+)\s*"
    r"(?P<args>q\[\d+\](?:\s*,\s*q\[\d+\])*)\s*;$")
_QREG_RE = re.compile(r"^qubit\[(\d+)\]\s+q\s*;$")
_QREG2_RE = re.compile(r"^qreg\s+q\[(\d+)\]\s*;$")  # OpenQASM 2.0

_NAME_MAP = {
    "h": ("H", 1, 0), "x": ("X", 1, 0), "y": ("Y", 1, 0), "z": ("Z", 1, 0),
    "s": ("S", 1, 0), "sdg": ("SDG", 1, 0), "t": ("T", 1, 0),
    "tdg": ("TDG", 1, 0), "swap": ("SWAP", 2, 0),
    "rx": ("RX", 1, 1), "ry": ("RY", 1, 1), "rz": ("RZ", 1, 1),
    "p": ("P", 1, 1), "u3": ("U3", 1, 3),
}
_CTRL_MAP = {"cx": ("CNOT", 1), "cz": ("CZ", 1), "crx": ("CRX", 1),
             "cry": ("CRY", 1), "crz": ("CRZ", 1), "ccx": ("MCX", 2),
             "cswap": ("CSWAP", 1)}


def parse_qasm3(text: str) -> CircuitIR:
    num_qubits = None
    ops = []
    for raw in text.splitlines():
        line = raw.split("//")[0].strip()
        if not line or line.startswith(("OPENQASM", "include", "bit[",
                                        "creg", "barrier")):
            continue
        if line.startswith(("c = measure", "c=measure", "measure ")):
            continue  # terminal measurement (2.0: 'measure q -> c;')
        m = _QREG_RE.match(line) or _QREG2_RE.match(line)
        if m:
            num_qubits = int(m.group(1))
            continue
        m = _CTRL_RE.match(line)
        if m:
            qubits = [int(x) for x in re.findall(r"q\[(\d+)\]", m.group("args"))]
            if m.group("name") != "x":
                raise ValueError(f"unsupported controlled gate: {line!r}")
            ops.append(("MCX", qubits[-1:], qubits[:-1], []))
            continue
        m = _GATE_RE.match(line)
        if m:
            name = m.group("name").lower()
            qubits = [int(x) for x in re.findall(r"q\[(\d+)\]", m.group("args"))]
            params = ([float(p) for p in m.group("params").split(",")]
                      if m.group("params") else [])
            if name in _CTRL_MAP:
                base, nc = _CTRL_MAP[name]
                ops.append((base, qubits[nc:], qubits[:nc], params))
            elif name in _NAME_MAP:
                base, ntgt, npar = _NAME_MAP[name]
                if len(params) != npar:
                    raise ValueError(f"{name} expects {npar} params: {line!r}")
                ops.append((base, qubits, [], params))
            else:
                raise ValueError(f"unknown gate in QASM: {line!r}")
            continue
        raise ValueError(f"cannot parse QASM line: {line!r}")
    if num_qubits is None:
        raise ValueError("QASM has no qubit register declaration")
    ir = CircuitIR(num_qubits, name="from_qasm")
    for name, targets, controls, params in ops:
        ir.add(name, targets, controls=controls, params=params)
    return ir
