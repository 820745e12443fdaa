"""OpenQASM 3.0 (and 2.0-subset) parser.

Covers the subset emitted by compiler/qasm.py plus, beyond the reference
(which had QASM emission only, circuit.py:68-96):

* custom gate definitions — ``gate name(p0, p1) a, b { ... }`` — expanded
  at use sites with parameter-expression substitution;
* mid-circuit measurement — ``c[k] = measure q[i];`` / 2.0
  ``measure q[i] -> c[k];``;
* classical control — ``if (c[k] == 1) { ... }`` / single-statement and
  2.0 ``if (c == 1) x q[0];`` forms.

``parse_qasm3`` returns a plain :class:`CircuitIR` for static circuits
(raising on dynamic constructs), matching its original contract;
``parse_qasm3_program`` returns a :class:`DynamicProgram` whose items may
also be :class:`Measure` / :class:`Cond` — executed shot-batched by
compiler/dynamic.py (the reference's dynamic-circuit semantics,
examples/dynamic_circuit_example.py, reachable from QASM).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

from .ir import CircuitIR, GateOp

_GATE_RE = re.compile(
    r"^(?P<name>[a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\((?P<params>[^)]*)\))?\s*"
    r"(?P<args>\S.*?)\s*;$")
_CTRL_RE = re.compile(
    r"^ctrl\((?P<n>\d+)\)\s*@\s*(?P<name>[a-z]+)\s*"
    r"(?P<args>q\[\d+\](?:\s*,\s*q\[\d+\])*)\s*;$")
_QREG_RE = re.compile(r"^qubit\[(\d+)\]\s+q\s*;$")
_QREG2_RE = re.compile(r"^qreg\s+q\[(\d+)\]\s*;$")  # OpenQASM 2.0
_CREG_RE = re.compile(r"^(?:bit\[(\d+)\]\s+c|creg\s+c\[(\d+)\])\s*;$")
_MEAS3_RE = re.compile(r"^c\[(?P<c>\d+)\]\s*=\s*measure\s+q\[(?P<q>\d+)\]\s*;$")
_MEAS2_RE = re.compile(r"^measure\s+q\[(?P<q>\d+)\]\s*->\s*c\[(?P<c>\d+)\]\s*;$")
_IF_RE = re.compile(
    r"^if\s*\(\s*c(?:\[(?P<bit>\d+)\])?\s*==\s*(?P<val>\d+)\s*\)\s*"
    r"(?P<rest>.*)$")
_GATEDEF_RE = re.compile(
    r"^gate\s+(?P<name>[a-zA-Z_][a-zA-Z0-9_]*)\s*"
    r"(?:\((?P<params>[^)]*)\))?\s*(?P<args>[a-zA-Z_][\w\s,]*)\s*\{")

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

_EXPR_TOKENS = re.compile(r"^[\w\s+\-*/().]*$")


def _eval_param(expr: str, env: Dict[str, float]) -> float:
    """Evaluate a QASM parameter expression (numbers, pi, formal params,
    + - * / and parentheses only)."""
    expr = expr.strip()
    if not _EXPR_TOKENS.match(expr):
        raise ValueError(f"unsupported parameter expression: {expr!r}")
    names = dict(env)
    names["pi"] = math.pi
    try:
        return float(eval(expr, {"__builtins__": {}}, names))  # noqa: S307
    except Exception as exc:
        raise ValueError(f"cannot evaluate parameter {expr!r}: {exc}") from exc


@dataclasses.dataclass
class Measure:
    """Mid-circuit measurement of qubit -> classical bit."""
    qubit: int
    clbit: int


@dataclasses.dataclass
class Cond:
    """Apply ``ops`` when classical bit (or whole register when clbit is
    None) equals ``value``."""
    clbit: Optional[int]
    value: int
    ops: List[GateOp]


@dataclasses.dataclass
class GateDef:
    params: List[str]
    qargs: List[str]
    body: List[Tuple[str, List[str], List[str]]]  # (name, param_exprs, args)


@dataclasses.dataclass
class DynamicProgram:
    num_qubits: int
    num_clbits: int
    items: List[object]  # GateOp | Measure | Cond
    measure_all: bool = False

    @property
    def is_static(self) -> bool:
        return all(isinstance(it, GateOp) for it in self.items)

    def to_ir(self) -> CircuitIR:
        if not self.is_static:
            raise ValueError(
                "program uses measurement/classical control; execute it "
                "with compiler.dynamic.run_dynamic instead")
        ir = CircuitIR(self.num_qubits, name="from_qasm")
        ir.ops.extend(self.items)
        return ir


def _parse_gate_use(line: str, macros: Dict[str, GateDef],
                    env: Dict[str, float]) -> Optional[List[GateOp]]:
    """Parse one gate-application statement into GateOps (macro uses are
    expanded recursively)."""
    m = _CTRL_RE.match(line)
    if m:
        qubits = [int(x) for x in re.findall(r"q\[(\d+)\]", m.group("args"))]
        if m.group("name") != "x":
            raise ValueError(f"unsupported controlled gate: {line!r}")
        return [GateOp("MCX", tuple(qubits[-1:]), tuple(qubits[:-1]), ())]
    m = _GATE_RE.match(line)
    if not m:
        return None
    name = m.group("name").lower()
    arg_text = m.group("args")
    qubits = [int(x) for x in re.findall(r"q\[(\d+)\]", arg_text)]
    param_exprs = ([p for p in m.group("params").split(",")]
                   if m.group("params") else [])
    if name in macros:
        macro = macros[name]
        if len(param_exprs) != len(macro.params):
            raise ValueError(f"{name} expects {len(macro.params)} params")
        if len(qubits) != len(macro.qargs):
            raise ValueError(f"{name} expects {len(macro.qargs)} qubits")
        local = {p: _eval_param(e, env)
                 for p, e in zip(macro.params, param_exprs)}
        qmap = dict(zip(macro.qargs, qubits))
        out: List[GateOp] = []
        for bname, bparams, bargs in macro.body:
            sub_args = ", ".join(f"q[{qmap[a]}]" for a in bargs)
            sub_params = f"({', '.join(bparams)})" if bparams else ""
            sub_line = f"{bname}{sub_params} {sub_args};"
            sub = _parse_gate_use(sub_line, macros, local)
            if sub is None:
                raise ValueError(f"cannot parse macro body line {sub_line!r}")
            out.extend(sub)
        return out
    params = [_eval_param(p, env) for p in param_exprs]
    if name in _CTRL_MAP:
        base, nc = _CTRL_MAP[name]
        return [GateOp(base, tuple(qubits[nc:]), tuple(qubits[:nc]),
                       tuple(params))]
    if name in _NAME_MAP:
        base, ntgt, npar = _NAME_MAP[name]
        if len(params) != npar:
            raise ValueError(f"{name} expects {npar} params: {line!r}")
        return [GateOp(base, tuple(qubits), (), tuple(params))]
    raise ValueError(f"unknown gate in QASM: {line!r}")


def _split_statements(text: str) -> List[str]:
    """Normalize to one statement (or block header/footer) per element:
    statements end at ';', blocks open at '{' and close at '}' — all of
    which may share a source line."""
    out = []
    for raw in text.splitlines():
        line = raw.split("//")[0]
        # keep ';' with its statement and '{' with its header; '}' alone
        line = line.replace(";", ";\n").replace("{", "{\n")
        line = line.replace("}", "\n}\n")
        for piece in line.splitlines():
            piece = piece.strip()
            if piece:
                out.append(piece)
    return out


def _parse_gatedef_body(lines: List[str], start: int):
    """Collect a gate definition's body until the closing brace."""
    body: List[Tuple[str, List[str], List[str]]] = []
    i = start
    while i < len(lines):
        line = lines[i]
        if line.startswith("}"):
            return body, i + 1
        m = _GATE_RE.match(line)
        if not m:
            raise ValueError(f"cannot parse gate-definition line: {line!r}")
        params = ([p.strip() for p in m.group("params").split(",")]
                  if m.group("params") else [])
        args = [a.strip() for a in m.group("args").split(",")]
        body.append((m.group("name").lower(), params, args))
        i += 1
    raise ValueError("unterminated gate definition")


def parse_qasm3_program(text: str) -> DynamicProgram:
    num_qubits = None
    num_clbits = 0
    measure_all = False
    macros: Dict[str, GateDef] = {}
    items: List[object] = []
    lines = _split_statements(text)
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        if line.startswith(("OPENQASM", "include", "barrier")):
            continue
        m = _CREG_RE.match(line)
        if m:
            num_clbits = int(m.group(1) or m.group(2))
            continue
        if line.startswith(("c = measure", "c=measure")) or \
                re.match(r"^measure\s+q\s*->\s*c\s*;$", line):
            measure_all = True
            continue
        m = _QREG_RE.match(line) or _QREG2_RE.match(line)
        if m:
            num_qubits = int(m.group(1))
            continue
        m = _GATEDEF_RE.match(line)
        if m:
            params = ([p.strip() for p in m.group("params").split(",")]
                      if m.group("params") else [])
            qargs = [a.strip() for a in m.group("args").split(",")]
            rest = line[line.index("{") + 1:].strip()
            if rest:
                lines.insert(i, rest)
            body, i = _parse_gatedef_body(lines, i)
            macros[m.group("name").lower()] = GateDef(params, qargs, body)
            continue
        m = _MEAS3_RE.match(line) or _MEAS2_RE.match(line)
        if m:
            q, c = int(m.group("q")), int(m.group("c"))
            num_clbits = max(num_clbits, c + 1)
            items.append(Measure(q, c))
            continue
        m = _IF_RE.match(line)
        if m:
            bit = int(m.group("bit")) if m.group("bit") is not None else None
            value = int(m.group("val"))
            rest = m.group("rest").strip()
            cond_ops: List[GateOp] = []
            if rest.startswith("{"):
                rest = rest[1:].strip()
                block = [rest] if rest and rest != "}" else []
                while i < len(lines):
                    ln = lines[i]
                    i += 1
                    if ln.startswith("}"):
                        break
                    block.append(ln)
                for ln in block:
                    ops = _parse_gate_use(ln, macros, {})
                    if ops is None:
                        raise ValueError(f"cannot parse if-block line {ln!r}")
                    cond_ops.extend(ops)
            else:
                ops = _parse_gate_use(rest, macros, {})
                if ops is None:
                    raise ValueError(f"cannot parse conditional {rest!r}")
                cond_ops.extend(ops)
            items.append(Cond(bit, value, cond_ops))
            continue
        ops = _parse_gate_use(line, macros, {})
        if ops is not None:
            items.extend(ops)
            continue
        raise ValueError(f"cannot parse QASM line: {line!r}")
    if num_qubits is None:
        raise ValueError("QASM has no qubit register declaration")
    return DynamicProgram(num_qubits, num_clbits, items, measure_all)


def parse_qasm3(text: str) -> CircuitIR:
    """Static-circuit entry point (original contract): returns a CircuitIR,
    raising on measurement/classical-control constructs."""
    return parse_qasm3_program(text).to_ir()
