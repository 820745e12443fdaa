"""QASM custom gate definitions + classical control (VERDICT r1 item 9):
the teleportation example round-trips through OpenQASM and the local
backend, matching the reference's dynamic-circuit acceptance check
(examples/dynamic_circuit_example.py:84 asserts <Z> = cos(theta))."""

import numpy as np
import pytest

from rocquantum_tpu.compiler.dynamic import expval_z_dynamic, run_dynamic
from rocquantum_tpu.compiler.qasm_parser import (Cond, Measure,
                                                 parse_qasm3,
                                                 parse_qasm3_program)

THETA = np.pi / 3

TELEPORT_QASM = f"""
OPENQASM 3.0;
include "stdgates.inc";
// teleport RY(theta)|0> from q[0] to q[2]
gate prep(theta) a {{
    ry(theta) a;
}}
gate bellpair a, b {{
    h a;
    cx a, b;
}}
qubit[3] q;
bit[2] c;
prep({THETA}) q[0];
bellpair q[1], q[2];
cx q[0], q[1];
h q[0];
c[0] = measure q[0];
c[1] = measure q[1];
if (c[1] == 1) {{
    x q[2];
}}
if (c[0] == 1) {{
    z q[2];
}}
"""


class TestParser:
    def test_gate_definitions_expand(self):
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        gate mygate(theta) a, b { ry(theta / 2) a; cx a, b; }
        mygate(1.0) q[0], q[1];
        """
        ir = parse_qasm3(qasm)
        names = [op.name for op in ir.ops]
        assert names == ["RY", "CNOT"]
        assert abs(ir.ops[0].params[0] - 0.5) < 1e-12
        assert ir.ops[1].controls == (0,) and ir.ops[1].targets == (1,)

    def test_nested_macro_and_pi_expr(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        gate half a { rz(pi / 2) a; }
        gate wrapped a { half a; h a; }
        wrapped q[0];
        """
        ir = parse_qasm3(qasm)
        assert [op.name for op in ir.ops] == ["RZ", "H"]
        assert abs(ir.ops[0].params[0] - np.pi / 2) < 1e-12

    def test_dynamic_constructs_parse(self):
        prog = parse_qasm3_program(TELEPORT_QASM)
        assert prog.num_qubits == 3
        assert prog.num_clbits == 2
        kinds = [type(it).__name__ for it in prog.items]
        assert kinds.count("Measure") == 2
        assert kinds.count("Cond") == 2
        with pytest.raises(ValueError):
            parse_qasm3(TELEPORT_QASM)  # static entry refuses dynamic text

    def test_qasm2_if_form(self):
        qasm = """
        OPENQASM 2.0;
        qreg q[2];
        creg c[1];
        h q[0];
        measure q[0] -> c[0];
        if (c == 1) x q[1];
        """
        prog = parse_qasm3_program(qasm)
        assert isinstance(prog.items[1], Measure)
        cond = prog.items[2]
        assert isinstance(cond, Cond) and cond.clbit is None
        assert cond.ops[0].name == "X"


class TestDynamicExecution:
    def test_teleportation_expval(self):
        prog = parse_qasm3_program(TELEPORT_QASM)
        ez = expval_z_dynamic(prog, qubit=2, shots=3000, seed=7)
        assert abs(ez - np.cos(THETA)) < 0.06

    def test_conditional_correlates_with_measurement(self):
        # H; measure; if(c==1) X  -> qubit always ends in |0>
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        h q[0];
        c[0] = measure q[0];
        if (c[0] == 1) { x q[0]; }
        """
        counts = run_dynamic(parse_qasm3_program(qasm), shots=256, seed=3)
        assert counts == {"0": 256}

    def test_single_shot_ensemble(self):
        """shots=1 runs an UNBATCHED circuit: the conditional/measure
        select paths must handle the flat state (regression: flags[:, None]
        broadcast corrupted it / sample[:, 0] crashed)."""
        qasm = """
        OPENQASM 2.0;
        qreg q[2]; creg c[2];
        h q[0];
        measure q[0] -> c[0];
        if (c==1) x q[1];
        measure q[1] -> c[1];
        """
        prog = parse_qasm3_program(qasm)
        for seed in range(8):
            counts = run_dynamic(prog, 1, seed=seed)
            assert sum(counts.values()) == 1
            assert set(counts) <= {"00", "11"}, counts

    def test_single_shot_ensemble_fp64_pair(self):
        """shots=1 under double precision rides the fp64 pair engine
        through the dynamic conditional machinery."""
        from rocquantum_tpu import config
        qasm = """
        OPENQASM 2.0;
        qreg q[2]; creg c[2];
        h q[0];
        measure q[0] -> c[0];
        if (c==1) x q[1];
        """
        prog = parse_qasm3_program(qasm)
        old = config.get_precision()
        config.set_precision("double")
        try:
            for seed in range(6):
                counts = run_dynamic(prog, 1, seed=seed)
                assert set(counts) <= {"00", "11"}, counts
        finally:
            config.set_precision(old)

    def test_local_backend_runs_dynamic_qasm(self):
        import rocquantum_tpu.core as core
        from rocquantum_tpu.backends.local import LocalTPUBackend

        backend = LocalTPUBackend(shots_seed=5)
        job = backend.submit_job(TELEPORT_QASM, shots=1500)
        assert backend.get_job_status(job) == "completed"
        counts = backend.get_job_result(job)
        total = sum(counts.values())
        assert total == 1500
        # marginal over q[2] (leftmost bit of the 3-bit strings)
        p0 = sum(v for k, v in counts.items() if k[0] == "0") / total
        ez = 2 * p0 - 1
        assert abs(ez - np.cos(THETA)) < 0.08


def test_run_dynamic_chunks_large_shot_counts(monkeypatch):
    # force tiny chunks: results must still be a complete, correct histogram
    import rocquantum_tpu.compiler.dynamic as dyn
    monkeypatch.setattr(dyn, "_MAX_BATCH_ELEMENTS", 1 << 7)  # 64 shots at n=1
    qasm = """
    OPENQASM 3.0;
    qubit[1] q;
    bit[1] c;
    h q[0];
    c[0] = measure q[0];
    if (c[0] == 1) { x q[0]; }
    """
    counts = dyn.run_dynamic(parse_qasm3_program(qasm), shots=500, seed=2)
    assert counts == {"0": 500}


class TestForLoops:
    """Classical for loops (OpenQASM 3 [start:stop] / [start:step:stop],
    stop inclusive), unrolled at parse time; the loop variable works in
    parameter expressions and qubit indices."""

    def test_for_ghz(self):
        qasm = """
        OPENQASM 3.0;
        qubit[4] q;
        h q[0];
        for int i in [0:2] {
            cx q[i], q[i+1];
        }
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3(qasm)
        names = [(op.name, op.targets, op.controls) for op in ir.ops]
        assert names == [("H", (0,), ()), ("CNOT", (1,), (0,)),
                         ("CNOT", (2,), (1,)), ("CNOT", (3,), (2,))]

    def test_for_with_step_and_params(self):
        qasm = """
        OPENQASM 3.0;
        qubit[6] q;
        for int k in [0:2:4] {
            ry(0.1*k + 0.05) q[k];
        }
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3(qasm)
        assert [op.targets[0] for op in ir.ops] == [0, 2, 4]
        np.testing.assert_allclose([op.params[0] for op in ir.ops],
                                   [0.05, 0.25, 0.45])

    def test_nested_for_and_macro(self):
        qasm = """
        OPENQASM 3.0;
        qubit[4] q;
        gate layer(t) a, b { ry(t) a; cx a, b; }
        for int i in [0:1] {
            for int j in [0:1] {
                layer(0.1*i + 0.01*j) q[2*i], q[2*i+1];
            }
        }
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3(qasm)
        assert len(ir.ops) == 8  # 4 iterations x (ry + cx)
        ry_params = [op.params[0] for op in ir.ops if op.name == "RY"]
        np.testing.assert_allclose(ry_params, [0.0, 0.01, 0.1, 0.11])

    def test_for_with_measurement_runs_dynamic(self):
        # loop body containing measurement: unrolls into a dynamic program
        qasm = """
        OPENQASM 3.0;
        qubit[3] q;
        bit[3] c;
        for int i in [0:2] {
            h q[i];
            c[i] = measure q[i];
        }
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3_program
        prog = parse_qasm3_program(qasm)
        assert not prog.is_static
        assert prog.num_clbits == 3
        from rocquantum_tpu.compiler.dynamic import run_dynamic
        counts = run_dynamic(prog, shots=64, seed=3)
        assert sum(counts.values()) == 64
        assert all(set(k) <= {"0", "1"} and len(k) == 3 for k in counts)


class TestWhileLoops:
    """Classical while loops execute shot-batched with per-shot active
    masks (bounded by WHILE_MAX_ITERATIONS); bodies may re-measure —
    repeat-until-success programs work."""

    def test_while_parses_nested(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        while (c[0] == 0) {
            h q[0];
            c[0] = measure q[0];
        }
        """
        from rocquantum_tpu.compiler.qasm_parser import While
        prog = parse_qasm3_program(qasm)
        assert len(prog.items) == 1
        wh = prog.items[0]
        assert isinstance(wh, While)
        assert wh.clbit == 0 and wh.value == 0
        assert [type(it).__name__ for it in wh.items] == ["GateOp", "Measure"]

    def test_repeat_until_success(self):
        # H then measure, repeating until the outcome is 1: every shot must
        # terminate in |1> (P(still active after 100 iters) ~ 2^-100)
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        while (c[0] == 0) {
            h q[0];
            c[0] = measure q[0];
        }
        """
        counts = run_dynamic(parse_qasm3_program(qasm), shots=128, seed=11)
        assert counts == {"1": 128}

    def test_while_masks_inactive_shots(self):
        # first measurement splits the ensemble: only c[0]==0 shots enter
        # the loop (which flips q[1] and q[0] exactly once and exits with
        # both set); the q[0]=1 shots must keep q[1]=0 untouched ->
        # outcomes "01" (never looped) or "11" (looped once), with q[0]
        # the rightmost bit
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[2] c;
        h q[0];
        c[0] = measure q[0];
        while (c[0] == 0) {
            x q[1];
            x q[0];
            c[0] = measure q[0];
        }
        """
        counts = run_dynamic(parse_qasm3_program(qasm), shots=200, seed=4)
        assert set(counts) == {"01", "11"}
        assert sum(counts.values()) == 200

    def test_while_register_compare_form(self):
        qasm = """
        OPENQASM 2.0;
        qreg q[1];
        creg c[1];
        while (c == 0) {
            h q[0];
            measure q[0] -> c[0];
        }
        """
        counts = run_dynamic(parse_qasm3_program(qasm), shots=64, seed=9)
        assert counts == {"1": 64}


class TestDefSubroutines:
    """OpenQASM 3 ``def`` subroutines: qubit + classical args, bodies with
    gates / measurement / control flow, expanded at call sites."""

    def test_def_expands_static(self):
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        def entangle(qubit a, qubit b, float t) {
            ry(t) a;
            cx a, b;
        }
        entangle(q[0], q[1], pi/2);
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3(qasm)
        assert [op.name for op in ir.ops] == ["RY", "CNOT"]
        assert abs(ir.ops[0].params[0] - np.pi / 2) < 1e-12
        assert ir.ops[1].controls == (0,) and ir.ops[1].targets == (1,)

    def test_def_with_for_and_macro_body(self):
        qasm = """
        OPENQASM 3.0;
        qubit[4] q;
        def ghz_tail(qubit a) {
            for int i in [1:3] {
                cx q[i-1], q[i];
            }
        }
        h q[0];
        ghz_tail(q[0]);
        """
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3(qasm)
        assert [op.name for op in ir.ops] == ["H", "CNOT", "CNOT", "CNOT"]

    def test_def_with_measurement_executes(self):
        # subroutine performing a measured parity check on the creg
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[1] c;
        def check(qubit a) {
            c[0] = measure a;
        }
        x q[0];
        check(q[0]);
        if (c[0] == 1) { x q[1]; }
        """
        counts = run_dynamic(parse_qasm3_program(qasm), shots=32, seed=1)
        assert counts == {"11": 32}

    def test_def_arg_count_mismatch_raises(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        def f(qubit a, float t) { ry(t) a; }
        f(q[0]);
        """
        with pytest.raises(ValueError):
            parse_qasm3_program(qasm)


class TestGateModifiers:
    """OpenQASM 3 gate modifiers: inv @, pow(k) @, ctrl(n) @, negctrl @ —
    composable, including over user-defined gates."""

    def test_inv_pow_ctrl_forms(self):
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3("""
        OPENQASM 3.0;
        qubit[3] q;
        inv @ s q[0];
        pow(2) @ t q[0];
        ctrl @ rz(0.5) q[1], q[0];
        ctrl(2) @ x q[0], q[1], q[2];
        pow(-1) @ s q[0];
        """)
        kinds = [(op.name, op.controls, op.is_adjoint) for op in ir.ops]
        assert kinds[0] == ("S", (), True)
        assert kinds[1] == ("T", (), False) and kinds[2] == ("T", (), False)
        assert kinds[3] == ("RZ", (1,), False)
        assert kinds[4] == ("X", (0, 1), False)
        assert kinds[5] == ("S", (), True)

    def test_negctrl_via_x_conjugation(self):
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3("""
        OPENQASM 3.0;
        qubit[2] q;
        negctrl @ x q[0], q[1];
        """)
        names = [(op.name, op.targets, op.controls) for op in ir.ops]
        assert names == [("X", (0,), ()), ("X", (1,), (0,)),
                         ("X", (0,), ())]
        # behavior: |00> -> control 0 is 0 -> fires -> |10> (q1 flipped)
        counts = run_dynamic(parse_qasm3_program("""
        OPENQASM 3.0;
        qubit[2] q;
        negctrl @ x q[0], q[1];
        """), shots=16, seed=0)
        assert counts == {"10": 16}

    def test_inv_of_macro_reverses_and_daggers(self):
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3("""
        OPENQASM 3.0;
        qubit[1] q;
        gate st a { s a; t a; }
        st q[0];
        inv @ st q[0];
        """)
        names = [(op.name, op.is_adjoint) for op in ir.ops]
        assert names == [("S", False), ("T", False),
                         ("T", True), ("S", True)]

    def test_nested_parens_in_params_and_pow(self):
        # ADVICE r2: [^)]* regexes truncated nested-paren expressions
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3("""
        OPENQASM 3.0;
        qubit[1] q;
        rz(pi/(1+1)) q[0];
        pow(2*(1+1)) @ t q[0];
        pow(2) @ rz(pi/(1+1)) q[0];
        """)
        names = [op.name for op in ir.ops]
        assert names == ["RZ"] + ["T"] * 4 + ["RZ"] * 2
        import math
        assert abs(ir.ops[0].params[0] - math.pi / 2) < 1e-9
        assert abs(ir.ops[5].params[0] - math.pi / 2) < 1e-9

    def test_nested_parens_in_gatedef_body(self):
        from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
        ir = parse_qasm3("""
        OPENQASM 3.0;
        qubit[1] q;
        gate half(t) a { rz(t/(1+1)) a; }
        half(1.0) q[0];
        """)
        assert [op.name for op in ir.ops] == ["RZ"]
        assert abs(ir.ops[0].params[0] - 0.5) < 1e-9


class TestWhileMaxIterWarning:
    def test_nonconverged_while_warns(self):
        # condition never clears: c stays 1 (no re-measure in body)
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        x q[0];
        c[0] = measure q[0];
        while (c[0] == 1) { z q[0]; }
        """
        prog = parse_qasm3_program(qasm)
        prog.items[-1].max_iter = 5
        with pytest.warns(RuntimeWarning, match="did not converge"):
            run_dynamic(prog, shots=4, seed=0)

    def test_converged_while_does_not_warn(self):
        import warnings as _w
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        x q[0];
        c[0] = measure q[0];
        while (c[0] == 1) { x q[0]; c[0] = measure q[0]; }
        """
        prog = parse_qasm3_program(qasm)
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            run_dynamic(prog, shots=4, seed=0)


class TestSwitch:
    """OpenQASM 3 ``switch`` statements, shot-batched (reference scope:
    classical control ran host-side per shot,
    examples/dynamic_circuit_example.py)."""

    def test_switch_parses(self):
        from rocquantum_tpu.compiler.qasm_parser import Switch
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[2] c;
        h q[0];
        c[0] = measure q[0];
        c[1] = measure q[1];
        switch (c) {
            case 1 { x q[1]; }
            case 2, 3 { z q[1]; }
            default { }
        }
        """
        prog = parse_qasm3_program(qasm)
        sw = prog.items[-1]
        assert isinstance(sw, Switch)
        assert sw.clbit is None
        assert [vals for vals, _ in sw.cases] == [(1,), (2, 3)]
        assert sw.default == []

    def test_switch_register_routes_arms(self):
        # q0 measured in superposition: c in {0, 1}; case 1 flips q1,
        # default (c==0) leaves it — so afterwards q1 == c[0] always,
        # and measuring q1 equals c[0] per shot
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[2] c;
        h q[0];
        c[0] = measure q[0];
        switch (c) {
            case 1 { x q[1]; }
            default { }
        }
        c[1] = measure q[1];
        """
        prog = parse_qasm3_program(qasm)
        counts = run_dynamic(prog, shots=64, seed=3)
        # measured over all qubits: bitstring q1 q0 — equal bits always
        assert set(counts) <= {"00", "11"}
        assert sum(counts.values()) == 64

    def test_switch_single_bit_and_case_priority(self):
        # switch (c[0]): first matching case wins; arm bodies may measure
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[2] c;
        x q[0];
        c[0] = measure q[0];
        switch (c[0]) {
            case 1 { x q[1]; c[1] = measure q[1]; }
            case 1, 0 { }
        }
        """
        prog = parse_qasm3_program(qasm)
        counts = run_dynamic(prog, shots=16, seed=0)
        assert counts == {"11": 16}

    def test_switch_bad_arm_raises(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        switch (c) { x q[0]; }
        """
        with pytest.raises(ValueError, match="case"):
            parse_qasm3_program(qasm)


class TestDefReturns:
    def test_def_return_measure_captures(self):
        # def -> bit: return measure lowers to a measurement into the
        # capturing classical bit
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[2] c;
        def flip_and_read(qubit a) -> bit {
            x a;
            return measure a;
        }
        c[1] = flip_and_read(q[0]);
        """
        prog = parse_qasm3_program(qasm)
        meas = [it for it in prog.items if isinstance(it, Measure)]
        assert len(meas) == 1 and meas[0].qubit == 0 and meas[0].clbit == 1
        counts = run_dynamic(prog, shots=8, seed=0)
        assert counts == {"01": 8}

    def test_def_return_feeds_conditional(self):
        qasm = """
        OPENQASM 3.0;
        qubit[2] q;
        bit[1] c;
        def coin(qubit a) -> bit {
            h a;
            return measure a;
        }
        c[0] = coin(q[0]);
        if (c[0] == 1) { x q[1]; }
        """
        prog = parse_qasm3_program(qasm)
        counts = run_dynamic(prog, shots=64, seed=5)
        assert set(counts) <= {"00", "11"}

    def test_uncaptured_return_call_raises(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        bit[1] c;
        def coin(qubit a) -> bit { h a; return measure a; }
        coin(q[0]);
        """
        with pytest.raises(ValueError, match="capture"):
            parse_qasm3_program(qasm)

    def test_missing_return_in_typed_def_raises(self):
        qasm = """
        OPENQASM 3.0;
        qubit[1] q;
        def coin(qubit a) -> bit { h a; }
        """
        with pytest.raises(ValueError, match="return measure"):
            parse_qasm3_program(qasm)
