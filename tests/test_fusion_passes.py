"""Unit tests for the compiler fusion/consolidation pass pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.compiler.ir import CircuitIR, GateOp, ParamRef
from rocquantum_tpu.compiler.passes import (
    DiagBlock, FusedBlock, PallasBlock, consolidate_high, consolidate_low,
    fuse_diagonals, fuse_pallas_runs, is_diagonal, plan_fusion)
from rocquantum_tpu.compiler.interpreter import execute, parametrize
from rocquantum_tpu.ops import statevec as sv


def g(name, targets, controls=(), params=()):
    return GateOp(name, tuple(targets), tuple(controls), tuple(params))


class TestDiagonalFusion:
    def test_is_diagonal(self):
        assert is_diagonal(g("Z", [0]))
        assert is_diagonal(g("CRZ", [1], [0], [0.3]))
        assert is_diagonal(g("CZ", [1], [0]))
        assert not is_diagonal(g("X", [0]))
        assert not is_diagonal(g("CNOT", [1], [0]))

    def test_consecutive_diagonals_group(self):
        ops = [g("Z", [0]), g("S", [1]), g("CRZ", [2], [0], [0.1]),
               g("H", [0]), g("T", [1])]
        out = fuse_diagonals(ops)
        blocks = [o for o in out if isinstance(o, DiagBlock)]
        # first block holds the 3-gate cascade; H flushes it (shares qubit
        # 0); the trailing T stays a (singleton) DiagBlock — the elementwise
        # path is the fast path even for lone diagonals
        assert len(blocks) == 2
        assert len(blocks[0].ops) == 3
        assert len(blocks[1].ops) == 1 and blocks[1].ops[0].name == "T"
        names = [o.name for o in out if isinstance(o, GateOp)]
        assert "H" in names

    def test_disjoint_nondiagonal_passthrough(self):
        ops = [g("Z", [0]), g("H", [3]), g("S", [0])]
        out = fuse_diagonals(ops)
        blocks = [o for o in out if isinstance(o, DiagBlock)]
        assert len(blocks) == 1 and len(blocks[0].ops) == 2


class TestPallasRunCollection:
    def test_run_collection_threshold(self):
        ops = [g("H", [q]) for q in range(8)]
        out = fuse_pallas_runs(ops, max_qubit=17, min_gates=6)
        assert len(out) == 1 and isinstance(out[0], PallasBlock)
        short = fuse_pallas_runs([g("H", [0]), g("H", [1])], 17, min_gates=6)
        assert all(isinstance(o, GateOp) for o in short)

    def test_controlled_and_high_gates_excluded(self):
        # CNOTs now JOIN the fused run (in-kernel CNOT path); genuinely
        # controlled gates (CRZ etc.) and out-of-range gates stay out
        ops = [g("H", [q]) for q in range(6)] + \
              [g("CNOT", [1], [0])] + [g("H", [q]) for q in range(6)]
        out = fuse_pallas_runs(ops, max_qubit=17, min_gates=6)
        assert len(out) == 1 and isinstance(out[0], PallasBlock)
        assert len(out[0].ops) == 13
        # controlled DIAGONALS (CRZ/CZ/controlled-P) join as "D2" masked
        # multiplies; controlled DENSE 1q gates (CRY/CRX) join as "CU"
        ops_d = [g("H", [q]) for q in range(6)] + \
                [g("CRZ", [1], [0], [0.3])] + [g("H", [q]) for q in range(6)]
        out_d = fuse_pallas_runs(ops_d, max_qubit=17, min_gates=6)
        assert len(out_d) == 1 and isinstance(out_d[0], PallasBlock)
        ops_c = [g("H", [q]) for q in range(6)] + \
                [g("CRY", [1], [0], [0.3])] + [g("H", [q]) for q in range(6)]
        out_c = fuse_pallas_runs(ops_c, max_qubit=17, min_gates=6)
        assert len(out_c) == 1 and isinstance(out_c[0], PallasBlock)
        # multi-controlled gates still stay out
        ops_m = [g("H", [q]) for q in range(6)] + \
                [GateOp("UNITARY", (2,), (0, 1), (),
                        np.eye(2, dtype=np.complex128))] + \
                [g("H", [q]) for q in range(6)]
        out_m = fuse_pallas_runs(ops_m, max_qubit=17, min_gates=6)
        assert any(isinstance(o, GateOp) and o.controls == (0, 1)
                   for o in out_m)
        # gate above the kernel range never joins
        out2 = fuse_pallas_runs([g("H", [20])] * 7, max_qubit=17)
        assert all(isinstance(o, GateOp) for o in out2)


class TestConsolidation:
    def test_low_high_regions(self):
        ops = [g("H", [0]), g("T", [1]), g("H", [7]), g("H", [6]),
               g("CNOT", [4], [3])]
        plan = plan_fusion(ops)
        plan = consolidate_low(plan, 2)
        plan = consolidate_high(plan, 2, 8)
        lows = [b for b in plan if isinstance(b, FusedBlock)
                and b.qubits == (0, 1)]
        highs = [b for b in plan if isinstance(b, FusedBlock)
                 and b.qubits == (6, 7)]
        assert lows and highs

    def test_swap_bits_never_fused(self):
        ops = [g("H", [0]), GateOp("SWAP_BITS", (0, 5)), g("H", [0])]
        plan = plan_fusion(ops)
        plan = consolidate_low(plan, 6)
        names = [o.name for o in plan if isinstance(o, GateOp)]
        assert "SWAP_BITS" in names


class TestPipelineEquivalence:
    @pytest.mark.parametrize("seed", range(3))
    def test_all_passes_preserve_semantics(self, seed):
        from rocquantum_tpu.models import random_circuit_ir
        n = 9
        ir = random_circuit_ir(n, 20, seed=seed)
        ops, values = parametrize(ir.ops)
        p = jnp.asarray(values, jnp.float32)
        base = execute(sv.init_state(n), ops, p, fuse=False,
                       use_pallas=False)
        full = execute(sv.init_state(n), ops, p, low_width=4, high_width=4,
                       use_pallas=False)
        np.testing.assert_allclose(np.asarray(jnp.abs(base - full)),
                                   0, atol=1e-5)


class TestLaneRegionLayoutHazard:
    def test_cross_lane_gate_avoids_exposed_views(self):
        """Regression: H(25) + CNOT(25->0) at n=26 must not lower to
        exposed-view einsums with sub-lane trailing dims — TPU materialized
        them at 64x padding (32 GB for a 0.5 GB state). The roll-select
        path keeps all buffers 1-D."""
        import jax
        import jax.numpy as jnp
        from rocquantum_tpu.compiler.interpreter import compile_ir
        n = 26
        ir = CircuitIR(n)
        ir.add("H", [n - 1])
        ir.add("CNOT", [0], controls=[n - 1])
        fn = compile_ir(ir, donate=False, low_width=9, high_width=9)
        txt = jax.jit(lambda s, p: fn(s, p)).lower(
            jax.ShapeDtypeStruct((1 << n,), jnp.complex64),
            jax.ShapeDtypeStruct((0,), jnp.float32)).as_text()
        # the pathological signature: a rank>=5 view exposing qubit 0
        assert "16777216x2x1" not in txt
        assert "x2x1xcomplex" not in txt

    def test_roll_select_matches_reference(self):
        """roll-select path == dense reference for controlled/plain gates
        with lane-region targets at n just above the lane boundary."""
        import jax.numpy as jnp
        from rocquantum_tpu.ops import statevec as sv
        rng = np.random.default_rng(3)
        n = 9
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v = (v / np.linalg.norm(v)).astype(np.complex64)
        u = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        state = jnp.asarray(v)
        got = sv._roll_select_apply(state, jnp.asarray(u, jnp.complex64),
                                    [2], [8, 5])
        # reference via dense controlled construction
        full = np.zeros((1 << n, 1 << n), complex)
        for col in range(1 << n):
            if ((col >> 8) & 1) and ((col >> 5) & 1):
                t = (col >> 2) & 1
                for tn_ in (0, 1):
                    row = (col & ~(1 << 2)) | (tn_ << 2)
                    full[row, col] += u[tn_, t]
            else:
                full[col, col] = 1.0
        expected = full @ v
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestFreeDiagonalScheduling:
    """Diagonal gates are FREE in the kernel planner (out-of-window bits
    resolve from the grid position) and both-high CNOTs rewrite to
    H-CZ-H, halving their pair-slot cost."""

    def test_free_diagonals_do_not_consume_pairs(self):
        from rocquantum_tpu.ops.relabel import plan_full_layer
        n, reach = 24, 17
        sups = [(q,) for q in range(reach)] + \
               [(18, 20), (17, 23), (22, 22)]
        free = [False] * reach + [True, True, True]
        plan = plan_full_layer(n, sups, reach, free=free)
        assert len(plan) == 1
        assert plan[0].pair_bits == ()

    def test_high_cnot_ring_pass_count(self):
        # the n=29 2-layer RY+CNOT-ring body: H-CZ-H rewriting packs 3
        # chain CNOTs per 3-pair pass (was 2) -> 8 passes, down from 12
        from rocquantum_tpu.ops.relabel import plan_full_layer
        n, reach = 29, 17
        kinds, sups = [], []
        for _ in range(2):
            for q in range(n):
                kinds.append("U")
                sups.append((q,))
            for q in range(n):
                c, t = q, (q + 1) % n
                if min(c, t) >= reach:
                    kinds += ["U", "D2", "U"]
                    sups += [(t,), (c, t), (t,)]
                else:
                    kinds.append("CNOT")
                    sups.append((c, t))
        plan = plan_full_layer(n, sups, reach,
                               free=[k == "D2" for k in kinds])
        assert len(plan) <= 8
