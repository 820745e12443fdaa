"""Pallas fused-gate kernel: interpret-mode correctness vs the einsum path
(same strategy as the reference's kernel-vs-CPU-reference permute tests,
test_PermutationKernels.cpp:116-177)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.ops import statevec as sv
from rocquantum_tpu.ops import gates as g
from rocquantum_tpu.ops.pallas_sv import (apply_fused_1q_layer,
                                          fused_layer_complex,
                                          max_kernel_qubit, pack_gate_mats)


def rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex64)


def reference_apply(state, qubits, mats):
    out = jnp.asarray(state)
    for q, m in zip(qubits, mats):
        out = sv.apply_matrix(out, jnp.asarray(m, jnp.complex64), [q])
    return np.asarray(out)


@pytest.mark.parametrize("n", [8, 14, 16])
def test_full_layer_matches_einsum(n):
    rng = np.random.default_rng(1)
    state = rand_state(n, 2)
    qubits = list(range(min(n, max_kernel_qubit(n) + 1)))
    mats = []
    for _ in qubits:
        th = rng.normal()
        mats.append(np.array(
            [[np.cos(th / 2), -np.sin(th / 2)],
             [np.sin(th / 2), np.cos(th / 2)]], np.complex64))
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_complex_gates_and_subsets():
    n = 10
    state = rand_state(n, 5)
    qubits = [0, 3, 7, 9]
    mats = [np.asarray(g.H), np.asarray(g.S), np.asarray(g.T),
            np.asarray(g.Y)]
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_row_space_qubits():
    # qubits above COL_QUBITS exercise the row-pairing branch
    n = 16
    state = rand_state(n, 7)
    qubits = [12, 13]  # COL_QUBITS = 12 -> row space
    mats = [np.asarray(g.H), np.asarray(g.X)]
    expected = reference_apply(state, qubits, mats)
    got = np.asarray(fused_layer_complex(
        jnp.asarray(state), qubits, jnp.asarray(pack_gate_mats(mats)),
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rejects_out_of_range_qubit():
    n = 16
    state = jnp.asarray(rand_state(n))
    re = jnp.real(state)
    im = jnp.imag(state)
    with pytest.raises(ValueError):
        apply_fused_1q_layer(re, im, [max_kernel_qubit(n) + 1],
                             jnp.zeros((1, 2, 2, 2), jnp.float32),
                             interpret=True)


# ---------------------------------------------------------------------------
# Pair-bit + relabel scheduling (full-qubit-range coverage)
# ---------------------------------------------------------------------------

from rocquantum_tpu.ops.relabel import (KernelPass, Rotation,  # noqa: E402
                                        execute_plan, plan_full_1q_layer,
                                        rotate_bits_down)


def test_pair_bit_matches_einsum():
    # in-tile qubits + one block bit reached via pairing (n=18: col=12,
    # tile=5 -> limit=17 < n, so bit 17 is a block bit)
    n = 18
    state = rand_state(n, 11)
    limit = max_kernel_qubit(n) + 1
    assert limit < n
    qubits = [0, 5, 13, limit]
    rng = np.random.default_rng(3)
    mats = [np.asarray(g.H), np.asarray(g.S), np.asarray(g.T),
            np.asarray(g.Y)]
    expected = reference_apply(state, qubits, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_1q_layer(re, im, qubits,
                                  jnp.asarray(pack_gate_mats(mats)),
                                  pair_bit=limit, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rotate_bits_down_roundtrip():
    n = 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))
    # rotating down by s then by size-s restores the array
    y = rotate_bits_down(x, n, 2)
    z = rotate_bits_down(y, n, (n - 7) - 2)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    # semantic check: bit at position 7+2 moves to position 7
    # index with only bit 9 set maps to index with only bit 7 set
    e = jnp.zeros((1 << n,), jnp.float32).at[1 << 9].set(1.0)
    r = rotate_bits_down(e, n, 2)
    assert float(r[1 << 7]) == 1.0


def test_plan_full_layer_covers_everything():
    n = 29
    reach = 17
    qubits = list(range(n))
    plan = plan_full_1q_layer(n, qubits, reach)
    covered = []
    for item in plan:
        assert isinstance(item, KernelPass)  # rotations are never emitted
        covered.extend(item.gate_idx)
        assert len(item.pair_bits) <= 3
        assert all(p >= reach for p in item.pair_bits)
    assert sorted(covered) == list(range(n))
    # full 29-qubit layer: window pass + 3 pair bits, then 3 pair bits per
    # pass for the remaining 9 high qubits = 4 passes total (the rotation
    # scheme needed 3 passes + 3 full-state rotation copies)
    assert len(plan) == 4


def test_plan_handles_2q_both_out_of_window():
    # CNOT with control AND target above the window: two pair bits in one
    # pass (previously unschedulable without rotations)
    n = 30
    reach = 17
    supports = [(28, 22), (5,), (22,)]
    plan = plan_full_layer(n, supports, reach)
    assert all(isinstance(p, KernelPass) for p in plan)
    first = plan[0]
    assert 0 in first.gate_idx
    assert set(first.pair_bits) >= {22, 28}
    order = [i for p in plan for i in p.gate_idx]
    assert order.index(0) < order.index(2)  # dependency kept (qubit 22)


@pytest.mark.parametrize("n,qubits", [
    (17, list(range(17))),
    (18, list(range(18))),
    (19, list(range(19))),
    (20, [0, 3, 11, 14, 17, 18, 19]),
    (21, list(range(21)) + [20, 19, 0]),  # repeated qubits keep order
])
def test_full_range_plan_matches_einsum(n, qubits):
    rng = np.random.default_rng(n)
    state = rand_state(n, n)
    mats = []
    for _ in qubits:
        th = rng.normal()
        mats.append(np.array(
            [[np.cos(th / 2), -1j * np.sin(th / 2)],
             [-1j * np.sin(th / 2), np.cos(th / 2)]], np.complex64))
    expected = reference_apply(state, qubits, mats)
    from rocquantum_tpu.ops.pallas_sv import COL_QUBITS, TILE_ROWS_LOG2
    reach = min(COL_QUBITS, n) + min(TILE_ROWS_LOG2, n - min(COL_QUBITS, n))
    plan = plan_full_1q_layer(n, qubits, reach, pair_ok=n > reach)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = execute_plan(re, im, plan,
                          jnp.asarray(pack_gate_mats(mats)), n,
                          interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused CNOT support (1q + CNOT in one kernel pass)
# ---------------------------------------------------------------------------

from rocquantum_tpu.ops.pallas_sv import apply_fused_layer  # noqa: E402
from rocquantum_tpu.ops.relabel import plan_full_layer  # noqa: E402


def reference_apply_specs(state, specs, mats):
    out = jnp.asarray(state)
    for spec, m in zip(specs, mats):
        if spec[0] == "CNOT":
            out = sv.apply_controlled_matrix(
                out, jnp.asarray(g.X, jnp.complex64), [spec[1]], [spec[2]])
        else:
            out = sv.apply_matrix(out, jnp.asarray(m, jnp.complex64),
                                  [spec[1]])
    return np.asarray(out)


def _ry(th):
    return np.array([[np.cos(th / 2), -np.sin(th / 2)],
                     [np.sin(th / 2), np.cos(th / 2)]], np.complex64)


def test_fused_cnot_in_window():
    n = 14
    state = rand_state(n, 21)
    eye = np.eye(2, dtype=np.complex64)
    specs = [("U", 0), ("CNOT", 0, 1), ("CNOT", 5, 13), ("CNOT", 13, 2),
             ("U", 13)]
    mats = [_ry(0.3), eye, eye, eye, np.asarray(g.H)]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.parametrize("pair_role", ["control", "target"])
def test_fused_cnot_pair_bit(pair_role):
    n = 18
    limit = max_kernel_qubit(n) + 1
    state = rand_state(n, 22)
    eye = np.eye(2, dtype=np.complex64)
    if pair_role == "control":
        specs = [("U", 3), ("CNOT", limit, 4)]
    else:
        specs = [("U", 3), ("CNOT", 4, limit)]
    mats = [np.asarray(g.H), eye]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bit=limit, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_free_control_cnot_row_target_with_pair_bits():
    # Regression (ADVICE r2, high): a multi-pair pass whose rowdot group
    # holds a CNOT with a FREE (out-of-window, unpaired) control and a
    # tile-ROW-region target (COL_QUBITS <= t < limit). _kernel_multi's
    # rowdot branch must pass pair_bits/limit to _compose_row_matrix or
    # the control mask reads a nonexistent row-index bit and the CNOT is
    # silently dropped (err ~7e-3 end to end).
    n = 19
    limit = max_kernel_qubit(n) + 1
    assert limit == 17
    state = rand_state(n, 77)
    eye = np.eye(2, dtype=np.complex64)
    # U(17) forces pair_bits=(17,); CNOT(18 -> 13): control 18 is free,
    # target 13 is in the row region -> rowdot with a free control
    specs = [("U", 17), ("CNOT", 18, 13)]
    mats = [_ry(0.9), eye]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=(17,), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_free_control_cnot_row_target_multi_pair_bits():
    # Same path with TWO pair bits and extra row gates sharing the rowdot
    n = 20
    limit = max_kernel_qubit(n) + 1
    state = rand_state(n, 78)
    eye = np.eye(2, dtype=np.complex64)
    specs = [("U", 17), ("U", 18), ("CNOT", 19, 14), ("U", 13)]
    mats = [_ry(0.4), np.asarray(g.H), eye, _ry(1.1)]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=(17, 18), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_plan_respects_cnot_dependencies():
    # RY(q20); CNOT(20 -> 3); RY(3): strictly ordered chain — the plan must
    # not let the later RY(3) overtake the CNOT into an earlier pass
    n = 21
    reach = 17
    supports = [(20,), (20, 3), (3,)]
    plan = plan_full_layer(n, supports, reach)
    order = []
    for item in plan:
        if isinstance(item, KernelPass):
            order.extend(item.gate_idx)
    assert order == [0, 1, 2]
    # and within each pass, gate indices are in original order
    for item in plan:
        if isinstance(item, KernelPass):
            assert list(item.gate_idx) == sorted(item.gate_idx)


def test_multi_pair_cnot_both_high_matches_reference():
    # CNOTs whose control AND target are both above the roll window ride
    # two pair bits in one pass (no dense fallback, no relabeling)
    n = 20
    limit = max_kernel_qubit(n) + 1
    assert limit == 17
    state = rand_state(n, 55)
    eye = np.eye(2, dtype=np.complex64)
    specs = [("U", 19), ("CNOT", 19, 17), ("CNOT", 18, 3), ("U", 17),
             ("CNOT", 2, 18), ("U", 5)]
    mats = [_ry(0.7), eye, eye, np.asarray(g.H), eye, _ry(1.3)]
    expected = reference_apply_specs(state, specs, mats)
    supports = [s[1:] for s in specs]
    plan = plan_full_layer(n, supports, limit)
    kinds = [s[0] for s in specs]
    from rocquantum_tpu.ops.relabel import execute_plan as run_plan
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = run_plan(re, im, plan, jnp.asarray(pack_gate_mats(mats)), n,
                      kinds=kinds, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=2e-5)
    # all in ONE pass: every gate fits window ∪ {17, 18, 19}
    assert len(plan) == 1 and set(plan[0].pair_bits) == {17, 18, 19}


def test_full_ansatz_layer_with_relabel_matches_reference():
    # hardware-efficient ansatz layer: RY column + CNOT ring, n=20 (spans
    # the window boundary) — via plan_full_layer + execute_plan
    n = 20
    state = rand_state(n, 33)
    rng = np.random.default_rng(4)
    specs, mats = [], []
    for q in range(n):
        specs.append(("U", q))
        mats.append(_ry(rng.normal()))
    eye = np.eye(2, dtype=np.complex64)
    for q in range(n):
        specs.append(("CNOT", q, (q + 1) % n))
        mats.append(eye)
    expected = reference_apply_specs(state, specs, mats)
    from rocquantum_tpu.ops.pallas_sv import COL_QUBITS, TILE_ROWS_LOG2
    reach = min(COL_QUBITS, n) + min(TILE_ROWS_LOG2, n - min(COL_QUBITS, n))
    supports = [s[1:] for s in specs]
    plan = plan_full_layer(n, supports, reach, pair_ok=True)
    kinds = [s[0] for s in specs]
    from rocquantum_tpu.ops.relabel import execute_plan as run_plan
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = run_plan(re, im, plan, jnp.asarray(pack_gate_mats(mats)), n,
                      kinds=kinds, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=2e-5)


# ---------------------------------------------------------------------------
# Native C++ scheduler parity (native/fusion_planner.cpp)
# ---------------------------------------------------------------------------

def _python_plan(n, supports, reach, pair_ok=True, max_pairs=None,
                 free=None):
    """Force the pure-Python scheduling path."""
    import rocquantum_tpu.ops._native_planner as npl
    import rocquantum_tpu.ops.relabel as rl
    orig = npl.plan_layer_native
    npl.plan_layer_native = lambda *a, **k: None
    try:
        return rl.plan_full_layer(n, supports, reach, pair_ok=pair_ok,
                                  max_pairs=max_pairs, free=free)
    finally:
        npl.plan_layer_native = orig


def test_native_planner_matches_python_oracle():
    import rocquantum_tpu.ops._native_planner as npl
    if npl._load() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    for trial in range(30):
        n = int(rng.integers(18, 33))
        reach = 17
        supports = []
        for _ in range(int(rng.integers(1, 60))):
            if rng.random() < 0.6:
                supports.append((int(rng.integers(0, n)),))
            else:
                a = int(rng.integers(0, n))
                b = int((a + 1 + rng.integers(0, n - 1)) % n)
                supports.append((a, b))
        # ~1/4 of gates marked FREE (diagonals): the native scheduler must
        # agree with the Python oracle on the extended model too
        free = [bool(rng.random() < 0.25) for _ in supports]
        for max_pairs in (2, 3):
            py = _python_plan(n, supports, reach, max_pairs=max_pairs)
            nat = plan_full_layer(n, supports, reach, max_pairs=max_pairs)
            assert py == nat, (trial, max_pairs, py, nat)
            py_f = _python_plan(n, supports, reach, max_pairs=max_pairs,
                                free=free)
            nat_f = plan_full_layer(n, supports, reach, max_pairs=max_pairs,
                                    free=free)
            assert py_f == nat_f, (trial, max_pairs, py_f, nat_f)


def test_mxu_dot_groups_match_reference():
    # >= 2 lane-bit gates (dot threshold) + row-bit gates + a CNOT barrier
    # through the lane region, complex and real mixed — exercises the
    # in-kernel MXU offload (lanedot/rowdot composition)
    n = 18
    state = rand_state(n, 77)
    rng = np.random.default_rng(6)

    def rx(th):
        return np.array([[np.cos(th / 2), -1j * np.sin(th / 2)],
                         [-1j * np.sin(th / 2), np.cos(th / 2)]],
                        np.complex64)

    eye = np.eye(2, dtype=np.complex64)
    specs = [("U", 0), ("U", 3), ("U", 6), ("U", 12), ("U", 14),
             ("CNOT", 2, 13), ("U", 1), ("U", 5), ("U", 13)]
    mats = [rx(0.3), _ry(0.7), rx(1.1), _ry(0.5), rx(0.9),
            eye, _ry(0.2), rx(0.4), _ry(1.3)]
    flags = [False, True, False, True, False, True, True, False, True]
    expected = reference_apply_specs(state, specs, mats)
    from rocquantum_tpu.ops.pallas_sv import _plan_mxu_items
    items = _plan_mxu_items(specs, (), 12, 32)
    kinds = [it[0] for it in items]
    assert "lanedot" in kinds and "rowdot" in kinds
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               real_flags=flags, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_bf16x3_dot_mode_matches_reference(monkeypatch):
    # ROCQ_DOT_PRECISION=bf16x3: the hand-rolled 3-pass bf16 region dot
    # (Mosaic rejects Precision.HIGH inside pallas) must stay inside the
    # engine's f32 tolerance on every dot region (lane/mid/row)
    monkeypatch.setenv("ROCQ_DOT_PRECISION", "bf16x3")
    n = 18
    state = rand_state(n, 42)
    rng = np.random.default_rng(9)

    def rx(th):
        return np.array([[np.cos(th / 2), -1j * np.sin(th / 2)],
                         [-1j * np.sin(th / 2), np.cos(th / 2)]],
                        np.complex64)

    specs = [("U", q) for q in (0, 3, 6, 8, 10, 12, 14, 1, 5, 13)]
    mats = [rx(x) if i % 2 else _ry(x)
            for i, x in enumerate(rng.normal(size=len(specs)))]
    flags = [bool(np.allclose(m.imag, 0)) for m in mats]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               real_flags=flags, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=5e-5)


def test_mxu_cnot_barrier_ordering():
    # CNOT(0 -> 13) does not commute with pending lane gates on qubit 0 or
    # row gates on 13: the planner must flush both groups first
    from rocquantum_tpu.ops.pallas_sv import _plan_mxu_items
    specs = [("U", 0), ("U", 2), ("U", 13), ("CNOT", 0, 13), ("U", 0)]
    items = _plan_mxu_items(specs, (), 12, 32)
    flat = []
    for kind, payload in items:
        flat.extend(payload if kind != "spec" else [payload])
    # gates 0,1 (lane) and 2 (row) before the CNOT (3); gate 4 after
    assert flat.index(3) > max(flat.index(0), flat.index(1), flat.index(2))
    assert flat.index(4) > flat.index(3)
    # correctness of the ordering on a real state
    n = 15
    state = rand_state(n, 88)
    eye = np.eye(2, dtype=np.complex64)
    mats = [_ry(0.3), _ry(0.8), _ry(0.4), eye, _ry(1.1)]
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               real_flags=[True] * 5, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_mxu_composes_lane_and_row_cnots():
    # CNOTs with both qubits inside one dot region compose into the dot
    # matrix (permutation columns) instead of acting as barriers
    from rocquantum_tpu.ops.pallas_sv import _plan_mxu_items
    n = 18
    specs = [("U", 0), ("CNOT", 1, 4), ("U", 3), ("CNOT", 13, 14),
             ("U", 12), ("CNOT", 5, 14)]
    items = _plan_mxu_items(specs, (), 12, 32)
    lane_groups = [p for kk, p in items if kk == "lanedot"]
    row_groups = [p for kk, p in items if kk == "rowdot"]
    assert lane_groups and 1 in lane_groups[0]   # lane CNOT composed
    assert row_groups and 3 in row_groups[0]     # row CNOT composed
    # the cross-region CNOT (5, 14) stays a spec and barriers both
    assert ("spec", 5) in items

    state = rand_state(n, 99)
    eye = np.eye(2, dtype=np.complex64)
    mats = [_ry(0.3), eye, _ry(0.8), eye, _ry(0.4), eye]
    flags = [True] * 6
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               real_flags=flags, interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_qft_fuses_to_one_kernel_pass_and_matches(monkeypatch):
    """The QFT's H + controlled-phase cascade rides the kernel as "D2"
    masked multiplies: the whole circuit (minus trailing SWAPs) must fuse
    into ONE PallasBlock and match the dense engine. This is what turns
    the QFT benchmark from ~39 launch-bound XLA ops into ~1."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rocquantum_tpu.models import qft_ir
    from rocquantum_tpu.compiler.interpreter import clear_cache, execute
    from rocquantum_tpu.compiler.passes import (PallasBlock, fuse_diagonals,
                                                fuse_pallas_runs)
    from rocquantum_tpu.ops import statevec as sv
    from rocquantum_tpu.ops.pallas_sv import max_kernel_qubit

    n = 17  # one qubit beyond the in-tile window: the D2/pair path engages
    ir = qft_ir(n)
    items = fuse_diagonals(fuse_pallas_runs(
        list(ir.ops), n - 1, num_qubits=n,
        relabel_reach=max_kernel_qubit(n) + 1))
    blocks = [it for it in items if isinstance(it, PallasBlock)]
    assert len(blocks) == 1
    assert len(blocks[0].ops) == len(ir.ops) - n // 2  # all but the SWAPs

    clear_cache()
    with_pallas = jax.jit(lambda: execute(
        sv.apply_gate(sv.init_state(n), "H", [n - 1]), list(ir.ops), None))()
    plain = jax.jit(lambda: execute(
        sv.apply_gate(sv.init_state(n), "H", [n - 1]), list(ir.ops), None,
        use_pallas=False))()
    np.testing.assert_allclose(np.asarray(jnp.real(with_pallas)),
                               np.asarray(jnp.real(plain)), atol=3e-6)
    np.testing.assert_allclose(np.asarray(jnp.imag(with_pallas)),
                               np.asarray(jnp.imag(plain)), atol=3e-6)
    clear_cache()


def test_tall_geometry_five_pair_bits_one_group():
    # tall geometry (col=10, tile=5): 4x smaller tiles buy 5 pair bits per
    # pass; a contiguous run shares ONE size-32 block axis (rank-7 view)
    from rocquantum_tpu.ops.pallas_sv import (TALL_GEOMETRY,
                                              max_pair_bits_for)
    assert max_pair_bits_for(*TALL_GEOMETRY) == 5
    n = 22
    state = rand_state(n, 91)
    eye = np.eye(2, dtype=np.complex64)
    # limit = 15 at tall geometry; chain over the paired run 15..19
    specs = [("U", 14), ("U", 15), ("U", 16), ("U", 17), ("U", 18),
             ("U", 19), ("CNOT", 14, 15), ("CNOT", 15, 16),
             ("CNOT", 16, 17), ("CNOT", 17, 18), ("CNOT", 18, 19),
             ("CNOT", 21, 3)]    # free (out-of-window, unpaired) control
    mats = [_ry(0.1 * (i + 1)) for i in range(6)] + [eye] * 6
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=(15, 16, 17, 18, 19),
                               geometry=(10, 5), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_two_groups_mixed_sizes():
    # two contiguous runs: {17,18} + {20}: two block axes (sizes 4 and 2)
    n = 22
    state = rand_state(n, 92)
    eye = np.eye(2, dtype=np.complex64)
    specs = [("U", 17), ("U", 18), ("U", 20), ("CNOT", 17, 18),
             ("CNOT", 18, 20), ("CNOT", 20, 5)]
    mats = [_ry(0.3), np.asarray(g.H), _ry(0.8)] + [eye] * 3
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=(17, 18, 20), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_group_count_and_capacity_limits():
    from rocquantum_tpu.ops.pallas_sv import MAX_PAIR_GROUPS
    n = 26
    state = rand_state(n, 3)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    eye = np.eye(2, dtype=np.complex64)
    # 4 non-contiguous bits = 4 groups > MAX_PAIR_GROUPS
    specs = [("U", 17), ("U", 19), ("U", 21), ("U", 23)]
    mats = jnp.asarray(pack_gate_mats([eye] * 4))
    with pytest.raises(ValueError):
        apply_fused_layer(re, im, specs, mats,
                          pair_bits=(17, 19, 21, 23), interpret=True)


def test_ansatz_layer_selects_tall_geometry_and_matches(monkeypatch):
    """At n=21 the RY+CNOT-ring layer's default-geometry plan needs >2
    passes, so _run_pallas_specs must pick the tall-geometry plan (fewer
    passes) and still match the dense engine end-to-end."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    import jax
    from rocquantum_tpu.compiler.interpreter import clear_cache, execute
    from rocquantum_tpu.compiler.ir import CircuitIR
    from rocquantum_tpu.ops import statevec as sv
    from rocquantum_tpu.ops.relabel import plan_full_layer
    from rocquantum_tpu.ops.pallas_sv import (TALL_GEOMETRY,
                                              max_kernel_qubit,
                                              max_pair_bits_for)

    # plan shapes at n=24 (where the chain spans 7+ high targets): the
    # tall plan is strictly shorter than the default-geometry plan
    def ring(n):
        ir = CircuitIR(n)
        for q in range(n):
            ir.add("RY", [q], params=[0.1 * (q + 1)])
        for q in range(n):
            ir.add("CNOT", [(q + 1) % n], controls=[q])
        return ir

    def plans(n):
        ir = ring(n)
        supports = [tuple(op.controls) + tuple(op.targets) if op.controls
                    else tuple(op.targets) for op in ir.ops]
        kinds = ["U"] * n + ["CNOT"] * n

        def mk_anchors(reach):
            return [(s[1],) if k == "CNOT" and s[0] >= reach else tuple(s)
                    for k, s in zip(kinds, supports)]

        reach_def = max_kernel_qubit(n) + 1
        tcol, ttile = TALL_GEOMETRY
        reach_tall = min(tcol, n) + min(ttile, n - min(tcol, n))
        p_def = plan_full_layer(n, supports, reach_def,
                                anchors=mk_anchors(reach_def))
        p_tall = plan_full_layer(n, supports, reach_tall,
                                 anchors=mk_anchors(reach_tall),
                                 max_pairs=max_pair_bits_for(tcol, ttile),
                                 geometry=TALL_GEOMETRY)
        return p_def, p_tall

    p_def, p_tall = plans(24)
    assert len(p_tall) < len(p_def), (len(p_tall), len(p_def))

    # end-to-end numeric equivalence through execute() (n=21 keeps the
    # interpret-mode run fast; the multi-pass pallas path still engages)
    n = 21
    ir = ring(n)
    clear_cache()
    with_pallas = jax.jit(lambda: execute(
        sv.init_state(n), list(ir.ops), None))()
    plain = jax.jit(lambda: execute(
        sv.init_state(n), list(ir.ops), None, use_pallas=False))()
    np.testing.assert_allclose(np.asarray(jnp.real(with_pallas)),
                               np.asarray(jnp.real(plain)), atol=3e-6)
    np.testing.assert_allclose(np.asarray(jnp.imag(with_pallas)),
                               np.asarray(jnp.imag(plain)), atol=3e-6)
    clear_cache()


def test_merged_group_kernel_thin_geometry():
    # THIN geometry (col=8, tile=3): 9 contiguous pair bits merge into the
    # tile rows (one (2^9 * 8, 256) tile) — the 2-passes-per-ansatz-layer
    # regime. Mixed specs: window RYs, chain CNOTs into the group, a free
    # control, and a D2 on a free bit.
    from rocquantum_tpu.ops.pallas_sv import THIN_GEOMETRY
    n = 23
    state = rand_state(n, 13)
    eye = np.eye(2, dtype=np.complex64)
    d2 = np.diag([1.0, np.exp(0.4j)]).astype(np.complex64)  # CPHASE-like
    group = tuple(range(11, 20))   # limit=11 at (8,3)
    specs = ([("U", q) for q in (0, 5, 9, 10)]
             + [("U", q) for q in group]
             + [("CNOT", 10, 11), ("CNOT", 11, 12), ("CNOT", 18, 19)]
             + [("CNOT", 21, 3)]          # free control -> lane target
             + [("CNOT", 22, 15)])        # free control -> group target
    mats = [_ry(0.1 * (i + 1)) for i in range(4 + len(group))] + [eye] * 5
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=group, geometry=THIN_GEOMETRY,
                               interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_merged_group_kernel_d2_free_and_group_bits():
    from rocquantum_tpu.ops.pallas_sv import THIN_GEOMETRY
    from rocquantum_tpu.ops import statevec as svv
    n = 22
    state = rand_state(n, 14)
    group = tuple(range(11, 16))
    # D2 diag gate packed as the 2x2 of diagonal entries d[bit_a, bit_b]
    ph = np.exp(0.7j)
    d2_pack = np.array([[1, 1], [1, ph]], np.complex64)
    specs = [("U", 12), ("D2", 20, 13), ("D2", 12, 2)]
    mats = [_ry(0.5), d2_pack, d2_pack]
    # reference: controlled-phase(a, b)
    out = jnp.asarray(state)
    out = sv.apply_matrix(out, jnp.asarray(_ry(0.5), jnp.complex64), [12])
    cp = jnp.asarray(np.diag([1, 1, 1, ph]).astype(np.complex64))
    out = sv.apply_matrix(out, cp, [13, 20])
    out = sv.apply_matrix(out, cp, [2, 12])
    expected = np.asarray(out)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=group, geometry=THIN_GEOMETRY,
                               interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_merged_kernel_composes_same_bit_runs():
    # multi-layer body: repeated RYs on the same group/row bits must
    # compose into one slice gate each (and flush correctly around
    # non-commuting CNOTs/D2s)
    from rocquantum_tpu.ops.pallas_sv import TALL_GEOMETRY
    n = 22
    state = rand_state(n, 44)
    eye = np.eye(2, dtype=np.complex64)
    group = tuple(range(15, 20))
    specs, mats = [], []
    for layer in range(3):
        for i, q in enumerate((15, 16, 17, 18, 19, 12, 3)):
            specs.append(("U", q))
            mats.append(_ry(0.1 * (layer * 7 + i + 1)))
        specs.append(("CNOT", 14, 16))   # forces a flush of bit 16
        mats.append(eye)
        specs.append(("CNOT", 21, 18))   # free control -> flush of 18
        mats.append(eye)
    expected = reference_apply_specs(state, specs, mats)
    re = jnp.real(jnp.asarray(state))
    im = jnp.imag(jnp.asarray(state))
    re, im = apply_fused_layer(re, im, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=group, geometry=TALL_GEOMETRY,
                               interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-5)


class TestControlledU:
    """Kernel kind "CU" (controlled dense 1q — CRX/CRY/controlled-matrix/
    Kraus-channel factors; reference: apply_controlled_matrix,
    bindings.cpp:429): every control/target region combination must match
    the dense reference, including non-unitary matrices."""

    @staticmethod
    def _ref_apply(state, specs, mats):
        n = state.size.bit_length() - 1
        s = state.copy()
        for (spec, m) in zip(specs, mats):
            v = s.reshape([2] * n)
            if spec[0] == "U":
                ax = n - 1 - spec[1]
                v = np.moveaxis(np.tensordot(
                    m, np.moveaxis(v, ax, 0), axes=(1, 0)), 0, ax)
            elif spec[0] == "CU":
                axc, axt = n - 1 - spec[1], n - 1 - spec[2]
                v = np.moveaxis(v, (axc, axt), (0, 1))
                out = v.copy()
                out[1] = np.tensordot(m, v[1], axes=(1, 0))
                v = np.moveaxis(out, (0, 1), (axc, axt))
            elif spec[0] == "CNOT":
                axc, axt = n - 1 - spec[1], n - 1 - spec[2]
                v = np.moveaxis(v, (axc, axt), (0, 1))
                out = v.copy()
                out[1, 0], out[1, 1] = v[1, 1], v[1, 0]
                v = np.moveaxis(out, (0, 1), (axc, axt))
            s = v.reshape(-1)
        return s

    def _run(self, n, specs, mats, pair_bits=None, geometry=None):
        from rocquantum_tpu.ops.pallas_sv import (apply_fused_layer,
                                                  pack_gate_mats)
        rng = np.random.default_rng(7)
        state = rng.normal(size=2 ** n) + 1j * rng.normal(size=2 ** n)
        state /= np.linalg.norm(state)
        re = jnp.asarray(state.real, jnp.float32)
        im = jnp.asarray(state.imag, jnp.float32)
        gm = jnp.asarray(pack_gate_mats(mats))
        rf = tuple(bool(np.allclose(m.imag, 0)) for m in mats)
        o_re, o_im = apply_fused_layer(re, im, specs, gm, real_flags=rf,
                                       pair_bits=pair_bits,
                                       geometry=geometry, interpret=True)
        got = np.asarray(o_re) + 1j * np.asarray(o_im)
        exp = self._ref_apply(state.astype(np.complex64), specs, mats)
        np.testing.assert_allclose(got, exp, atol=2e-5)

    def _u(self, seed=3):
        rng = np.random.default_rng(seed)
        return rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))

    @pytest.mark.parametrize("c,t", [(2, 4), (8, 9), (13, 14), (3, 13),
                                     (14, 5), (18, 4), (17, 13)])
    def test_cu_regions_unpaired(self, c, t):
        # lane/mid/row targets with in-window and free (out-of-window)
        # controls at n=19 (window = 17 bits)
        self._run(19, (("CU", c, t),), [self._u()])

    def test_cu_pair_target_and_pair_control(self):
        u1, u2 = self._u(1), self._u(2)
        self._run(19, (("CU", 3, 18),), [u1], pair_bits=(18,))
        self._run(19, (("CU", 18, 3), ("U", 18)), [u1, u2], pair_bits=(18,))
        self._run(19, (("CU", 17, 18), ("U", 17)), [u1, u2],
                  pair_bits=(17, 18))

    def test_cu_mixed_with_cnot_multi_pair(self):
        u1, u2, u3 = self._u(1), self._u(2), self._u(3)
        self._run(19, (("U", 0), ("CU", 18, 4), ("CNOT", 17, 3),
                       ("CU", 2, 17), ("U", 18)),
                  [u1, u2, np.eye(2), u3, u1], pair_bits=(17, 18))

    def test_cu_merged_group_kernel(self):
        # contiguous run of 4+ pair bits -> _kernel_merged CU branch
        u1, u2, u3 = self._u(1), self._u(2), self._u(3)
        self._run(22, (("CU", 21, 17), ("CU", 3, 18), ("U", 19),
                       ("CU", 20, 13), ("CNOT", 18, 19)),
                  [u1, u2, u3, u1, np.eye(2)], pair_bits=(17, 18, 19, 20))

    def test_cu_tall_geometry(self):
        from rocquantum_tpu.ops.pallas_sv import TALL_GEOMETRY
        u1, u2, u3 = self._u(1), self._u(2), self._u(3)
        self._run(22, (("CU", 20, 3), ("CU", 2, 16), ("U", 15)),
                  [u1, u2, u3], pair_bits=(15, 16, 17, 18, 19, 20),
                  geometry=TALL_GEOMETRY)

    def test_cu_claimed_by_pallas_runs(self):
        # CRY/CRX/controlled-matrix ops fuse into ONE PallasBlock
        from rocquantum_tpu.compiler.ir import CircuitIR
        from rocquantum_tpu.compiler.passes import fuse_pallas_runs
        from rocquantum_tpu.ops.pallas_sv import max_kernel_qubit
        n = 18
        ir = CircuitIR(n)
        for q in range(n):
            ir.add("RY", [q], params=[0.1 * (q + 1)])
        ir.add("CRX", [2], controls=[17], params=[0.7])
        ir.add("CRY", [16], controls=[3], params=[0.4])
        q_, _ = np.linalg.qr(self._u())
        ir.add("UNITARY", [5], controls=[15], matrix=q_)
        items = fuse_pallas_runs(list(ir.ops), n - 1, num_qubits=n,
                                 relabel_reach=max_kernel_qubit(n) + 1)
        assert [type(i).__name__ for i in items] == ["PallasBlock"]


class TestChannelFactorization:
    """superop_kernel_ops: built-in channels factor into kernel-native ops
    (the dense 4x4 forced one einsum pass per channel)."""

    @pytest.mark.parametrize("name,maker,p", [
        ("bit_flip", "bit_flip_kraus", 0.1),
        ("phase_flip", "phase_flip_kraus", 0.15),
        ("depolarizing", "depolarizing_kraus", 0.08),
        ("amplitude_damping", "amplitude_damping_kraus", 0.2),
    ])
    def test_builtin_channels_factor(self, name, maker, p):
        from rocquantum_tpu.ops import density as dmops
        ks = getattr(dmops, maker)(p)
        s = dmops.kraus_superoperator(ks, xp=np)
        ops = dmops.superop_kernel_ops(s, 0, 1)
        assert ops is not None
        if name == "phase_flip":
            assert [o.name for o in ops] == ["D2M"]  # comm-free diagonal

    def test_factored_channel_matches_dense(self):
        # end-to-end on the density circuit: factored channels == the
        # direct superoperator application
        import rocquantum_tpu as rocq
        from rocquantum_tpu.density_circuit import DensityCircuit
        from rocquantum_tpu.ops import density as dmops
        n = 3
        dc = DensityCircuit(n, rocq.Simulator())
        for q in range(n):
            dc.ry(0.3 + 0.1 * q, q)
        dc.apply_channel("depolarizing", 0.05, [0, 1, 2])
        dc.apply_channel("amplitude_damping", 0.1, [1])
        dc.apply_channel("phase_flip", 0.2, [2])
        dc.cx(0, 1)
        dc.flush()
        got = np.asarray(dmops.to_matrix(dc.state))

        rho = jax.jit(lambda: dmops.init_density(n))()
        for q in range(n):
            rho = dmops.apply_gate_dm(rho, "RY", [q], [], [0.3 + 0.1 * q])
        rho = dmops.apply_channel(rho, "depolarizing", 0.05, [0, 1, 2])
        rho = dmops.apply_channel(rho, "amplitude_damping", 0.1, [1])
        rho = dmops.apply_channel(rho, "phase_flip", 0.2, [2])
        rho = dmops.apply_gate_dm(rho, "CNOT", [1], [0])
        exp = np.asarray(dmops.to_matrix(rho))
        np.testing.assert_allclose(got, exp, atol=2e-6)

    def test_unitary_kraus_factors_separably(self):
        from rocquantum_tpu.ops import density as dmops
        q_, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(2, 2))
                             + 1j * np.random.default_rng(1).normal(
                                 size=(2, 2)))
        s = dmops.kraus_superoperator([q_], xp=np)
        ops = dmops.superop_kernel_ops(s, 2, 7)
        assert ops is not None and len(ops) == 2
        assert all(o.name == "UNITARY" and not o.controls for o in ops)


# ---------------------------------------------------------------------------
# Real-state (single-plane) kernel mode: im=None streams only the real
# plane — valid exactly when every gate matrix is real (RealAmplitudes-
# style RY/CNOT circuits). Each test drives one kernel variant.
# ---------------------------------------------------------------------------


def rand_real_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _run_real_vs_complex(n, specs, mats, pair_bits=None, geometry=None,
                         seed=3):
    state = rand_real_state(n, seed)
    expected = reference_apply_specs(state.astype(np.complex64), specs, mats)
    assert np.abs(expected.imag).max() == 0.0  # sanity: circuit is real
    flags = [True] * len(specs)
    re, im = apply_fused_layer(jnp.asarray(state), None, specs,
                               jnp.asarray(pack_gate_mats(mats)),
                               pair_bits=pair_bits, geometry=geometry,
                               real_flags=flags, interpret=True)
    assert im is None
    np.testing.assert_allclose(np.asarray(re), expected.real, atol=2e-5)


def test_real_state_window_pass():
    # no-pair _kernel: RY column + in-window CNOTs on one real plane
    n = 16
    specs = [("U", q) for q in range(0, 15, 2)] + \
        [("CNOT", 0, 1), ("CNOT", 5, 13), ("CNOT", 14, 2)]
    rng = np.random.default_rng(4)
    mats = [_ry(x) for x in rng.normal(size=8)] + \
        [np.eye(2, dtype=np.complex64)] * 3
    _run_real_vs_complex(n, specs, mats)


def test_real_state_multi_pair_pass():
    # _kernel_multi: gates on separate pair bits + a CNOT across them
    n = 19
    specs = [("U", 3), ("U", 17), ("CNOT", 17, 18), ("U", 18),
             ("CNOT", 18, 5)]
    rng = np.random.default_rng(6)
    eye = np.eye(2, dtype=np.complex64)
    mats = [_ry(rng.normal()), _ry(rng.normal()), eye, _ry(rng.normal()),
            eye]
    _run_real_vs_complex(n, specs, mats, pair_bits=(17, 18))


def test_real_state_merged_run_pass():
    # _kernel_merged (single contiguous run, k>=4) under the thin geometry
    n = 16
    specs = [("U", 2), ("U", 12), ("CNOT", 12, 13), ("U", 13),
             ("CNOT", 13, 14), ("U", 14), ("CNOT", 14, 15), ("U", 15)]
    rng = np.random.default_rng(8)
    eye = np.eye(2, dtype=np.complex64)
    mats = [_ry(rng.normal()) if s[0] == "U" else eye for s in specs]
    _run_real_vs_complex(n, specs, mats, pair_bits=(12, 13, 14, 15),
                         geometry=(8, 3))


def test_real_state_rejects_complex_gate():
    n = 16
    re = jnp.asarray(rand_real_state(n))
    with pytest.raises(ValueError, match="real"):
        apply_fused_layer(re, None, [("U", 0)],
                          jnp.asarray(pack_gate_mats([np.asarray(g.S)])),
                          real_flags=[False], interpret=True)


def test_execute_pair_real_plane(monkeypatch):
    # init_real + an all-real circuit stays single-plane end to end;
    # a complex gate materializes the imaginary plane and still matches
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    from rocquantum_tpu.compiler.interpreter import (execute_pair, init_real,
                                                     init_pair)
    from rocquantum_tpu.compiler.ir import CircuitIR

    n = 15
    ir = CircuitIR(n)
    for q in range(n):
        ir.add("RY", [q], params=[0.2 + 0.05 * q])
    for q in range(n - 1):
        ir.add("CNOT", [q + 1], controls=[q])
    re, im = execute_pair(init_real(n), None, ir.ops)
    assert im is None
    re2, im2 = execute_pair(*init_pair(n), ir.ops)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re2), atol=2e-5)

    ir.add("RZ", [3], params=[0.7])  # complex: forces the pair path
    re, im = execute_pair(init_real(n), None, ir.ops)
    assert im is not None
    re2, im2 = execute_pair(*init_pair(n), ir.ops)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im2), atol=2e-5)


def test_init_zero_state_tiled_matches():
    """The kernel-layout |0..0> writer (n=31 capacity fix) produces
    exactly the canonical state."""
    from rocquantum_tpu.ops.pallas_sv import init_zero_state_tiled
    out = np.asarray(init_zero_state_tiled(15, interpret=True))
    assert out.shape == (1 << 15,)
    assert out[0] == 1.0
    assert not out[1:].any()


def test_deferred_init_no_pair(monkeypatch):
    """execute_pair(re=None) fuses the |0..0> init into the first pass
    (pallas_sv._gen_zero_input) and matches the materialized-init run
    exactly — the n=31 one-plane-peak enabler."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    from rocquantum_tpu.compiler.interpreter import (default_widths,
                                                     execute_pair, init_real)
    from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef

    n = 15
    ir = CircuitIR(n)
    for q in range(n):
        ir.add("RY", [q], params=[ParamRef(q)])
    params = jnp.asarray(np.linspace(0.1, 1.0, n), jnp.float32)
    lw, hw = default_widths(n)
    re0, im0 = execute_pair(init_real(n), None, ir.ops, params,
                            low_width=lw, high_width=hw)
    re1, im1 = execute_pair(None, None, ir.ops, params,
                            low_width=lw, high_width=hw, num_qubits=n)
    assert im1 is None and im0 is None
    np.testing.assert_array_equal(np.asarray(re0), np.asarray(re1))


def test_deferred_init_pair_view():
    """The generated init in a PAIR-VIEW pass geometry (5-D block shape)
    places amplitude 0 at the block origin of grid cell (0, ..., 0)."""
    from rocquantum_tpu.ops.pallas_sv import apply_fused_layer
    n = 19
    limit = max_kernel_qubit(n) + 1
    assert limit < n
    qubits = [0, 5, 13, limit, n - 1]
    rng = np.random.default_rng(9)
    mats, specs = [], []
    for q in qubits:
        th = rng.normal()
        mats.append(np.array([[np.cos(th / 2), -np.sin(th / 2)],
                              [np.sin(th / 2), np.cos(th / 2)]], np.complex64))
        specs.append(("U", q))
    gm = jnp.asarray(pack_gate_mats(mats))
    flags = [True] * len(specs)
    zero = np.zeros(1 << n, np.float32)
    zero[0] = 1.0
    re0, _ = apply_fused_layer(jnp.asarray(zero), None, specs, gm,
                               pair_bits=[limit, n - 1], real_flags=flags,
                               interpret=True)
    re1, _ = apply_fused_layer(None, None, specs, gm,
                               pair_bits=[limit, n - 1], real_flags=flags,
                               interpret=True, num_qubits=n)
    np.testing.assert_array_equal(np.asarray(re0), np.asarray(re1))


def test_deferred_init_falls_back_without_pallas(monkeypatch):
    """re=None still works when the plan has no leading PallasBlock
    (pallas disabled): the init materializes and execution proceeds."""
    monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
    from rocquantum_tpu.compiler.interpreter import execute_pair
    from rocquantum_tpu.compiler.ir import CircuitIR

    n = 8
    ir = CircuitIR(n)
    for q in range(n):
        ir.add("RY", [q], params=[0.1 * (q + 1)])
    re, im = execute_pair(None, None, ir.ops, num_qubits=n)
    total = float(jnp.sum(re * re)) + (0.0 if im is None
                                       else float(jnp.sum(im * im)))
    assert abs(total - 1.0) < 1e-5
