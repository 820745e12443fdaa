"""Fused df64 Pallas kernel: interpret-mode correctness vs the exact-f64
pair engine (ops/pallas_df64.py — the compensated-f32 fused layer that
takes double precision past the fp64 hardware ceiling)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.compiler.ir import GateOp
from rocquantum_tpu.ops import df64, pairsim
from rocquantum_tpu.ops.pallas_df64 import (apply_fused_layer_df64,
                                            pack_gate_mats_df64,
                                            pack_rows_df64)

from test_pairsim import double_precision  # noqa: F401

I2 = np.eye(2, dtype=np.complex128)


def rand_pair_f64(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    return jnp.asarray(v.real, jnp.float64), jnp.asarray(v.imag,
                                                         jnp.float64)


def ref_ops(specs, mats):
    """specs + per-spec 2x2 matrices -> exact-f64 pair-engine ops."""
    ops = []
    for spec, m in zip(specs, mats):
        if spec[0] == "CNOT":
            ops.append(GateOp("CNOT", (spec[2],), (spec[1],)))
        elif spec[0] == "D2":
            ops.append(GateOp("D2M", (spec[1], spec[2]), matrix=m))
        else:
            ops.append(GateOp("U", (spec[1],), matrix=m))
    return ops


def run_case(n, specs, mats, real_flags, pair_bits=(), real_state=False,
             seed=3, atol=1e-13):
    if real_state:
        rng = np.random.default_rng(seed)
        v = rng.normal(size=1 << n)
        v /= np.linalg.norm(v)
        v_re = jnp.asarray(v, jnp.float64)
        v_im = jnp.zeros_like(v_re)
    else:
        v_re, v_im = rand_pair_f64(n, seed)
    re, im = v_re, v_im
    for op in ref_ops(specs, mats):
        re, im = pairsim.apply_op_pair(re, im, op)

    if real_state:
        rh, rl, _, _ = df64.state_from_pair_f64(v_re, v_im)
        planes = (rh, rl, None, None)
    else:
        planes = df64.state_from_pair_f64(v_re, v_im)
    gm = jnp.asarray(pack_gate_mats_df64(mats))
    out = apply_fused_layer_df64(planes[0], planes[1], planes[2],
                                 planes[3], specs, gm,
                                 real_flags=real_flags,
                                 pair_bits=pair_bits, interpret=True)
    got_re = df64.promote_f64(out[0], out[1])
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(re),
                               atol=atol)
    if out[2] is not None:
        got_im = df64.promote_f64(out[2], out[3])
        np.testing.assert_allclose(np.asarray(got_im), np.asarray(im),
                                   atol=atol)


def _ry(th):
    return np.array([[np.cos(th / 2), -np.sin(th / 2)],
                     [np.sin(th / 2), np.cos(th / 2)]], np.complex128)


def test_window_ry_layer_complex_state(double_precision):  # noqa: F811
    n = 14
    rng = np.random.default_rng(1)
    qubits = list(range(n))  # window covers all 14 (col 12 + 2 rows)
    mats = [_ry(rng.normal()) for _ in qubits]
    specs = [("U", q) for q in qubits]
    run_case(n, specs, mats, [True] * n)


def test_window_ry_layer_real_state(double_precision):  # noqa: F811
    n = 14
    rng = np.random.default_rng(2)
    mats = [_ry(rng.normal()) for _ in range(n)]
    specs = [("U", q) for q in range(n)]
    run_case(n, specs, mats, [True] * n, real_state=True)


def test_complex_gates(double_precision):  # noqa: F811
    from rocquantum_tpu.ops import gates as g
    n = 13
    qubits = [0, 3, 7, 11, 12]
    mats = [np.asarray(g.H), np.asarray(g.S), np.asarray(g.T),
            np.asarray(g.Y), np.asarray(g.SDG)]
    specs = [("U", q) for q in qubits]
    run_case(n, specs, mats, [False] * 5)


def test_cnot_and_free_control(double_precision):  # noqa: F811
    n = 18  # limit = col 12 + 2 (for n=14)... here col=12, tile=5 -> 17
    rng = np.random.default_rng(4)
    specs = [("U", 3), ("CNOT", 2, 9), ("CNOT", 17, 5), ("U", 13)]
    mats = [_ry(rng.normal()), I2, I2, _ry(rng.normal())]
    run_case(n, specs, mats, [True, True, True, True])


def test_d2_diagonal_free_bits(double_precision):  # noqa: F811
    n = 18
    d = np.exp(1j * np.array([[0.0, 0.3], [0.8, -0.4]]))
    specs = [("D2", 2, 17), ("D2", 16, 5)]
    mats = [d, d]
    run_case(n, specs, mats, [False, False])


def test_pair_bits_single(double_precision):  # noqa: F811
    n = 19  # limit 17; qubit 18 via pair bit
    rng = np.random.default_rng(6)
    specs = [("U", 18), ("U", 1), ("CNOT", 18, 2)]
    mats = [_ry(rng.normal()), _ry(rng.normal()), I2]
    run_case(n, specs, mats, [True] * 3, pair_bits=(18,))


def test_pair_bits_two_and_cross_tile_cnot(double_precision):  # noqa: F811
    n = 20  # limit 17; 17, 18 pair bits
    rng = np.random.default_rng(7)
    specs = [("U", 17), ("U", 18), ("CNOT", 17, 18), ("CNOT", 3, 17),
             ("U", 5)]
    mats = [_ry(rng.normal()), _ry(rng.normal()), I2, I2,
            _ry(rng.normal())]
    run_case(n, specs, mats, [True] * 5, pair_bits=(17, 18))


def test_pack_rows_matches_host_pack(double_precision):  # noqa: F811
    th = 0.7321
    rows, _ = pairsim.gate_rows("RY", (jnp.asarray(th, jnp.float64),),
                                dtype=jnp.float64)
    traced = np.asarray(pack_rows_df64([(rows, None)]))
    host = pack_gate_mats_df64([_ry(th)])
    np.testing.assert_allclose(traced, host, atol=2e-17)


def test_df64_kernel_beats_f32_grade(double_precision):  # noqa: F811
    """The whole point: a fused layer whose result is ~1e-14, not ~1e-7."""
    n = 14
    rng = np.random.default_rng(8)
    mats = [_ry(rng.normal()) for _ in range(n)]
    specs = [("U", q) for q in range(n)]

    re, im = rand_pair_f64(n, 9)
    want_re, want_im = re, im
    for op in ref_ops(specs, mats):
        want_re, want_im = pairsim.apply_op_pair(want_re, want_im, op)

    planes = df64.state_from_pair_f64(re, im)
    gm = jnp.asarray(pack_gate_mats_df64(mats))
    out = apply_fused_layer_df64(*planes, specs, gm,
                                 real_flags=[True] * n, interpret=True)
    err = np.abs(np.asarray(df64.promote_f64(out[0], out[1]))
                 - np.asarray(want_re)).max()
    assert err < 1e-13

    # f32 comparison: the same layer on f32 planes lands ~1e-7
    re32 = re.astype(jnp.float32)
    im32 = im.astype(jnp.float32)
    for op in ref_ops(specs, mats):
        re32, im32 = pairsim.apply_op_pair(re32, im32, op)
    err32 = np.abs(np.asarray(re32, np.float64)
                   - np.asarray(want_re)).max()
    assert err < err32 * 1e-4
