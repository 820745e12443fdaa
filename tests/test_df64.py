"""Double-float (hi/lo f32) engine: error-free transformation exactness,
df64 arithmetic accuracy, and end-to-end circuit equivalence vs the exact
f64 pair engine (the route past the fp64 hardware ceiling — ops/df64.py,
docs/FP64_GUIDE.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu import config
from rocquantum_tpu.compiler.ir import CircuitIR, GateOp
from rocquantum_tpu.ops import df64, pairsim

from test_pairsim import _random_ir, double_precision  # noqa: F401

# df64 carries ~49 effective mantissa bits; per-op relative error ~2^-48.
DF64_EPS = 2.0 ** -46


def _rand_f32(rng, k=4096, scale=1.0):
    return jnp.asarray(rng.normal(size=k).astype(np.float32) * scale)


def test_two_sum_exact(double_precision):  # noqa: F811
    rng = np.random.default_rng(0)
    a, b = _rand_f32(rng), _rand_f32(rng, scale=1e-4)
    s, e = jax.jit(df64.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)  # EFT: bit-exact


def test_two_prod_exact(double_precision):  # noqa: F811
    rng = np.random.default_rng(1)
    a, b = _rand_f32(rng), _rand_f32(rng)
    p, e = jax.jit(df64.two_prod)(a, b)
    # product of two 24-bit mantissas fits f64 exactly
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def _rand_df(rng, k=4096):
    v = rng.normal(size=k)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(hi), jnp.asarray(lo)), v


def test_df_add_mul_accuracy(double_precision):  # noqa: F811
    rng = np.random.default_rng(2)
    x, xv = _rand_df(rng)
    y, yv = _rand_df(rng)
    s = jax.jit(df64.df_add)(x, y)
    p = jax.jit(df64.df_mul)(x, y)
    sv = np.asarray(s[0], np.float64) + np.asarray(s[1], np.float64)
    pv = np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)
    # double-float ADD error is bounded relative to the OPERANDS (under
    # cancellation the absolute bound ~|x|+|y| times 2^-49 dominates the
    # relative-to-result view) — the standard double-double contract
    np.testing.assert_allclose(sv, xv + yv, rtol=DF64_EPS, atol=1e-14)
    np.testing.assert_allclose(pv, xv * yv, rtol=DF64_EPS, atol=1e-16)


def test_df_add_cancellation(double_precision):  # noqa: F811
    # the accurate add must survive near-total cancellation: the result
    # is the lo part EXACTLY (the remaining error is only the f32
    # rounding of representing 1e-10 in the lo plane, ~6e-8 relative —
    # a sloppy add would return 0 or garbage here)
    x = df64.split_f64_host(1.0 + 1e-10)
    y = df64.split_f64_host(-1.0)
    s = df64.df_add((jnp.float32(x[0]), jnp.float32(x[1])),
                    (jnp.float32(y[0]), jnp.float32(y[1])))
    got = float(s[0]) + float(s[1])
    np.testing.assert_allclose(got, 1e-10, rtol=1e-6)
    assert got == x[1]  # exactly the represented residue


def test_split_roundtrip(double_precision):  # noqa: F811
    vals = [0.0, 1.0, np.pi, -2.0 / 3.0, 1e-20, 12345.678901234567]
    for v in vals:
        hi, lo = df64.split_f64_host(v)
        assert np.float64(hi) + np.float64(lo) == np.float64(v) or \
            abs(np.float64(hi) + np.float64(lo) - v) <= abs(v) * 2 ** -48


def _run_df64_eager(ir, n):
    state = df64.init_df64(n)
    for op in ir.ops:
        state = df64.apply_op_df64(state, op)
    return state


def _run_pair_eager(ir, n, dtype=jnp.float64):
    re, im = pairsim.init_pair(n, dtype=dtype)
    for op in ir.ops:
        re, im = pairsim.apply_op_pair(re, im, op)
    return re, im


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_df64_matches_pair_engine(seed, double_precision):  # noqa: F811
    n = 5
    rng = np.random.default_rng(seed)
    ir = _random_ir(n, rng)

    re, im = _run_pair_eager(ir, n)
    want = np.asarray(re) + 1j * np.asarray(im)

    state = _run_df64_eager(ir, n)
    gre, gim = df64.state_to_pair_f64(state)
    got = np.asarray(gre) + 1j * np.asarray(gim)
    # depth-30 circuit: per-gate ~2^-48 -> comfortably below 1e-12
    np.testing.assert_allclose(got, want, atol=1e-12)
    # and far BELOW f32 grade: the df64 point is beating 1e-7
    assert np.abs(got - want).max() < 1e-12


def test_df64_compiled_matches_eager(double_precision):  # noqa: F811
    n = 4
    rng = np.random.default_rng(5)
    ir = _random_ir(n, rng, depth=10)
    state = df64.compile_df64_ir(ir)(*df64.init_df64(n), None)
    want = _run_df64_eager(ir, n)
    for got_p, want_p in zip(state, want):
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                   atol=1e-13)
    # structure-cached: a second compile returns the same executable
    assert df64.compile_df64_ir(ir) is df64.compile_df64_ir(ir)


def test_df64_param_refs(double_precision):  # noqa: F811
    from rocquantum_tpu.compiler.ir import ParamRef
    n = 3
    ir = CircuitIR(n)
    ir.add("RY", [0], params=[ParamRef(0)])
    ir.add("CNOT", [1], controls=[0])
    ir.add("RZ", [2], params=[ParamRef(1)])
    params = jnp.asarray([0.3, -1.1], jnp.float64)

    state = df64.compile_df64_ir(ir)(*df64.init_df64(n), params)
    re, im = pairsim.init_pair(n, dtype=jnp.float64)
    re, im = pairsim.compile_pair_ir(ir)(re, im, params)
    gre, gim = df64.state_to_pair_f64(state)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(re), atol=1e-13)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(im), atol=1e-13)


def test_df64_norm_and_expvals(double_precision):  # noqa: F811
    n = 4
    rng = np.random.default_rng(7)
    ir = _random_ir(n, rng, depth=20)
    state = _run_df64_eager(ir, n)
    norm = float(df64.norm2_df64(state))
    np.testing.assert_allclose(norm, 1.0, atol=1e-12)

    re, im = _run_pair_eager(ir, n)
    for term in [(("Z", 0),), (("X", 1), ("Y", 2)),
                 (("Z", 0), ("Z", 3)), (("X", 0), ("X", 1), ("Z", 2))]:
        want = float(pairsim.expval_pauli_string_pair(re, im, term))
        got = float(df64.expval_pauli_string_df64(state, term))
        np.testing.assert_allclose(got, want, atol=1e-12)
    terms = ((("Z", 0),), (("X", 1),), ())
    coeffs = (0.5, -0.25, 1.5)
    want = float(pairsim.expval_terms_pair(re, im, terms, coeffs))
    got = float(df64.expval_terms_df64(state, terms, coeffs))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_df64_d2m_and_adjoint(double_precision):  # noqa: F811
    n = 3
    d = np.exp(1j * np.array([[0.0, 0.4], [0.9, -0.3]]))
    ops = [GateOp("H", (0,)), GateOp("H", (1,)),
           GateOp("D2M", (0, 2), matrix=d),
           GateOp("U3", (1,), params=(0.3, 0.2, 0.1), is_adjoint=True),
           GateOp("D2M", (1, 0), matrix=d, is_adjoint=True)]
    state = df64.init_df64(n)
    re, im = pairsim.init_pair(n, dtype=jnp.float64)
    for op in ops:
        state = df64.apply_op_df64(state, op)
        re, im = pairsim.apply_op_pair(re, im, op)
    gre, gim = df64.state_to_pair_f64(state)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(re), atol=1e-13)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(im), atol=1e-13)


def test_df64_collapse_and_probs(double_precision):  # noqa: F811
    n = 3
    ir = CircuitIR(n)
    ir.add("H", [0])
    ir.add("RY", [1], params=[0.7])
    ir.add("CNOT", [2], controls=[0])
    state = _run_df64_eager(ir, n)
    p1 = float(df64.prob_one_df64(state, 0))
    np.testing.assert_allclose(p1, 0.5, atol=1e-12)
    state = df64.collapse_df64(state, 0, 1)
    np.testing.assert_allclose(float(df64.norm2_df64(state)), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(float(df64.prob_one_df64(state, 2)), 1.0,
                               atol=1e-12)
    probs = np.asarray(df64.probs_df64(state))
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-12)

    key = jax.random.PRNGKey(0)
    draws = np.asarray(df64.sample_df64(state, [0, 2], 64, key))
    assert draws.shape == (64,)
    assert set(np.unique(draws)) <= {3}  # both bits collapsed to 1


def test_df64_roundtrip_f64_state(double_precision):  # noqa: F811
    rng = np.random.default_rng(9)
    v = rng.normal(size=16) + 1j * rng.normal(size=16)
    v /= np.linalg.norm(v)
    re = jnp.asarray(v.real, jnp.float64)
    im = jnp.asarray(v.imag, jnp.float64)
    state = df64.state_from_pair_f64(re, im)
    gre, gim = df64.state_to_pair_f64(state)
    np.testing.assert_allclose(np.asarray(gre), v.real, atol=1e-15)
    np.testing.assert_allclose(np.asarray(gim), v.imag, atol=1e-15)


def test_df64_requires_x64():
    old = jax.config.jax_enable_x64
    try:
        jax.config.update("jax_enable_x64", False)
        ir = CircuitIR(1)
        ir.add("H", [0])
        with pytest.raises(RuntimeError, match="x64"):
            df64.compile_df64_ir(ir)
    finally:
        jax.config.update("jax_enable_x64", old)


def test_df64_beats_f32_accuracy(double_precision):  # noqa: F811
    """The point of the engine: a deep circuit where plain f32 visibly
    drifts stays at ~1e-13 in df64."""
    n = 4
    rng = np.random.default_rng(11)
    ir = _random_ir(n, rng, depth=80)

    re, im = _run_pair_eager(ir, n)
    want = np.asarray(re) + 1j * np.asarray(im)

    state = _run_df64_eager(ir, n)
    gre, gim = df64.state_to_pair_f64(state)
    got = np.asarray(gre) + 1j * np.asarray(gim)
    df_err = np.abs(got - want).max()

    re32, im32 = _run_pair_eager(ir, n, dtype=jnp.float32)
    f32_err = np.abs((np.asarray(re32) + 1j * np.asarray(im32))
                     - want).max()

    assert df_err < 1e-11
    assert df_err < f32_err * 1e-3  # orders of magnitude better than f32
