"""Mixed-geometry (per-pass template) planning: the 2-passes-per-layer
ring-ansatz lever. Lead passes keep the default wide window; the high CNOT
chain + its 1q column ride lean thin-geometry merged-run passes.

Reference cost model to beat: one HBM pass per 2q gate
(/root/reference/rocquantum/src/hipStateVec/two_qubit_kernels.hip:17-51);
the mixed plan amortizes a whole ring layer over TWO passes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rocquantum_tpu.compiler.ir import CircuitIR
from rocquantum_tpu.compiler.interpreter import (_plan_mixed, clear_cache,
                                                 execute, parametrize)
from rocquantum_tpu.ops import statevec as sv
from rocquantum_tpu.ops.pallas_sv import (THIN_GEOMETRY, _prune_pair_bits,
                                          max_kernel_qubit)


def ring_specs(n, body):
    kinds, supports = [], []
    for _ in range(body):
        for q in range(n):
            kinds.append("U")
            supports.append((q,))
        for q in range(n):
            kinds.append("CNOT")
            supports.append((q, (q + 1) % n))
    return kinds, supports


def test_mixed_plan_reaches_two_passes_per_layer():
    """n=29 / body=8 ring ansatz: 16 passes (8 default-geometry lead + 8
    thin chain), vs 24 for the whole-plan tall geometry."""
    n, body = 29, 8
    kinds, supports = ring_specs(n, body)
    limit = max_kernel_qubit(n) + 1
    plan = _plan_mixed(n, kinds, supports, limit)
    assert plan is not None
    assert len(plan) == 2 * body
    geos = [p.geometry for p in plan]
    assert geos.count(None) == body
    assert geos.count(THIN_GEOMETRY) == body
    for p in plan:
        if p.geometry == THIN_GEOMETRY:
            # lean bodies: the scoped-VMEM-stack guard (40+ gate merged
            # bodies stall double-buffering on v5e)
            assert len(p.gate_idx) <= 26
            # single contiguous run -> the merged-run O(gates) kernel
            lo, hi = min(p.pair_bits), max(p.pair_bits)
            assert p.pair_bits == tuple(range(lo, hi + 1))
    # every gate scheduled exactly once
    seen = sorted(i for p in plan for i in p.gate_idx)
    assert seen == list(range(len(supports)))


def test_mixed_plan_respects_dependencies():
    """A gate never runs in an earlier pass than a prior gate sharing a
    qubit (chain order: CX(q,q+1) before CX(q+1,q+2))."""
    n, body = 24, 4
    kinds, supports = ring_specs(n, body)
    limit = max_kernel_qubit(n) + 1
    plan = _plan_mixed(n, kinds, supports, limit)
    assert plan is not None
    pass_of = {}
    for pi, p in enumerate(plan):
        for i in p.gate_idx:
            pass_of[i] = pi
    for j in range(len(supports)):
        for i in range(j):
            if set(supports[i]) & set(supports[j]):
                assert pass_of[i] <= pass_of[j], (i, j)


def test_prune_pair_bits_bridges_split_runs():
    # untouched middle bits of a contiguous run are re-bridged so the
    # group set stays kernel-valid (single run when > 5 bits)
    assert _prune_pair_bits(tuple(range(20, 29)), {20, 22, 24, 26, 28}) \
        == tuple(range(20, 29))
    # valid subsets prune freely
    assert _prune_pair_bits(tuple(range(20, 29)), {20, 21, 22}) == (20, 21, 22)
    assert _prune_pair_bits((17, 18, 25), {17, 25}) == (17, 25)
    assert _prune_pair_bits((17, 18, 19), set()) == ()
    # 4 scattered survivors exceed MAX_PAIR_GROUPS: smallest gap fills
    # first, stopping at the first valid set (3 groups / 5 bits)
    assert _prune_pair_bits((17, 19, 21, 24), {17, 19, 21, 24}) \
        == (17, 18, 19, 21, 24)


@pytest.mark.parametrize("n", [20, 23])
def test_mixed_geometry_matches_plain_engine(n, monkeypatch):
    """Ring ansatz through ROCQ_GEOMETRY=mixed (interpret mode) == plain
    XLA engine."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ROCQ_GEOMETRY", "mixed")
    rng = np.random.default_rng(7 + n)
    ir = CircuitIR(n)
    for _ in range(2):
        for q in range(n):
            ir.add("RY", [q], params=[float(rng.normal())])
        for q in range(n):
            ir.add("CNOT", [(q + 1) % n], controls=[q])
    pops, values = parametrize(ir.ops)
    params = jnp.asarray(values, jnp.float32)
    clear_cache()
    mixed = jax.jit(lambda p: execute(sv.init_state(n), pops, p))(params)
    plain = jax.jit(
        lambda p: execute(sv.init_state(n), pops, p, use_pallas=False))(
            params)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(plain),
                               atol=3e-5, err_msg=f"n={n}")
    clear_cache()


@pytest.mark.parametrize("seed", range(3))
def test_mixed_geometry_fuzz(seed, monkeypatch):
    """Random full-alphabet circuits under ROCQ_GEOMETRY=mixed must match
    the plain engine (same generator as test_fuzz_equivalence)."""
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ROCQ_GEOMETRY", "mixed")
    rng = np.random.default_rng(500 + seed)
    n = int(rng.integers(19, 22))
    ir = CircuitIR(n)
    for _ in range(40):
        kind = rng.integers(0, 5)
        q = int(rng.integers(0, n))
        q2 = int((q + 1 + rng.integers(0, n - 1)) % n)
        if kind == 0:
            ir.add(str(rng.choice(["RY", "RX", "RZ"])), [q],
                   params=[float(rng.normal())])
        elif kind == 1:
            ir.add(str(rng.choice(["H", "X", "S", "T", "Y"])), [q])
        elif kind == 2:
            ir.add("CNOT", [q2], controls=[q])
        elif kind == 3:
            ir.add(str(rng.choice(["CRY", "CRX"])), [q2], controls=[q],
                   params=[float(rng.normal())])
        else:
            name = str(rng.choice(["CZ", "CRZ", "P", "RZZ"]))
            if name == "RZZ":
                ir.add("RZZ", [q, q2], params=[float(rng.normal())])
            else:
                params = [float(rng.normal())] if name != "CZ" else []
                ir.add(name, [q2], controls=[q], params=params)
    pops, values = parametrize(ir.ops)
    params = jnp.asarray(values, jnp.float32)
    clear_cache()
    mixed = jax.jit(lambda p: execute(sv.init_state(n), pops, p))(params)
    plain = jax.jit(
        lambda p: execute(sv.init_state(n), pops, p, use_pallas=False))(
            params)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(plain),
                               atol=3e-5, err_msg=f"seed={seed} n={n}")
    clear_cache()


def test_mixed_geometry_sharded_matches_single_device(monkeypatch):
    """Sharded flush routes each shard's local gates through the same
    _run_pallas_specs, so ROCQ_GEOMETRY=mixed applies per shard — the
    sharded ring must match the single-device plain engine."""
    import rocquantum_tpu as rocq
    from rocquantum_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("ROCQ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ROCQ_GEOMETRY", "mixed")
    clear_cache()
    n = 21  # 18 local bits on 8 devices: out-of-window anchors exist
    rng = np.random.default_rng(23)
    thetas = rng.normal(size=n)

    def build(circ):
        for q in range(n):
            circ.ry(float(thetas[q]), q)
        for q in range(n):
            circ.cx(q, (q + 1) % n)

    c = rocq.Circuit(n, rocq.Simulator(), mesh=make_mesh(8))
    build(c)
    got = c.get_statevector()
    monkeypatch.setenv("ROCQ_DISABLE_PALLAS", "1")
    clear_cache()
    ref = rocq.Circuit(n, rocq.Simulator())
    build(ref)
    exp = ref.get_statevector()
    np.testing.assert_allclose(got, exp, atol=3e-5)
    clear_cache()
