"""Sharded density-matrix tests (virtual 8-device CPU mesh): rho — the
flattened 2n-qubit view — sharded over the mesh, with the qubit-locality
scheduler relabeling row/column bits so gates AND Kraus channels stay local
(the reference's multi-GPU design, MULTI_GPU_GUIDE.md:19-59, covered the
statevector engine only)."""

import numpy as np
import pytest
import jax

import rocquantum_tpu as rocq
from rocquantum_tpu.density_circuit import DensityCircuit
from rocquantum_tpu.parallel import make_mesh

requires_multi = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _build(n, mesh=None):
    sim = rocq.Simulator(seed=5)
    return DensityCircuit(n, sim, mesh=mesh)


def _drive(c, n):
    """Gates spanning local and device-selecting bits + noise channels."""
    c.h(0)
    for q in range(n - 1):
        c.cnot(q, q + 1)
    c.ry(0.37, n - 1)              # high row bit is device-selecting
    c.apply_channel("depolarizing", 0.05, [n - 1])
    c.rz(0.21, n - 2)
    c.apply_channel("amplitude_damping", 0.1, [0])
    c.apply_kraus([np.sqrt(0.9) * np.eye(2),
                   np.sqrt(0.1) * np.array([[0, 1], [1, 0]])], [n - 1])
    c.crx(0.5, 0, n - 1)


@requires_multi
class TestShardedDensity:
    def test_sharded_matches_single_device(self):
        n = 6
        ref = _build(n)
        _drive(ref, n)
        rho_ref = ref.get_density_matrix()

        mesh = make_mesh(8)
        c = _build(n, mesh=mesh)
        _drive(c, n)
        assert len(c.state.sharding.device_set) == 8
        rho = c.get_density_matrix()
        np.testing.assert_allclose(rho, rho_ref, atol=1e-5)

    def test_sharded_expectations_and_purity(self):
        n = 6
        ref = _build(n)
        _drive(ref, n)
        mesh = make_mesh(8)
        c = _build(n, mesh=mesh)
        _drive(c, n)
        op = rocq.PauliOperator({f"Z0 Z{n-1}": 1.0, f"X1": 0.5})
        assert abs(c.expval(op) - ref.expval(op)) < 1e-5
        assert abs(c.purity() - ref.purity()) < 1e-5

    def test_sharded_measure_collapse(self):
        n = 6
        mesh = make_mesh(8)
        c = _build(n, mesh=mesh)
        c.x(n - 1)  # deterministic |1> on the top qubit
        outcome, prob = c.measure(n - 1)
        assert outcome == 1 and abs(prob - 1.0) < 1e-6

    def test_parameterized_segments_share_executable(self):
        # two flushes with different angles but the same structure must not
        # grow the run cache twice (slot-keyed caching through the sharded
        # scheduler)
        from rocquantum_tpu.density_circuit import _DM_RUN_CACHE
        n = 6
        mesh = make_mesh(8)
        c = _build(n, mesh=mesh)
        c.ry(0.3, n - 1); c.flush()
        size1 = len(_DM_RUN_CACHE)
        c2 = _build(n, mesh=mesh)
        c2.ry(0.9, n - 1); c2.flush()
        assert len(_DM_RUN_CACHE) == size1

    def test_no_all_gather_for_global_row_gate(self):
        # the scheduled sharded program must move data with all-to-all
        # relabels, never the partitioner's all-gather fallback
        import re as _re
        from rocquantum_tpu.compiler.ir import GateOp
        from rocquantum_tpu.compiler.sharded_schedule import (
            schedule_for_sharding)
        from rocquantum_tpu.compiler.interpreter import execute
        from rocquantum_tpu.parallel import num_global_qubits, state_sharding
        from rocquantum_tpu.ops import density as dmops
        import jax.numpy as jnp

        n = 6
        mesh = make_mesh(8)
        sharding = state_sharding(mesh)
        ops = [GateOp("RY", (2 * n - 1,), (), (0.3,)),
               GateOp("RY", (n - 1,), (), (0.3,))]
        sched, _ = schedule_for_sharding(ops, 2 * n,
                                         num_global_qubits(mesh))

        def run(rho):
            out = execute(rho, sched, None, sharding=sharding)
            return jax.lax.with_sharding_constraint(out, sharding)

        rho0 = jax.jit(lambda: dmops.init_density(n),
                       out_shardings=sharding)()
        txt = jax.jit(run).lower(rho0).compile().as_text()
        assert "all-gather" not in txt
        assert len(_re.findall("all-to-all", txt)) > 0

    def test_factored_phase_flip_comm_free_on_global_qubit(self):
        # a phase-flip channel factors to ONE "D2M" diagonal
        # (density.superop_kernel_ops); diagonals need no relabeling, so
        # the channel on a device-selecting qubit compiles with ZERO
        # collectives in the sharded density engine
        import re as _re
        from rocquantum_tpu.compiler.sharded_schedule import (
            schedule_for_sharding)
        from rocquantum_tpu.compiler.interpreter import execute
        from rocquantum_tpu.parallel import num_global_qubits, state_sharding
        from rocquantum_tpu.ops import density as dmops

        n = 6
        mesh = make_mesh(8)
        sharding = state_sharding(mesh)
        s = dmops.kraus_superoperator(dmops.phase_flip_kraus(0.2), xp=np)
        fops = dmops.superop_kernel_ops(s, n - 1, 2 * n - 1)
        assert fops is not None and [o.name for o in fops] == ["D2M"]
        sched, _ = schedule_for_sharding(fops, 2 * n,
                                         num_global_qubits(mesh))

        def run(rho):
            out = execute(rho, sched, None, sharding=sharding)
            return jax.lax.with_sharding_constraint(out, sharding)

        rho0 = jax.jit(lambda: dmops.init_density(n),
                       out_shardings=sharding)()
        txt = jax.jit(run).lower(rho0).compile().as_text()
        assert not _re.findall("all-gather|all-to-all|collective-permute",
                               txt)


@requires_multi
class TestShardedDensityFuzz:
    """Randomized equivalence: sharded DensityCircuit (row/col locality
    scheduling, channel factorization, positional Kraus) must track the
    single-device run across random gates, channels, flushes, and
    measurements."""

    def _drive(self, c, rng, n, depth):
        readouts = []
        for _ in range(depth):
            kind = rng.integers(0, 8)
            q = int(rng.integers(0, n))
            q2 = int((q + 1 + rng.integers(0, n - 1)) % n)
            if kind == 0:
                getattr(c, str(rng.choice(["h", "x", "z", "s"])))(q)
            elif kind == 1:
                c.ry(float(rng.normal()), q)
            elif kind == 2:
                c.cx(q, q2)
            elif kind == 3:
                c.cz(q, q2)
            elif kind == 4:
                ch = str(rng.choice(["depolarizing", "phase_flip",
                                     "bit_flip", "amplitude_damping"]))
                c.apply_channel(ch, 0.02 + 0.1 * float(rng.random()), [q])
            elif kind == 5:
                c.flush()
            elif kind == 6:
                c.rz(float(rng.normal()), q)
            else:
                out, p = c.measure(q)
                readouts.append((out, round(p, 7)))
        return readouts

    @pytest.mark.parametrize("seed", range(3))
    def test_random_noisy_circuits_match_single_device(self, seed):
        mesh = make_mesh(8)
        n = 5
        rng_a, rng_b = (np.random.default_rng(40 + seed) for _ in range(2))
        ca = DensityCircuit(n, rocq.Simulator(seed=seed), mesh=mesh)
        cb = DensityCircuit(n, rocq.Simulator(seed=seed))
        ra = self._drive(ca, rng_a, n, depth=18)
        rb = self._drive(cb, rng_b, n, depth=18)
        assert [x[0] for x in ra] == [x[0] for x in rb]
        for (_, pa), (_, pb) in zip(ra, rb):
            assert abs(pa - pb) < 1e-5
        np.testing.assert_allclose(ca.get_density_matrix(),
                                   cb.get_density_matrix(), atol=2e-5,
                                   err_msg=f"seed={seed}")
        assert abs(ca.purity() - cb.purity()) < 1e-5
        h = rocq.PauliOperator({"Z0": 0.4, f"Z1 Z{n-1}": -0.3, "X2": 0.2})
        assert abs(ca.expval(h) - cb.expval(h)) < 1e-5

    @pytest.mark.parametrize("seed", [50, 51])
    def test_random_noisy_circuits_fp64_pair_sharded(self, seed):
        """Same fuzz at double precision: the sharded density PAIR engine
        (transposed relabels, positional superop Kraus, comm-free D2M
        factors) tracks the unsharded pair run at f64 tolerance."""
        from rocquantum_tpu import config
        old = config.get_precision()
        config.set_precision("double")
        try:
            mesh = make_mesh(8)
            n = 4
            rng_a, rng_b = (np.random.default_rng(60 + seed)
                            for _ in range(2))
            ca = DensityCircuit(n, rocq.Simulator(seed=seed), mesh=mesh)
            cb = DensityCircuit(n, rocq.Simulator(seed=seed))
            ra = self._drive(ca, rng_a, n, depth=15)
            rb = self._drive(cb, rng_b, n, depth=15)
            assert isinstance(ca._rho, tuple) and isinstance(cb._rho, tuple)
            assert len(ca._rho[0].sharding.device_set) == 8
            assert [x[0] for x in ra] == [x[0] for x in rb]
            np.testing.assert_allclose(ca.get_density_matrix(),
                                       cb.get_density_matrix(), atol=1e-12,
                                       err_msg=f"seed={seed}")
            assert abs(ca.purity() - cb.purity()) < 1e-12
        finally:
            config.set_precision(old)
