"""Pallas TPU kernel: fused gate layers (1q + CNOT) in one HBM pass.

The XLA einsum path executes (roughly) one full-state pass per gate — the
same cost model as the reference's one-HIP-kernel-per-gate design
(single_qubit_kernels.hip:28-72). This kernel applies a whole LIST of
gates in ONE pass: each grid step streams a block of the state through
VMEM, applies every gate in registers, and writes it back in place (in/out
aliased). For an L-gate layer this divides HBM traffic by up to L.

Layout: the state is carried as a (real, imag) float32 pair, each reshaped
to (R, C) with C = 2^COL_QUBITS columns (the low qubits) and rows covering
the high qubits. A gate on qubit q applies:
  * q < COL_QUBITS: within each row, on the column axis (pltpu.roll — a
    half-slice reformulation measured SLOWER, 0.67x vs 1.53x on v5e);
  * COL_QUBITS <= q < COL_QUBITS + TILE_ROWS_LOG2: across rows within the
    tile (tiles are aligned so partner rows share a tile);
  * q == pair_bit (any single higher bit): a 5-D block view pairs the two
    partner tiles in one block — the gate is an elementwise cross-half
    combine;
  * other high q: the caller relabels with index-bit rotations first
    (ops/relabel.py) or falls back to the XLA paths.

Complex never crosses the jit boundary on this backend, and the float-pair
representation also avoids complex-in-Pallas limitations.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COL_QUBITS = 12          # C = 4096 float32 columns = 16 KiB rows
TILE_ROWS_LOG2 = 5       # 32-row tiles: 0.5 MiB blocks — roll/select
                         # temporaries must fit beside the pipelined
                         # in/out buffers in 16 MiB VMEM


def max_kernel_qubit(n: int) -> int:
    """Highest qubit index the fused kernel can touch for an n-qubit state."""
    col = min(COL_QUBITS, n)
    tile = min(TILE_ROWS_LOG2, n - col)
    return col + tile - 1


def _gate_step(re, im, p_re, p_im, is_one, coeffs, real_mat=False):
    """One 1q-gate update given the partner amplitudes and the own-bit mask.

    bit=0 elements: y = a*x + b*partner ; bit=1: y = c*partner + d*x
    (complex arithmetic on float pairs). ``real_mat`` (a static, trace-time
    fact about the gate NAME — RY/H/X/Z have real matrices) drops the
    imaginary-coefficient terms: 6 FMAs instead of 14 on the kernel's
    VPU-bound hot path.

    ``im=None`` selects the REAL-STATE plane: a real matrix acting on a
    known-real state updates the single plane (3 FMAs) — the kernels
    thread None through every helper so an all-real pass streams HALF the
    HBM traffic (see apply_fused_layer's real-state mode)."""
    (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = coeffs
    e_re = jnp.where(is_one, d_re, a_re)
    f_re = jnp.where(is_one, c_re, b_re)
    if im is None:
        assert real_mat, "real-state plane requires a real matrix"
        return e_re * re + f_re * p_re, None
    if real_mat:
        new_re = e_re * re + f_re * p_re
        new_im = e_re * im + f_re * p_im
        return new_re, new_im
    e_im = jnp.where(is_one, d_im, a_im)
    f_im = jnp.where(is_one, c_im, b_im)
    new_re = e_re * re - e_im * im + f_re * p_re - f_im * p_im
    new_im = e_re * im + e_im * re + f_re * p_im + f_im * p_re
    return new_re, new_im


def _roll_gate(re, im, q, is_one_cache, coeffs, col_qubits, tile_rows,
               real_mat=False):
    """Apply a 1q gate on an in-tile qubit via roll+mask pairing: Mosaic
    rejects reshapes that split the lane register ("unsupported shape cast"
    for inner dims < 128), so the amplitude partner at index distance 2^q is
    fetched with a cyclic roll and blended with a parity mask — uniform for
    column- and row-space qubits, all pure VPU work."""
    C = 1 << col_qubits
    if q < col_qubits:
        axis, dist, size = 1, 1 << q, C
    else:
        axis, dist, size = 0, 1 << (q - col_qubits), tile_rows
    is_one = is_one_cache(q)
    # partner of a bit=0 element sits +dist ahead; of a bit=1, -dist
    # (pltpu.roll requires non-negative shifts; -d == size-d cyclically)
    fwd_re = pltpu.roll(re, size - dist, axis)   # element at i+dist
    bwd_re = pltpu.roll(re, dist, axis)          # element at i-dist
    p_re = jnp.where(is_one, bwd_re, fwd_re)
    if im is None:
        return _gate_step(re, None, p_re, None, is_one, coeffs,
                          real_mat=real_mat)
    fwd_im = pltpu.roll(im, size - dist, axis)
    bwd_im = pltpu.roll(im, dist, axis)
    p_im = jnp.where(is_one, bwd_im, fwd_im)
    return _gate_step(re, im, p_re, p_im, is_one, coeffs,
                      real_mat=real_mat)


def _cnot_roll(re, im, c, t, is_one_cache, col_qubits, tile_rows,
               m_c=None):
    """CNOT with control+target both in-tile: target-partner fetch via one
    roll pair, applied only where the control bit is 1 (~10 VPU ops/elem —
    the two_qubit_kernels.hip:17-51 analog, fused into the layer pass).
    ``m_c`` overrides the control mask — a grid-resolved SCALAR for
    out-of-window (free) controls."""
    C = 1 << col_qubits
    if t < col_qubits:
        axis, dist, size = 1, 1 << t, C
    else:
        axis, dist, size = 0, 1 << (t - col_qubits), tile_rows
    if m_c is None:
        m_c = is_one_cache(c)
    m_t = is_one_cache(t)
    fwd_re = pltpu.roll(re, size - dist, axis)
    bwd_re = pltpu.roll(re, dist, axis)
    p_re = jnp.where(m_t, bwd_re, fwd_re)
    if im is None:
        return jnp.where(m_c, p_re, re), None
    fwd_im = pltpu.roll(im, size - dist, axis)
    bwd_im = pltpu.roll(im, dist, axis)
    p_im = jnp.where(m_t, bwd_im, fwd_im)
    return jnp.where(m_c, p_re, re), jnp.where(m_c, p_im, im)


def _cu_roll(re, im, c, t, is_one_cache, coeffs, col_qubits, tile_rows,
             m_c=None, real_mat=False):
    """Controlled dense 1q gate (CRX/CRY/controlled-matrix/channel factors)
    with control+target both in-tile: the target update applies only where
    the control bit is 1. ``m_c`` overrides the control mask — a
    grid-resolved SCALAR for out-of-window (free) controls, exactly like
    _cnot_roll. The matrix need not be unitary (Kraus-channel factors ride
    this path)."""
    if m_c is None:
        m_c = is_one_cache(c)
    g_re, g_im = _roll_gate(re, im, t, is_one_cache, coeffs, col_qubits,
                            tile_rows, real_mat=real_mat)
    if im is None:
        return jnp.where(m_c, g_re, re), None
    return jnp.where(m_c, g_re, re), jnp.where(m_c, g_im, im)


def _d2_mul(re, im, sel_a, sel_b, coeffs, real_mat=False):
    """Two-qubit DIAGONAL gate (controlled-phase family): multiply each
    amplitude by d(bit_a, bit_b) — no partner fetch at all. ``coeffs`` is
    the packed 2x2 of diagonal entries d[bit_a, bit_b]; ``sel_a``/``sel_b``
    are boolean mask arrays for in-tile bits or compile-time 0/1 for pair
    bits (per-tile constants in the multi-pair kernel)."""
    ((d00_re, d00_im), (d01_re, d01_im),
     (d10_re, d10_im), (d11_re, d11_im)) = coeffs

    def pick(sel, on, off):
        if isinstance(sel, (bool, int)):
            return on if sel else off
        return jnp.where(sel, on, off)

    d_re = pick(sel_a, pick(sel_b, d11_re, d10_re),
                pick(sel_b, d01_re, d00_re))
    if im is None:
        assert real_mat, "real-state plane requires a real diagonal"
        return re * d_re, None
    if real_mat:
        return re * d_re, im * d_re
    d_im = pick(sel_a, pick(sel_b, d11_im, d10_im),
                pick(sel_b, d01_im, d00_im))
    return re * d_re - im * d_im, re * d_im + im * d_re


def _pair_groups(pair_bits):
    """Partition sorted pair bits into maximal CONTIGUOUS runs,
    [(lo, m), ...] ascending. Each run becomes ONE size-2^m block axis of
    the paired view (instead of m size-2 axes), keeping the view rank at
    1 + 2*runs + 2 — which is what lets a chain pass carry 5+ pair bits
    without exceeding Mosaic's rank tolerance."""
    groups = []
    for p in pair_bits:
        if groups and p == groups[-1][0] + groups[-1][1]:
            groups[-1] = (groups[-1][0], groups[-1][1] + 1)
        else:
            groups.append((p, 1))
    return groups


def _prune_pair_bits(pair_bits, touched):
    """Drop pair bits no gate touches (each costs 2x block size) — but
    re-BRIDGE where the drop would split a contiguous run into a group set
    the kernels reject (> MAX_PAIR_GROUPS runs, or a multi-run set of more
    than 5 bits): an untouched pair bit is semantically inert (gates ignore
    its block axis), so the cheapest VALID superset of the touched bits
    wins. Bridging fills the smallest inter-group gap first; bridge bits
    stay strictly between surviving pair bits, so they remain valid block
    bits."""
    bits = sorted(p for p in pair_bits if p in touched)
    if not bits:
        return ()

    def ok(b):
        gs = _pair_groups(b)
        return len(gs) <= MAX_PAIR_GROUPS and not (len(gs) > 1
                                                   and len(b) > 5)

    while not ok(bits):
        groups = _pair_groups(bits)
        gaps = [(groups[j + 1][0] - (groups[j][0] + groups[j][1]), j)
                for j in range(len(groups) - 1)]
        _, j = min(gaps)
        bits = sorted(set(bits)
                      | set(range(groups[j][0] + groups[j][1],
                                  groups[j + 1][0])))
    return tuple(bits)


def _free_bit_sel(b, pair_bits, limit):
    """Boolean value of state-index bit ``b`` (>= limit, not a pair bit)
    recovered from the GRID position — diagonal gates need only the bit
    VALUE, not the partner amplitudes, so they reach every qubit with no
    block pairing. Returns a traced scalar bool (per-tile constant)."""
    if not pair_bits:
        return ((pl.program_id(0) >> (b - limit)) & 1) == 1
    groups = _pair_groups(pair_bits)
    r = len(groups)
    # grid = (a_top, gap_{r-1}, ..., gap_0); gap_j covers [bounds[j], lo_j)
    bounds = [limit] + [lo + m for lo, m in groups]
    for j, (lo, m) in enumerate(groups):
        if bounds[j] <= b < lo:
            return ((pl.program_id(1 + (r - 1 - j))
                     >> (b - bounds[j])) & 1) == 1
    return ((pl.program_id(0) >> (b - bounds[r])) & 1) == 1


def _x_roll(re, im, t, is_one_cache, col_qubits, tile_rows):
    """Unconditional X on an in-tile qubit (y = partner)."""
    C = 1 << col_qubits
    if t < col_qubits:
        axis, dist, size = 1, 1 << t, C
    else:
        axis, dist, size = 0, 1 << (t - col_qubits), tile_rows
    m_t = is_one_cache(t)
    fwd_re = pltpu.roll(re, size - dist, axis)
    bwd_re = pltpu.roll(re, dist, axis)
    if im is None:
        return jnp.where(m_t, bwd_re, fwd_re), None
    fwd_im = pltpu.roll(im, size - dist, axis)
    bwd_im = pltpu.roll(im, dist, axis)
    return (jnp.where(m_t, bwd_re, fwd_re),
            jnp.where(m_t, bwd_im, fwd_im))


def _mask_factory(col_qubits: int, tile_rows: int):
    C = 1 << col_qubits
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 0)

    def is_one(q):
        if q < col_qubits:
            return ((col_ids >> q) & 1) == 1
        return ((row_ids >> (q - col_qubits)) & 1) == 1

    return is_one


def _coeffs(gm_ref, k):
    return (((gm_ref[k, 0, 0, 0]), (gm_ref[k, 0, 0, 1])),
            ((gm_ref[k, 0, 1, 0]), (gm_ref[k, 0, 1, 1])),
            ((gm_ref[k, 1, 0, 0]), (gm_ref[k, 1, 0, 1])),
            ((gm_ref[k, 1, 1, 0]), (gm_ref[k, 1, 1, 1])))


# ---------------------------------------------------------------------------
# MXU offload: compose 1q gates on the lane bits (q < LANE_QUBITS) into one
# 128x128 matrix — built in-kernel with the same roll machinery, which is
# trivial on a 128x128 array — and apply them all as ONE dot_general per
# tile (the systolic array does the work the VPU roll path was doing).
# Likewise gates on the tile-row bits compose into a TxT left-matrix.
# ---------------------------------------------------------------------------

LANE_QUBITS = 7  # 2^7 = 128 = one lane register

# minimum composed-gate counts for a dot to beat the roll path (measured
# cost model: a 128-wide fp32 HIGHEST dot ~ 2 real roll gates; the 32-wide
# row dot is nearly free; the batched mid dot measured ~2 roll gates at
# n=25: 5-gate mid layers 2529 vs 2363 gates/s, and it moves VPU work to
# the otherwise-idle MXU in mixed passes)
_MIN_LANE_DOT = 2
_MIN_ROW_DOT = 1
_MIN_MID_DOT = 2
_MIN_PAIR_DOT = 2


def _i32_map(fn):
    """Force a BlockSpec index map's outputs to int32. Under
    ``jax_enable_x64`` (the df64/double regimes) Python-int literals in an
    index map trace as i64, and Mosaic rejects the lowered map with
    "failed to legalize operation 'func.return'" ((i64, ...) returns) on
    real hardware — interpret mode masks this, which is why it first
    surfaced on-chip (r5 df64 bench)."""
    def wrapped(*idx):
        return tuple(jnp.asarray(v, jnp.int32) for v in fn(*idx))
    return wrapped


def _grid_semantics(grid_len: int) -> dict:
    """ROCQ_GRID_PARALLEL=1 marks every grid dim "parallel": each grid step
    of the fused passes touches an independent block (identity in/out maps,
    in-place aliased), so Mosaic may reorder/pipeline steps freely — the
    DMA/compute-overlap experiment knob for the compute-bound window
    passes. Off by default until measured on chip."""
    import os
    if os.environ.get("ROCQ_GRID_PARALLEL", "0") == "1":
        return {"dimension_semantics": ("parallel",) * grid_len}
    return {}


def _dot_mode() -> str:
    """Region-dot precision mode. DEFAULT on TPU: ``bf16x3`` — chip
    bake-off r5: n=29 ring ansatz 1864.8 vs 1616.7 g/s (+15.3%) at
    HIGHEST, and the depth-accuracy sweep (experiments/
    bf16x3_depth_sweep.py, n=20 ring, 128 layers vs plain XLA) stays
    within the f32 engine's tolerance: max amp err 2.8e-7 at depth 128
    (HIGHEST: 7.4e-8), sublinear growth; norm bias ~7e-7/layer.
    ``ROCQ_DOT_PRECISION=highest`` reverts to exact-fp32 dots.
    Off-TPU the default stays HIGHEST (CPU tests compare bit-tight)."""
    import os
    v = os.environ.get("ROCQ_DOT_PRECISION", "").lower()
    if v:
        return v
    try:
        return "bf16x3" if jax.default_backend() == "tpu" else "highest"
    except Exception:
        return "highest"


def _dot_precision():
    """MXU dot precision for the in-kernel region dots. HIGHEST (6-pass
    bf16) reproduces fp32 exactly (rel err ~1e-7/pass); ROCQ_DOT_PRECISION=
    high selects the 3-pass variant — ~2x dot throughput at ~1e-6/pass,
    still inside the engine's f32 tolerance. Knob for the compute-bound
    window passes (the stream-bound chain passes don't care)."""
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_dot_mode()]


def _make_dot(dn):
    """Region-dot factory honoring ROCQ_DOT_PRECISION (default via
    :func:`_dot_mode`). ``bf16x3`` emulates the 3-pass bf16 scheme
    (= Precision.HIGH, which Mosaic rejects inside pallas kernels) by
    hand: split each f32 operand into a bf16 high part plus a bf16
    residual and sum the three significant cross products — half the MXU
    passes of HIGHEST at ~1e-6 relative error, for the compute-bound
    lead passes whose lane dot dominates."""
    if _dot_mode() != "bf16x3":
        return functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                                 precision=_dot_precision(),
                                 preferred_element_type=jnp.float32)
    base = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                             precision=jax.lax.Precision.DEFAULT,
                             preferred_element_type=jnp.float32)

    def _split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def dot3(lhs, rhs):
        lh, ll = _split(lhs)
        rh, rl = _split(rhs)
        return base(lh, rh) + base(lh, rl) + base(ll, rh)

    return dot3


def _mxu_enabled() -> bool:
    import os
    return not os.environ.get("ROCQ_DISABLE_MXU")


def _merged_min_k() -> int:
    """Smallest single-run pair count routed to the merged-run kernel
    (below it, the tiles-list _kernel_multi). Default 1: merged measured
    ~3.4x faster than tiles-list at k=3 on v5e (105 vs ~31 ms/pass,
    n=29)."""
    import os
    return int(os.environ.get("ROCQ_MERGED_MIN_K", "1"))


def _compose_lane_matrix(gm_ref, idxs, specs, real_flags, pair_bits=(),
                         limit=0):
    """(R_re, R_im, is_real): R = G_1^T @ ... @ G_L^T so that applying all
    gates is x' = x @ R on the lane axis. Each 1q gate updates R's COLUMN
    index via the roll formula ((M @ G^T)[r,c] = sum_c' M[r,c'] G[c,c']);
    a CNOT (a permutation, so G^T application = a column shuffle) composes
    via the same masked-roll move."""
    L = 1 << LANE_QUBITS
    m_re = jnp.eye(L, dtype=jnp.float32)
    m_im = jnp.zeros((L, L), jnp.float32)
    is_one = _mask_factory(LANE_QUBITS, L)
    is_real = all(real_flags[k] for k in idxs)
    for k in idxs:
        spec = specs[k]
        if spec[0] == "CNOT":
            m_c = _free_bit_sel(spec[1], pair_bits, limit) \
                if limit and spec[1] >= limit else None
            m_re, m_im = _cnot_roll(m_re, m_im, spec[1], spec[2], is_one,
                                    LANE_QUBITS, L, m_c=m_c)
        elif spec[0] == "CU":
            m_c = _free_bit_sel(spec[1], pair_bits, limit) \
                if limit and spec[1] >= limit else None
            m_re, m_im = _cu_roll(m_re, m_im, spec[1], spec[2], is_one,
                                  _coeffs(gm_ref, k), LANE_QUBITS, L,
                                  m_c=m_c, real_mat=is_real and real_flags[k])
        elif spec[0] == "D2":
            # R' = R @ D scales R's columns by the diagonal
            m_re, m_im = _d2_mul(m_re, m_im, is_one(spec[1]),
                                 is_one(spec[2]), _coeffs(gm_ref, k),
                                 real_mat=is_real and real_flags[k])
        else:
            m_re, m_im = _roll_gate(m_re, m_im, spec[1], is_one,
                                    _coeffs(gm_ref, k), LANE_QUBITS, L,
                                    real_mat=is_real and real_flags[k])
    return m_re, m_im, is_real


def _compose_row_matrix(gm_ref, idxs, specs, real_flags, col_qubits,
                        tile_rows, pair_bits=(), limit=0):
    """(A_re, A_im, is_real): A = G_L @ ... @ G_1 so that applying all gates
    is x' = A @ x on the row axis. Each gate updates A's ROW index (CNOTs
    compose as row shuffles)."""
    t_log2 = tile_rows.bit_length() - 1
    a_re = jnp.eye(tile_rows, dtype=jnp.float32)
    a_im = jnp.zeros((tile_rows, tile_rows), jnp.float32)
    is_one = _mask_factory(t_log2, tile_rows)
    is_real = all(real_flags[k] for k in idxs)
    for k in idxs:
        spec = specs[k]
        if spec[0] == "CNOT":
            if limit and spec[1] >= limit:
                m_c = _free_bit_sel(spec[1], pair_bits, limit)
                c_t = t_log2  # unused (mask overridden); any in-range bit
            else:
                m_c, c_t = None, t_log2 + spec[1] - col_qubits
            a_re, a_im = _cnot_roll(a_re, a_im, c_t,
                                    t_log2 + spec[2] - col_qubits, is_one,
                                    t_log2, tile_rows, m_c=m_c)
        elif spec[0] == "CU":
            if limit and spec[1] >= limit:
                m_c = _free_bit_sel(spec[1], pair_bits, limit)
                c_t = t_log2  # unused (mask overridden)
            else:
                m_c, c_t = None, t_log2 + spec[1] - col_qubits
            a_re, a_im = _cu_roll(a_re, a_im, c_t,
                                  t_log2 + spec[2] - col_qubits, is_one,
                                  _coeffs(gm_ref, k), t_log2, tile_rows,
                                  m_c=m_c, real_mat=is_real and real_flags[k])
        elif spec[0] == "D2":
            # A' = D @ A scales A's rows by the diagonal
            a_re, a_im = _d2_mul(a_re, a_im,
                                 is_one(t_log2 + spec[1] - col_qubits),
                                 is_one(t_log2 + spec[2] - col_qubits),
                                 _coeffs(gm_ref, k),
                                 real_mat=is_real and real_flags[k])
        else:
            a_re, a_im = _roll_gate(a_re, a_im,
                                    t_log2 + spec[1] - col_qubits, is_one,
                                    _coeffs(gm_ref, k), t_log2, tile_rows,
                                    real_mat=is_real and real_flags[k])
    return a_re, a_im, is_real


def _compose_mid_matrix(gm_ref, idxs, specs, real_flags, col_qubits,
                        pair_bits=(), limit=0):
    """(A_re, A_im, is_real) for gates on the MIDDLE column bits
    (LANE_QUBITS <= q < col_qubits): A = G_L @ ... @ G_1 acting on the
    middle axis of the (T, M, 128) tile view. The composition is the row
    composition with the bit window shifted to start at LANE_QUBITS."""
    mid = 1 << (col_qubits - LANE_QUBITS)
    return _compose_row_matrix(gm_ref, idxs, specs, real_flags,
                               LANE_QUBITS, mid, pair_bits=pair_bits,
                               limit=limit)


def _apply_mid_dot(re, im, a_re, a_im, is_real):
    """x' = A @ x over the middle axis: (T, C) viewed as (T, M, 128) with
    M covering column bits [LANE_QUBITS, col_qubits). A is broadcast to a
    batched (T, M, M) dot_general — no transposes, one MXU op (measured
    fastest of the batched/transposed/leading-dot variants on v5e)."""
    T, C = re.shape
    M = a_re.shape[0]
    L = C // M
    x_re = re.reshape(T, M, L)
    dn = (((2,), (1,)), ((0,), (0,)))
    dot = _make_dot(dn)
    ab_re = jnp.broadcast_to(a_re, (T, M, M))
    if im is None:
        assert is_real, "real-state plane requires a real composed matrix"
        return dot(ab_re, x_re).reshape(T, C), None
    x_im = im.reshape(T, M, L)
    if is_real:
        o_re = dot(ab_re, x_re)
        o_im = dot(ab_re, x_im)
    else:
        ab_im = jnp.broadcast_to(a_im, (T, M, M))
        o_re = dot(ab_re, x_re) - dot(ab_im, x_im)
        o_im = dot(ab_re, x_im) + dot(ab_im, x_re)
    return o_re.reshape(T, C), o_im.reshape(T, C)


def _compose_pair_matrix(gm_ref, idxs, specs, real_flags, bitpos,
                         pair_bits=(), limit=0):
    """(A_re, A_im, is_real): the cross-tile mixing matrix over the 2^k
    pair-bit combos — A = G_L @ ... @ G_1 with gate qubits translated
    through ``bitpos`` (pair bits are arbitrary, non-contiguous high index
    bits; combo bit j <-> pair_bits[j]). Applying ALL pair-bit gates is one
    (2^k, 2^k) @ (2^k, T*C) dot instead of k elementwise tile combines.
    D2 members may also reference FREE bits (out-of-window, unpaired):
    their per-block value is a grid-resolved scalar, so the diagonal scale
    folds into the matrix."""
    k = len(bitpos)
    size = 1 << k
    a_re = jnp.eye(size, dtype=jnp.float32)
    a_im = jnp.zeros((size, size), jnp.float32)
    is_one = _mask_factory(k, size)
    is_real = all(real_flags[i] for i in idxs)

    def psel(q):
        if q in bitpos:
            return is_one(k + bitpos[q])
        return _free_bit_sel(q, pair_bits, limit)

    for i in idxs:
        spec = specs[i]
        if spec[0] == "CNOT":
            if spec[1] not in bitpos:  # free control: scalar-masked X
                sel_c = _free_bit_sel(spec[1], pair_bits, limit)
                x_re, x_im = _x_roll(a_re, a_im, k + bitpos[spec[2]],
                                     is_one, k, size)
                a_re = jnp.where(sel_c, x_re, a_re)
                a_im = jnp.where(sel_c, x_im, a_im)
            else:
                a_re, a_im = _cnot_roll(a_re, a_im, k + bitpos[spec[1]],
                                        k + bitpos[spec[2]], is_one, k,
                                        size)
        elif spec[0] == "CU":
            rm = is_real and real_flags[i]
            if spec[1] not in bitpos:  # free control: scalar-masked gate
                sel_c = _free_bit_sel(spec[1], pair_bits, limit)
                g_re, g_im = _roll_gate(a_re, a_im, k + bitpos[spec[2]],
                                        is_one, _coeffs(gm_ref, i), k, size,
                                        real_mat=rm)
                a_re = jnp.where(sel_c, g_re, a_re)
                a_im = jnp.where(sel_c, g_im, a_im)
            else:
                a_re, a_im = _cu_roll(a_re, a_im, k + bitpos[spec[1]],
                                      k + bitpos[spec[2]], is_one,
                                      _coeffs(gm_ref, i), k, size,
                                      real_mat=rm)
        elif spec[0] == "D2":
            a_re, a_im = _d2_mul(a_re, a_im, psel(spec[1]), psel(spec[2]),
                                 _coeffs(gm_ref, i),
                                 real_mat=is_real and real_flags[i])
        else:
            a_re, a_im = _roll_gate(a_re, a_im, k + bitpos[spec[1]], is_one,
                                    _coeffs(gm_ref, i), k, size,
                                    real_mat=is_real and real_flags[i])
    return a_re, a_im, is_real


def _apply_pair_dot(tiles, a_re, a_im, is_real):
    """Mix the 2^k paired tiles through A on the MXU: stack to
    (2^k, T, C), one left dot over the combo axis, unstack."""
    ncombo = len(tiles)
    x_re = jnp.stack([t[0] for t in tiles])
    dn = (((1,), (0,)), ((), ()))
    dot = _make_dot(dn)
    if tiles[0][1] is None:
        assert is_real, "real-state plane requires a real pair matrix"
        o_re = dot(a_re, x_re)
        return [(o_re[c], None) for c in range(ncombo)]
    x_im = jnp.stack([t[1] for t in tiles])
    if is_real:
        o_re = dot(a_re, x_re)
        o_im = dot(a_re, x_im)
    else:
        o_re = dot(a_re, x_re) - dot(a_im, x_im)
        o_im = dot(a_re, x_im) + dot(a_im, x_re)
    return [(o_re[c], o_im[c]) for c in range(ncombo)]


def _apply_lane_dot(re, im, m_re, m_im, is_real):
    """x' = x @ R over the lane axis: (T, C) viewed as (T, C/128, 128)."""
    T, C = re.shape
    L = 1 << LANE_QUBITS
    x_re = re.reshape(T, C // L, L)
    dn = (((2,), (0,)), ((), ()))
    dot = _make_dot(dn)
    if im is None:
        assert is_real, "real-state plane requires a real composed matrix"
        return dot(x_re, m_re).reshape(T, C), None
    x_im = im.reshape(T, C // L, L)
    if is_real:
        o_re = dot(x_re, m_re)
        o_im = dot(x_im, m_re)
    else:
        o_re = dot(x_re, m_re) - dot(x_im, m_im)
        o_im = dot(x_re, m_im) + dot(x_im, m_re)
    return o_re.reshape(T, C), o_im.reshape(T, C)


def _apply_row_dot(re, im, a_re, a_im, is_real):
    """x' = A @ x over the row axis of a (T, C) tile."""
    dn = (((1,), (0,)), ((), ()))
    dot = _make_dot(dn)
    if im is None:
        assert is_real, "real-state plane requires a real composed matrix"
        return dot(a_re, re), None
    if is_real:
        return dot(a_re, re), dot(a_re, im)
    return (dot(a_re, re) - dot(a_im, im),
            dot(a_re, im) + dot(a_im, re))


def _plan_mxu_items(specs, pair_bits, col_qubits, tile_rows):
    """Static partition of a pass's specs into execution items:
    ("spec", k) — roll/CNOT/pair path for gate k — or ("lanedot", idxs) /
    ("middot", idxs) / ("rowdot", idxs) batching 1q lane/middle/row gates
    into one MXU dot each. Deferred dot gates commute with everything
    between their original slot and the flush point (disjoint qubits); a
    CNOT touching a dot region flushes that pending group first."""
    t_log2 = tile_rows.bit_length() - 1
    row_lo, row_hi = col_qubits, col_qubits + t_log2
    pair_set = set(pair_bits)
    # middle column bits [LANE_QUBITS, col_qubits): only dot them at the
    # full 32-wide region (smaller M underfills the fp32 sublane tile)
    mid_on = col_qubits - LANE_QUBITS == COL_QUBITS - LANE_QUBITS
    # ROCQ_LANE_DOT_WIDTH caps the lane dot at 2^W x 2^W (gates on lane
    # bits >= W take the roll path): the full 128x128 fp32-HIGHEST dot
    # costs 128 MAC/amplitude regardless of how few gates composed into it
    # — a knob for trading MXU FLOPs vs VPU rolls on compute-heavy passes
    import os
    lane_w = min(int(os.environ.get("ROCQ_LANE_DOT_WIDTH", LANE_QUBITS)),
                 LANE_QUBITS)

    def is_freebit(q):
        # out-of-window, unpaired: reachable by D2 only (grid-resolved)
        return q >= row_hi and q not in pair_set

    def is_lane(q):
        return q < lane_w and q not in pair_set

    def is_mid(q):
        return mid_on and LANE_QUBITS <= q < col_qubits and q not in pair_set

    def is_row(q):
        return row_lo <= q < row_hi and q not in pair_set

    def is_pair(q):
        return q in pair_set

    # The dense (2^k, 2^k) pair dot costs 2^k x the state FLOPs; past k=3
    # (8 combos) the elementwise cross-tile combines (a few FMA per gate
    # per element, and pair-pair CNOTs are FREE tile-list permutations)
    # are strictly cheaper than the MXU dot.
    pair_dot_ok = len(pair_set) <= 3

    items, lane_pend, mid_pend, row_pend, pair_pend = [], [], [], [], []

    def flush_lane():
        if lane_pend:
            if len(lane_pend) >= _MIN_LANE_DOT:
                items.append(("lanedot", tuple(lane_pend)))
            else:
                items.extend(("spec", k) for k in lane_pend)
            lane_pend.clear()

    def flush_mid():
        if mid_pend:
            if len(mid_pend) >= _MIN_MID_DOT:
                items.append(("middot", tuple(mid_pend)))
            else:
                items.extend(("spec", k) for k in mid_pend)
            mid_pend.clear()

    def flush_row():
        if row_pend:
            if len(row_pend) >= _MIN_ROW_DOT:
                items.append(("rowdot", tuple(row_pend)))
            else:
                items.extend(("spec", k) for k in row_pend)
            row_pend.clear()

    def flush_pair():
        if pair_pend:
            if pair_dot_ok and len(pair_pend) >= _MIN_PAIR_DOT:
                items.append(("pairdot", tuple(pair_pend)))
            else:
                items.extend(("spec", k) for k in pair_pend)
            pair_pend.clear()

    for k, spec in enumerate(specs):
        if spec[0] == "U":
            q = spec[1]
            if is_lane(q):
                lane_pend.append(k)
                continue
            if is_mid(q):
                mid_pend.append(k)
                continue
            if is_row(q):
                row_pend.append(k)
                continue
            if is_pair(q):
                pair_pend.append(k)
                continue
            items.append(("spec", k))
        else:  # CNOT (a permutation) / CU (a controlled 2x2) / D2 (a
            # diagonal): composable when both qubits are in one dot region;
            # otherwise a barrier for the regions they touch
            qs = spec[1:]
            if all(is_lane(q) for q in qs):
                lane_pend.append(k)
                continue
            if all(is_mid(q) for q in qs):
                mid_pend.append(k)
                continue
            if all(is_row(q) for q in qs):
                row_pend.append(k)
                continue
            if all(is_pair(q) for q in qs):
                pair_pend.append(k)
                continue
            if spec[0] in ("CNOT", "CU") and is_freebit(qs[0]):
                # free control (grid-resolved scalar): the TARGET's region
                # decides the group
                t = qs[1]
                if is_lane(t):
                    lane_pend.append(k)
                    continue
                if is_mid(t):
                    mid_pend.append(k)
                    continue
                if is_row(t):
                    row_pend.append(k)
                    continue
                if is_pair(t):
                    pair_pend.append(k)
                    continue
            if (spec[0] == "D2" and pair_set
                    and all(is_pair(q) or is_freebit(q) for q in qs)):
                # diagonal over pair + free bits: the free-bit value is a
                # per-block scalar, so the scale folds into the pair matrix
                pair_pend.append(k)
                continue
            if any(is_lane(q) for q in qs):
                flush_lane()
            if any(is_mid(q) for q in qs):
                flush_mid()
            if any(is_row(q) for q in qs):
                flush_row()
            if any(is_pair(q) for q in qs):
                # a CNOT straddling the pair/in-tile boundary conditions
                # cross-tile motion on in-tile masks: order matters
                flush_pair()
            items.append(("spec", k))
    flush_lane()
    flush_mid()
    flush_row()
    flush_pair()
    return items


def _kernel(gm_ref, *refs,
            specs: Tuple[Tuple, ...], real_flags: Tuple[bool, ...],
            col_qubits: int, tile_rows: int, use_mxu: bool = False):
    if len(refs) == 2:       # real-state plane: (re_ref, out_re_ref)
        (re_ref, out_re_ref), im_ref, out_im_ref = refs, None, None
    else:
        re_ref, im_ref, out_re_ref, out_im_ref = refs
    re = re_ref[...]
    im = im_ref[...] if im_ref is not None else None
    is_one = _mask_factory(col_qubits, tile_rows)
    items = _plan_mxu_items(specs, (), col_qubits, tile_rows) if use_mxu \
        else [("spec", k) for k in range(len(specs))]
    limit0 = col_qubits + (tile_rows.bit_length() - 1)
    for kind, payload in items:
        if kind == "lanedot":
            m_re, m_im, m_real = _compose_lane_matrix(
                gm_ref, payload, specs, real_flags, pair_bits=(),
                limit=limit0)
            re, im = _apply_lane_dot(re, im, m_re, m_im, m_real)
            continue
        if kind == "middot":
            a_re, a_im, a_real = _compose_mid_matrix(
                gm_ref, payload, specs, real_flags, col_qubits,
                pair_bits=(), limit=limit0)
            re, im = _apply_mid_dot(re, im, a_re, a_im, a_real)
            continue
        if kind == "rowdot":
            a_re, a_im, a_real = _compose_row_matrix(
                gm_ref, payload, specs, real_flags, col_qubits, tile_rows,
                pair_bits=(), limit=limit0)
            re, im = _apply_row_dot(re, im, a_re, a_im, a_real)
            continue
        k = payload
        spec = specs[k]
        if spec[0] == "CNOT":
            c = spec[1]
            limit = col_qubits + (tile_rows.bit_length() - 1)
            m_c = _free_bit_sel(c, (), limit) if c >= limit else None
            re, im = _cnot_roll(re, im, c, spec[2], is_one,
                                col_qubits, tile_rows, m_c=m_c)
        elif spec[0] == "CU":
            c = spec[1]
            limit = col_qubits + (tile_rows.bit_length() - 1)
            m_c = _free_bit_sel(c, (), limit) if c >= limit else None
            re, im = _cu_roll(re, im, c, spec[2], is_one, _coeffs(gm_ref, k),
                              col_qubits, tile_rows, m_c=m_c,
                              real_mat=real_flags[k])
        elif spec[0] == "D2":
            limit = col_qubits + (tile_rows.bit_length() - 1)

            def _sel(q):
                return is_one(q) if q < limit else _free_bit_sel(q, (), limit)

            re, im = _d2_mul(re, im, _sel(spec[1]), _sel(spec[2]),
                             _coeffs(gm_ref, k), real_mat=real_flags[k])
        else:
            re, im = _roll_gate(re, im, spec[1], is_one, _coeffs(gm_ref, k),
                                col_qubits, tile_rows,
                                real_mat=real_flags[k])
    out_re_ref[...] = re
    if out_im_ref is not None:
        out_im_ref[...] = im


def _matmul_coeffs(c2, c1):
    """Scalar 2x2 complex matrix product c2 @ c1 on packed coeff tuples —
    composes consecutive same-bit 1q gates at O(1) cost so a merged-kernel
    pass applies ONE slice gate per bit regardless of layer count."""
    (a2, b2), (c2_, d2) = (c2[0], c2[1]), (c2[2], c2[3])
    (a1, b1), (c1_, d1) = (c1[0], c1[1]), (c1[2], c1[3])

    def mul(x, y):
        return (x[0] * y[0] - x[1] * y[1], x[0] * y[1] + x[1] * y[0])

    def add(x, y):
        return (x[0] + y[0], x[1] + y[1])

    return (add(mul(a2, a1), mul(b2, c1_)),
            add(mul(a2, b1), mul(b2, d1)),
            add(mul(c2_, a1), mul(d2, c1_)),
            add(mul(c2_, b1), mul(d2, d1)))


def _slice_gate_rows(re, im, q, col_qubits, coeffs, real_mat=False):
    """1q gate on a ROW-axis bit via a leading-dim reshape exposing the bit
    as its own axis — no rolls, no masks, half the VMEM temporaries of
    _roll_gate (Mosaic only rejects LANE-splitting reshapes; leading dims
    are free). This is what keeps the merged-group kernel's stack inside
    the 128 MiB scoped-vmem budget at 4 MiB blocks."""
    R, C = re.shape
    d = 1 << (q - col_qubits)
    v_re = re.reshape(R // (2 * d), 2, d, C)
    x0_re, x1_re = v_re[:, 0], v_re[:, 1]
    (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = coeffs
    if im is None:
        assert real_mat, "real-state plane requires a real matrix"
        n0_re = a_re * x0_re + b_re * x1_re
        n1_re = c_re * x0_re + d_re * x1_re
        return jnp.stack([n0_re, n1_re], axis=1).reshape(R, C), None
    v_im = im.reshape(R // (2 * d), 2, d, C)
    x0_im, x1_im = v_im[:, 0], v_im[:, 1]
    if real_mat:
        n0_re = a_re * x0_re + b_re * x1_re
        n0_im = a_re * x0_im + b_re * x1_im
        n1_re = c_re * x0_re + d_re * x1_re
        n1_im = c_re * x0_im + d_re * x1_im
    else:
        n0_re = a_re * x0_re - a_im * x0_im + b_re * x1_re - b_im * x1_im
        n0_im = a_re * x0_im + a_im * x0_re + b_re * x1_im + b_im * x1_re
        n1_re = c_re * x0_re - c_im * x0_im + d_re * x1_re - d_im * x1_im
        n1_im = c_re * x0_im + c_im * x0_re + d_re * x1_im + d_im * x1_re
    out_re = jnp.stack([n0_re, n1_re], axis=1).reshape(R, C)
    out_im = jnp.stack([n0_im, n1_im], axis=1).reshape(R, C)
    return out_re, out_im


def _slice_cnot_rows(re, im, t, col_qubits, c=None, m_c=None):
    """CNOT with a ROW-axis target via the same leading-dim reshape:
    where the control is 1 the two target slices swap. The in-tile control
    mask (virtual bit ``c``) is built DIRECTLY in the sliced (lead, d, C)
    shape — reshaping an (R, C) boolean mask trips a Mosaic layout CHECK.
    ``m_c`` overrides with a grid-resolved scalar (free controls)."""
    R, C = re.shape
    d = 1 << (t - col_qubits)
    lead = R // (2 * d)
    shape3 = (lead, d, C)
    if m_c is not None:
        m = m_c
    elif c < col_qubits:
        ids = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
        m = ((ids >> c) & 1) == 1
    else:
        # full row index at target-bit=0: lead*(2d) + j; bit (c - col) of
        # it never lands on the target-bit position (c != t)
        row0 = (jax.lax.broadcasted_iota(jnp.int32, shape3, 0) * (2 * d)
                + jax.lax.broadcasted_iota(jnp.int32, shape3, 1))
        m = ((row0 >> (c - col_qubits)) & 1) == 1
    v_re = re.reshape(lead, 2, d, C)
    x0_re, x1_re = v_re[:, 0], v_re[:, 1]
    n0_re = jnp.where(m, x1_re, x0_re)
    n1_re = jnp.where(m, x0_re, x1_re)
    out_re = jnp.stack([n0_re, n1_re], axis=1).reshape(R, C)
    if im is None:
        return out_re, None
    v_im = im.reshape(lead, 2, d, C)
    x0_im, x1_im = v_im[:, 0], v_im[:, 1]
    n0_im = jnp.where(m, x1_im, x0_im)
    n1_im = jnp.where(m, x0_im, x1_im)
    return out_re, jnp.stack([n0_im, n1_im], axis=1).reshape(R, C)


def _kernel_merged(gm_ref, *refs,
                   specs: Tuple[Tuple, ...], real_flags: Tuple[bool, ...],
                   group_lo: int, group_m: int,
                   pair_bits: Tuple[int, ...], col_qubits: int,
                   tile_rows: int, use_mxu: bool = False):
    """Fused layer over a block pairing ONE contiguous run of ``group_m``
    bits at [group_lo, group_lo+group_m): the (1, 2^m, 1, T, C) block
    reshapes to a single (2^m * T, C) tile whose high row bits ARE the
    group bits — every group-bit gate is an ordinary row-axis roll, so the
    kernel body stays O(gates) regardless of 2^m (the tiles-list kernel
    unrolls 2^m refs per gate, which explodes at m >= 4)."""
    if len(refs) == 2:       # real-state plane: (re_ref, out_re_ref)
        (re_ref, out_re_ref), im_ref, out_im_ref = refs, None, None
    else:
        re_ref, im_ref, out_re_ref, out_im_ref = refs
    G = 1 << group_m
    T = tile_rows
    limit = col_qubits + (T.bit_length() - 1)
    re = re_ref[...].reshape(G * T, 1 << col_qubits)
    im = im_ref[...].reshape(G * T, 1 << col_qubits) \
        if im_ref is not None else None
    rows = G * T

    def in_group(b):
        return group_lo <= b < group_lo + group_m

    def is_free(b):
        """Out-of-window, not in the paired group: grid-resolved."""
        return b >= limit and not in_group(b)

    def vbit(b):
        """Virtual bit position of state bit b inside the merged tile:
        window bits keep their position, group bits stack above the real
        tile rows, free bits stay at their REAL positions (disambiguated
        by is_free on the original spec, never by magnitude)."""
        if in_group(b):
            return limit + (b - group_lo)
        return b

    vspecs = tuple((s[0],) + tuple(vbit(q) for q in s[1:]) for s in specs)
    vlimit = limit + group_m
    is_one = _mask_factory(col_qubits, rows)
    # only LANE/MID dots stay on the MXU here: row/group gates roll on the
    # merged row axis (a rowdot would compose a (G*T)^2 matrix), and the
    # planner routes anything listed in its pair set to the spec path
    blocked = tuple(range(col_qubits, vlimit))
    items = _plan_mxu_items(vspecs, blocked, col_qubits, T) if use_mxu \
        else [("spec", k) for k in range(len(vspecs))]
    # rowdot/pairdot can't fire today (``blocked`` covers every row+group
    # bit and is too large for a pair dot) — expand defensively rather
    # than mis-index below if the planner ever changes
    items = [it for kind, payload in items
             for it in (((kind, payload),) if kind in ("spec", "lanedot",
                                                       "middot")
                        else tuple(("spec", k) for k in payload))]
    # consecutive 1q gates on the same row/group bit COMPOSE (scalar 2x2
    # products) and apply as ONE slice gate at flush time — a 16-layer RY
    # body stays at one gate per bit instead of 16 (which would blow the
    # scoped-VMEM stack). 1q gates on distinct bits commute, so deferral
    # past disjoint items is exact.
    pending = {}  # vbit -> [coeffs, all_real]

    def flush(bits=None):
        nonlocal re, im
        for b in sorted(pending) if bits is None else list(bits):
            ent = pending.pop(b, None)
            if ent is None:
                continue
            re, im = _slice_gate_rows(re, im, b, col_qubits, ent[0],
                                      real_mat=ent[1])

    for kind, payload in items:
        if kind == "lanedot":
            # lanes are disjoint from every pending row/group bit.
            # Free controls keep their REAL bit numbers in vspecs, so the
            # composer's >= limit test + _free_bit_sel see real positions
            m_re, m_im, m_real = _compose_lane_matrix(
                gm_ref, payload, vspecs, real_flags, pair_bits=pair_bits,
                limit=limit)
            re, im = _apply_lane_dot(re, im, m_re, m_im, m_real)
            continue
        if kind == "middot":
            # mid bits are COLUMN bits — untouched by the row merge, so
            # the batched (rows, M, M) dot applies unchanged; mid gates
            # commute with every pending row/group 1q gate (disjoint
            # axes), so no flush. Free controls keep real positions in
            # vspecs (vbit is the identity on free bits).
            a_re, a_im, a_real = _compose_mid_matrix(
                gm_ref, payload, vspecs, real_flags, col_qubits,
                pair_bits=pair_bits, limit=limit)
            re, im = _apply_mid_dot(re, im, a_re, a_im, a_real)
            continue
        k = payload
        spec = vspecs[k]
        if spec[0] == "CNOT":
            c_real = specs[k][1]
            free_c = is_free(c_real)
            m_c = _free_bit_sel(c_real, pair_bits, limit) if free_c else None
            flush([b for b in ((spec[2],) if free_c
                               else (spec[1], spec[2])) if b in pending])
            if spec[2] >= col_qubits:
                re, im = _slice_cnot_rows(re, im, spec[2], col_qubits,
                                          c=spec[1], m_c=m_c)
            else:
                re, im = _cnot_roll(re, im, spec[1], spec[2], is_one,
                                    col_qubits, rows, m_c=m_c)
        elif spec[0] == "CU":
            c_real = specs[k][1]
            free_c = is_free(c_real)
            m_c = _free_bit_sel(c_real, pair_bits, limit) if free_c \
                else is_one(vbit(c_real))
            flush([b for b in ((spec[2],) if free_c
                               else (spec[1], spec[2])) if b in pending])
            cs = _coeffs(gm_ref, k)
            if spec[2] >= col_qubits:
                g_re, g_im = _slice_gate_rows(re, im, spec[2], col_qubits,
                                              cs, real_mat=real_flags[k])
            else:
                g_re, g_im = _roll_gate(re, im, spec[2], is_one, cs,
                                        col_qubits, rows,
                                        real_mat=real_flags[k])
            re = jnp.where(m_c, g_re, re)
            im = jnp.where(m_c, g_im, im) if im is not None else None
        elif spec[0] == "D2":
            flush([b for j, b in ((1, spec[1]), (2, spec[2]))
                   if not is_free(specs[k][j]) and b in pending])

            def _sel(j):
                b_real = specs[k][j]
                if is_free(b_real):
                    return _free_bit_sel(b_real, pair_bits, limit)
                return is_one(vspecs[k][j])

            re, im = _d2_mul(re, im, _sel(1), _sel(2),
                             _coeffs(gm_ref, k), real_mat=real_flags[k])
        elif spec[1] >= col_qubits:
            cs = _coeffs(gm_ref, k)
            ent = pending.get(spec[1])
            if ent is None:
                pending[spec[1]] = [cs, real_flags[k]]
            else:
                ent[0] = _matmul_coeffs(cs, ent[0])
                ent[1] = ent[1] and real_flags[k]
        else:
            re, im = _roll_gate(re, im, spec[1], is_one, _coeffs(gm_ref, k),
                                col_qubits, rows, real_mat=real_flags[k])
    flush()
    out_re_ref[...] = re.reshape(re_ref.shape)
    if out_im_ref is not None:
        out_im_ref[...] = im.reshape(im_ref.shape)


def _kernel_multi(gm_ref, *refs,
                  specs: Tuple[Tuple, ...], real_flags: Tuple[bool, ...],
                  pair_bits: Tuple[int, ...], col_qubits: int,
                  tile_rows: int, use_mxu: bool = False):
    """Fused layer over a MULTI-PAIRED block: the refs are
    (1, 2, 1, 2, ..., 1, T, C) slices of a view exposing each of the k
    ``pair_bits`` (ascending) as its own size-2 axis, so the block holds all
    2^k partner tiles. Gates on in-tile qubits roll within every tile; a
    gate on a pair bit is an elementwise cross-tile combine — extending the
    kernel's reach by k arbitrary high qubits in the same single HBM pass.
    A CNOT with BOTH qubits on pair bits is a conditional tile swap (this is
    what covers 2q gates whose qubits are both out of the roll window).

    Contiguous pair-bit runs share ONE size-2^m block axis (_pair_groups),
    so a chain pass can pair 5+ bits while the view rank stays <= 9."""
    k_pairs = len(pair_bits)
    ncombo = 1 << k_pairs
    # combo bit j <-> pair_bits[j] (ascending); the view's outermost pair
    # axis carries the HIGHEST pair-bit GROUP
    bitpos = {pb: j for j, pb in enumerate(pair_bits)}
    groups = _pair_groups(pair_bits)   # ascending (lo, m) runs
    r_groups = len(groups)
    # combo-bit offset of each group (ascending)
    starts = []
    s = 0
    for (_, m) in groups:
        starts.append(s)
        s += m

    def ref_idx(combo):
        idx = [0]
        for j in reversed(range(r_groups)):
            v = (combo >> starts[j]) & ((1 << groups[j][1]) - 1)
            idx.append(v)
            idx.append(0)
        return tuple(idx)

    if len(refs) == 2:       # real-state plane: (re_ref, out_re_ref)
        (re_ref, out_re_ref), im_ref, out_im_ref = refs, None, None
    else:
        re_ref, im_ref, out_re_ref, out_im_ref = refs
    tiles = [(re_ref[ref_idx(c)],
              im_ref[ref_idx(c)] if im_ref is not None else None)
             for c in range(ncombo)]
    is_one = _mask_factory(col_qubits, tile_rows)

    def pair_partner(combo, pb):
        return combo ^ (1 << bitpos[pb])

    def pair_is_one(combo, pb):
        return (combo >> bitpos[pb]) & 1

    items = _plan_mxu_items(specs, pair_bits, col_qubits, tile_rows) \
        if use_mxu else [("spec", k) for k in range(len(specs))]
    limit0 = col_qubits + (tile_rows.bit_length() - 1)
    for kind, payload in items:
        if kind == "lanedot":
            m_re, m_im, m_real = _compose_lane_matrix(
                gm_ref, payload, specs, real_flags, pair_bits=pair_bits,
                limit=limit0)
            tiles = [_apply_lane_dot(re, im, m_re, m_im, m_real)
                     for (re, im) in tiles]
            continue
        if kind == "middot":
            a_re, a_im, a_real = _compose_mid_matrix(
                gm_ref, payload, specs, real_flags, col_qubits,
                pair_bits=pair_bits, limit=limit0)
            tiles = [_apply_mid_dot(re, im, a_re, a_im, a_real)
                     for (re, im) in tiles]
            continue
        if kind == "pairdot":
            a_re, a_im, a_real = _compose_pair_matrix(
                gm_ref, payload, specs, real_flags, bitpos,
                pair_bits=pair_bits,
                limit=col_qubits + (tile_rows.bit_length() - 1))
            tiles = _apply_pair_dot(tiles, a_re, a_im, a_real)
            continue
        if kind == "rowdot":
            a_re, a_im, a_real = _compose_row_matrix(
                gm_ref, payload, specs, real_flags, col_qubits, tile_rows,
                pair_bits=pair_bits, limit=limit0)
            tiles = [_apply_row_dot(re, im, a_re, a_im, a_real)
                     for (re, im) in tiles]
            continue
        k = payload
        spec = specs[k]
        if spec[0] == "D2":
            qa, qb = spec[1], spec[2]
            limit = col_qubits + (tile_rows.bit_length() - 1)

            def sel(q, combo):
                if q in bitpos:
                    return pair_is_one(combo, q)
                if q < limit:
                    return is_one(q)
                return _free_bit_sel(q, pair_bits, limit)

            tiles = [_d2_mul(re, im, sel(qa, combo), sel(qb, combo),
                             _coeffs(gm_ref, k), real_mat=real_flags[k])
                     for combo, (re, im) in enumerate(tiles)]
            continue
        if spec[0] == "CNOT":
            c, tq = spec[1], spec[2]
            limit = col_qubits + (tile_rows.bit_length() - 1)
            c_pair, t_pair = c in bitpos, tq in bitpos
            if not c_pair and c >= limit:
                # FREE control: its bit value is a per-block scalar
                sel_c = _free_bit_sel(c, pair_bits, limit)
                if t_pair:
                    # scalar-masked cross-tile swap over the target axis
                    new = []
                    for combo, (re, im) in enumerate(tiles):
                        p_re, p_im = tiles[pair_partner(combo, tq)]
                        new.append((jnp.where(sel_c, p_re, re),
                                    jnp.where(sel_c, p_im, im)
                                    if im is not None else None))
                    tiles = new
                else:
                    tiles = [_cnot_roll(re, im, c, tq, is_one, col_qubits,
                                        tile_rows, m_c=sel_c)
                             for (re, im) in tiles]
                continue
            if c_pair and t_pair:
                # both qubits on pair bits: swap tiles across the target
                # axis wherever the control bit is 1
                new = list(tiles)
                for combo in range(ncombo):
                    if pair_is_one(combo, c) and not pair_is_one(combo, tq):
                        other = pair_partner(combo, tq)
                        new[combo], new[other] = tiles[other], tiles[combo]
                tiles = new
            elif c_pair:
                # control selects tiles: X on target within bit=1 tiles only
                tiles = [
                    _x_roll(re, im, tq, is_one, col_qubits, tile_rows)
                    if pair_is_one(combo, c) else (re, im)
                    for combo, (re, im) in enumerate(tiles)]
            elif t_pair:
                # target on a pair bit: masked cross-tile swap where the
                # (in-tile) control bit is 1
                m_c = is_one(c)
                new = []
                for combo, (re, im) in enumerate(tiles):
                    p_re, p_im = tiles[pair_partner(combo, tq)]
                    new.append((jnp.where(m_c, p_re, re),
                                jnp.where(m_c, p_im, im)
                                if im is not None else None))
                tiles = new
            else:
                tiles = [_cnot_roll(re, im, c, tq, is_one, col_qubits,
                                    tile_rows) for (re, im) in tiles]
            continue
        if spec[0] == "CU":
            c, tq = spec[1], spec[2]
            limit = col_qubits + (tile_rows.bit_length() - 1)
            c_pair, t_pair = c in bitpos, tq in bitpos
            cs = _coeffs(gm_ref, k)
            rm = real_flags[k]
            # control mask: per-combo constant (pair), grid-resolved scalar
            # (free), or in-tile boolean array
            m_c = None if c_pair else (
                _free_bit_sel(c, pair_bits, limit) if c >= limit
                else is_one(c))
            if t_pair:
                (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = cs
                new = []
                for combo, (re, im) in enumerate(tiles):
                    if c_pair and not pair_is_one(combo, c):
                        new.append((re, im))
                        continue
                    p_re, p_im = tiles[pair_partner(combo, tq)]
                    if pair_is_one(combo, tq):
                        x0_re, x0_im, x1_re, x1_im = p_re, p_im, re, im
                        u_re, u_im, v_re, v_im = c_re, c_im, d_re, d_im
                    else:
                        x0_re, x0_im, x1_re, x1_im = re, im, p_re, p_im
                        u_re, u_im, v_re, v_im = a_re, a_im, b_re, b_im
                    if x0_im is None:
                        assert rm, "real-state plane requires a real CU"
                        n_re = u_re * x0_re + v_re * x1_re
                        n_im = None
                    elif rm:
                        n_re = u_re * x0_re + v_re * x1_re
                        n_im = u_re * x0_im + v_re * x1_im
                    else:
                        n_re = (u_re * x0_re - u_im * x0_im
                                + v_re * x1_re - v_im * x1_im)
                        n_im = (u_re * x0_im + u_im * x0_re
                                + v_re * x1_im + v_im * x1_re)
                    if c_pair:
                        new.append((n_re, n_im))
                    else:
                        new.append((jnp.where(m_c, n_re, re),
                                    jnp.where(m_c, n_im, im)
                                    if im is not None else None))
                tiles = new
            elif c_pair:
                tiles = [
                    _roll_gate(re, im, tq, is_one, cs, col_qubits,
                               tile_rows, real_mat=rm)
                    if pair_is_one(combo, c) else (re, im)
                    for combo, (re, im) in enumerate(tiles)]
            else:
                tiles = [_cu_roll(re, im, c, tq, is_one, cs, col_qubits,
                                  tile_rows, m_c=m_c, real_mat=rm)
                         for (re, im) in tiles]
            continue
        q = spec[1]
        cs = _coeffs(gm_ref, k)
        if q in bitpos:
            # cross-tile 1q gate: bit=0 tiles get a*x0 + b*x1, bit=1 tiles
            # c*x0 + d*x1 (masks are compile-time constants per tile)
            (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = cs
            new = []
            for combo, (re, im) in enumerate(tiles):
                p_re, p_im = tiles[pair_partner(combo, q)]
                if pair_is_one(combo, q):
                    x0_re, x0_im, x1_re, x1_im = p_re, p_im, re, im
                    u_re, u_im, v_re, v_im = c_re, c_im, d_re, d_im
                else:
                    x0_re, x0_im, x1_re, x1_im = re, im, p_re, p_im
                    u_re, u_im, v_re, v_im = a_re, a_im, b_re, b_im
                if x0_im is None:
                    assert real_flags[k], \
                        "real-state plane requires a real matrix"
                    n_re = u_re * x0_re + v_re * x1_re
                    n_im = None
                elif real_flags[k]:
                    n_re = u_re * x0_re + v_re * x1_re
                    n_im = u_re * x0_im + v_re * x1_im
                else:
                    n_re = (u_re * x0_re - u_im * x0_im
                            + v_re * x1_re - v_im * x1_im)
                    n_im = (u_re * x0_im + u_im * x0_re
                            + v_re * x1_im + v_im * x1_re)
                new.append((n_re, n_im))
            tiles = new
        else:
            tiles = [_roll_gate(re, im, q, is_one, cs, col_qubits,
                                tile_rows, real_mat=real_flags[k])
                     for (re, im) in tiles]
    for combo, (re, im) in enumerate(tiles):
        out_re_ref[ref_idx(combo)] = re
        if out_im_ref is not None:
            out_im_ref[ref_idx(combo)] = im


def apply_fused_1q_layer(re: jnp.ndarray, im: jnp.ndarray,
                         qubits: Sequence[int],
                         gate_mats: jnp.ndarray,
                         pair_bit: int = None,
                         real_flags: Sequence[bool] = None,
                         interpret: bool = False):
    """Apply 1q gates (gate k on ``qubits[k]``) in one pass — convenience
    wrapper over :func:`apply_fused_layer`."""
    specs = tuple(("U", int(q)) for q in qubits)
    return apply_fused_layer(re, im, specs, gate_mats, pair_bit=pair_bit,
                             real_flags=real_flags, interpret=interpret)


MAX_PAIR_BITS = 3  # default-geometry cap: VMEM holds 2^k paired tiles x
                   # (re+im) x (in+out) x double-buffering; k=3 with
                   # 0.5 MiB tiles needs ~70 MiB of v5e's 128 MiB physical
                   # VMEM (k=4 would exceed it). Smaller tiles raise the
                   # cap — see max_pair_bits_for.
MAX_PAIR_GROUPS = 3  # contiguous runs of pair bits, each one block axis:
                     # view rank = 1 + 2*groups + 2 (rank 9 compiles)
_PAIRED_BUDGET_BYTES = 4 << 20  # 2^k tiles x T x C x 4B per array, the
                                # measured k=3 @ 0.5 MiB-tile working set

# The tall chain geometry: 4x smaller tiles buy 2 more pair bits per pass
# (k=5), which is what collapses a 12-target CNOT chain from 5 passes to 3.
TALL_GEOMETRY = (10, 5)
# The thin geometry: 8 KiB tiles buy 9 pair bits per pass (k=9) at an
# 11-bit window — a full n=29 ring-CNOT chain fits TWO passes. Pair gates
# at this k run as elementwise cross-tile combines, never the dense
# (2^k, 2^k) dot (see pair_dot_ok).
THIN_GEOMETRY = (8, 3)

# Relative HBM-pass cost per geometry in stream-floor units (v5e measured:
# tall tiles pay ~2x grid-step overhead amortized to ~15%; thin merged-run
# passes ~8%). Single source for BOTH the mixed planner's template scores
# and the plan accept/reject comparison in the interpreter.
GEOMETRY_COSTS = {None: 1.0, TALL_GEOMETRY: 1.15, THIN_GEOMETRY: 1.08}


def max_pair_bits_for(col_qubits: int = COL_QUBITS,
                      tile_log2: int = TILE_ROWS_LOG2,
                      planes: int = 2) -> int:
    """Pair-bit capacity of a kernel geometry: how many out-of-window bits
    fit the paired-block VMEM budget at this tile size. ``planes=1``
    (real-state passes) halves the VMEM working set, buying one more
    pair bit."""
    budget = _PAIRED_BUDGET_BYTES * (2 // max(planes, 1))
    tile_bytes = (1 << col_qubits) * (1 << tile_log2) * 4
    if tile_bytes > budget:
        return 0
    return (budget // tile_bytes).bit_length() - 1


def apply_fused_layer(re: jnp.ndarray, im: jnp.ndarray,
                      specs: Sequence[Tuple],
                      gate_mats: jnp.ndarray,
                      pair_bit=None,
                      real_flags: Sequence[bool] = None,
                      interpret: bool = False,
                      pair_bits: Sequence[int] = None,
                      geometry: Tuple[int, int] = None,
                      num_qubits: int = None):
    """Apply a mixed gate list to the float-pair state in one HBM pass.

    ``re=None`` (with ``im=None`` and ``num_qubits`` set) DEFERS the
    |0...0> init into this pass: the input plane is written by
    :func:`_gen_zero_input` in this pass's exact view geometry, so no
    layout-mismatched init array (and no retiling copy) ever exists —
    the whole program peaks at ONE state plane (the n=31 enabler).

    specs: per-gate ("U", q) — dense 1q matrix ``gate_mats[k]`` on qubit q —
    ("CNOT", control, target), or ("D2", qa, qb) — a two-qubit DIAGONAL
    (controlled-phase family) whose packed entry [i, j] is the diagonal
    value at (bit_qa=i, bit_qb=j); D2 costs a masked multiply, no partner
    fetch. gate_mats: float32 (K, 2, 2, 2) — [k, row, col, re/im] (rows for
    CNOT entries are ignored).
    All referenced qubits must satisfy q < window (col + tile bits of the
    active ``geometry``, default (COL_QUBITS, TILE_ROWS_LOG2)), except that
    extra high qubits listed in ``pair_bits`` (up to
    ``max_pair_bits_for(*geometry)`` of them, in at most MAX_PAIR_GROUPS
    contiguous runs) are reachable via block pairing (_kernel_multi).
    ``pair_bit`` (scalar) is the backward-compatible single-pair form.
    """
    gen_init = re is None
    if gen_init:
        if im is not None or num_qubits is None:
            raise ValueError("deferred init (re=None) requires im=None and "
                             "num_qubits")
        n = num_qubits
    else:
        n = (re.size).bit_length() - 1
    geo_col, geo_tile = geometry if geometry is not None \
        else (COL_QUBITS, TILE_ROWS_LOG2)
    col = min(geo_col, n)
    tile_log2 = min(geo_tile, n - col)
    tile_rows = 1 << tile_log2
    limit = col + tile_log2
    specs = tuple((spec[0],) + tuple(int(q) for q in spec[1:])
                  for spec in specs)
    # D2 (diagonal) gates need only the BIT VALUE of their qubits, and a
    # CNOT's CONTROL likewise — any out-of-window bit resolves from the
    # grid position (_free_bit_sel) — so only targets and in-window
    # controls constrain the window/pair set
    paired_qubits = []
    for spec in specs:
        if spec[0] == "D2":
            continue
        if spec[0] in ("CNOT", "CU"):
            paired_qubits.append(spec[2])
            if spec[1] < limit:
                paired_qubits.append(spec[1])
            continue
        paired_qubits.extend(spec[1:])
    real_flags = tuple(bool(f) for f in real_flags) if real_flags is not None \
        else (False,) * len(specs)
    if len(real_flags) != len(specs):
        raise ValueError("real_flags length must match specs")
    if im is None and not all(real_flags):
        raise ValueError("real-state mode (im=None) requires every gate "
                         "matrix to be real")
    if pair_bits is None:
        pair_bits = () if pair_bit is None else (int(pair_bit),)
    pair_bits = tuple(sorted(int(p) for p in set(pair_bits)))
    # only keep pair bits a gate actually touches (each costs 2x block
    # size), bridging any split run back to a kernel-valid group set
    pair_bits = _prune_pair_bits(pair_bits, set(paired_qubits))
    in_tile = [q for q in paired_qubits if q not in set(pair_bits)]
    if any(q >= limit for q in in_tile):
        raise ValueError(f"kernel handles qubits < {limit} (or in pair_bits "
                         f"{pair_bits}), got {specs}")
    if any(q >= n for spec in specs for q in spec[1:]):
        raise ValueError(f"qubit out of range for n={n}: {specs}")
    cap = max_pair_bits_for(col, tile_log2)
    if len(pair_bits) > cap:
        raise ValueError(f"at most {cap} pair bits per pass at geometry "
                         f"({col}, {tile_log2}), got {pair_bits}")
    pg = _pair_groups(pair_bits)
    if len(pg) > MAX_PAIR_GROUPS:
        raise ValueError(f"at most {MAX_PAIR_GROUPS} contiguous pair-bit "
                         f"runs per pass, got {pair_bits}")
    if len(pg) > 1 and len(pair_bits) > 5:
        raise ValueError(
            f"more than 5 pair bits need a single contiguous run (the "
            f"tiles-list kernel unrolls 2^k refs), got {pair_bits}")
    C = 1 << col
    R = 1 << (n - col)
    tile_rows = min(tile_rows, R)

    gspec = pl.BlockSpec((len(specs), 2, 2, 2),
                         _i32_map(lambda *idx: (0,) * 4),
                         memory_space=pltpu.VMEM)

    if not pair_bits:
        grid = (max(R // tile_rows, 1),)
        kernel = functools.partial(_kernel, specs=specs,
                                   real_flags=real_flags, col_qubits=col,
                                   tile_rows=tile_rows,
                                   use_mxu=_mxu_enabled())
        block = pl.BlockSpec((tile_rows, C), _i32_map(lambda i: (i, 0)),
                             memory_space=pltpu.VMEM)
        params = {}
        sem = _grid_semantics(len(grid))
        if sem and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(**sem)
        re2 = _gen_zero_input((R, C), tile_rows, interpret=interpret) \
            if gen_init else re.reshape(R, C)
        if im is None:
            out_re = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[gspec, block],
                out_specs=block,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                input_output_aliases={1: 0},
                interpret=interpret,
                **params,
            )(gate_mats, re2)
            return out_re.reshape((1 << n,)), None
        im2 = im.reshape(R, C)
        out_re, out_im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[gspec, block, block],
            out_specs=(block, block),
            out_shape=(jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32)),
            # identity block maps -> in-place is safe; halves peak HBM
            input_output_aliases={1: 0, 2: 1},
            interpret=interpret,
            **params,
        )(gate_mats, re2, im2)
        return out_re.reshape(re.shape), out_im.reshape(im.shape)

    if not all(limit <= p < n for p in pair_bits):
        raise ValueError(f"pair_bits {pair_bits} must be block bits in "
                         f"[{limit}, {n})")
    # View exposing each pair bit as its own size-2 axis (highest pair bit
    # outermost): (A_k, 2, A_{k-1}, 2, ..., A_0, T, C) where A_j covers the
    # non-pair bits between adjacent pair bits (A_0: [col+tile, p_min)).
    t_log2 = tile_rows.bit_length() - 1
    k_pairs = len(pair_bits)
    groups = _pair_groups(pair_bits)   # ascending (lo, m) contiguous runs
    r_groups = len(groups)
    # low edge of the non-pair gap below each group (and above the last)
    bounds = [limit] + [lo + m for lo, m in groups]
    gaps = []  # A_j sizes, innermost first: A_j covers [bounds[j], lo_j)
    for j, (lo, m) in enumerate(groups):
        gaps.append(1 << (lo - bounds[j]))
    top_lo, top_m = groups[-1]
    a_top = 1 << (n - (top_lo + top_m))
    shape = (a_top,)
    for (lo, m), g in zip(reversed(groups), reversed(gaps)):
        shape = shape + (1 << m, g)
    shape = shape + (tile_rows, C)
    grid = (a_top,) + tuple(reversed(gaps))
    if r_groups == 1 and k_pairs >= _merged_min_k():
        # one contiguous run: merge the group axis into the tile rows —
        # O(gates) kernel body instead of the tiles-list kernel's
        # 2^k-unrolled refs. Measured on v5e (n=29, 4 MiB blocks): the
        # tiles-list kernel costs 105 ms/pass at k=3 where the merged
        # kernel runs at ~the no-pair floor (30 ms) — per-tile ref
        # loads/stores and 2^k small per-tile dots serialize badly — so
        # merged is preferred for EVERY single-run pair set
        # (ROCQ_MERGED_MIN_K overrides for A/B measurement).
        kernel = functools.partial(_kernel_merged, specs=specs,
                                   real_flags=real_flags,
                                   group_lo=groups[0][0],
                                   group_m=groups[0][1],
                                   pair_bits=pair_bits, col_qubits=col,
                                   tile_rows=tile_rows,
                                   use_mxu=_mxu_enabled())
    else:
        kernel = functools.partial(_kernel_multi, specs=specs,
                                   real_flags=real_flags,
                                   pair_bits=pair_bits, col_qubits=col,
                                   tile_rows=tile_rows,
                                   use_mxu=_mxu_enabled())
    block_shape = (1,)
    for (lo, m) in reversed(groups):
        block_shape = block_shape + (1 << m, 1)
    block_shape = block_shape + (tile_rows, C)

    def index_map(*idx):
        # idx = (a_top_idx, gap_{r-1}, ..., gap_0)
        out = [idx[0]]
        for j in range(r_groups):
            out.extend((0, idx[1 + j]))
        return tuple(out) + (0, 0)

    block = pl.BlockSpec(block_shape, _i32_map(index_map),
                         memory_space=pltpu.VMEM)
    re_v = _gen_zero_input(shape, tile_rows, interpret=interpret) \
        if gen_init else re.reshape(shape)
    im_v = im.reshape(shape) if im is not None else None
    # paired blocks are 2^k x the unpaired ones; scoped-vmem must hold the
    # double-buffered in/out set (v5e physical VMEM is 128 MiB). The limit
    # scales with the paired-block bytes (measured: 4 MiB blocks need the
    # 100 MiB ceiling).
    params = {}
    if not interpret:
        block_mib = max(1, ((1 << k_pairs) * tile_rows * C * 4) >> 20)
        # 112 MiB ceiling of v5e's 128 MiB physical VMEM: the merged-group
        # window pass measured 100.04 MiB of stack at 4 MiB blocks
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(32 * block_mib, 112) * 1024 * 1024,
            **_grid_semantics(len(grid)))
    if im is None:
        out_re = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[gspec, block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            input_output_aliases={1: 0},
            interpret=interpret,
            **params,
        )(gate_mats, re_v)
        return out_re.reshape((1 << n,)), None
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gspec, block, block],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.float32)),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
        **params,
    )(gate_mats, re_v, im_v)
    return out_re.reshape(re.shape), out_im.reshape(im.shape)


def _gen_zero_input(shape, tile_rows, interpret=False):
    """|0...0> written DIRECTLY in a fused pass's input view SHAPE — the
    consuming pallas_call's operand then has byte-for-byte the writer's
    layout and XLA inserts NO retiling copy.

    This is the deferred-init fix for the n=31 capacity edge: a flat (or
    wrong-geometry) |0..0> init and the first pass's multi-pair 5-D view
    carry different physical tilings, and the materialized relayout copy
    is a second full-state HLO temp (2 x 8 GiB at n=31 = the OOM of
    record, bench n31 probe r5).

    The writer uses its OWN grid (one step per leading-axis index x row
    tile; blocks of (1, ..., 1, t, C)) — only ``shape`` must match the
    consumer. The kernel body is strictly 2-D iota + where: in-kernel
    ``.at[].set`` lowers to scatter, which Mosaic rejects (interpret mode
    masks that — measured on chip, r5)."""
    n_lead = len(shape) - 2
    rows_l, cols = shape[-2], shape[-1]
    t = min(tile_rows, rows_l)
    grid = tuple(shape[:-2]) + (max(rows_l // t, 1),)

    def kernel(out_ref):
        at_zero = pl.program_id(0) == 0
        for d in range(1, len(grid)):
            at_zero = at_zero & (pl.program_id(d) == 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, cols), 0)
        cs = jax.lax.broadcasted_iota(jnp.int32, (t, cols), 1)
        plane = jnp.where((rows == 0) & (cs == 0) & at_zero,
                          1.0, 0.0).astype(jnp.float32)
        out_ref[...] = plane.reshape((1,) * n_lead + (t, cols))

    block = pl.BlockSpec(
        (1,) * n_lead + (t, cols),
        _i32_map(lambda *idx: tuple(idx) + (0,)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )()


def init_zero_state_tiled(n: int, interpret: bool = False) -> jnp.ndarray:
    """|0...0> as a flat (2^n,) f32 plane, WRITTEN by a Pallas kernel in
    the fused kernels' native (R, C) tiled layout.

    Why not ``jnp.zeros(...).at[0].set(1.0)``: XLA materializes that as a
    ``pad`` with the flat 1-D {T(1024)} layout, and the first kernel
    pass's (R, C)/{T(8,128)} view then needs a PHYSICAL retiling copy —
    two full-state HLO temps. At n=31 (8 GiB planes) that copy is the
    single-chip OOM of record (16.00 GiB program vs 15.75 GiB HBM,
    ROADMAP r4 capacity-edge note). Emitting the state straight into the
    kernel layout makes the downstream flat<->(R, C) reshapes cancel
    structurally, so the whole unrolled in-place pass chain peaks at ONE
    plane."""
    col = min(COL_QUBITS, n)
    tile_log2 = min(TILE_ROWS_LOG2, n - col)
    tile_rows = 1 << tile_log2
    C = 1 << col
    R = 1 << (n - col)
    tile_rows = min(tile_rows, R)
    grid = (max(R // tile_rows, 1),)

    def kernel(out_ref):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 1)
        first = (i == 0) & (rows == 0) & (cols == 0)
        out_ref[...] = jnp.where(first, 1.0, 0.0).astype(jnp.float32)

    block = pl.BlockSpec((tile_rows, C), _i32_map(lambda i: (i, 0)),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        interpret=interpret,
    )()
    return out.reshape((1 << n,))


def pack_gate_mats(mats: List[np.ndarray]) -> np.ndarray:
    """[K x (2,2) complex] -> (K, 2, 2, 2) float32 [.., re/im]."""
    out = np.zeros((len(mats), 2, 2, 2), np.float32)
    for k, m in enumerate(mats):
        m = np.asarray(m)
        out[k, :, :, 0] = m.real
        out[k, :, :, 1] = m.imag
    return out


def fused_layer_complex(state: jnp.ndarray, qubits: Sequence[int],
                        gate_mats: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Convenience: complex state in/out (adds the split/combine passes —
    chain layers on the float pair directly to amortize them)."""
    re = jnp.real(state).astype(jnp.float32)
    im = jnp.imag(state).astype(jnp.float32)
    re, im = apply_fused_1q_layer(re, im, qubits, gate_mats,
                                  interpret=interpret)
    return jax.lax.complex(re, im).astype(state.dtype)
