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
    VPU-bound hot path."""
    (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = coeffs
    e_re = jnp.where(is_one, d_re, a_re)
    f_re = jnp.where(is_one, c_re, b_re)
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
    fwd_im = pltpu.roll(im, size - dist, axis)
    bwd_im = pltpu.roll(im, dist, axis)
    p_re = jnp.where(is_one, bwd_re, fwd_re)
    p_im = jnp.where(is_one, bwd_im, fwd_im)
    return _gate_step(re, im, p_re, p_im, is_one, coeffs,
                      real_mat=real_mat)


def _cnot_roll(re, im, c, t, is_one_cache, col_qubits, tile_rows):
    """CNOT with control+target both in-tile: target-partner fetch via one
    roll pair, applied only where the control bit is 1 (~10 VPU ops/elem —
    the two_qubit_kernels.hip:17-51 analog, fused into the layer pass)."""
    C = 1 << col_qubits
    if t < col_qubits:
        axis, dist, size = 1, 1 << t, C
    else:
        axis, dist, size = 0, 1 << (t - col_qubits), tile_rows
    m_c = is_one_cache(c)
    m_t = is_one_cache(t)
    fwd_re = pltpu.roll(re, size - dist, axis)
    bwd_re = pltpu.roll(re, dist, axis)
    fwd_im = pltpu.roll(im, size - dist, axis)
    bwd_im = pltpu.roll(im, dist, axis)
    p_re = jnp.where(m_t, bwd_re, fwd_re)
    p_im = jnp.where(m_t, bwd_im, fwd_im)
    return jnp.where(m_c, p_re, re), jnp.where(m_c, p_im, im)


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


def _kernel(gm_ref, re_ref, im_ref, out_re_ref, out_im_ref, *,
            specs: Tuple[Tuple, ...], real_flags: Tuple[bool, ...],
            col_qubits: int, tile_rows: int):
    re = re_ref[...]
    im = im_ref[...]
    is_one = _mask_factory(col_qubits, tile_rows)
    for k, spec in enumerate(specs):
        if spec[0] == "CNOT":
            re, im = _cnot_roll(re, im, spec[1], spec[2], is_one,
                                col_qubits, tile_rows)
        else:
            re, im = _roll_gate(re, im, spec[1], is_one, _coeffs(gm_ref, k),
                                col_qubits, tile_rows,
                                real_mat=real_flags[k])
    out_re_ref[...] = re
    out_im_ref[...] = im


def _kernel_paired(gm_ref, re_ref, im_ref, out_re_ref, out_im_ref, *,
                   specs: Tuple[Tuple, ...], real_flags: Tuple[bool, ...],
                   pair_bit: int, col_qubits: int, tile_rows: int):
    """Fused 1q layer over a PAIRED block: the refs are (1, 2, 1, T, C)
    slices of a 5-D state view whose axis 1 is index bit ``pair_bit``. Gates
    on in-tile qubits roll within each half; the gate on ``pair_bit`` is an
    elementwise cross-half combine (the two partner amplitudes live in the
    same block) — extending the kernel's reach by one arbitrary high qubit
    without extra HBM traffic."""
    re0, im0 = re_ref[0, 0, 0], im_ref[0, 0, 0]
    re1, im1 = re_ref[0, 1, 0], im_ref[0, 1, 0]
    is_one = _mask_factory(col_qubits, tile_rows)
    for k, spec in enumerate(specs):
        if spec[0] == "CNOT":
            c, tq = spec[1], spec[2]
            if c == pair_bit:
                # control selects the half: X on target within half 1 only
                re1, im1 = _x_roll(re1, im1, tq, is_one, col_qubits,
                                   tile_rows)
            elif tq == pair_bit:
                # target is the pair bit: swap halves where control is 1
                m_c = is_one(c)
                n0_re = jnp.where(m_c, re1, re0)
                n0_im = jnp.where(m_c, im1, im0)
                n1_re = jnp.where(m_c, re0, re1)
                n1_im = jnp.where(m_c, im0, im1)
                re0, im0, re1, im1 = n0_re, n0_im, n1_re, n1_im
            else:
                re0, im0 = _cnot_roll(re0, im0, c, tq, is_one, col_qubits,
                                      tile_rows)
                re1, im1 = _cnot_roll(re1, im1, c, tq, is_one, col_qubits,
                                      tile_rows)
            continue
        q = spec[1]
        cs = _coeffs(gm_ref, k)
        if q == pair_bit:
            # x0 (bit=0) partner is x1 and vice versa; masks are constants
            (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = cs
            if real_flags[k]:
                n0_re = a_re * re0 + b_re * re1
                n0_im = a_re * im0 + b_re * im1
                n1_re = c_re * re0 + d_re * re1
                n1_im = c_re * im0 + d_re * im1
            else:
                n0_re = a_re * re0 - a_im * im0 + b_re * re1 - b_im * im1
                n0_im = a_re * im0 + a_im * re0 + b_re * im1 + b_im * re1
                n1_re = c_re * re0 - c_im * im0 + d_re * re1 - d_im * im1
                n1_im = c_re * im0 + c_im * re0 + d_re * im1 + d_im * re1
            re0, im0, re1, im1 = n0_re, n0_im, n1_re, n1_im
        else:
            re0, im0 = _roll_gate(re0, im0, q, is_one, cs, col_qubits,
                                  tile_rows, real_mat=real_flags[k])
            re1, im1 = _roll_gate(re1, im1, q, is_one, cs, col_qubits,
                                  tile_rows, real_mat=real_flags[k])
    out_re_ref[0, 0, 0] = re0
    out_im_ref[0, 0, 0] = im0
    out_re_ref[0, 1, 0] = re1
    out_im_ref[0, 1, 0] = im1


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


def apply_fused_layer(re: jnp.ndarray, im: jnp.ndarray,
                      specs: Sequence[Tuple],
                      gate_mats: jnp.ndarray,
                      pair_bit: int = None,
                      real_flags: Sequence[bool] = None,
                      interpret: bool = False):
    """Apply a mixed gate list to the float-pair state in one HBM pass.

    specs: per-gate ("U", q) — dense 1q matrix ``gate_mats[k]`` on qubit q —
    or ("CNOT", control, target). gate_mats: float32 (K, 2, 2, 2) —
    [k, row, col, re/im] (rows for CNOT entries are ignored).
    All referenced qubits must satisfy q <= max_kernel_qubit(n), except that
    one extra high qubit equal to ``pair_bit`` (any index bit above the tile
    region) is reachable via block pairing (_kernel_paired).
    """
    n = (re.size).bit_length() - 1
    col = min(COL_QUBITS, n)
    tile_log2 = min(TILE_ROWS_LOG2, n - col)
    tile_rows = 1 << tile_log2
    limit = col + tile_log2
    specs = tuple((spec[0],) + tuple(int(q) for q in spec[1:])
                  for spec in specs)
    all_qubits = [q for spec in specs for q in spec[1:]]
    real_flags = tuple(bool(f) for f in real_flags) if real_flags is not None \
        else (False,) * len(specs)
    if len(real_flags) != len(specs):
        raise ValueError("real_flags length must match specs")
    in_tile = [q for q in all_qubits if q != pair_bit]
    if any(q >= limit for q in in_tile):
        raise ValueError(f"kernel handles qubits < {limit} (or == pair_bit "
                         f"{pair_bit}), got {specs}")
    C = 1 << col
    R = 1 << (n - col)
    tile_rows = min(tile_rows, R)

    gspec = pl.BlockSpec((len(specs), 2, 2, 2),
                         lambda *idx: (0,) * 4, memory_space=pltpu.VMEM)

    if pair_bit is None or all(q != pair_bit for q in all_qubits):
        re2 = re.reshape(R, C)
        im2 = im.reshape(R, C)
        grid = (max(R // tile_rows, 1),)
        kernel = functools.partial(_kernel, specs=specs,
                                   real_flags=real_flags, col_qubits=col,
                                   tile_rows=tile_rows)
        block = pl.BlockSpec((tile_rows, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
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
        )(gate_mats, re2, im2)
        return out_re.reshape(re.shape), out_im.reshape(im.shape)

    pair_bit = int(pair_bit)
    if not (limit <= pair_bit < n):
        raise ValueError(f"pair_bit {pair_bit} must be a block bit in "
                         f"[{limit}, {n})")
    # 5-D view exposing pair_bit as its own axis: (A, 2, B, T, C) where
    # B covers bits [col+tile, pair_bit) and A bits (pair_bit, n).
    t_log2 = tile_rows.bit_length() - 1
    B = 1 << (pair_bit - col - t_log2)
    A = 1 << (n - 1 - pair_bit)
    shape5 = (A, 2, B, tile_rows, C)
    re5 = re.reshape(shape5)
    im5 = im.reshape(shape5)
    grid = (A, B)
    kernel = functools.partial(_kernel_paired, specs=specs,
                               real_flags=real_flags,
                               pair_bit=pair_bit, col_qubits=col,
                               tile_rows=tile_rows)
    block = pl.BlockSpec((1, 2, 1, tile_rows, C),
                         lambda a, b: (a, 0, b, 0, 0),
                         memory_space=pltpu.VMEM)
    # the paired blocks are 2x the unpaired ones; the default scoped-vmem
    # limit (16 MiB) falls ~1.6 MiB short of the double-buffered in/out set,
    # so raise it (fine: v5e physical VMEM is 128 MiB)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gspec, block, block],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct(shape5, jnp.float32),
                   jax.ShapeDtypeStruct(shape5, jnp.float32)),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
        **params,
    )(gate_mats, re5, im5)
    return out_re.reshape(re.shape), out_im.reshape(im.shape)


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
    return (re + 1j * im).astype(state.dtype)
