"""Pallas TPU kernel: fused df64 (hi/lo f32) gate layers in one HBM pass.

The XLA df64 path (ops/df64.py) costs one full-state pass per gate — chip-
measured 82.5 gates/s at n=26, only 1.33x the exact-f64 pair engine's
hardware ceiling (docs/FP64_GUIDE.md). This kernel is where the double-
float representation pays off: a whole LIST of gates applies in ONE HBM
pass, and the compensated arithmetic runs on the VPU's native f32 units —
the two things the f64 formulation can never have on v5e (Mosaic rejects
f64; f64 elementwise is emulated at ~185 Gflop/s).

Layout matches ops/pallas_sv.py: each f32 plane reshaped to (R, C) rows x
columns, 32-row tiles streamed through VMEM, partner amplitudes fetched
with pltpu.roll (movement — exact), gates combined with the error-free
df64 arithmetic of ops/df64.py (two_sum / two_prod are pure jnp
elementwise, so they lower inside Pallas kernels unchanged). The state is
  * REAL carry:    (re_hi, re_lo)                      — 2 planes
  * complex carry: (re_hi, re_lo, im_hi, im_lo)        — 4 planes
mirroring pallas_sv's single-plane real-state mode: an all-real gate list
on a real state streams HALF the HBM traffic.

Out-of-window high qubits ride the same multi-pair block views as the f32
kernels (each pair bit a size-2 block axis; gates on pair bits become
cross-tile df64 combines, CNOTs tile swaps), so an n-qubit layer covers
window + k qubits per pass.

No MXU items here BY DESIGN: the MXU's f32 accumulation order breaks the
error-free transformations, so every gate stays on the VPU roll path.

Reference parity: the fused fp64 analog of single_qubit_kernels.hip:49-71
(real FMA pairs), each f64 FMA expanded to compensated f32.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df64 import df_add, df_mul, df_neg, df_select, split_f64
from .pallas_sv import (COL_QUBITS, TILE_ROWS_LOG2, MAX_PAIR_GROUPS,
                        _free_bit_sel, _grid_semantics, _i32_map,
                        _mask_factory, _pair_groups, _prune_pair_bits,
                        max_pair_bits_for)


# ---------------------------------------------------------------------------
# Coefficient packing: (K, 2, 2, 4) f32, last axis (re_hi, re_lo, im_hi, im_lo)
# ---------------------------------------------------------------------------

def pack_gate_mats_df64(mats: List[np.ndarray]) -> np.ndarray:
    """Host 2x2 complex128 matrices -> one (K, 2, 2, 4) f32 array of
    hi/lo-split entries (the df64 twin of pallas_sv.pack_gate_mats)."""
    out = np.zeros((len(mats), 2, 2, 4), np.float32)
    for k, m in enumerate(mats):
        m = np.asarray(m, np.complex128)
        for i in range(2):
            for j in range(2):
                re_hi = np.float32(m[i, j].real)
                im_hi = np.float32(m[i, j].imag)
                out[k, i, j, 0] = re_hi
                out[k, i, j, 1] = np.float32(m[i, j].real
                                             - np.float64(re_hi))
                out[k, i, j, 2] = im_hi
                out[k, i, j, 3] = np.float32(m[i, j].imag
                                             - np.float64(im_hi))
    return out


def pack_rows_df64(rows: Sequence[Tuple]) -> jnp.ndarray:
    """Traced scalar rows [(m_re, m_im|None), ...] (pairsim.gate_rows
    output, f64 entries) -> (K, 2, 2, 4) f32 — keeps params runtime inputs
    so compiled layer programs are reused across parameter updates."""
    gs = []
    for m_re, m_im in rows:
        entries = []
        for i in range(2):
            for j in range(2):
                rh, rl = split_f64(m_re[i][j])
                ih, il = split_f64(m_im[i][j]) if m_im is not None \
                    else (0.0, 0.0)
                entries.append(jnp.stack([jnp.asarray(v, jnp.float32)
                                          for v in (rh, rl, ih, il)]))
        gs.append(jnp.stack(entries).reshape(2, 2, 4))
    return jnp.stack(gs)


def _coeffs_df(gm_ref, k):
    """Entry (i, j) -> ((re_hi, re_lo), (im_hi, im_lo)) nested pairs,
    row-major (a, b, c, d) like pallas_sv._coeffs."""
    def entry(i, j):
        return ((gm_ref[k, i, j, 0], gm_ref[k, i, j, 1]),
                (gm_ref[k, i, j, 2], gm_ref[k, i, j, 3]))
    return entry(0, 0), entry(0, 1), entry(1, 0), entry(1, 1)


# ---------------------------------------------------------------------------
# In-kernel df64 gate steps. A state is (re_pair, im_pair|None), each pair
# (hi, lo) arrays of the tile shape.
# ---------------------------------------------------------------------------

def _df_gate_step(re, im, p_re, p_im, is_one, coeffs, real_mat=False):
    """bit=0 elements: y = a*x + b*partner ; bit=1: y = c*partner + d*x —
    all products/sums in compensated df64 (the pallas_sv._gate_step twin)."""
    (a_re, a_im), (b_re, b_im), (c_re, c_im), (d_re, d_im) = coeffs
    e_re = df_select(is_one, d_re, a_re)
    f_re = df_select(is_one, c_re, b_re)
    if im is None:
        assert real_mat, "real-state carry requires a real matrix"
        return df_add(df_mul(e_re, re), df_mul(f_re, p_re)), None
    if real_mat:
        return (df_add(df_mul(e_re, re), df_mul(f_re, p_re)),
                df_add(df_mul(e_re, im), df_mul(f_re, p_im)))
    e_im = df_select(is_one, d_im, a_im)
    f_im = df_select(is_one, c_im, b_im)
    t1 = df_mul(e_im, im)
    t2 = df_mul(f_im, p_im)
    new_re = df_add(df_add(df_mul(e_re, re), df_neg(t1)),
                    df_add(df_mul(f_re, p_re), df_neg(t2)))
    new_im = df_add(df_add(df_mul(e_re, im), df_mul(e_im, re)),
                    df_add(df_mul(f_re, p_im), df_mul(f_im, p_re)))
    return new_re, new_im


def _roll_pair(pair, dist, size, axis, is_one):
    """Partner fetch for one df64 plane pair: two rolls + a parity select
    per plane (pure movement — exact). Shifts pinned to i32: df64 programs
    run under jax_enable_x64, where a Python-int shift becomes an i64
    scalar that Mosaic's tpu.dynamic_rotate rejects."""
    fw = np.int32(size - dist)
    bw = np.int32(dist)
    fwd = (pltpu.roll(pair[0], fw, axis), pltpu.roll(pair[1], fw, axis))
    bwd = (pltpu.roll(pair[0], bw, axis), pltpu.roll(pair[1], bw, axis))
    return df_select(is_one, bwd, fwd)


def _axis_of(q, col_qubits, tile_rows):
    if q < col_qubits:
        return 1, 1 << q, 1 << col_qubits
    return 0, 1 << (q - col_qubits), tile_rows


def _df_roll_gate(re, im, q, is_one_cache, coeffs, col_qubits, tile_rows,
                  real_mat=False):
    axis, dist, size = _axis_of(q, col_qubits, tile_rows)
    is_one = is_one_cache(q)
    p_re = _roll_pair(re, dist, size, axis, is_one)
    p_im = _roll_pair(im, dist, size, axis, is_one) if im is not None \
        else None
    return _df_gate_step(re, im, p_re, p_im, is_one, coeffs,
                         real_mat=real_mat)


def _df_cnot(re, im, c, t, is_one_cache, col_qubits, tile_rows, m_c=None):
    """CNOT: partner swap where the control bit is 1 — per-plane movement,
    exact (no arithmetic at all)."""
    axis, dist, size = _axis_of(t, col_qubits, tile_rows)
    if m_c is None:
        m_c = is_one_cache(c)
    is_one = is_one_cache(t)
    p_re = _roll_pair(re, dist, size, axis, is_one)
    new_re = df_select(m_c, p_re, re)
    if im is None:
        return new_re, None
    p_im = _roll_pair(im, dist, size, axis, is_one)
    return new_re, df_select(m_c, p_im, im)


def _df_cu(re, im, c, t, is_one_cache, coeffs, col_qubits, tile_rows,
           m_c=None, real_mat=False):
    """Controlled dense 1q gate (CRX/CRY/controlled-matrix): the df64
    target update applies only where the control bit is 1 (the
    pallas_sv._cu_roll twin — selects are movement, exact)."""
    if m_c is None:
        m_c = is_one_cache(c)
    g_re, g_im = _df_roll_gate(re, im, t, is_one_cache, coeffs, col_qubits,
                               tile_rows, real_mat=real_mat)
    new_re = df_select(m_c, g_re, re)
    if im is None:
        return new_re, None
    return new_re, df_select(m_c, g_im, im)


def _df_x(re, im, t, is_one_cache, col_qubits, tile_rows):
    """Unconditional X on an in-tile qubit: the partner IS the result
    (movement only, exact)."""
    axis, dist, size = _axis_of(t, col_qubits, tile_rows)
    m_t = is_one_cache(t)
    new_re = _roll_pair(re, dist, size, axis, m_t)
    new_im = _roll_pair(im, dist, size, axis, m_t) if im is not None \
        else None
    return new_re, new_im


def _df_d2(re, im, sel_a, sel_b, coeffs, real_mat=False):
    """Two-qubit DIAGONAL: multiply by d(bit_a, bit_b) in df64 — no
    partner fetch (comm-free reach to every qubit via _free_bit_sel)."""
    (d00_re, d00_im), (d01_re, d01_im), (d10_re, d10_im), (d11_re, d11_im) \
        = coeffs

    def pick(sel, on, off):
        if isinstance(sel, (bool, int)):
            return on if sel else off
        return df_select(sel, on, off)

    d_re = pick(sel_a, pick(sel_b, d11_re, d10_re),
                pick(sel_b, d01_re, d00_re))
    if im is None:
        assert real_mat, "real-state carry requires a real diagonal"
        return df_mul(re, d_re), None
    if real_mat:
        return df_mul(re, d_re), df_mul(im, d_re)
    d_im = pick(sel_a, pick(sel_b, d11_im, d10_im),
                pick(sel_b, d01_im, d00_im))
    mr = df_mul(re, d_re)
    mi = df_mul(im, d_im)
    new_re = df_add(mr, (-mi[0], -mi[1]))
    new_im = df_add(df_mul(re, d_im), df_mul(im, d_re))
    return new_re, new_im


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _unpack_refs(refs):
    """refs -> ((re_pair, im_pair|None), out_refs). 4 refs = real carry,
    8 = complex."""
    if len(refs) == 4:
        rh, rl, orh, orl = refs
        return (rh[...], rl[...]), None, (orh, orl, None, None)
    rh, rl, ih, il, orh, orl, oih, oil = refs
    return (rh[...], rl[...]), (ih[...], il[...]), (orh, orl, oih, oil)


def _kernel_df(gm_ref, *refs, specs: Tuple[Tuple, ...],
               real_flags: Tuple[bool, ...], col_qubits: int,
               tile_rows: int):
    re, im, outs = _unpack_refs(refs)
    is_one = _mask_factory(col_qubits, tile_rows)
    limit = col_qubits + (tile_rows.bit_length() - 1)
    for k, spec in enumerate(specs):
        if spec[0] == "CNOT":
            c = spec[1]
            m_c = _free_bit_sel(c, (), limit) if c >= limit else None
            re, im = _df_cnot(re, im, c, spec[2], is_one, col_qubits,
                              tile_rows, m_c=m_c)
        elif spec[0] == "CU":
            c = spec[1]
            m_c = _free_bit_sel(c, (), limit) if c >= limit else None
            re, im = _df_cu(re, im, c, spec[2], is_one,
                            _coeffs_df(gm_ref, k), col_qubits, tile_rows,
                            m_c=m_c, real_mat=real_flags[k])
        elif spec[0] == "D2":
            def _sel(q):
                return is_one(q) if q < limit else _free_bit_sel(q, (),
                                                                 limit)
            re, im = _df_d2(re, im, _sel(spec[1]), _sel(spec[2]),
                            _coeffs_df(gm_ref, k), real_mat=real_flags[k])
        else:
            re, im = _df_roll_gate(re, im, spec[1], is_one,
                                   _coeffs_df(gm_ref, k), col_qubits,
                                   tile_rows, real_mat=real_flags[k])
    orh, orl, oih, oil = outs
    orh[...], orl[...] = re
    if oih is not None:
        oih[...], oil[...] = im


def _kernel_multi_df(gm_ref, *refs, specs: Tuple[Tuple, ...],
                     real_flags: Tuple[bool, ...],
                     pair_bits: Tuple[int, ...], col_qubits: int,
                     tile_rows: int):
    """Multi-paired df64 layer: the block holds all 2^k partner tiles of
    the ``pair_bits`` (the pallas_sv._kernel_multi twin, VPU-only). Gates
    on pair bits are cross-tile df64 combines; CNOTs tile swaps."""
    k_pairs = len(pair_bits)
    ncombo = 1 << k_pairs
    bitpos = {pb: j for j, pb in enumerate(pair_bits)}
    groups = _pair_groups(pair_bits)
    r_groups = len(groups)
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

    if len(refs) == 4:
        rh, rl, orh, orl = refs
        ih = il = oih = oil = None
    else:
        rh, rl, ih, il, orh, orl, oih, oil = refs
    tiles = [((rh[ref_idx(c)], rl[ref_idx(c)]),
              (ih[ref_idx(c)], il[ref_idx(c)]) if ih is not None else None)
             for c in range(ncombo)]
    is_one = _mask_factory(col_qubits, tile_rows)
    limit = col_qubits + (tile_rows.bit_length() - 1)

    def pair_partner(combo, pb):
        return combo ^ (1 << bitpos[pb])

    def pair_is_one(combo, pb):
        return (combo >> bitpos[pb]) & 1

    for k, spec in enumerate(specs):
        if spec[0] == "D2":
            qa, qb = spec[1], spec[2]

            def sel(q, combo):
                if q in bitpos:
                    return pair_is_one(combo, q)
                if q < limit:
                    return is_one(q)
                return _free_bit_sel(q, pair_bits, limit)

            tiles = [_df_d2(re, im, sel(qa, combo), sel(qb, combo),
                            _coeffs_df(gm_ref, k), real_mat=real_flags[k])
                     for combo, (re, im) in enumerate(tiles)]
            continue
        if spec[0] == "CNOT":
            c, tq = spec[1], spec[2]
            c_pair, t_pair = c in bitpos, tq in bitpos
            if c_pair and t_pair:
                new = list(tiles)
                for combo in range(ncombo):
                    if pair_is_one(combo, c) and not pair_is_one(combo, tq):
                        other = pair_partner(combo, tq)
                        new[combo], new[other] = tiles[other], tiles[combo]
                tiles = new
                continue
            if t_pair:
                # masked cross-tile swap where the control bit is 1
                m_c = (_free_bit_sel(c, pair_bits, limit) if c >= limit
                       else is_one(c))
                new = []
                for combo, (re, im) in enumerate(tiles):
                    p_re, p_im = tiles[pair_partner(combo, tq)]
                    new.append((df_select(m_c, p_re, re),
                                df_select(m_c, p_im, im)
                                if im is not None else None))
                tiles = new
                continue
            if c_pair:
                # control selects tiles: X on target in bit=1 tiles only
                # (pure movement — the partner IS the result)
                tiles = [
                    _df_x(re, im, tq, is_one, col_qubits, tile_rows)
                    if pair_is_one(combo, c) else (re, im)
                    for combo, (re, im) in enumerate(tiles)]
                continue
            m_c = _free_bit_sel(c, pair_bits, limit) if c >= limit else None
            tiles = [_df_cnot(re, im, c, tq, is_one, col_qubits,
                              tile_rows, m_c=m_c) for (re, im) in tiles]
            continue
        if spec[0] == "CU":
            c, tq = spec[1], spec[2]
            c_pair, t_pair = c in bitpos, tq in bitpos
            cs = _coeffs_df(gm_ref, k)
            rm = real_flags[k]
            # control mask: per-combo constant (pair), grid-resolved scalar
            # (free), or in-tile boolean array — pallas_sv._kernel_multi's
            # CU branch with the combines swapped for df64
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
                        n_re = df_add(df_mul(u_re, x0_re),
                                      df_mul(v_re, x1_re))
                        n_im = None
                    elif rm:
                        n_re = df_add(df_mul(u_re, x0_re),
                                      df_mul(v_re, x1_re))
                        n_im = df_add(df_mul(u_re, x0_im),
                                      df_mul(v_re, x1_im))
                    else:
                        t1 = df_mul(u_im, x0_im)
                        t2 = df_mul(v_im, x1_im)
                        n_re = df_add(df_add(df_mul(u_re, x0_re),
                                             df_neg(t1)),
                                      df_add(df_mul(v_re, x1_re),
                                             df_neg(t2)))
                        n_im = df_add(df_add(df_mul(u_re, x0_im),
                                             df_mul(u_im, x0_re)),
                                      df_add(df_mul(v_re, x1_im),
                                             df_mul(v_im, x1_re)))
                    if c_pair:
                        new.append((n_re, n_im))
                    else:
                        new.append((df_select(m_c, n_re, re),
                                    df_select(m_c, n_im, im)
                                    if im is not None else None))
                tiles = new
            elif c_pair:
                tiles = [
                    _df_roll_gate(re, im, tq, is_one, cs, col_qubits,
                                  tile_rows, real_mat=rm)
                    if pair_is_one(combo, c) else (re, im)
                    for combo, (re, im) in enumerate(tiles)]
            else:
                tiles = [_df_cu(re, im, c, tq, is_one, cs, col_qubits,
                                tile_rows, m_c=m_c, real_mat=rm)
                         for (re, im) in tiles]
            continue
        q = spec[1]
        cs = _coeffs_df(gm_ref, k)
        if q in bitpos:
            # cross-tile 1q gate: bit=0 tiles get a*x0 + b*x1, bit=1
            # c*x0 + d*x1 (compile-time constants per tile)
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
                if real_flags[k]:
                    n_re = df_add(df_mul(u_re, x0_re), df_mul(v_re, x1_re))
                    n_im = None if x0_im is None else \
                        df_add(df_mul(u_re, x0_im), df_mul(v_re, x1_im))
                else:
                    t1 = df_mul(u_im, x0_im)
                    t2 = df_mul(v_im, x1_im)
                    n_re = df_add(df_add(df_mul(u_re, x0_re),
                                         (-t1[0], -t1[1])),
                                  df_add(df_mul(v_re, x1_re),
                                         (-t2[0], -t2[1])))
                    n_im = df_add(df_add(df_mul(u_re, x0_im),
                                         df_mul(u_im, x0_re)),
                                  df_add(df_mul(v_re, x1_im),
                                         df_mul(v_im, x1_re)))
                new.append((n_re, n_im))
            tiles = new
        else:
            tiles = [_df_roll_gate(re, im, q, is_one, cs, col_qubits,
                                   tile_rows, real_mat=real_flags[k])
                     for (re, im) in tiles]
    for combo, (re, im) in enumerate(tiles):
        orh[ref_idx(combo)], orl[ref_idx(combo)] = re
        if oih is not None:
            oih[ref_idx(combo)], oil[ref_idx(combo)] = im


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def apply_fused_layer_df64(rh: jnp.ndarray, rl: jnp.ndarray,
                           ih: Optional[jnp.ndarray],
                           il: Optional[jnp.ndarray],
                           specs: Sequence[Tuple],
                           gate_mats: jnp.ndarray,
                           real_flags: Sequence[bool] = None,
                           pair_bits: Sequence[int] = (),
                           geometry: Tuple[int, int] = None,
                           interpret: bool = False):
    """Apply a mixed gate list to the df64 state in one HBM pass.

    specs / real_flags / pair_bits semantics match
    pallas_sv.apply_fused_layer; gate_mats is the (K, 2, 2, 4) hi/lo-split
    form (pack_gate_mats_df64 / pack_rows_df64). ``ih is None`` selects the
    REAL-state carry (half the planes, half the traffic)."""
    n = (rh.size).bit_length() - 1
    geo_col, geo_tile = geometry if geometry is not None \
        else (COL_QUBITS, TILE_ROWS_LOG2)
    col = min(geo_col, n)
    tile_log2 = min(geo_tile, n - col)
    tile_rows = 1 << tile_log2
    limit = col + tile_log2
    specs = tuple((spec[0],) + tuple(int(q) for q in spec[1:])
                  for spec in specs)
    real_flags = tuple(bool(f) for f in real_flags) \
        if real_flags is not None else (False,) * len(specs)
    if len(real_flags) != len(specs):
        raise ValueError("real_flags length must match specs")
    if ih is None and not all(real_flags):
        raise ValueError("real-state mode requires every gate matrix real")
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
    pair_bits = tuple(sorted(int(p) for p in set(pair_bits)))
    pair_bits = _prune_pair_bits(pair_bits, set(paired_qubits))
    in_tile = [q for q in paired_qubits if q not in set(pair_bits)]
    if any(q >= limit for q in in_tile):
        raise ValueError(f"kernel handles qubits < {limit} (or in "
                         f"pair_bits {pair_bits}), got {specs}")
    cap = max_pair_bits_for(col, tile_log2)
    if len(pair_bits) > cap:
        raise ValueError(f"at most {cap} pair bits per pass, got "
                         f"{pair_bits}")
    if len(_pair_groups(pair_bits)) > MAX_PAIR_GROUPS:
        raise ValueError(f"at most {MAX_PAIR_GROUPS} pair-bit runs, got "
                         f"{pair_bits}")
    if len(_pair_groups(pair_bits)) > 1 and len(pair_bits) > 5:
        raise ValueError(f"multi-run pair sets cap at 5 bits, got "
                         f"{pair_bits}")
    C = 1 << col
    R = 1 << (n - col)
    tile_rows = min(tile_rows, R)
    planes = [rh, rl] if ih is None else [rh, rl, ih, il]
    nplanes = len(planes)

    gspec = pl.BlockSpec((len(specs), 2, 2, 4),
                         _i32_map(lambda *idx: (0,) * 4),
                         memory_space=pltpu.VMEM)

    if not pair_bits:
        grid = (max(R // tile_rows, 1),)
        kernel = functools.partial(_kernel_df, specs=specs,
                                   real_flags=real_flags, col_qubits=col,
                                   tile_rows=tile_rows)
        block = pl.BlockSpec((tile_rows, C), _i32_map(lambda i: (i, 0)),
                             memory_space=pltpu.VMEM)
        params = {}
        sem = _grid_semantics(len(grid))
        if sem and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(**sem)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[gspec] + [block] * nplanes,
            out_specs=tuple([block] * nplanes),
            out_shape=tuple(jax.ShapeDtypeStruct((R, C), jnp.float32)
                            for _ in range(nplanes)),
            input_output_aliases={1 + i: i for i in range(nplanes)},
            interpret=interpret,
            **params,
        )(gate_mats, *[p.reshape(R, C) for p in planes])
        outs = [o.reshape(rh.shape) for o in outs]
        return tuple(outs) + (None, None) if ih is None else tuple(outs)

    if not all(limit <= p < n for p in pair_bits):
        raise ValueError(f"pair_bits {pair_bits} must be block bits in "
                         f"[{limit}, {n})")
    k_pairs = len(pair_bits)
    groups = _pair_groups(pair_bits)
    r_groups = len(groups)
    bounds = [limit] + [lo + m for lo, m in groups]
    gaps = []
    for j, (lo, m) in enumerate(groups):
        gaps.append(1 << (lo - bounds[j]))
    top_lo, top_m = groups[-1]
    a_top = 1 << (n - (top_lo + top_m))
    shape = (a_top,)
    for (lo, m), g in zip(reversed(groups), reversed(gaps)):
        shape = shape + (1 << m, g)
    shape = shape + (tile_rows, C)
    grid = (a_top,) + tuple(reversed(gaps))
    kernel = functools.partial(_kernel_multi_df, specs=specs,
                               real_flags=real_flags, pair_bits=pair_bits,
                               col_qubits=col, tile_rows=tile_rows)
    block_shape = (1,)
    for (lo, m) in reversed(groups):
        block_shape = block_shape + (1 << m, 1)
    block_shape = block_shape + (tile_rows, C)

    def index_map(*idx):
        out = [idx[0]]
        for j in range(r_groups):
            out.extend((0, idx[1 + j]))
        return tuple(out) + (0, 0)

    block = pl.BlockSpec(block_shape, _i32_map(index_map),
                         memory_space=pltpu.VMEM)
    params = {}
    if not interpret:
        # paired blocks x planes must fit beside the double-buffered
        # in/out set (see pallas_sv's measured ceiling notes)
        block_mib = max(1, (nplanes // 2)
                        * (((1 << k_pairs) * tile_rows * C * 4) >> 20))
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(32 * block_mib, 112) * 1024 * 1024,
            **_grid_semantics(len(grid)))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gspec] + [block] * nplanes,
        out_specs=tuple([block] * nplanes),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(nplanes)),
        input_output_aliases={1 + i: i for i in range(nplanes)},
        interpret=interpret,
        **params,
    )(gate_mats, *[p.reshape(shape) for p in planes])
    outs = [o.reshape(rh.shape) for o in outs]
    return tuple(outs) + (None, None) if ih is None else tuple(outs)
