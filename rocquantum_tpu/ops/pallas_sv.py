"""Pallas TPU kernel: fused single-qubit gate layers in one HBM pass.

The XLA einsum path executes (roughly) one full-state pass per gate — the
same cost model as the reference's one-HIP-kernel-per-gate design
(single_qubit_kernels.hip:28-72). This kernel applies a whole LIST of
single-qubit gates in ONE pass: each grid step streams a row-tile of the
state through VMEM, applies every gate in registers, and writes it back.
For an L-gate layer this divides HBM traffic by up to L.

Layout: the state is carried as a (real, imag) float32 pair, each reshaped
to (R, C) with C = 2^COL_QUBITS columns (the low qubits) and rows covering
the high qubits. A gate on qubit q applies:
  * q < COL_QUBITS: within each row, on the column axis;
  * COL_QUBITS <= q < COL_QUBITS + log2(TILE_R): across rows within the
    tile (tiles are aligned so partner rows share a tile);
  * higher q: not representable in one tile -> the caller falls back to the
    XLA einsum path for those gates (or relabels qubits with one
    swap-index-bits pass first).

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


def _kernel(gm_ref, re_ref, im_ref, out_re_ref, out_im_ref, *,
            qubits: Tuple[int, ...], col_qubits: int, tile_rows: int):
    """Roll+mask pairing: Mosaic rejects reshapes that split the lane
    register ("unsupported shape cast" for inner dims < 128), so the
    amplitude partner at index distance 2^q is fetched with a cyclic roll
    and blended with a parity mask — uniform for column- and row-space
    qubits, all pure VPU work."""
    C = 1 << col_qubits
    re = re_ref[...]
    im = im_ref[...]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, C), 0)
    for k, q in enumerate(qubits):
        a_re, a_im = gm_ref[k, 0, 0, 0], gm_ref[k, 0, 0, 1]
        b_re, b_im = gm_ref[k, 0, 1, 0], gm_ref[k, 0, 1, 1]
        c_re, c_im = gm_ref[k, 1, 0, 0], gm_ref[k, 1, 0, 1]
        d_re, d_im = gm_ref[k, 1, 1, 0], gm_ref[k, 1, 1, 1]
        if q < col_qubits:
            axis, dist, ids, bit = 1, 1 << q, col_ids, q
        else:
            axis, dist, ids, bit = 0, 1 << (q - col_qubits), row_ids, \
                q - col_qubits
        is_one = ((ids >> bit) & 1) == 1
        size = C if axis == 1 else tile_rows
        # partner of a bit=0 element sits +dist ahead; of a bit=1, -dist
        # (pltpu.roll requires non-negative shifts; -d == size-d cyclically)
        fwd_re = pltpu.roll(re, size - dist, axis)   # element at i+dist
        bwd_re = pltpu.roll(re, dist, axis)          # element at i-dist
        fwd_im = pltpu.roll(im, size - dist, axis)
        bwd_im = pltpu.roll(im, dist, axis)
        p_re = jnp.where(is_one, bwd_re, fwd_re)
        p_im = jnp.where(is_one, bwd_im, fwd_im)
        # bit=0: y = a*x + b*p ; bit=1: y = c*p + d*x  (complex arithmetic)
        e_re = jnp.where(is_one, d_re, a_re)
        e_im = jnp.where(is_one, d_im, a_im)
        f_re = jnp.where(is_one, c_re, b_re)
        f_im = jnp.where(is_one, c_im, b_im)
        new_re = e_re * re - e_im * im + f_re * p_re - f_im * p_im
        new_im = e_re * im + e_im * re + f_re * p_im + f_im * p_re
        re, im = new_re, new_im
    out_re_ref[...] = re
    out_im_ref[...] = im


def apply_fused_1q_layer(re: jnp.ndarray, im: jnp.ndarray,
                         qubits: Sequence[int],
                         gate_mats: jnp.ndarray,
                         interpret: bool = False):
    """Apply 1q gates (gate k on ``qubits[k]``) to the float-pair state in
    one pass.

    gate_mats: float32 (K, 2, 2, 2) — [k, row, col, re/im].
    All qubits must satisfy q <= max_kernel_qubit(n).
    """
    n = (re.size).bit_length() - 1
    col = min(COL_QUBITS, n)
    tile_log2 = min(TILE_ROWS_LOG2, n - col)
    tile_rows = 1 << tile_log2
    limit = col + tile_log2
    qubits = tuple(int(q) for q in qubits)
    if any(q >= limit for q in qubits):
        raise ValueError(f"kernel handles qubits < {limit}, got {qubits}")
    C = 1 << col
    R = 1 << (n - col)
    re2 = re.reshape(R, C)
    im2 = im.reshape(R, C)

    tile_rows = min(tile_rows, R)
    grid = (max(R // tile_rows, 1),)
    kernel = functools.partial(_kernel, qubits=qubits, col_qubits=col,
                               tile_rows=tile_rows)
    block = pl.BlockSpec((tile_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((len(qubits), 2, 2, 2), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gspec, block, block],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct((R, C), jnp.float32),
                   jax.ShapeDtypeStruct((R, C), jnp.float32)),
        interpret=interpret,
    )(gate_mats, re2, im2)
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
