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
TILE_ROWS_LOG2 = 6       # 64-row tiles: 4 x 1 MiB blocks pipelined in VMEM


def max_kernel_qubit(n: int) -> int:
    """Highest qubit index the fused kernel can touch for an n-qubit state."""
    col = min(COL_QUBITS, n)
    tile = min(TILE_ROWS_LOG2, n - col)
    return col + tile - 1


def _kernel(gm_ref, re_ref, im_ref, out_re_ref, out_im_ref, *,
            qubits: Tuple[int, ...], col_qubits: int, tile_rows: int):
    C = 1 << col_qubits
    re = re_ref[...]
    im = im_ref[...]
    for k, q in enumerate(qubits):
        a_re, a_im = gm_ref[k, 0, 0, 0], gm_ref[k, 0, 0, 1]
        b_re, b_im = gm_ref[k, 0, 1, 0], gm_ref[k, 0, 1, 1]
        c_re, c_im = gm_ref[k, 1, 0, 0], gm_ref[k, 1, 0, 1]
        d_re, d_im = gm_ref[k, 1, 1, 0], gm_ref[k, 1, 1, 1]
        if q < col_qubits:
            # column-space pairing: (rows, outer, 2, inner)
            inner = 1 << q
            outer = C >> (q + 1)
            shape = (tile_rows, outer, 2, inner)
            re4 = re.reshape(shape)
            im4 = im.reshape(shape)
            x0r, x1r = re4[:, :, 0, :], re4[:, :, 1, :]
            x0i, x1i = im4[:, :, 0, :], im4[:, :, 1, :]
        else:
            # row-space pairing: (outer, 2, inner, C)
            b = q - col_qubits
            inner = 1 << b
            outer = tile_rows >> (b + 1)
            shape = (outer, 2, inner, C)
            re4 = re.reshape(shape)
            im4 = im.reshape(shape)
            x0r, x1r = re4[:, 0, :, :], re4[:, 1, :, :]
            x0i, x1i = im4[:, 0, :, :], im4[:, 1, :, :]
        # y0 = a x0 + b x1 ; y1 = c x0 + d x1 (complex)
        y0r = a_re * x0r - a_im * x0i + b_re * x1r - b_im * x1i
        y0i = a_re * x0i + a_im * x0r + b_re * x1i + b_im * x1r
        y1r = c_re * x0r - c_im * x0i + d_re * x1r - d_im * x1i
        y1i = c_re * x0i + c_im * x0r + d_re * x1i + d_im * x1r
        if q < col_qubits:
            re = jnp.stack([y0r, y1r], axis=2).reshape(tile_rows, C)
            im = jnp.stack([y0i, y1i], axis=2).reshape(tile_rows, C)
        else:
            re = jnp.stack([y0r, y1r], axis=1).reshape(tile_rows, C)
            im = jnp.stack([y0i, y1i], axis=1).reshape(tile_rows, C)
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
