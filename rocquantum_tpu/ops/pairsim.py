"""Float-pair simulation: the complex state as (re, im) REAL arrays.

Why this exists: the TPU x64 rewriter emulates complex128 as (f64, f64)
tuples and is missing expansions for several ops — observed libtpu
x64_rewriter.cc aborts on scalar ``convert f64 -> c128``, on ``abs(c128)``
and on un-rewritten c128 ``add``s — so the fp64 chemistry path cannot ship
complex128 programs to this backend at all. This module runs the SAME
simulation in explicit real arithmetic: a gate is

    re' = M_re @ re - M_im @ im      im' = M_re @ im + M_im @ re

where each ``@`` is a scatter-free slice-multiply-add over the exposed
target axes (NEVER a dot/einsum: TPU f64 DOTS silently run at ~f32
accuracy; elementwise f64 keeps double-single precision — and never a
transpose: moveaxis materialized ~17 GiB of layout copies at n=26). Real
matrices skip the two ``M_im`` passes. This is also what
the reference's ``ROCQ_PRECISION_DOUBLE`` kernels ultimately execute:
explicit real FMA pairs (hipStateVec.h:7-15, single_qubit_kernels.hip:49-71).

Works at any real dtype; defaults to ``config.real_dtype()`` (f64 when
``set_precision("double")`` is active — the intended use).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from . import gates as G
from . import statevec as sv


def init_pair(n: int, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|0...0> as a float pair."""
    dt = dtype or config.real_dtype()
    re = jnp.zeros((1 << n,), dt).at[0].set(1.0)
    return re, jnp.zeros((1 << n,), dt)


def _controlled_parts(m_re, m_im, m: int, c: int):
    """Embed a 2^m x 2^m gate-part pair into the 2^(m+c) controlled matrix
    (controls = HIGH matrix-index bits, the engine's convention): identity
    everywhere except the all-controls-one block."""
    dim = 1 << (m + c)
    sub = 1 << m
    eye = jnp.eye(dim, dtype=m_re.dtype)
    full_re = eye.at[dim - sub:, dim - sub:].set(m_re)
    full_im = jnp.zeros((dim, dim), m_re.dtype).at[
        dim - sub:, dim - sub:].set(m_im) if m_im is not None else None
    return full_re, full_im


def _apply_real_elementwise(vec: jnp.ndarray, mat: jnp.ndarray,
                            targets: Sequence[int]) -> jnp.ndarray:
    """Apply a real 2^m x 2^m matrix to a real vector via explicit
    slice-multiply-add — NEVER einsum/dot_general: TPU f64 is emulated and
    its DOTS silently run at ~f32 accuracy (measured 4e-7 norm drift over
    52 RY einsums at n=26), while elementwise f64 keeps double-single
    accuracy. 2^m scalar*slice FMAs per output slice; m is small (<=4)."""
    n = vec.size.bit_length() - 1
    m = len(targets)
    desc = sorted(targets, reverse=True)
    dims = sv._exposed_view_dims(n, desc)
    v = vec.reshape(dims)
    # XOR-flip formulation:  out = sum_d flip_d(v) * C_d  where flip_d
    # reverses the size-2 axes in the bit-mask d (the partner permutation)
    # and C_d[r] = mat[r, r ^ d] broadcast over the target axes. Pure
    # fused elementwise — no slices, stacks or transposes (slice/stack and
    # moveaxis assemblies both blew HBM at n=26: ~17 GiB of materialized
    # temporaries; this form keeps peak at ~2 states).
    ax_of = {q: 2 * i + 1 for i, q in enumerate(desc)}
    rows = np.arange(1 << m)
    # view-axis bit order: position 2i+1 holds qubit desc[i]; r's bit j is
    # targets[j] — permutation from view multi-index to matrix index r
    view_to_r = np.zeros(1 << m, dtype=np.int64)
    for vi in range(1 << m):
        r = 0
        for i in range(m):
            if (vi >> (m - 1 - i)) & 1:  # axis order: desc[0] outermost
                r |= 1 << targets.index(desc[i])
        view_to_r[vi] = r
    cshape = [1] * len(dims)
    for i in range(m):
        cshape[2 * i + 1] = 2
    out = None
    for d in range(1 << m):
        c = mat[rows, rows ^ d]          # XOR-diagonal of the matrix
        c = c[view_to_r].reshape(cshape)  # broadcast over non-target axes
        term = v
        for i in range(m):
            if (d >> targets.index(desc[i])) & 1:
                term = jnp.flip(term, axis=2 * i + 1)
        term = term * c
        out = term if out is None else out + term
    return out.reshape(vec.shape)


def apply_matrix_pair(re: jnp.ndarray, im: jnp.ndarray,
                      m_re: jnp.ndarray, m_im: Optional[jnp.ndarray],
                      targets: Sequence[int]):
    """Dense m-qubit matrix given as (re, im) parts; ``m_im=None`` marks a
    REAL matrix (half the passes — RY/X/H/CNOT territory)."""
    a = _apply_real_elementwise(re, m_re, targets)
    b = _apply_real_elementwise(im, m_re, targets)
    if m_im is None:
        return a, b
    c = _apply_real_elementwise(im, m_im, targets)
    d = _apply_real_elementwise(re, m_im, targets)
    return a - c, b + d


def gate_parts(name: str, params=()):
    """(re, im) parts of a named gate's matrix; ``im`` is None for real
    matrices. Traced params supported (the energy-fn path)."""
    key = name.upper()
    if key in ("CNOT", "CX"):
        key = "X"
    if key in G.FIXED:
        m = np.asarray(G.FIXED[key])
        re = jnp.asarray(m.real, config.real_dtype())
        if np.allclose(m.imag, 0.0):
            return re, None
        return re, jnp.asarray(m.imag, config.real_dtype())
    if key in G.PARAMETERIZED_PARTS:
        return G.PARAMETERIZED_PARTS[key](*params)
    raise ValueError(f"Unknown gate name: {name}")


def apply_op_pair(re: jnp.ndarray, im: jnp.ndarray, op,
                  params_resolved: Sequence = None):
    """Apply one CircuitIR GateOp to the pair state. ``params_resolved``
    overrides ``op.params`` (already-resolved traced values)."""
    pvals = tuple(op.params) if params_resolved is None \
        else tuple(params_resolved)
    if op.matrix is not None:
        if isinstance(op.matrix, np.ndarray):
            # split on HOST — a complex constant embedded in the traced
            # program would reintroduce c128 into the fp64 pipeline
            mh = np.asarray(op.matrix)
            m_re = jnp.asarray(np.real(mh), re.dtype)
            m_im = None if np.allclose(np.imag(mh), 0.0) \
                else jnp.asarray(np.imag(mh), re.dtype)
        else:  # traced matrix (adjoint-grad embeds tracers)
            m = jnp.asarray(op.matrix)
            m_re = jnp.real(m).astype(re.dtype)
            m_im = jnp.imag(m).astype(re.dtype)
    else:
        m_re, m_im = gate_parts(op.name, pvals)
    if op.is_adjoint:
        m_re = m_re.T
        m_im = None if m_im is None else -m_im.T
    tgts = list(op.targets)
    if op.controls:
        m = len(tgts)
        c = len(op.controls)
        m_re, m_im = _controlled_parts(m_re, m_im, m, c)
        tgts = tgts + list(op.controls)
    return apply_matrix_pair(re, im, m_re, m_im, tgts)


def norm2_pair(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(re * re + im * im)


def expval_pauli_product_z_pair(re: jnp.ndarray, im: jnp.ndarray,
                                qubits: Sequence[int]) -> jnp.ndarray:
    """<Z...Z> on the pair state (parity-weighted probabilities)."""
    n = re.size.bit_length() - 1
    desc = sorted(set(int(q) for q in qubits), reverse=True)
    dims = sv._exposed_view_dims(n, desc)
    probs = (re * re + im * im).reshape(dims)
    sign = jnp.asarray([1.0, -1.0], dtype=probs.dtype)
    for i in range(len(desc)):
        shape = [1] * len(dims)
        shape[2 * i + 1] = 2
        probs = probs * sign.reshape(shape)
    return jnp.sum(probs)


_PAULI_PARTS = {
    "X": (np.array([[0.0, 1.0], [1.0, 0.0]]), None),
    "Y": (None, np.array([[0.0, -1.0], [1.0, 0.0]])),
    "Z": (np.array([[1.0, 0.0], [0.0, -1.0]]), None),
}


def expval_pauli_string_pair(re: jnp.ndarray, im: jnp.ndarray,
                             ops: Sequence[tuple]) -> jnp.ndarray:
    """<psi| P |psi> for a Pauli string [(char, qubit), ...]: apply P to a
    copy, then Re<psi|phi> = sum(re*phi_re + im*phi_im)."""
    zs = [q for ch, q in ops if ch == "Z"]
    if all(ch in ("I", "Z") for ch, _ in ops):
        return expval_pauli_product_z_pair(re, im, zs) if zs \
            else norm2_pair(re, im)
    pre, pim = re, im
    dt = re.dtype
    for ch, q in ops:
        if ch == "I":
            continue
        mr, mi = _PAULI_PARTS[ch]
        mr = None if mr is None else jnp.asarray(mr, dt)
        mi = None if mi is None else jnp.asarray(mi, dt)
        if mr is None:
            # purely imaginary matrix (Y): (re+i im)(i Mi) -> parts swap
            a = _apply_real_elementwise(pim, mi, [q])
            b = _apply_real_elementwise(pre, mi, [q])
            pre, pim = -a, b
        else:
            pre, pim = apply_matrix_pair(pre, pim, mr, mi, [q])
    return jnp.sum(re * pre + im * pim)


def expval_terms_pair(re: jnp.ndarray, im: jnp.ndarray, terms, coeffs):
    """Sum_k coeffs[k] * <P_k> for PauliOperator-style terms
    [((char, qubit), ...), ...]."""
    total = jnp.zeros((), re.dtype)
    for term, c in zip(terms, coeffs):
        if len(term) == 0:
            ev = norm2_pair(re, im)  # identity term
        else:
            ev = expval_pauli_string_pair(re, im, term)
        total = total + jnp.asarray(c, re.dtype) * ev
    return total
