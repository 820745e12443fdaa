"""Gate matrix library.

TPU-native analog of the reference's name->matrix tables
(reference: rocquantum/src/simulator.cpp:28-48, GateFusion.cpp:40-83,
hipStateVec.cpp named-gate entry points). Parameterized gates are functions of
a (possibly traced) angle so circuits JIT with dynamic parameters.

Matrix convention for multi-target gates: for ``targets=[t0, t1, ...]`` the
matrix row/column index has ``t0`` as the least-significant bit, matching the
reference's generic-matrix kernel convention
(multi_qubit_kernels.hip:37-115, targets[0] -> LSB of the gathered index).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config

_SQRT1_2 = 1.0 / np.sqrt(2.0)


# ---------------------------------------------------------------------------
# Fixed (non-parameterized) gates, as numpy arrays (cast at use site).
# ---------------------------------------------------------------------------

I = np.eye(2, dtype=np.complex128)
X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
Z = np.array([[1, 0], [0, -1]], dtype=np.complex128)
H = np.array([[_SQRT1_2, _SQRT1_2], [_SQRT1_2, -_SQRT1_2]], dtype=np.complex128)
S = np.array([[1, 0], [0, 1j]], dtype=np.complex128)
SDG = np.array([[1, 0], [0, -1j]], dtype=np.complex128)
T = np.array([[1, 0], [0, np.exp(1j * np.pi / 4)]], dtype=np.complex128)
TDG = np.array([[1, 0], [0, np.exp(-1j * np.pi / 4)]], dtype=np.complex128)

# Two-qubit gates; targets=[t0, t1], t0 = LSB of the 2-bit index.
# CNOT convention: targets=[target, control] i.e. index bit0=target, bit1=control.
# We instead always expand controlled gates via the control mechanism, but a
# dense CNOT/CZ/SWAP matrix is useful for fusion and tensor-network nodes.
SWAP = np.array(
    [[1, 0, 0, 0],
     [0, 0, 1, 0],
     [0, 1, 0, 0],
     [0, 0, 0, 1]], dtype=np.complex128)

PAULI = {"I": I, "X": X, "Y": Y, "Z": Z}


# ---------------------------------------------------------------------------
# Parameterized gates. Return jnp arrays; `theta` may be a tracer.
# ---------------------------------------------------------------------------

def rx(theta):
    theta = jnp.asarray(theta, dtype=config.real_dtype())
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    return jnp.stack(
        [jnp.stack([c, -1j * s]), jnp.stack([-1j * s, c])]
    ).astype(config.complex_dtype())


def ry(theta):
    theta = jnp.asarray(theta, dtype=config.real_dtype())
    c = jnp.cos(theta / 2).astype(config.complex_dtype())
    s = jnp.sin(theta / 2).astype(config.complex_dtype())
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def rz(theta):
    theta = jnp.asarray(theta, dtype=config.real_dtype())
    em = jnp.exp(-0.5j * theta).astype(config.complex_dtype())
    ep = jnp.exp(0.5j * theta).astype(config.complex_dtype())
    zero = jnp.zeros((), config.complex_dtype())
    return jnp.stack([jnp.stack([em, zero]), jnp.stack([zero, ep])])


def phase(lam):
    lam = jnp.asarray(lam, dtype=config.real_dtype())
    one = jnp.ones((), config.complex_dtype())
    zero = jnp.zeros((), config.complex_dtype())
    return jnp.stack([jnp.stack([one, zero]),
                      jnp.stack([zero, jnp.exp(1j * lam).astype(config.complex_dtype())])])


def rzz(theta):
    """exp(-i theta/2 Z@Z): the native two-qubit diagonal entangler (QAOA's
    cost-layer term without the CNOT sandwich). targets[0] is the matrix
    LSB; the diagonal is [e^-, e^+, e^+, e^-] over (b1, b0)."""
    theta = jnp.asarray(theta, dtype=config.real_dtype())
    em = jnp.exp(-0.5j * theta).astype(config.complex_dtype())
    ep = jnp.exp(0.5j * theta).astype(config.complex_dtype())
    return jnp.diag(jnp.stack([em, ep, ep, em]))


def u3(theta, phi, lam):
    theta = jnp.asarray(theta, dtype=config.real_dtype())
    c = jnp.cos(theta / 2).astype(config.complex_dtype())
    s = jnp.sin(theta / 2).astype(config.complex_dtype())
    ephi = jnp.exp(1j * jnp.asarray(phi)).astype(config.complex_dtype())
    elam = jnp.exp(1j * jnp.asarray(lam)).astype(config.complex_dtype())
    return jnp.stack([jnp.stack([c, -elam * s]),
                      jnp.stack([ephi * s, ephi * elam * c])])


# Registry: name -> (num_targets, num_params, builder). Controlled named gates
# (CNOT, CZ, CRX, ...) are expressed as {controls} + base gate at circuit level.
FIXED = {
    "I": I, "X": X, "Y": Y, "Z": Z, "H": H, "S": S, "SDG": SDG,
    "T": T, "TDG": TDG, "SWAP": SWAP,
}

PARAMETERIZED = {
    "RX": rx, "RY": ry, "RZ": rz, "P": phase, "PHASE": phase, "U3": u3,
    "RZZ": rzz,
}


def gate_matrix(name: str, params=()) -> jnp.ndarray:
    """Look up / build the unitary for a named gate (uncontrolled part)."""
    key = name.upper()
    if key in FIXED:
        return jnp.asarray(FIXED[key], dtype=config.complex_dtype())
    if key in PARAMETERIZED:
        return PARAMETERIZED[key](*params)
    raise ValueError(f"Unknown gate name: {name}")


def is_parameterized(name: str) -> bool:
    return name.upper() in PARAMETERIZED
