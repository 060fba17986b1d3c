"""Closed-form batched statevector simulation of the QuantumConv1d circuit.

The reference evaluates a PennyLane ``default.qubit`` qnode once per (batch
element x output position) in nested Python loops
(/root/reference/quantum_whisper.py:107-122) - O(B * 4500) Python-driven
statevector simulations per encoder forward.  The circuit, however, is fixed:

    AmplitudeEmbedding(pad(x), normalize=True)
    Rot(phi_i, theta_i, omega_i) on each wire i
    CNOT(i, i+1) chain
    expval(PauliZ(i)) for each wire

so the entire circuit collapses to *one* precomposed unitary ``U`` (built
from the 3n rotation angles; the CNOT chain is a basis permutation) and the
expectations become two MXU matmuls over the whole batch:

    psi    = x_padded / ||x||          (real, only first n_q entries nonzero)
    phi    = U[:, :n_q] @ psi          (complex (2^n x n_q) slice - the rest
                                        of U multiplies zeros)
    <Z_i>  = sum_b z_i(b) |phi_b|^2  = (phi_r^2 + phi_i^2) @ Zdiag

This file implements that closed form with real/imag matrices kept separate
(complex-free MXU arithmetic) and full autodiff through both the angles and
the embedding normalization.  Parity vs a gate-by-gate simulator is tested to
~1e-6 in tests/test_quantum.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def cnot_chain_permutation(n_qubits: int) -> np.ndarray:
    """sigma with U = R[sigma] for the circuit-ordered CNOT(0,1)..CNOT(n-2,n-1).

    Basis convention matches PennyLane: wire 0 is the most significant bit of
    the computational-basis index.  Returns the *inverse* map f^-1 as an index
    array, where f(b) applies the chain's controlled flips to basis state b.
    """
    dim = 1 << n_qubits
    f = np.arange(dim)
    for i in range(n_qubits - 1):
        ctrl_bit = n_qubits - 1 - i  # wire i, MSB-first
        tgt_bit = n_qubits - 2 - i  # wire i+1
        ctrl_set = (f >> ctrl_bit) & 1
        f = np.where(ctrl_set == 1, f ^ (1 << tgt_bit), f)
    # f[b] is where basis state b ends up; C matrix has C[f(b), b] = 1, so
    # (C R)[f(b), :] = R[b, :]  =>  U = R[argsort(f)].
    return np.argsort(f)


@functools.lru_cache(maxsize=None)
def pauli_z_diagonal(n_qubits: int) -> np.ndarray:
    """(2^n, n) matrix of z_i(b) = +/-1 so that expvals = probs @ Z."""
    dim = 1 << n_qubits
    b = np.arange(dim)
    z = np.empty((dim, n_qubits), np.float32)
    for i in range(n_qubits):
        bit = (b >> (n_qubits - 1 - i)) & 1  # wire i is MSB-first
        z[:, i] = 1.0 - 2.0 * bit
    return z


def rot_matrices(weights: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-wire Rot(phi, theta, omega) = RZ(omega) RY(theta) RZ(phi).

    weights: (n, 3) angles.  Returns real and imaginary parts, each (n, 2, 2).
    """
    phi, theta, omega = weights[:, 0], weights[:, 1], weights[:, 2]
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    # Rot = [[e^{-i(phi+omega)/2} c, -e^{ i(phi-omega)/2} s],
    #        [e^{-i(phi-omega)/2} s,  e^{ i(phi+omega)/2} c]]
    a = (phi + omega) / 2
    d = (phi - omega) / 2
    re = jnp.stack(
        [
            jnp.stack([jnp.cos(a) * c, -jnp.cos(d) * s], axis=-1),
            jnp.stack([jnp.cos(d) * s, jnp.cos(a) * c], axis=-1),
        ],
        axis=-2,
    )
    im = jnp.stack(
        [
            jnp.stack([-jnp.sin(a) * c, -jnp.sin(d) * s], axis=-1),
            jnp.stack([-jnp.sin(d) * s, jnp.sin(a) * c], axis=-1),
        ],
        axis=-2,
    )
    return re, im


def circuit_unitary(weights: jnp.ndarray, n_qubits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompose the full circuit unitary U = CNOT-chain . (kron_i Rot_i).

    Returns (U_re, U_im), each (2^n, 2^n).  Differentiable in ``weights``.
    """
    re, im = rot_matrices(weights)

    u_re, u_im = re[0], im[0]
    for i in range(1, n_qubits):
        # complex kron via real arithmetic
        u_re, u_im = (
            jnp.kron(u_re, re[i]) - jnp.kron(u_im, im[i]),
            jnp.kron(u_re, im[i]) + jnp.kron(u_im, re[i]),
        )
    sigma = cnot_chain_permutation(n_qubits)
    return u_re[sigma], u_im[sigma]


def quantum_expvals(
    inputs: jnp.ndarray, weights: jnp.ndarray, n_qubits: int, eps: float = 1e-12
) -> jnp.ndarray:
    """<Z_i> for a batch of circuit inputs.

    inputs: (..., m) real with m <= 2^n (zero-padded amplitude embedding, as
    in the reference where m == n_qubits); weights: (n_qubits, 3).
    Returns (..., n_qubits) float32.

    The reference would raise on an all-zero window (PennyLane refuses to
    normalize a zero vector); we guard the squared norm with ``eps**2``
    INSIDE the sqrt so a silent window yields all-zero expvals with finite
    gradients.  (Clamping after the sqrt would not help: sqrt's VJP at 0 is
    already NaN, upstream of any maximum.)
    """
    m = inputs.shape[-1]
    dim = 1 << n_qubits
    assert m <= dim, f"amplitude input length {m} exceeds 2^{n_qubits}"

    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(inputs * inputs, axis=-1, keepdims=True), eps * eps)
    )
    psi = inputs / norm  # (..., m)

    u_re, u_im = circuit_unitary(weights, n_qubits)  # (dim, dim)
    # Only the first m columns of U touch nonzero amplitudes.
    phi_re = psi @ u_re[:, :m].T  # (..., dim)
    phi_im = psi @ u_im[:, :m].T
    probs = phi_re * phi_re + phi_im * phi_im
    z = jnp.asarray(pauli_z_diagonal(n_qubits))
    return (probs @ z).astype(jnp.float32)
