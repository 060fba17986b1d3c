"""Naive gate-by-gate statevector simulator - the test oracle.

Replicates PennyLane ``default.qubit`` semantics for the exact circuit used
by the reference QuantumConv1d (quantum_whisper.py:64-85): amplitude
embedding with normalization, per-wire Rot, CNOT chain, PauliZ expvals.
Implemented as sequential per-gate tensor contractions over a (2,)*n state -
a deliberately different algorithm from the production closed-form unitary,
so agreement is meaningful.  Also serves as the "reference simulator" speed
baseline for the >=50x benchmark.
"""

import numpy as np


def rot_matrix(phi, theta, omega):
    rz1 = np.diag([np.exp(-0.5j * phi), np.exp(0.5j * phi)])
    ry = np.array(
        [
            [np.cos(theta / 2), -np.sin(theta / 2)],
            [np.sin(theta / 2), np.cos(theta / 2)],
        ]
    )
    rz2 = np.diag([np.exp(-0.5j * omega), np.exp(0.5j * omega)])
    return rz2 @ ry @ rz1


def apply_1q(state, gate, wire, n):
    state = state.reshape((2,) * n)
    state = np.moveaxis(state, wire, 0)
    state = np.tensordot(gate, state, axes=([1], [0]))
    state = np.moveaxis(state, 0, wire)
    return state.reshape(-1)


def apply_cnot(state, ctrl, tgt, n):
    state = state.reshape((2,) * n)
    state = np.moveaxis(state, (ctrl, tgt), (0, 1))
    state = state.copy()
    state[1] = state[1][::-1]  # flip target where control = 1
    state = np.moveaxis(state, (0, 1), (ctrl, tgt))
    return state.reshape(-1)


def simulate_circuit(inputs, weights, n_qubits):
    """One circuit evaluation: inputs (m,) real, weights (n, 3).

    Returns <Z_i> for each wire, shape (n_qubits,).
    """
    dim = 1 << n_qubits
    padded = np.zeros(dim, np.complex128)
    padded[: len(inputs)] = inputs[:dim]
    norm = np.linalg.norm(padded)
    if norm == 0:
        norm = 1e-12
    state = padded / norm

    for i in range(n_qubits):
        state = apply_1q(state, rot_matrix(*weights[i]), i, n_qubits)
    for i in range(n_qubits - 1):
        state = apply_cnot(state, i, i + 1, n_qubits)

    probs = np.abs(state) ** 2
    expvals = np.empty(n_qubits)
    for i in range(n_qubits):
        z = 1.0 - 2.0 * ((np.arange(dim) >> (n_qubits - 1 - i)) & 1)
        expvals[i] = np.sum(z * probs)
    return expvals


def quantum_conv1d_reference(x, pre_w, pre_b, post_w, post_b, qweights,
                             kernel_size, stride, padding, n_qubits):
    """Loop-based QuantumConv1d forward mirroring the reference
    (quantum_whisper.py:95-128): per-position, per-batch circuit evals.

    x: (B, C_in, L) -> (B, C_out, L_out).  pre_w: (C_in*k, nq) [our (in,out)
    layout], post_w: (nq, C_out).
    """
    B, C, L = x.shape
    if padding > 0:
        x = np.pad(x, ((0, 0), (0, 0), (padding, padding)))
    L_out = (L + 2 * padding - kernel_size) // stride + 1
    out = np.zeros((B, post_w.shape[1], L_out), np.float32)
    for i in range(L_out):
        window = x[:, :, i * stride : i * stride + kernel_size]
        flat = window.reshape(B, -1)
        pre = flat @ pre_w + pre_b
        q = np.stack(
            [simulate_circuit(pre[j], qweights, n_qubits) for j in range(B)]
        ).astype(np.float32)
        out[:, :, i] = q @ post_w + post_b
    return out
