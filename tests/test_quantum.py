"""Quantum layer parity vs a gate-by-gate simulator, autodiff checks, and
the closed-form-vs-naive speed ratio."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_ijcnlp_tpu.ops import qsim
from . import quantum_oracle as oracle


@pytest.mark.parametrize("n_qubits", [2, 3, 4, 6])
def test_expvals_match_naive_simulator(rng, n_qubits):
    weights = rng.standard_normal((n_qubits, 3))
    inputs = rng.standard_normal((5, n_qubits))  # reference feeds nq values
    ours = np.asarray(qsim.quantum_expvals(jnp.asarray(inputs), jnp.asarray(weights), n_qubits))
    for j in range(5):
        ref = oracle.simulate_circuit(inputs[j], weights, n_qubits)
        np.testing.assert_allclose(ours[j], ref, atol=1e-6)


def test_expvals_with_full_amplitude_input(rng):
    # inputs longer than n_qubits (up to 2^n) exercise the general embedding.
    n_qubits = 3
    weights = rng.standard_normal((n_qubits, 3))
    inputs = rng.standard_normal((4, 8))
    ours = np.asarray(qsim.quantum_expvals(jnp.asarray(inputs), jnp.asarray(weights), n_qubits))
    for j in range(4):
        ref = oracle.simulate_circuit(inputs[j], weights, n_qubits)
        np.testing.assert_allclose(ours[j], ref, atol=1e-6)


def test_unitary_is_unitary(rng):
    n = 4
    w = jnp.asarray(rng.standard_normal((n, 3)))
    ur, ui = qsim.circuit_unitary(w, n)
    u = np.asarray(ur) + 1j * np.asarray(ui)
    np.testing.assert_allclose(u @ u.conj().T, np.eye(1 << n), atol=1e-6)


def test_gradients_match_finite_differences(rng):
    n_qubits = 3
    weights = rng.standard_normal((n_qubits, 3))
    inputs = rng.standard_normal((n_qubits,))

    def loss_jax(w):
        return jnp.sum(
            qsim.quantum_expvals(jnp.asarray(inputs)[None], w, n_qubits) ** 2
        )

    g = np.asarray(jax.grad(loss_jax)(jnp.asarray(weights)))

    def loss_np(w):
        return float(np.sum(oracle.simulate_circuit(inputs, w, n_qubits) ** 2))

    eps = 1e-5
    for i in range(n_qubits):
        for j in range(3):
            wp = weights.copy()
            wp[i, j] += eps
            wm = weights.copy()
            wm[i, j] -= eps
            fd = (loss_np(wp) - loss_np(wm)) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, atol=1e-4)


def test_input_gradients_flow_through_normalization(rng):
    # The amplitude-embedding normalization has a nontrivial input gradient
    # that the reference propagates (SURVEY.md hard-parts); verify non-zero
    # and finite-difference correct.
    n_qubits = 2
    weights = rng.standard_normal((n_qubits, 3))
    inputs = rng.standard_normal((n_qubits,)) + 2.0

    def f(x):
        return jnp.sum(qsim.quantum_expvals(x[None], jnp.asarray(weights), n_qubits))

    g = np.asarray(jax.grad(f)(jnp.asarray(inputs)))
    eps = 1e-5
    for i in range(n_qubits):
        xp = inputs.copy()
        xp[i] += eps
        xm = inputs.copy()
        xm[i] -= eps
        fd = (
            float(np.sum(oracle.simulate_circuit(xp, weights, n_qubits)))
            - float(np.sum(oracle.simulate_circuit(xm, weights, n_qubits)))
        ) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, atol=1e-4)


def test_quantum_conv1d_matches_loop_reference(rng):
    from qasr_ijcnlp_tpu.models import quantum as qm

    key = jax.random.PRNGKey(3)
    p = qm.init_quantum_conv(key, 8, 16, 3, n_qubits=4)
    x = rng.standard_normal((2, 8, 20)).astype(np.float32)
    ours = np.asarray(qm.quantum_conv1d(p, jnp.asarray(x), 3, 2, 1))
    ref = oracle.quantum_conv1d_reference(
        x,
        np.asarray(p["pre_w"]),
        np.asarray(p["pre_b"]),
        np.asarray(p["post_w"]),
        np.asarray(p["post_b"]),
        np.asarray(p["qweights"]),
        kernel_size=3,
        stride=2,
        padding=1,
        n_qubits=4,
    )
    assert ours.shape == ref.shape == (2, 16, 10)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_qubit_clamping(rng):
    from qasr_ijcnlp_tpu.models import quantum as qm

    # n_qubits capped at in_channels * kernel_size (reference :55).
    assert qm.quantum_conv_spec(1, 2, 8) == 2
    p = qm.init_quantum_conv(jax.random.PRNGKey(0), 1, 4, 2, n_qubits=8)
    assert p["qweights"].shape == (2, 3)


def test_trainable_mask_and_param_budget():
    from qasr_ijcnlp_tpu.models import quantum as qm
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=50, n_audio_state=384, n_audio_head=6,
        n_audio_layer=1, n_vocab=1000, n_text_ctx=24, n_text_state=384,
        n_text_head=6, n_text_layer=1,
    )
    params = qm.init_quantum_params(jax.random.PRNGKey(0), dims, n_qubits=4)
    mask = qm.trainable_mask(params)
    trainable = sum(
        int(np.prod(p.shape))
        for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
        if m
    )
    # pre(240*4+4) + post(4*384+384) + q(12)  +  pre(1152*4+4) + post(4*384+384) + q(12)
    expected = (240 * 4 + 4 + 4 * 384 + 384 + 12) + (1152 * 4 + 4 + 4 * 384 + 384 + 12)
    assert trainable == expected
    # ~9.4k trainable params, matching the reference budget.
    assert 9000 < trainable < 10000


def test_quantum_encoder_runs(rng):
    from qasr_ijcnlp_tpu.models import quantum as qm
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=100, n_text_ctx=8, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    params = qm.init_quantum_params(jax.random.PRNGKey(0), dims, n_qubits=4)
    mel = rng.standard_normal((2, 80, 20)).astype(np.float32)
    out = qm.quantum_encoder_apply(params["encoder"], jnp.asarray(mel), dims)
    assert out.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_closed_form_speedup_vs_naive():
    """The closed-form batch sim must beat the per-sample loop by a wide
    margin even on CPU (the >=50x BASELINE target is measured in bench.py
    on real hardware; here we sanity-check >=10x on a small workload)."""
    import time

    from qasr_ijcnlp_tpu.models import quantum as qm

    key = jax.random.PRNGKey(5)
    p = qm.init_quantum_conv(key, 8, 16, 3, n_qubits=4)
    x = np.random.default_rng(0).standard_normal((4, 8, 64)).astype(np.float32)

    fast = jax.jit(lambda p, x: qm.quantum_conv1d(p, x, 3, 1, 1))
    fast(p, jnp.asarray(x)).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        fast(p, jnp.asarray(x)).block_until_ready()
    fast_t = (time.perf_counter() - t0) / 5

    args = (
        x, np.asarray(p["pre_w"]), np.asarray(p["pre_b"]),
        np.asarray(p["post_w"]), np.asarray(p["post_b"]),
        np.asarray(p["qweights"]),
    )
    t0 = time.perf_counter()
    oracle.quantum_conv1d_reference(*args, kernel_size=3, stride=1, padding=1, n_qubits=4)
    naive_t = time.perf_counter() - t0

    assert naive_t / fast_t > 10, f"speedup only {naive_t / fast_t:.1f}x"


# ---------------------------------------------------------------------------
# Analytic golden vectors (hand-derived; independent of BOTH implementations)
# ---------------------------------------------------------------------------
#
# tests above pin qsim against the repo's own gate-by-gate oracle, which
# deliberately uses a different algorithm but SHARES the wire/Rot/CNOT
# conventions — a convention error common to both would be invisible
# (VERDICT r2 item 6).  The cases below are derived by hand on paper, so
# they anchor the conventions themselves:
#
# * RY-only chain, |0...0> input.  After per-wire RY(theta_i) the state is
#   a product of (cos(t_i/2)|0> + sin(t_i/2)|1>).  Writing the CNOT chain
#   as the basis relabeling w_{i+1} ^= w_i applied in order, the final
#   probability of basis word (w_0..w_{n-1}) is
#   prod_i [cos^2 or sin^2](t_i/2) of the PRE-chain bit, and telescoping
#   the signs gives        <Z_i> = prod_{j<=i} cos(theta_j).
# * Bell case: theta = (pi/2, 0), |00> input -> (|00>+|11>)/sqrt(2):
#   <Z> = (0, 0).  A reversed CNOT direction would give (0, 1); an
#   LSB-first wire order gives (1, 0) — either error is caught.
# * Phase case: wire0 identity; wire1 Rot(pi/2, pi/2, 0) applied to the
#   normalized [1, 1] embedding ((|00>+|01>)/sqrt(2)).  Rot = RZ(omega=0)
#   RY(theta) RZ(phi), so the wire-1 amplitudes become
#   a0 = (e^{-i pi/4} - e^{i pi/4})/2 = -i/sqrt(2),
#   a1 = (e^{-i pi/4} + e^{i pi/4})/2 =  1/sqrt(2)   =>  <Z1> = 0.
#   Swapping phi/omega order instead collapses a0 to 0 => <Z1> = -1,
#   so the Rot convention is pinned too.


def test_qsim_analytic_golden_ry_chain():
    weights = jnp.asarray(
        [[0.0, np.pi / 3, 0.0], [0.0, np.pi / 4, 0.0], [0.0, np.pi / 6, 0.0]]
    )
    got = np.asarray(
        qsim.quantum_expvals(jnp.asarray([[1.0, 0.0, 0.0]]), weights, 3)
    )[0]
    expected = [
        0.5,                      # cos(pi/3)
        np.sqrt(2.0) / 4.0,       # cos(pi/3) cos(pi/4)
        np.sqrt(6.0) / 8.0,       # cos(pi/3) cos(pi/4) cos(pi/6)
    ]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_qsim_analytic_golden_bell():
    weights = jnp.asarray([[0.0, np.pi / 2, 0.0], [0.0, 0.0, 0.0]])
    got = np.asarray(
        qsim.quantum_expvals(jnp.asarray([[1.0, 0.0]]), weights, 2)
    )[0]
    np.testing.assert_allclose(got, [0.0, 0.0], atol=1e-6)


def test_qsim_analytic_golden_phases():
    weights = jnp.asarray([[0.0, 0.0, 0.0], [np.pi / 2, np.pi / 2, 0.0]])
    got = np.asarray(
        qsim.quantum_expvals(jnp.asarray([[1.0, 1.0]]), weights, 2)
    )[0]
    np.testing.assert_allclose(got, [1.0, 0.0], atol=1e-6)


def test_zero_input_window_finite_gradients():
    """An exactly-zero window (silent audio) must produce finite expvals AND
    finite gradients: sqrt's VJP at 0 is NaN, so the norm guard has to clamp
    INSIDE the sqrt (regression for the eps-after-sqrt bug)."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)), jnp.float32)
    x = jnp.zeros((2, 3), jnp.float32)

    out = qsim.quantum_expvals(x, w, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(x, w):
        return jnp.sum(qsim.quantum_expvals(x, w, 3) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert np.all(np.isfinite(np.asarray(gw)))
