"""Quantum-conv speedup benchmark: closed-form batched sim vs per-call loop.

The BASELINE.json north star requires the quantum-conv encoder forward to be
>=50x faster than PennyLane ``default.qubit`` on CPU.  PennyLane is not
installed in this container, so the baseline is tests/quantum_oracle.py - a
faithful gate-by-gate default.qubit-semantics statevector simulator driven
one circuit evaluation per (batch x position) in a Python loop, exactly like
the reference's hot loops (/root/reference/quantum_whisper.py:107-122).

Usage: python scripts/bench_quantum.py [--n_qubits 4] [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_qubits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--positions", type=int, default=4500,
                    help="conv output positions per sample (3000 + 1500)")
    ap.add_argument("--oracle_positions", type=int, default=200,
                    help="positions actually run through the slow oracle")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.ops.qsim import quantum_expvals
    from tests.quantum_oracle import simulate_circuit

    nq = args.n_qubits
    rng = np.random.default_rng(0)
    weights = rng.standard_normal((nq, 3)).astype(np.float32)
    inputs = rng.standard_normal(
        (args.batch, args.positions, nq)
    ).astype(np.float32)

    # --- closed-form batched (ours) ---
    fn = jax.jit(lambda x, w: quantum_expvals(x, w, nq))
    fn(jnp.asarray(inputs), jnp.asarray(weights)).block_until_ready()  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        fn(jnp.asarray(inputs), jnp.asarray(weights)).block_until_ready()
    ours = (time.perf_counter() - t0) / reps

    # --- per-call oracle loop (reference pattern) on a subset, extrapolated ---
    sub = inputs[0, : args.oracle_positions]
    t0 = time.perf_counter()
    for row in sub:
        simulate_circuit(row, weights, nq)
    oracle_sub = time.perf_counter() - t0
    oracle = oracle_sub * (args.batch * args.positions / args.oracle_positions)

    total = args.batch * args.positions
    print(f"circuits per encoder forward: {total} ({args.batch} x {args.positions})")
    print(f"closed-form batched: {ours * 1e3:8.2f} ms "
          f"({total / ours:,.0f} circuits/s)")
    print(f"per-call loop est.:  {oracle * 1e3:8.2f} ms "
          f"({total / oracle:,.0f} circuits/s, measured on "
          f"{args.oracle_positions} circuits)")
    print(f"speedup: {oracle / ours:,.1f}x  (target >= 50x)")


if __name__ == "__main__":
    main()
