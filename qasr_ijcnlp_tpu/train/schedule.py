"""Learning-rate schedules matching the reference's optimizers.

* warmup + cosine: the per-step LambdaLR of the classical trainer
  (/root/reference/train_classical_whisper_asr.py:433-452) — linear warmup to
  ``peak`` then cosine decay to ``min_ratio * peak``.
* cosine-per-epoch: CosineAnnealingLR used by the quantum trainers
  (/root/reference/train_quantum_whisper_asr.py:149-151).

Expressed as optax schedules (step -> lr), fully jittable.
"""

from __future__ import annotations

import optax


def warmup_cosine(
    peak_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_ratio: float = 0.1,
) -> optax.Schedule:
    if warmup_steps <= 0:
        # No warmup requested: start at peak immediately instead of a
        # one-step zero-LR prefix (linear_schedule(0, peak, 1) yields 0.0
        # at step 0, wasting the first batch).
        return optax.cosine_decay_schedule(
            peak_lr, max(total_steps, 1), alpha=min_ratio
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1)),
            optax.cosine_decay_schedule(
                peak_lr, max(total_steps - warmup_steps, 1), alpha=min_ratio
            ),
        ],
        [max(warmup_steps, 1)],
    )


def cosine(peak_lr: float, total_steps: int, min_lr: float = 0.0) -> optax.Schedule:
    alpha = min_lr / peak_lr if peak_lr > 0 else 0.0
    return optax.cosine_decay_schedule(peak_lr, max(total_steps, 1), alpha=alpha)
