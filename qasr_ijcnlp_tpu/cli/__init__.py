"""Reference-compatible CLI entry points.

One module per reference script, same flags
(SURVEY.md §1 L4); run as ``python -m qasr_ijcnlp_tpu.cli.<name>``.  Thin
same-named wrappers at the repo root keep drop-in compatibility with the
reference invocation style.
"""

from __future__ import annotations


def enable_compilation_cache() -> None:
    """Persist XLA binaries across processes (first TPU compile through the
    tunnel takes minutes; cached reloads take seconds).

    TPU-only: XLA:CPU persists AOT machine code whose target features may
    not match a later host (observed loading +prefer-no-scatter binaries ->
    replica divergence and collective rendezvous deadlocks).
    """
    import os

    import jax

    if jax.default_backend() != "tpu":
        return
    cache_dir = os.environ.get(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "qasr_xla_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob


def resolve_device(spec: str = "auto") -> str:
    """Map the reference's --device auto/cpu/cuda to a JAX platform.

    The platform override MUST be applied before the first backend query -
    ``jax.default_backend()`` initializes the platform stack and later
    ``jax_platforms`` updates are ignored.
    """
    import jax

    if spec == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    enable_compilation_cache()
    return jax.default_backend()


def load_model_with_fallback(name: str, compute_dtype: str = "float32"):
    """Official checkpoint if downloadable/cached, else random init with a
    loud warning (the reference's 3-tier loader, quantum_whisper.py:182-204)."""
    from ..models.registry import load_model

    model = load_model(name, compute_dtype=compute_dtype, init_if_missing=True)
    if "random-init" in model.name:
        print(
            f"WARNING: could not fetch official '{name}' weights "
            "(offline?); using random initialization - metrics will be "
            "meaningless, but the pipeline is exercised end-to-end."
        )
    return model
