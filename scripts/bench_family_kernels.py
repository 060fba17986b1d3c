"""On-chip A/B of the r3 kernel-family extensions.

For each requested family member, times the full encoder at a practical
batch with (a) kernels ON (fused block where applicable + fused/chunked
stem) and (b) the flash-attention-only path (r2's fallback for large), and
(c) for small/medium/large the XLA stem vs chunked-stem delta.

Usage: python scripts/bench_family_kernels.py [small|medium|large|all] [B]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qasr_ijcnlp_tpu.cli import enable_compilation_cache


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def timed(fn, reps=3, inner=3):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = [fn() for _ in range(inner)]
        sync(out[-1])
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


FAMS = {
    # name -> (D, heads, layers, default batch)
    "small": (768, 12, 12, 32),
    "medium": (1024, 16, 24, 16),
    "large": (1280, 20, 32, 8),
}


def bench_member(name, B):
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions
    from qasr_ijcnlp_tpu.ops import conv_stem, encoder_block

    D, H, L, _ = FAMS[name]
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=D, n_audio_head=H,
        n_audio_layer=L, n_vocab=51865, n_text_ctx=448, n_text_state=D,
        n_text_head=H, n_text_layer=L,
    )
    params = model.init_params(jax.random.PRNGKey(0), dims)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 80, 3000)), jnp.float32
    )
    print(f"--- {name}: D={D} H={H} L={L} B={B}")
    print("fused block applicable:",
          encoder_block.fused_block_applicable(H, D, 1536),
          " stem applicable:",
          conv_stem.stem_applicable(80, 3000, 1500, 1536, D))

    results = {}
    for label, flash in (("kernels-on", True), ("kernels-off-xla", None)):
        if flash is None and B > 4:
            continue  # XLA self-attention at 1500 frames OOMs at batch
        model.set_flash_attention(flash if flash is not None else False)
        enc = jax.jit(
            lambda p, x: model.encoder_apply(p, x, dims, jnp.bfloat16)
        )
        try:
            t = timed(lambda: enc(params["encoder"], mel))
            results[label] = t
            print(f"  {label}: {t * 1e3:.1f} ms/call "
                  f"({B * 30.0 / t:.0f} audio-s/s)")
        except Exception as e:
            print(f"  {label}: FAIL {type(e).__name__} {str(e)[:160]}")
        enc.clear_cache()
    model.set_flash_attention(None)

    # flash-only comparison: disable the fused block via its gate by
    # timing the packed-flash trunk directly (r2's path for this member)
    from qasr_ijcnlp_tpu.ops import encoder_block as eb

    real_gate = eb.fused_block_applicable
    eb.fused_block_applicable = lambda *a, **k: False
    try:
        model.set_flash_attention(True)
        enc = jax.jit(
            lambda p, x: model.encoder_apply(p, x, dims, jnp.bfloat16)
        )
        t = timed(lambda: enc(params["encoder"], mel))
        results["flash-only"] = t
        print(f"  flash-only (r2 path): {t * 1e3:.1f} ms/call")
        enc.clear_cache()
    except Exception as e:
        print(f"  flash-only: FAIL {type(e).__name__} {str(e)[:160]}")
    finally:
        eb.fused_block_applicable = real_gate
        model.set_flash_attention(None)

    if "kernels-on" in results and "flash-only" in results:
        print(f"  fused-vs-flash speedup: "
              f"{results['flash-only'] / results['kernels-on']:.2f}x")
    return results


def main():
    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "large"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    print("backend:", jax.default_backend())
    names = list(FAMS) if which == "all" else [which]
    for name in names:
        bench_member(name, B or FAMS[name][3])


if __name__ == "__main__":
    main()
