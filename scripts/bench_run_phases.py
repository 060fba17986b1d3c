"""Host-side phase timing inside DecodingTask.run() at B=64 on the chip."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.decode import DecodingOptions, DecodingTask, _audio_features
    from qasr_ijcnlp_tpu.decode import loop as dloop
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    print("backend:", jax.default_backend())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="bench")
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    B = 64
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
    )
    task = DecodingTask(m, opts)
    task.run(mel)  # warm

    for rep in range(3):
        t0 = time.perf_counter()
        xa = _audio_features(m, mel, True)
        t1 = time.perf_counter()
        init = np.tile(np.asarray(task.initial_tokens, np.int32), (B, 1))
        key = jax.random.PRNGKey(1)
        out = dloop.greedy_decode(m.params, task.loop_cfg, xa,
                                  jnp.asarray(init), key, 0.0)
        t2 = time.perf_counter()
        buf = np.asarray(out[0])
        lp = np.asarray(out[2])
        ns = np.asarray(out[3])
        t3 = time.perf_counter()
        texts = []
        eot = tok.eot
        for b in range(B):
            seq = list(buf[b][task.sample_begin:])
            if eot in seq:
                seq = seq[: seq.index(eot)]
            texts.append(tok.decode(seq))
        t4 = time.perf_counter()
        print(f"rep{rep}: encode_call {1e3*(t1-t0):7.1f}ms  "
              f"loop_call {1e3*(t2-t1):7.1f}ms  transfers {1e3*(t3-t2):7.1f}ms  "
              f"host_text {1e3*(t4-t3):7.1f}ms")


if __name__ == "__main__":
    main()
