"""On-chip A/B for speculative greedy decoding (decode/speculative.py).

Random weights give a real draft ~zero agreement with the target, so this
bench separates MECHANISM cost from MODEL agreement:

* plain greedy on the target            -> t_tok (the baseline per token)
* plain greedy on the draft             -> t_tok_d (the draft's step cost)
* spec, draft = target ("self")         -> acceptance 1: commits/round =
  gamma+1, isolating the slab-verify efficiency (upper bound on commits)
* spec, draft = small random ("weak")   -> acceptance ~0: worst case, the
  full mechanism overhead with ~1 commit/round

From those it projects the speedup at realistic acceptance rates
(distilled/tiny drafts on real weights land at alpha ~0.7-0.9 in the
speculative-decoding literature): a round costs
``gamma * t_tok_d + t_slab`` and commits ``E[c] = (1-a^(g+1))/(1-a)``
tokens, so projected speedup = ``t_tok * E[c] / round_cost``.

Usage: python scripts/bench_speculative.py [--batch 8] [--sample_len 96]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

from qasr_ijcnlp_tpu.decode import DecodingOptions, Draft, decode, _get_task
from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
from qasr_ijcnlp_tpu.models.dims import tiny_dims
from qasr_ijcnlp_tpu.models.whisper import init_params


def _model(dims, seed, name):
    return WhisperModel(
        init_params(jax.random.PRNGKey(seed), dims), dims, name=name
    )


def _time(fn, reps=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(getattr(out, "params", out) if out is not None else ())
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample_len", type=int, default=96)
    ap.add_argument("--gamma", type=int, default=4)
    args = ap.parse_args()

    # target: small-width production shape; draft: tiny (the pairing the
    # reference family table implies, whisper/__init__.py:17-32)
    small = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=768, n_audio_head=12,
        n_audio_layer=12, n_vocab=51865, n_text_ctx=448, n_text_state=768,
        n_text_head=12, n_text_layer=12,
    )
    target = _model(small, 0, "small-rand")
    draft = _model(tiny_dims(), 1, "tiny-rand")

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((args.batch, 80, 3000)).astype(np.float32)
    g = args.gamma

    base = dict(language="en", sample_len=args.sample_len)
    opts_t = DecodingOptions(**base)
    opts_weak = DecodingOptions(**base, draft=Draft(draft, gamma=g))
    opts_self = DecodingOptions(**base, draft=Draft(target, gamma=g))

    opts_lookup = DecodingOptions(**base, draft=Draft(None, gamma=g))

    def run(model, opts):
        return decode(model, mel, opts)

    t_greedy = _time(lambda: run(target, opts_t))
    t_draft_greedy = _time(lambda: run(draft, opts_t))
    t_weak = _time(lambda: run(target, opts_weak))
    rounds_weak = _get_task(target, opts_weak).last_spec_rounds
    t_self = _time(lambda: run(target, opts_self))
    rounds_self = _get_task(target, opts_self).last_spec_rounds
    t_lookup = _time(lambda: run(target, opts_lookup))
    rounds_lookup = _get_task(target, opts_lookup).last_spec_rounds

    # per-token / per-round costs (sample_len tokens decoded per row batch;
    # encoder + prompt cost is shared and small at this length)
    t_tok = t_greedy / args.sample_len
    t_tok_d = t_draft_greedy / args.sample_len
    round_weak = t_weak / max(rounds_weak, 1)
    t_slab = round_weak - g * t_tok_d  # slab verify + bookkeeping

    def proj(alpha):
        commits = (1 - alpha ** (g + 1)) / (1 - alpha) if alpha < 1 else g + 1
        return t_tok * commits / (g * t_tok_d + t_slab)

    out = {
        "batch": args.batch,
        "sample_len": args.sample_len,
        "gamma": g,
        "greedy_s": round(t_greedy, 4),
        "draft_greedy_s": round(t_draft_greedy, 4),
        "spec_weak_s": round(t_weak, 4),
        "spec_self_s": round(t_self, 4),
        "spec_lookup_s": round(t_lookup, 4),
        "rounds_weak": rounds_weak,
        "rounds_self": rounds_self,
        "rounds_lookup": rounds_lookup,
        "t_tok_ms": round(t_tok * 1e3, 3),
        "t_tok_draft_ms": round(t_tok_d * 1e3, 3),
        "t_slab_ms": round(t_slab * 1e3, 3),
        "slab_vs_tok": round(t_slab / t_tok, 3),
        "projected_speedup": {
            str(a): round(proj(a), 3) for a in (0.0, 0.5, 0.7, 0.8, 0.9)
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
