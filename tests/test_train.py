"""Training-layer tests: vocab parity, LSTM decoder, trainers learn, freezing."""

import numpy as np
import pytest

from qasr_ijcnlp_tpu.data import (
    CharVocabulary,
    ClassificationView,
    SyntheticLibriSpeech,
    SyntheticSpeechCommands,
    build_character_vocabulary,
)
from qasr_ijcnlp_tpu.data.loader import DataLoader, pad_batch_to
from qasr_ijcnlp_tpu.models.dims import ModelDimensions

TINY = ModelDimensions(
    n_mels=80, n_audio_ctx=30, n_audio_state=32, n_audio_head=2,
    n_audio_layer=1, n_vocab=64, n_text_ctx=16, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)


def test_char_vocab_reference_parity():
    from tests.oracle import reference_root, reference_whisper

    reference_whisper()
    reference_root()
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_librispeech_asr", "/root/reference/librispeech_asr.py"
    )
    try:
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_librispeech_asr"] = mod
        spec.loader.exec_module(mod)
    except Exception:
        pytest.skip("reference librispeech_asr not importable here")
    texts = ["Hello World", "abc DEF", "numbers 123!"]
    ref_map, ref_n = mod.build_character_vocabulary(texts)
    our_map, our_n = build_character_vocabulary(texts)
    # Reference has the 'UNK'-vs-'<UNK>' quirk (librispeech_asr.py:194): its
    # char set contains the literal 'UNK' string. Compare the fixed subset:
    # specials pinned to 0..3 and every real character mapped identically.
    assert our_map["<PAD>"] == ref_map["<PAD>"] == 0
    assert our_map["<UNK>"] == ref_map["<UNK>"] == 1
    assert our_map["<START>"] == ref_map["<START>"] == 2
    assert our_map["<END>"] == ref_map["<END>"] == 3


def test_char_vocab_encode_decode():
    vocab = CharVocabulary.build(["hello world"])
    ids = vocab.encode("hello", max_len=10)
    assert ids[0] == 2 and 3 in ids.tolist()
    assert vocab.decode(ids) == "hello"
    # unknown chars -> <UNK> (decoded as '')
    ids2 = vocab.encode("hezzo#", max_len=10)
    assert (ids2 == 1).sum() == 3  # 'z', 'z', '#' all unknown
    # round-trip through JSON
    v2 = CharVocabulary.from_json(vocab.to_json())
    assert v2.char_to_idx == vocab.char_to_idx


def test_lstm_decoder_shapes_and_greedy():
    import jax

    from qasr_ijcnlp_tpu.models import asr

    key = jax.random.PRNGKey(0)
    dec = asr.init_lstm_decoder(key, enc_dim=32, num_chars=12, hidden_size=16,
                                num_layers=2)
    enc = jax.random.normal(jax.random.fold_in(key, 1), (3, 20, 32))
    chars = jax.random.randint(jax.random.fold_in(key, 2), (3, 9), 0, 12)
    logits = asr.lstm_teacher_forced(dec, enc, chars)
    assert logits.shape == (3, 8, 12)
    out, lengths = asr.lstm_greedy_decode(dec, enc, start_id=2, end_id=3,
                                          max_len=15)
    assert out.shape == (3, 15)
    assert lengths.shape == (3,)


def test_mlp_head_fixed_alignment():
    import jax

    from qasr_ijcnlp_tpu.models import asr

    key = jax.random.PRNGKey(0)
    head = asr.init_mlp_head(key, enc_dim=32, num_chars=10, hidden_size=32)
    enc = jax.random.normal(key, (2, 20, 32))
    chars = jax.random.randint(key, (2, 7), 0, 10)
    full = asr.mlp_head_apply(head, enc, chars)
    assert full.shape == (2, 27, 10)
    char_logits = asr.mlp_head_char_logits(head, enc, chars)
    assert char_logits.shape == (2, 6, 10)
    np.testing.assert_allclose(
        np.asarray(char_logits), np.asarray(full[:, 20:26]), rtol=1e-6
    )


def test_mlp_greedy_decode_self_consistent():
    """Autoregressive MLP decode must reproduce its own chain when the
    decoded sequence is re-fed teacher-forced (position t logits depend
    only on char t, so the two evaluations must agree exactly)."""
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.models import asr

    key = jax.random.PRNGKey(7)
    head = asr.init_mlp_head(key, enc_dim=32, num_chars=10, hidden_size=32)
    enc = jax.random.normal(key, (3, 20, 32))
    out, lengths = asr.mlp_greedy_decode(head, enc, start_id=2, end_id=3,
                                         max_len=8)
    out = np.asarray(out)
    assert out.shape == (3, 8) and lengths.shape == (3,)
    # Re-feed [START] + decoded chars teacher-forced; argmax must match.
    chars = jnp.concatenate(
        [jnp.full((3, 1), 2, jnp.int32), jnp.asarray(out)], axis=1
    )
    tf = np.asarray(jnp.argmax(
        asr.mlp_head_char_logits(head, enc, chars), axis=-1
    ))
    for b in range(3):
        n = int(lengths[b]) + 1 if int(lengths[b]) < 8 else 8
        np.testing.assert_array_equal(tf[b, :n], out[b, :n])
    # after END everything is END
    for b in range(3):
        if int(lengths[b]) < 8:
            assert (out[b, int(lengths[b]):] == 3).all()


@pytest.fixture(scope="module")
def tiny_asr_setup():
    import jax

    from qasr_ijcnlp_tpu.models import asr, whisper as cmodel

    base = SyntheticLibriSpeech("train", size=8)
    vocab = CharVocabulary.build([base[i][1] for i in range(len(base))])

    class _View:
        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            audio, text = base[i]
            rng = np.random.default_rng(i)
            mel = rng.standard_normal((TINY.n_mels, TINY.n_audio_ctx * 2)).astype(
                np.float32
            )
            return mel, vocab.encode(text, 24)

    key = jax.random.PRNGKey(0)
    params = {
        "encoder": cmodel.init_params(key, TINY)["encoder"],
        "head": asr.init_lstm_decoder(
            jax.random.fold_in(key, 1), TINY.n_audio_state, vocab.num_chars,
            hidden_size=32, num_layers=2,
        ),
    }

    def encoder_apply(enc_params, mel):
        return cmodel.encoder_apply(enc_params, mel, TINY)

    return params, encoder_apply, _View(), vocab


def test_train_char_asr_learns(tiny_asr_setup, tmp_path):
    from qasr_ijcnlp_tpu.train.loops import train_char_asr

    params, encoder_apply, view, vocab = tiny_asr_setup
    loader = DataLoader(view, batch_size=4, shuffle=True)
    out = train_char_asr(
        params, encoder_apply, loader, DataLoader(view, batch_size=4, shuffle=False),
        vocab,
        head_kind="lstm", epochs=3, learning_rate=3e-3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        history_path=str(tmp_path / "hist.json"),
        log=lambda *a: None,
    )
    losses = [e["train_loss"] for e in out["history"].epochs]
    assert losses[-1] < losses[0], losses
    assert (tmp_path / "hist.json").exists()
    assert "cer" in out["tracker"].best


def test_train_classifier_learns(tmp_path):
    import jax

    from qasr_ijcnlp_tpu.models import classifier as clf, whisper as cmodel
    from qasr_ijcnlp_tpu.train.loops import train_classifier

    base = SyntheticSpeechCommands("train", size=8)

    class _View:
        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            _, label = base[i]
            rng = np.random.default_rng(100 + label)
            mel = rng.standard_normal((TINY.n_mels, TINY.n_audio_ctx * 2)).astype(
                np.float32
            )
            return mel, np.int32(label % 5)

    key = jax.random.PRNGKey(0)
    params = {
        "encoder": cmodel.init_params(key, TINY)["encoder"],
        "head": clf.init_classifier_head(key, TINY.n_audio_state, 5),
    }

    def encoder_apply(enc_params, mel):
        return cmodel.encoder_apply(enc_params, mel, TINY)

    loader = DataLoader(_View(), batch_size=4)
    out = train_classifier(
        params, encoder_apply, loader, DataLoader(_View(), batch_size=4,
                                                  shuffle=False),
        epochs=8, learning_rate=1e-2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log=lambda *a: None,
    )
    losses = [e["train_loss"] for e in out["history"].epochs]
    assert losses[-1] < losses[0], losses
    # 5 distinct (mel, label) pairs: must memorize well above chance.
    assert out["history"].epochs[-1]["val_accuracy"] >= 0.6


def test_freeze_mask_keeps_frozen_params():
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.models.quantum import (
        init_quantum_params,
        trainable_mask,
    )
    from qasr_ijcnlp_tpu.models.quantum import quantum_encoder_apply
    from qasr_ijcnlp_tpu.train.loss import masked_cross_entropy
    from qasr_ijcnlp_tpu.train.step import init_state, make_optimizer, make_train_step

    params = init_quantum_params(jax.random.PRNGKey(0), TINY, n_qubits=3)
    mask = trainable_mask(params, extra_names=("head",))
    tx = make_optimizer(1e-2, trainable_mask=mask)
    state = init_state(params, tx)

    def loss(params, mel):
        out = quantum_encoder_apply(params["encoder"], mel, TINY)
        return jnp.mean(out**2)

    step = make_train_step(loss, tx)
    mel = np.random.default_rng(0).standard_normal(
        (2, TINY.n_mels, TINY.n_audio_ctx * 2)
    ).astype(np.float32)
    new_state, m = step(state, mel)
    # quantum conv params moved; frozen transformer block params identical
    q_old = params["encoder"]["qconv1"]["qweights"]
    q_new = new_state.params["encoder"]["qconv1"]["qweights"]
    assert np.abs(np.asarray(q_new - q_old)).max() > 0
    b_old = params["encoder"]["blocks"]["attn"]["query"]["w"]
    b_new = new_state.params["encoder"]["blocks"]["attn"]["query"]["w"]
    np.testing.assert_array_equal(np.asarray(b_old), np.asarray(b_new))


def test_nonfinite_batch_skipped():
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.train.step import init_state, make_optimizer, make_train_step

    params = {"w": jnp.ones((4,))}
    tx = make_optimizer(1e-1)
    state = init_state(params, tx)

    def loss(p, x):
        return jnp.sum(p["w"] * x)

    step = make_train_step(loss, tx)
    state2, m = step(state, jnp.full((4,), jnp.nan))
    assert int(m["skipped"]) == 1
    np.testing.assert_array_equal(
        np.asarray(state2.params["w"]), np.asarray(params["w"])
    )
    state3, m = step(state2, jnp.ones((4,)))
    assert int(m["skipped"]) == 0
    assert np.abs(np.asarray(state3.params["w"]) - 1.0).max() > 0


def test_resume_from_checkpoint(tiny_asr_setup, tmp_path):
    from qasr_ijcnlp_tpu.train.checkpoint import load_pytree, save_pytree
    from qasr_ijcnlp_tpu.train.loops import train_char_asr

    params, encoder_apply, view, vocab = tiny_asr_setup
    save_pytree(str(tmp_path / "ckpt"), params)
    loader = DataLoader(view, batch_size=4)
    out = train_char_asr(
        params, encoder_apply, loader, None, vocab,
        head_kind="lstm", epochs=1, learning_rate=1e-3,
        checkpoint_dir=str(tmp_path / "out"),
        resume_from=str(tmp_path / "ckpt"),
        log=lambda *a: None,
    )
    assert out["history"].epochs


def test_pad_batch_to():
    a = np.arange(6).reshape(3, 2)
    (padded,), real = pad_batch_to((a,), 5)
    assert padded.shape == (5, 2) and real == 3
    np.testing.assert_array_equal(padded[3], a[-1])


def test_dataloader_epochs_differ():
    view = [(np.float32(i), np.int32(i)) for i in range(10)]
    loader = DataLoader(view, batch_size=3, shuffle=True, drop_last=True)
    e1 = [tuple(b[1].tolist()) for b in loader]
    e2 = [tuple(b[1].tolist()) for b in loader]
    assert e1 != e2  # reshuffled per epoch
    assert len(e1) == 3


def test_dataloader_process_sharding():
    """Multi-host sharding: equal-length shards (wrap-padded) covering the
    dataset — every host must run the SAME number of batches, or one host
    would block forever in a gradient all-reduce the others never enter."""
    view = [(np.float32(i), np.int32(i)) for i in range(11)]
    seen, counts = [], []
    for rank in range(3):
        loader = DataLoader(view, batch_size=2, shuffle=True, seed=7,
                            process_index=rank, process_count=3)
        batches = [b[1].tolist() for b in loader]
        got = [int(v) for b in batches for v in b]
        assert len(loader) == len(batches)
        counts.append((len(got), len(batches)))
        seen.append(got)
    # lockstep: identical item AND batch counts on every host (11 -> 4 each)
    assert len(set(counts)) == 1 and counts[0] == (4, 2)
    union = set(seen[0]) | set(seen[1]) | set(seen[2])
    assert union == set(range(11))
    # the only overlap is the <= count-1 wrap-padded duplicates
    assert sum(c[0] for c in counts) - len(union) == 1
    # same epoch counter -> same global order: deterministic re-shard
    l0 = DataLoader(view, batch_size=2, shuffle=True, seed=7,
                    process_index=0, process_count=3)
    again = [int(v) for b in l0 for v in b[1].tolist()]
    assert again == seen[0]


def test_grad_accum_matches_single_step():
    """accum=2 must reproduce the single full-batch step exactly (modulo fp
    reassociation) even with UNEVEN valid-token counts per microbatch."""
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.models import whisper as cmodel
    from qasr_ijcnlp_tpu.train.schedule import warmup_cosine
    from qasr_ijcnlp_tpu.train.step import (
        init_state,
        make_accum_train_step,
        make_optimizer,
        make_train_step,
        whisper_loss_fn,
        whisper_sum_loss_fn,
    )

    key = jax.random.PRNGKey(0)
    params = cmodel.init_params(key, TINY)
    mel = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                       (4, TINY.n_mels, TINY.n_audio_ctx * 2)))
    tokens = np.array(
        jax.random.randint(jax.random.fold_in(key, 2), (4, 8), 0, TINY.n_vocab)
    )
    # uneven padding: rows 0-1 keep 8 tokens, row 2 keeps 3, row 3 keeps 6
    tokens[2, 3:] = -100
    tokens[3, 6:] = -100

    def make(accum):
        tx = make_optimizer(warmup_cosine(1e-3, 2, 10))
        state = init_state(jax.tree.map(jnp.array, params), tx)
        if accum == 1:
            step = jax.jit(make_train_step(whisper_loss_fn(TINY), tx))
        else:
            step = jax.jit(make_accum_train_step(
                whisper_sum_loss_fn(TINY), tx, accum))
        return step(state, jnp.asarray(mel), jnp.asarray(tokens))

    s1, m1 = make(1)
    s2, m2 = make(2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_train_token_asr_resume_continues_epochs(tmp_path):
    """--resume_state continues the EPOCH loop where the restored optimizer
    step left off: the resumed run must reproduce the uninterrupted run's
    final params exactly (same LR schedule horizon, same epoch-keyed
    shuffles), log only the remaining epochs, and not clobber earlier
    state_epoch_N checkpoints."""
    import copy
    import os

    import jax

    from qasr_ijcnlp_tpu.models import whisper as cmodel
    from qasr_ijcnlp_tpu.train.loops import train_token_asr

    dims = ModelDimensions(
        n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
        n_audio_layer=1, n_vocab=64, n_text_ctx=8, n_text_state=16,
        n_text_head=2, n_text_layer=1,
    )
    params = cmodel.init_params(jax.random.PRNGKey(0), dims)

    class _Tok:
        eot = 50

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    rng = np.random.default_rng(3)
    data = []
    for i in range(4):
        mel = 0.1 * rng.standard_normal(
            (dims.n_mels, 2 * dims.n_audio_ctx)
        ).astype(np.float32)
        toks = np.full((dims.n_text_ctx,), -100, np.int32)
        toks[:4] = [1, 5 + i, 6, 2]
        data.append((mel, toks))

    def loader():
        return DataLoader(data, batch_size=2, shuffle=True, seed=9)

    kw = dict(save_state_every=2, learning_rate=1e-3, warmup_steps=2,
              log=lambda *a, **k: None)

    # Uninterrupted 4-epoch run; its state_epoch_1 save plays the role of
    # the checkpoint an interrupted run would have left behind (same LR
    # horizon, same optimizer trajectory through epoch 1).
    ckpt_dir = str(tmp_path / "run")
    full = train_token_asr(
        copy.deepcopy(params), dims, _Tok(), loader(), None, epochs=4,
        checkpoint_dir=ckpt_dir, **kw)
    ckpt = os.path.join(ckpt_dir, "state_epoch_1")
    assert os.path.exists(ckpt)
    before = os.path.getmtime(ckpt)

    resumed = train_token_asr(
        copy.deepcopy(params), dims, _Tok(), loader(), None, epochs=4,
        checkpoint_dir=ckpt_dir, resume_state=ckpt, **kw)

    # only the remaining epochs ran, numbered where the run left off
    assert [e["epoch"] for e in resumed["history"].epochs] == [2, 3]
    # epoch-1 checkpoint untouched; epoch-3 checkpoint added
    assert os.path.getmtime(ckpt) == before
    assert os.path.exists(os.path.join(ckpt_dir, "state_epoch_3"))
    # final params identical to the uninterrupted run
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        resumed["params"], full["params"],
    )
