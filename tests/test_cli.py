"""CLI smoke tests: every entry point runs end-to-end on the synthetic
offline corpus with tiny sample counts (the pipelines must work without
network; metric values are meaningless by construction and not asserted)."""

import json
import os

import pytest


@pytest.fixture(autouse=True)
def _run_in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_evaluate_pretrained_whisper_cli():
    from qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper import main

    out = main(["--model_size", "tiny", "--split", "test-clean",
                "--batch_size", "2", "--max_samples", "4"])
    assert 0.0 <= out["cer"] and out["rtf"] > 0
    files = [f for f in os.listdir(".") if f.endswith(".json")]
    assert files
    data = json.load(open(files[0]))
    assert data["used_dummy_dataset"] is True
    assert "wer" in data and "rtf_audio_sec_per_sec" in data


def test_evaluate_gspeech_cli():
    from qasr_ijcnlp_tpu.cli.evaluate_whisper_pretrained_modified_gspeech import (
        main,
    )

    out = main(["--batch_size", "4", "--max_samples", "8", "--n_repeats", "2",
                "--model_size", "tiny"])
    assert 0.0 <= out["accuracy"] <= 1.0
    assert os.path.exists("gspeech_classification_results.json")


def test_train_then_evaluate_quantum_whisper_asr_cli(tmp_path):
    from qasr_ijcnlp_tpu.cli.evaluate_quantum_whisper_asr import main as eval_main
    from qasr_ijcnlp_tpu.cli.train_quantum_whisper_asr import main as train_main

    out = train_main([
        "--epochs", "1", "--batch_size", "2", "--max_samples", "4",
        "--n_qubits", "3", "--hidden_size", "32", "--num_layers", "1",
        "--max_text_len", "24",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert os.path.exists("quantum_whisper_asr_training_history.json")
    assert out["history"].epochs

    best = str(tmp_path / "ckpt" / "best_cer")
    out = eval_main([
        "--model_path", best, "--batch_size", "2", "--max_samples", "4",
        "--n_qubits", "3", "--hidden_size", "32", "--num_layers", "1",
        "--max_text_len", "24",
    ])
    assert "cer" in out
    assert os.path.exists("quantum_whisper_asr_evaluation_results.json")


def test_evaluate_pretrained_whisper_asr_cli(monkeypatch):
    from qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper_asr import main
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    # Keep the random-weights smoke cheap: single temperature, short decode.
    orig = WhisperModel.transcribe

    def fast_transcribe(self, audio, **kwargs):
        kwargs.update(
            temperature=0.0, sample_len=8, logprob_threshold=None,
            no_speech_threshold=None, compression_ratio_threshold=None,
        )
        return orig(self, audio, **kwargs)

    monkeypatch.setattr(WhisperModel, "transcribe", fast_transcribe)
    out = main(["--model_size", "tiny", "--max_samples", "2"])
    assert "cer" in out and "wer" in out
    assert os.path.exists("metrics_distribution.png")


def test_train_quantum_whisper_cli(tmp_path):
    from qasr_ijcnlp_tpu.cli.train_quantum_whisper import main

    out = main([
        "--epochs", "1", "--batch_size", "2", "--max_samples", "4",
        "--n_qubits", "3", "--dataset", "google",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert os.path.exists("quantum_whisper_training_history.json")
    assert out["history"].epochs


def test_train_classical_whisper_asr_cli(tmp_path):
    from qasr_ijcnlp_tpu.cli.train_classical_whisper_asr import main

    out = main([
        "--model_size", "tiny", "--epochs", "1", "--batch_size", "2",
        "--max_samples", "4", "--max_tokens", "32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert os.path.exists("classical_whisper_asr_training_history.json")
    assert out["history"].epochs[0]["train_loss"] > 0


def test_train_whisper_from_scratch_cli(tmp_path):
    from qasr_ijcnlp_tpu.cli.train_whisper_from_scratch import main

    out = main([
        "--epochs", "1", "--batch_size", "2", "--max_samples", "4",
        "--n_qubits", "3", "--hidden_size", "32", "--num_layers", "1",
        "--max_text_len", "24",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert os.path.exists("whisper_from_scratch_training_history.json")
    assert out["history"].epochs


def test_transcribe_cli(tmp_path):
    import wave

    import numpy as np

    from qasr_ijcnlp_tpu.cli.transcribe import main

    # 2-second PCM WAV the stdlib loader can decode.
    t = np.arange(32000) / 16000.0
    audio = (0.1 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    wav = str(tmp_path / "clip.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(audio.tobytes())

    outdir = str(tmp_path / "out")
    main([wav, "--model", "tiny", "--output_dir", outdir,
          "--output_format", "txt", "--language", "en", "--verbose", "False",
          "--beam_size", "None", "--best_of", "None",
          "--logprob_threshold", "None", "--no_speech_threshold", "None",
          "--compression_ratio_threshold", "None"])
    assert os.path.exists(os.path.join(outdir, "clip.txt"))
