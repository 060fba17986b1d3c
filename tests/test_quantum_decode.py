"""Regression: quantum Whisper models must run through the full decode()
pipeline (the encoder dispatch must pick the quantum stem)."""

import numpy as np


def test_quantum_model_decodes():
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.models.quantum import create_quantum_whisper_tiny

    m = create_quantum_whisper_tiny(n_qubits=3)
    mel = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(
        np.float32
    )
    r = m.decode(
        mel, DecodingOptions(language="en", without_timestamps=True, sample_len=4)
    )
    assert isinstance(r[0].text, str)
    assert len(r[0].tokens) > 0
    xa = m.embed_audio(mel)
    assert xa.shape == (1, 1500, 384)
