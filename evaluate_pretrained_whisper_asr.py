#!/usr/bin/env python3
"""Drop-in CLI wrapper; implementation in qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper_asr."""
from qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper_asr import main

if __name__ == "__main__":
    main()
