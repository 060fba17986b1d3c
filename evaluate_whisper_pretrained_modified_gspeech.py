#!/usr/bin/env python3
"""Drop-in CLI wrapper; implementation in qasr_ijcnlp_tpu.cli.evaluate_whisper_pretrained_modified_gspeech."""
from qasr_ijcnlp_tpu.cli.evaluate_whisper_pretrained_modified_gspeech import main

if __name__ == "__main__":
    main()
