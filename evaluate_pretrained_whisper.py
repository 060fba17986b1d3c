#!/usr/bin/env python3
"""Drop-in CLI wrapper; implementation in qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper."""
from qasr_ijcnlp_tpu.cli.evaluate_pretrained_whisper import main

if __name__ == "__main__":
    main()
