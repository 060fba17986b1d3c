#!/usr/bin/env python3
"""Drop-in CLI wrapper; implementation in qasr_ijcnlp_tpu.cli.train_whisper_from_scratch."""
from qasr_ijcnlp_tpu.cli.train_whisper_from_scratch import main

if __name__ == "__main__":
    main()
