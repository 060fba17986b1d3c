"""``python -m qasr_ijcnlp_tpu`` == the transcribe CLI (reference
whisper/__main__.py)."""

from .cli.transcribe import main

main()
