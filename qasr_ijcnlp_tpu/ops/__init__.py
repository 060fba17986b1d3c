"""TPU Pallas kernels and their partitioning glue.

Modules (each with its XLA fallback + custom-VJP backward oracle):

* :mod:`.melfront` — fused STFT + mel filterbank frontend
* :mod:`.conv_stem` — fused two-conv encoder stem
* :mod:`.flash` — packed / 4D flash attention
* :mod:`.encoder_block` — fully fused encoder transformer block and the
  head-sharded LN+attention building block for the tensor-parallel trunk
* :mod:`.decode_attn` — int8 cross-attention for the decode loop (opt-in)
* :mod:`.qsim` — closed-form quantum circuit simulator (replaces PennyLane)
* :mod:`.partition` — custom_partitioning wrappers so the kernels survive
  GSPMD meshes
"""


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (kernel tile padding)."""
    return (x + m - 1) // m * m
