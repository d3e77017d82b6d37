"""Stub for NX-AI xLSTMLarge (reference model.py:6, build_encoder:216-228).

The parity harness exercises the reference's LSTM-CTC configuration only
(the one its own docs mark CPU-runnable); xLSTM needs the external Triton
package.  build_encoder only constructs the config object for encoder=xlstm,
and ASRModel isinstance-checks it — a plain dataclass satisfies both.
Instantiating the model itself raises."""

from dataclasses import dataclass, field


@dataclass
class xLSTMLargeConfig:
    embedding_dim: int = 80
    input_dim: int = 80
    num_heads: int = 2
    num_blocks: int = 3
    vocab_size: int = 1024
    return_last_states: bool = True
    mode: str = "train"
    chunkwise_kernel: str = "chunkwise--native_autograd"
    sequence_kernel: str = "native_sequence__native"
    step_kernel: str = "native"
    autocast_kernel_dtype: str = "float16"
    extra: dict = field(default_factory=dict)


class xLSTMLarge:
    def __init__(self, cfg):
        raise RuntimeError(
            "xlstm stub: the NX-AI xLSTM package is unavailable in the "
            "parity harness; use the lstm encoder config"
        )
