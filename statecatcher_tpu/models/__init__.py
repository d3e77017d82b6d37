"""L3 models: encoders (LSTM, LucyRNN, xLSTM), ASR wrapper, RNN-T nets.

Every encoder follows one stateful contract:

    y, new_state = encoder.apply(params, x, state, frame_mask)

where ``state`` is a pytree of (B, ...) arrays — batch-major so that under a
data-parallel mesh each state row is co-resident with its utterance
(SURVEY.md §5 long-context).  ``encoder.init_state(batch_size)`` builds the
zero state.
"""

from statecatcher_tpu.models.lucyrnn import LucyRNNEncoder
from statecatcher_tpu.models.lstm import LSTMEncoder
from statecatcher_tpu.models.asr import ASRModel, build_model

__all__ = ["LucyRNNEncoder", "LSTMEncoder", "ASRModel", "build_model"]
