"""statecatcher_tpu — a TPU-native stateful streaming-ASR training engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
speechcatcher-asr/statecatcher (reference mounted at /root/reference):

  * long recordings are segmented; encoder hidden state after segment k
    initializes segment k+1 *across gradient updates* (truncated BPTT over
    hour-long audio with O(segment) memory),
  * LSTM / LucyRNN (7-gate gated linear-recurrent cell) / xLSTM (mLSTM block)
    encoders,
  * CTC and RNN-T losses as on-device kernels,
  * training data streamed over HTTP from the speechcatcher-data API,
  * data-parallel scaling over TPU meshes via jax.sharding/pjit, with carry
    state kept as sharded, donated HBM-resident buffers.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

  L5  cli.py                      — entry points
  L4  train/                      — loop, jitted train_step with carried state,
                                    checkpoints (orbax), metrics
  L3  models/, decode.py          — ASRModel, encoders, RNN-T joiner, decoding
  L2  ops/                        — Pallas + XLA kernels: linear scans, CTC,
                                    RNN-T lattice; frontend DSP
  L1  data/, tokenizer/           — HTTP client, VTT parsing, audio decode,
                                    chunking, worker pool, tokenizer
"""

__version__ = "0.1.0"
