"""Analytic speed-of-light model for the flagship train step (SURVEY.md §6).

Answers "is 6000 audio-sec/s/chip actually fast?" by computing, from the
model config, the FLOPs and principal HBM bytes one audio-second of training
costs, and dividing by chip peaks.  Reported by bench.py as ``mfu`` (model
FLOPs / peak FLOPs) and ``pct_speed_of_light`` (achieved / roofline
throughput, where roofline time = max(compute time, memory time) — the
overlapped-roofline bound).

Assumptions (deliberately simple, stated so the numbers are auditable):
  * matmul FLOPs only for the MFU numerator (industry convention) — gate
    projections, output/vocab projections, CTC emission/grad matmuls,
    RNN-T joiner; backward = 2x forward matmuls.
  * HBM bytes counts each principal intermediate once per producer/consumer
    pass (write + read): gate tensors, scan inputs/outputs (f32), encoder
    activations, logits/log-probs (f32), optimizer state (f32 m/v/p read +
    write per segment update), parameter reads per matmul.
  * Elementwise/VPU work (sigmoid/tanh/RMS, scan combine) is bandwidth-,
    not flop-limited, so it is represented by its bytes, not its FLOPs.

Chip peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

from statecatcher_tpu.config import Config

V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_HBM_BPS = 819e9
# In-kernel VPU transcendental throughput, measured on chip via the fused
# RNN-T joint forward (tools/profile_rnnt_joint.py: 45.6 ms fwd at flagship
# shapes ≈ 9.3 ms matmul + ~36 ms for 7.1e9 exp+max+sum lanes → ~2.4e11/s;
# Mosaic's native exp path — XLA's scan-microbenched exp is ~5× slower).
V5E_PEAK_EXP_PS = 2.4e11


@dataclass
class Roofline:
    flops_per_audio_sec: float        # matmul FLOPs (fwd+bwd)
    bytes_per_audio_sec: float        # principal HBM traffic
    sol_audio_sec_per_sec: float      # overlapped-roofline throughput bound

    def mfu(self, achieved_audio_sec_per_sec: float,
            peak_flops: float = V5E_PEAK_FLOPS_BF16) -> float:
        return achieved_audio_sec_per_sec * self.flops_per_audio_sec / peak_flops

    def pct_sol(self, achieved_audio_sec_per_sec: float) -> float:
        return achieved_audio_sec_per_sec / self.sol_audio_sec_per_sec


def train_step_roofline(
    cfg: Config,
    feat_dim: int = 80,
    max_label_len: int = 128,
    mode: str = "ctc",
    peak_flops: float = V5E_PEAK_FLOPS_BF16,
    peak_hbm: float = V5E_PEAK_HBM_BPS,
) -> Roofline:
    m = cfg.model
    D = m.hidden_size
    L = m.num_layers
    V = m.vocab_size
    stack = max(1, m.stack_order)
    # frames per audio-second at the (possibly stacked) encoder rate
    hop_s = cfg.frontend.hop_length / cfg.frontend.sample_rate
    frames = (1.0 / hop_s) / stack
    act_bytes = 2 if m.dtype == "bfloat16" else 4

    if m.encoder == "lucyrnn" and m.lucyrnn.variant != "native":
        gates = 7
    elif m.encoder == "lucyrnn":
        gates = 6
    elif m.encoder == "lstm":
        gates = 4
    elif m.encoder == "xlstm":
        gates = None  # exact per-component inventory below
    else:
        gates = 8  # rwkv: q/k/v/gates + ffn, coarse
    din0 = feat_dim * stack

    # ---- matmul FLOPs per frame (forward) ----
    if m.encoder == "xlstm":
        # Exact mLSTM-block inventory (models/xlstm.py; replaces the old
        # coarse gates=8 guess — VERDICT r3 weak #2).  Per frame per block:
        x = m.xlstm
        E = x.embedding_dim
        H = x.num_heads
        dqk = int(E * x.qk_dim_factor) // H
        dv = int(E * x.v_dim_factor) // H
        Lc = x.chunk_size
        dff = int(E * x.ffn_proj_factor)
        nb = L  # bench/config uses num_layers blocks via num_blocks
        proj = 2 * E * (2 * H * dqk + 2 * H * dv + 2 * H) + 2 * (H * dv) * E
        ffn = 6 * E * dff
        # chunkwise mixer, executed FLOPs per frame (L² terms ÷ Lc):
        #   S=q·kᵀ, nvec=expD·k (dqk-wide), num=W·v (dv-wide), and the two
        #   state-sized products q·C and (k·w)·vᵀ
        mixer = 2 * H * (Lc * dqk + Lc * dqk + Lc * dv + 2 * dqk * dv)
        enc_fwd = nb * (proj + ffn + mixer) + 2 * din0 * E
        proj_fwd = 2 * E * V
        fwd = enc_fwd + proj_fwd
    else:
        enc_fwd = 2 * din0 * gates * D + 2 * (L - 1) * D * gates * D
        proj_fwd = 2 * D * V
        fwd = enc_fwd + proj_fwd
    exp_frame = 0.0          # VPU transcendental lanes per frame
    if mode == "ctc":
        S = 2 * max_label_len + 1
        # emission one-hot matmul fwd + grad projection bwd (ops/ctc.py)
        fwd += 2 * V * S
        flops_frame = 3 * fwd  # bwd = 2x fwd matmuls
        flops_exec_frame = flops_frame
    else:
        J = m.rnnt_joiner_dim
        U1 = max_label_len + 1
        flops_frame = 3 * (fwd + 2 * U1 * J * V)   # model convention
        # Executed work of the fused Pallas joint (ops/rnnt_pallas.py): per
        # frame, 4 matmul passes (fwd; bwd recompute, dlog·Kᵀ, dK) over the
        # PADDED tile — Jp lanes are real MXU cycles, so SoL counts them —
        # plus the full-vocab softmax on the VPU twice (fwd + bwd recompute),
        # which is the measured forward bottleneck.
        Jp = -(-(J + 1) // 128) * 128
        U1p = -(-U1 // 8) * 8
        Vp = -(-V // 128) * 128
        # banded lattice: the joint only visits a width-Wp window of u per
        # time block (ops/rnnt_band.py), so the executed joint/softmax work
        # scales by Wp/U1p.  -1 = auto resolves exactly like the step does
        # (train/step.py:resolve_rnnt_band) so the SoL floor models what
        # actually runs.
        band = getattr(cfg.train, "rnnt_band", 0)
        if band < 0:
            from statecatcher_tpu.train.step import resolve_rnnt_band

            # the step sees the loop's U bucket (labels padded to ×16)
            band = resolve_rnnt_band(band, -(-(U1 - 1) // 16) * 16)
        if band > 0:
            tb = cfg.train.rnnt_time_block
            Wp = -(-min(band + 8 + tb, U1 + 8) // 8) * 8
            U1p = min(U1p, Wp)
        flops_exec_frame = 3 * fwd + 4 * (2 * U1p * Jp * Vp)
        exp_frame = 2 * U1p * Vp

    # ---- principal HBM bytes per frame ----
    by = 0.0
    if m.encoder == "xlstm":
        # per block: q/k/v/ogate planes (w+r), ffn intermediates, mixer-local
        # (L,L) tensors saved for the chunk-scan backward (S/expD/W, f32,
        # ÷Lc per frame), h stacked f32, chunk state C (w+r ÷Lc); ×2 for the
        # mirrored backward traffic
        per_block = (
            2 * (2 * H * dqk + 2 * H * dv) * act_bytes     # q,k,v,o planes
            + 2 * (2 * dff + E) * act_bytes                # ffn gate/up/down
            + 3 * 2 * H * Lc * 4                           # S, expD, W rows
            + 2 * H * dv * 4                               # h (f32 scan out)
            + 2 * H * dqk * dv * 4 * 2 / Lc                # C carry w+r
        )
        by += 2 * L * per_block
        by += 2 * 2 * L * E * act_bytes                    # residual stream
    else:
        # gate tensors: written by matmul, read by scan prep; grads mirrored
        by += 2 * (2 * gates * D * act_bytes)
        # two scans per layer: coefficients in + state out, f32, fwd + bwd adjoint
        by += 2 * (2 * (2 * D * 4) + 2 * (2 * D * 4))
        by *= L
        # inter-layer activations (write + read, fwd + bwd)
        by += 2 * 2 * L * D * act_bytes
    # logits + log_probs + dlogits, f32
    by += 3 * 2 * V * 4
    if mode == "ctc":
        S = 2 * max_label_len + 1
        # emit, alpha, beta, gamma tiles (f32, write+read each)
        by += 4 * 2 * S * 4
    else:
        # blank/emit tables + lattice alpha/occupancy (f32, write+read each)
        by += 5 * 2 * (max_label_len + 1) * 4
    bytes_frame = by

    # optimizer: adam reads p,g,m,v and writes p,m,v in f32 once per
    # segment update; amortize over the audio-seconds in one segment batch
    if m.encoder == "xlstm":
        n_params = (din0 * E + E * V
                    + L * (E * (2 * H * dqk + 2 * H * dv + 2 * H)
                           + H * dv * E + 3 * E * dff))
    else:
        n_params = din0 * gates * D + (L - 1) * D * gates * D + D * V
    seg_audio = cfg.data.batch_size * cfg.data.target_duration
    opt_bytes_per_audio_sec = n_params * 4 * 7 / max(seg_audio, 1e-9)

    flops_per_audio_sec = flops_frame * frames
    bytes_per_audio_sec = bytes_frame * frames + opt_bytes_per_audio_sec

    t_flops = flops_exec_frame * frames / peak_flops
    t_bytes = bytes_per_audio_sec / peak_hbm
    t_exp = exp_frame * frames / V5E_PEAK_EXP_PS
    sol = 1.0 / max(t_flops, t_bytes, t_exp)
    return Roofline(flops_per_audio_sec, bytes_per_audio_sec, sol)
