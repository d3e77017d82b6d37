"""Evaluation harness: WER/CER of a trained model over a dataset.

The reference computes only in-loop train-TER (reference train.py:214-265);
this harness evaluates a checkpoint on held-out data with the same segment
streaming + state carry as training, using greedy or prefix-beam decoding.

Usage::

    python -m statecatcher_tpu.eval --ckpt models/<ts> \
        --data.source local --data.local_dir fixtures/ [--decoder beam]
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.beam import (
    beam_commit,
    beam_hypotheses,
    beam_init,
    ctc_beam_search,
)
from statecatcher_tpu.config import Config
from statecatcher_tpu.data.pipeline import BatchPipeline, stack_segment_slice
from statecatcher_tpu.decode import (
    boundary_trimmed_lens,
    ctc_greedy_decode,
    dedup_reference_text,
    keep_to_token_lists,
)
from statecatcher_tpu.frontend import compute_features, compute_frame_mask
from statecatcher_tpu.frontend import feat_dim as frontend_feat_dim
from statecatcher_tpu.metrics import cer, wer
from statecatcher_tpu.models.asr import init_carry
from statecatcher_tpu.models.speech import build_speech_model


@dataclass
class EvalResult:
    wer: float
    cer: float
    num_utterances: int
    num_segments: int
    refs: list
    hyps: list


def evaluate(
    cfg: Config,
    params,
    tokenizer,
    dataset=None,
    max_batches: int = 10,
    decoder: str = "greedy",
    beam: int = 8,
    boundary_dedup: bool = True,
) -> EvalResult:
    """Segment-streaming evaluation with carried encoder state.

    Hypotheses are accumulated per recording across its segments (decode on
    each segment's valid frames, concatenate), mirroring how the stateful
    model is meant to be consumed.

    ``boundary_dedup`` (default on) removes the cue-duplication artifact of
    the fixed-size chunker at the decode layer: frames past the next chunk's
    start are not decoded twice, and the duplicated boundary cue's text is
    counted once in the joined reference (``decode.boundary_trimmed_lens`` /
    ``dedup_reference_text``).  Training is untouched — byte parity with the
    reference's segmentation is preserved there.
    """
    import dataclasses as dc

    from statecatcher_tpu.train.loop import build_dataset

    mode = cfg.train.mode
    model_cfg = dc.replace(cfg.model, vocab_size=tokenizer.vocab_size)
    fdim = frontend_feat_dim(cfg.frontend)
    model = build_speech_model(model_cfg, fdim, mode)
    stack_order = max(1, model_cfg.stack_order)
    blank_id = tokenizer.blank_id
    if dataset is None:
        dataset = build_dataset(cfg)
    dataset.start_session(
        batch_size=cfg.data.batch_size, order=cfg.data.order,
        min_duration=cfg.data.min_duration, max_duration=cfg.data.max_duration,
    )
    sr = cfg.data.batch_samplerate
    target_samples = int(sr * cfg.data.target_duration)
    use_rnnt_dec = mode == "rnnt" and decoder in ("rnnt-greedy", "rnnt-beam")

    @jax.jit
    def forward(params, audio, sample_mask, carry):
        feats = compute_features(audio, cfg.frontend)
        fm, in_lens = compute_frame_mask(sample_mask, feats.shape[1], stack_order)
        logits, new_carry = model.apply(
            params, feats, carry, fm, method="encode"
        ) if mode == "rnnt" else model.apply(params, feats, carry, fm)
        enc_p = (
            model.apply(params, logits, method="rnnt_project_encoder")
            .astype(jnp.float32)
            if use_rnnt_dec else None
        )
        return logits.astype(jnp.float32), enc_p, in_lens, new_carry

    rnnt_tables = None
    if use_rnnt_dec:
        pt, jk, jb = model.apply(params, method="rnnt_decode_tables")
        rnnt_tables = tuple(jnp.asarray(x, jnp.float32) for x in (pt, jk, jb))

    pipe = BatchPipeline(dataset, target_samples, num_workers=cfg.data.num_workers)
    refs: list[str] = []
    hyps: list[str] = []
    n_segments = 0
    try:
        for _ in range(max_batches):
            batch = pipe.next_batch()
            n_rows = len(batch.audio_items)
            K = batch.num_segments(cfg.data.batch_segment_strategy)
            carry = init_carry(model_cfg, n_rows)
            per_item_hyp = [[] for _ in range(n_rows)]
            per_item_ref = [[] for _ in range(n_rows)]
            # Decode state is carried ACROSS segments (the decode-side twin of
            # the encoder carry, same as streaming.py) — one hypothesis per
            # recording, extracted after its last segment.
            beam_state = totals = None
            rnnt_state = None
            # Hour-scale decode: tokens committed to the host between
            # segments (all live beams agree on them / greedy RNN-T drain),
            # so the fixed 512-slot device buffers never overflow no matter
            # how long the recording is (reference README.md:5).
            per_item_committed = [[] for _ in range(n_rows)]
            prev_metas = None   # previous segment's metadata (beam dedup)
            for seg_idx in range(K):
                audio, mask, texts = stack_segment_slice(batch, seg_idx, target_samples)
                logits, enc_p, in_lens, carry = forward(
                    params, jnp.asarray(audio), jnp.asarray(mask), carry
                )
                n_segments += 1
                metas_k = [
                    batch.meta_items[i][seg_idx]
                    if (boundary_dedup and i < len(batch.meta_items)
                        and seg_idx < len(batch.meta_items[i]))
                    else None
                    for i in range(n_rows)
                ]
                raw_lens = in_lens
                # Trimmed lens are consumed only by the STATEFUL RNN-T
                # decoders (CTC uses skip-start force-blanking on raw_lens
                # below).  Margin 0 there: the 2-frame CTC emission-latency
                # margin would make the carried RNN-T state decode 2 frames
                # into the overlap the next segment re-decodes from frame 0,
                # double-emitting a boundary character.
                in_lens = jnp.asarray(boundary_trimmed_lens(
                    np.asarray(in_lens), metas_k, sr,
                    cfg.frontend.hop_length, stack_order,
                    latency_margin_frames=0,
                ))
                if use_rnnt_dec:
                    from statecatcher_tpu.rnnt_decode import (
                        rnnt_beam_init,
                        rnnt_beam_search,
                        rnnt_decode_init,
                        rnnt_greedy_decode,
                    )

                    from statecatcher_tpu.rnnt_decode import (
                        rnnt_beam_commit,
                        rnnt_drain,
                    )

                    if decoder == "rnnt-beam":
                        if rnnt_state is None:
                            rnnt_state = rnnt_beam_init(n_rows, beam, 512, blank_id)
                        rnnt_state = rnnt_beam_search(
                            enc_p, *rnnt_tables, in_lens, blank_id=blank_id,
                            beam=beam, topk=min(beam, 8), init_state=rnnt_state,
                        )
                        rnnt_state, com = rnnt_beam_commit(rnnt_state, reserve=256)
                    else:
                        if rnnt_state is None:
                            rnnt_state = rnnt_decode_init(n_rows, 512, blank_id)
                        rnnt_state = rnnt_greedy_decode(
                            enc_p, *rnnt_tables, in_lens, blank_id=blank_id,
                            init_state=rnnt_state,
                        )
                        rnnt_state, com = rnnt_drain(rnnt_state)
                    for i in range(n_rows):
                        per_item_committed[i].extend(com[i])
                elif decoder in ("beam", "greedy"):
                    # Boundary dedup for STATEFUL CTC decode: don't end-trim
                    # this segment (trimming loses late emissions of the last
                    # pre-boundary word, and a persistent beam state would
                    # re-commit the duplicated cue's first characters in the
                    # next one — measured as doubled chars, "ddelta");
                    # instead decode each segment in full and FORCE-BLANK the
                    # frames of the next segment that re-cover audio this one
                    # already decoded, so each instant is committed exactly
                    # once in stream order.  Fixture WER (6000 steps): beam
                    # 0.181 → 0.069, greedy 0.125 → (measured below in
                    # BASELINE.md) vs the trim-based scheme.
                    lp = jax.nn.log_softmax(logits, axis=-1)
                    fps = sr / float(cfg.frontend.hop_length
                                     * max(1, stack_order))
                    ofs = np.zeros(n_rows, np.int32)
                    for i in range(n_rows):
                        pm = prev_metas[i] if prev_metas else None
                        if pm and pm.get("overlap_start") is not None:
                            ofs[i] = max(0, int(
                                (pm["end"] - pm["overlap_start"]) * fps))
                    if ofs.any():
                        frames_ix = jnp.arange(lp.shape[1])[None, :, None]
                        blank_row = jnp.full(
                            (lp.shape[-1],), -1e30, lp.dtype
                        ).at[blank_id].set(0.0)
                        lp = jnp.where(
                            frames_ix < jnp.asarray(ofs)[:, None, None],
                            blank_row, lp,
                        )
                    if decoder == "beam":
                        if beam_state is None:
                            beam_state = beam_init(n_rows, beam, 512)
                        beam_state, totals = ctc_beam_search(
                            lp, raw_lens, beam=beam, blank_id=blank_id,
                            max_len=512, init_state=beam_state,
                        )
                        beam_state, com = beam_commit(
                            beam_state, totals, reserve=256)
                        # forced commits can prune beams — refresh totals
                        totals = jnp.logaddexp(
                            beam_state.p_b, beam_state.p_nb)
                        for i in range(n_rows):
                            per_item_committed[i].extend(com[i])
                    else:
                        preds, keep = ctc_greedy_decode(lp, raw_lens, blank_id)
                        batch_hyps = keep_to_token_lists(
                            np.asarray(preds), np.asarray(keep))
                        for i in range(n_rows):
                            if seg_idx < len(batch.text_items[i]):
                                per_item_hyp[i].extend(batch_hyps[i])
                else:
                    preds, keep = ctc_greedy_decode(logits, in_lens, blank_id)
                    batch_hyps = keep_to_token_lists(np.asarray(preds), np.asarray(keep))
                    for i in range(n_rows):
                        if seg_idx < len(batch.text_items[i]):
                            per_item_hyp[i].extend(batch_hyps[i])
                for i in range(n_rows):
                    if seg_idx < len(batch.text_items[i]):
                        per_item_ref[i].append(
                            dedup_reference_text(texts[i], metas_k[i])
                        )
                prev_metas = metas_k
            if use_rnnt_dec:
                from statecatcher_tpu.rnnt_decode import (
                    rnnt_beam_to_lists,
                    rnnt_state_to_lists,
                )

                if decoder == "rnnt-beam":
                    resid = [
                        h[0][1] if h else [] for h in rnnt_beam_to_lists(rnnt_state)
                    ]
                else:
                    resid = rnnt_state_to_lists(rnnt_state)
                per_item_hyp = [
                    per_item_committed[i] + resid[i] for i in range(n_rows)
                ]
            elif decoder == "beam" and beam_state is not None:
                resid = [
                    h[0][1] if h else []
                    for h in beam_hypotheses(beam_state, totals)
                ]
                per_item_hyp = [
                    per_item_committed[i] + resid[i] for i in range(n_rows)
                ]
            for i in range(n_rows):
                hyps.append(tokenizer.decode_ids(per_item_hyp[i]))
                refs.append(" ".join(t for t in per_item_ref[i] if t))
            dataset.mark_batch_done(batch.epoch, batch.batch_id)
    finally:
        pipe.stop()
        dataset.end_session()

    return EvalResult(
        wer=wer(refs, hyps), cer=cer(refs, hyps),
        num_utterances=len(refs), num_segments=n_segments,
        refs=refs, hyps=hyps,
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def popopt(name, default=None):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i:i + 2]
            return v
        return default

    ckpt_dir = popopt("--ckpt")
    decoder = popopt("--decoder", "greedy")
    max_batches = int(popopt("--max-batches", "10"))
    cfg = Config().apply_overrides(argv)
    if ckpt_dir is None:
        print("--ckpt <run_dir> is required", file=sys.stderr)
        return 1

    import os

    from statecatcher_tpu.train.checkpoint import CheckpointManager
    from statecatcher_tpu.train.loop import build_tokenizer
    from statecatcher_tpu.train.step import init_train_state

    run_tok = os.path.join(ckpt_dir, "tokenizer.json")
    if cfg.train.sp_model is None and os.path.exists(run_tok):
        from statecatcher_tpu.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(run_tok)
    else:
        tokenizer = build_tokenizer(cfg)
    import dataclasses as dc

    model_cfg = dc.replace(cfg.model, vocab_size=tokenizer.vocab_size)
    fdim = frontend_feat_dim(cfg.frontend)
    model = build_speech_model(model_cfg, fdim, cfg.train.mode)
    cfg2 = dc.replace(cfg, model=model_cfg)
    template = init_train_state(model, cfg2, jax.random.PRNGKey(0), fdim, 16)
    mgr = CheckpointManager(ckpt_dir)
    state, meta = mgr.restore(template)
    mgr.close()

    result = evaluate(cfg2, state.params, tokenizer,
                      max_batches=max_batches, decoder=decoder)
    print(f"WER: {result.wer:.4f}  CER: {result.cer:.4f}  "
          f"({result.num_utterances} utterances, {result.num_segments} segments)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
