"""jiwer stand-in: word error rate via Levenshtein distance.

The reference calls ``jiwer.wer(all_refs, all_preds)`` with two lists of
strings (reference train.py:19,250).  Same definition as
statecatcher_tpu.metrics.wer (kept standalone so the reference subprocess
imports no JAX)."""


def _edit_distance(ref, hyp):
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i]
        for j, h in enumerate(hyp, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (r != h)))
        prev = cur
    return prev[-1]


def wer(refs, hyps):
    if isinstance(refs, str):
        refs = [refs]
    if isinstance(hyps, str):
        hyps = [hyps]
    errors = 0
    words = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        errors += _edit_distance(rw, hw)
        words += len(rw)
    return errors / max(words, 1)
