"""End-to-end data-plane tests against the in-process fake server and the
file-backed local dataset (SURVEY.md §4a)."""

import os

import numpy as np
import pytest

from statecatcher_tpu.data.audio import write_wav_bytes
from statecatcher_tpu.data.client import SpeechDataset
from statecatcher_tpu.data.fake_server import FakeSpeechDataServer
from statecatcher_tpu.data.local import LocalSpeechDataset
from statecatcher_tpu.data.pipeline import BatchPipeline, stack_segment_slice


def _make_recording(rng, seconds=4, sr=16000, n_cues=3):
    x = rng.uniform(-0.3, 0.3, size=seconds * sr).astype(np.float32)
    wav = write_wav_bytes(x, sr)
    cue_len = seconds / n_cues
    lines = ["WEBVTT", ""]
    for i in range(n_cues):
        s, e = i * cue_len, (i + 1) * cue_len
        lines.append(f"00:00:{s:06.3f} --> 00:00:{e:06.3f}")
        lines.append(f"cue number {i}")
        lines.append("")
    return wav, "\n".join(lines)


@pytest.fixture
def server(rng):
    recs = [_make_recording(rng, seconds=3 + i) for i in range(5)]
    with FakeSpeechDataServer(recs) as srv:
        yield srv


def test_http_session_lifecycle(server):
    ds = SpeechDataset(config=server.client_config())
    ds.start_session(batch_size=2)
    assert ds.session_id is not None
    epoch, batch_id, batch = ds.fetch_next_batch()
    assert epoch == 0 and len(batch) == 2
    ds.mark_batch_done(epoch, batch_id)
    assert server.state.marked_done == [(0, batch_id)]
    ds.log("INFO", "hello")
    assert ("INFO", "hello") in server.state.logs
    ds.end_session()


def test_http_epoch_rollover(server):
    ds = SpeechDataset(config=server.client_config())
    ds.start_session(batch_size=4)
    e0, _, b0 = ds.fetch_next_batch()     # items 0-3
    e1, _, b1 = ds.fetch_next_batch()     # item 4
    e2, _, b2 = ds.fetch_next_batch()     # rollover → epoch 1
    assert (e0, e1) == (0, 0)
    assert e2 == 1
    assert len(b0) == 4 and len(b1) == 1


def test_http_item_preprocess(server):
    ds = SpeechDataset(config=server.client_config())
    ds.start_session(batch_size=1)
    _, _, batch = ds.fetch_next_batch()
    target = 16000 * 2
    audios, texts, masks, meta = ds.load_and_preprocess_batch_item(batch[0], target)
    assert len(audios) == len(texts) == len(masks) == len(meta) >= 1
    for a, m in zip(audios, masks):
        assert a.shape == (target,)
        assert m.shape == (target,)


def test_http_retry_on_transient_500(server):
    server.state.fail_next_fetches = 2  # urllib3 Retry should absorb these
    ds = SpeechDataset(config=server.client_config())
    ds.start_session(batch_size=2)
    epoch, _, batch = ds.fetch_next_batch()
    assert len(batch) == 2


def _write_local_fixtures(tmp_path, rng, n=4):
    for i in range(n):
        wav, vtt = _make_recording(rng, seconds=3 + i)
        (tmp_path / f"rec{i}.wav").write_bytes(wav)
        (tmp_path / f"rec{i}.vtt").write_text(vtt)
    return str(tmp_path)


def test_local_dataset(tmp_path, rng):
    root = _write_local_fixtures(tmp_path, rng)
    ds = LocalSpeechDataset(root)
    ds.start_session(batch_size=2)
    epoch, batch_id, batch = ds.fetch_next_batch()
    assert epoch == 0 and len(batch) == 2
    audios, texts, masks, _ = ds.load_and_preprocess_batch_item(batch[0], 16000)
    assert len(audios) >= 1


def test_pipeline_prefetch_and_slice(tmp_path, rng):
    root = _write_local_fixtures(tmp_path, rng)
    ds = LocalSpeechDataset(root)
    ds.start_session(batch_size=3)
    target = 16000 * 2
    with BatchPipeline(ds, target_samples=target, num_workers=2, prefetch=2) as pipe:
        b = pipe.get(timeout=30)
    assert len(b.audio_items) == 3
    K = b.num_segments("clipping")
    assert K >= 1
    audio, mask, texts = stack_segment_slice(b, 0, target)
    assert audio.shape == (3, target)
    assert mask.shape == (3, target)
    assert len(texts) == 3
    # padding strategy: out-of-range segment index yields silence + empty text
    Kmax = b.num_segments("padding")
    audio2, mask2, texts2 = stack_segment_slice(b, Kmax - 1, target)
    for i, count in enumerate(b.num_segments_per_item):
        if Kmax - 1 >= count:
            assert not mask2[i].any()
            assert texts2[i] == ""


def test_pipeline_drops_bad_items(tmp_path, rng):
    root = _write_local_fixtures(tmp_path, rng, n=3)
    # corrupt one wav
    with open(os.path.join(root, "rec1.wav"), "wb") as f:
        f.write(b"not a wav at all")
    ds = LocalSpeechDataset(root)
    ds.start_session(batch_size=3)
    pipe = BatchPipeline(ds, target_samples=16000, num_workers=2)
    b = pipe.next_batch()
    assert len(b.audio_items) == 2  # bad item dropped, parity w/ reference
    pipe.stop()


def test_local_dataset_sharding(tmp_path, rng):
    """Multi-host: shards partition the file list disjointly."""
    root = _write_local_fixtures(tmp_path, rng, n=5)
    seen = []
    for idx in range(2):
        ds = LocalSpeechDataset(root, shard_index=idx, shard_count=2)
        ds.start_session(batch_size=10)
        _, _, batch = ds.fetch_next_batch()
        seen.append({item["local_audio_path"] for item in batch})
    assert seen[0] & seen[1] == set()
    assert len(seen[0] | seen[1]) == 5


def test_pcm16_passthrough_decode(rng):
    """decode_audio_fast keeps int16 for mono PCM16 at the target rate and
    matches the float path exactly after /32767 scaling; other inputs fall
    back to float32."""
    from statecatcher_tpu.data.audio import decode_audio, decode_audio_fast

    x = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    wav = write_wav_bytes(x, 16000)
    fast = decode_audio_fast(wav, 16000)
    assert fast.dtype == np.int16
    np.testing.assert_array_equal(
        fast.astype(np.float32) / 32767.0, decode_audio(wav, 16000)
    )
    resampled = decode_audio_fast(wav, 8000)       # rate mismatch: float path
    assert resampled.dtype == np.float32
    np.testing.assert_array_equal(resampled, decode_audio(wav, 8000))


def test_stack_segment_slice_int16(tmp_path, rng):
    """int16 passthrough segments: default stacking converts to the
    reference float scale; raw_dtype keeps int16 for compact transfer."""
    root = _write_local_fixtures(tmp_path, rng, n=2)
    ds = LocalSpeechDataset(root)
    ds.start_session(batch_size=2)
    pipe = BatchPipeline(ds, target_samples=16000, num_workers=2)
    b = pipe.next_batch()
    assert all(a.dtype == np.int16 for aud in b.audio_items for a in aud)
    audio_f, mask_f, _ = stack_segment_slice(b, 0, 16000)
    assert audio_f.dtype == np.float32
    audio_r, mask_r, _ = stack_segment_slice(b, 0, 16000, raw_dtype=True)
    assert audio_r.dtype == np.int16
    np.testing.assert_array_equal(
        audio_r.astype(np.float32) / 32767.0, audio_f
    )
    np.testing.assert_array_equal(mask_f, mask_r)
    # missing-segment padding rows stay silent in both dtypes
    K = b.num_segments("padding")
    audio_p, mask_p, texts_p = stack_segment_slice(b, K - 1, 16000,
                                                   raw_dtype=True)
    for i, count in enumerate(b.num_segments_per_item):
        if K - 1 >= count:
            assert not audio_p[i].any() and not mask_p[i].any()
    pipe.stop()


def test_assemble_compact_group_pool_reuse(tmp_path, rng):
    """Reused (double-buffered) group buffers: a second group with missing
    segments must not leak the previous group's audio through stale rows."""
    from statecatcher_tpu.data.pipeline import (
        GroupBufferPool,
        assemble_compact_group,
    )

    root = _write_local_fixtures(tmp_path, rng, n=2)
    ds = LocalSpeechDataset(root)
    ds.start_session(batch_size=2)
    pipe = BatchPipeline(ds, target_samples=16000, num_workers=2)
    b = pipe.next_batch()
    K = b.num_segments("padding")
    pool = GroupBufferPool(depth=2)
    KG, B = 4, 3   # B_local > n_rows and KG > group: padded rows + segments
    outs = []
    for start in (0, 0, 0):   # third call reuses the first call's buffer
        gids = list(range(start, min(start + 2, K)))
        a, l, t = assemble_compact_group(b, gids, KG, B, 16000, pool=pool)
        outs.append((a.copy(), l.copy(), t))
    a0, l0, _ = outs[0]
    a2, l2, _ = outs[2]
    np.testing.assert_array_equal(a0, a2)
    np.testing.assert_array_equal(l0, l2)
    # padded segment rows and the padded batch row are silent
    assert not a2[2:].any() and not a2[:, 2:].any()
    # and match the no-pool reference exactly
    ar, lr, tr = assemble_compact_group(b, [0, 1], KG, B, 16000)
    np.testing.assert_array_equal(ar, a2)
    np.testing.assert_array_equal(lr, l2)
    pipe.stop()
