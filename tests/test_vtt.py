from statecatcher_tpu.data.vtt import parse_timestamp, vtt_to_segments_with_text


def test_parse_timestamp_hms():
    assert parse_timestamp("01:02:03.500") == 3723.5
    assert parse_timestamp("00:00:29.980") == 29.98


def test_parse_timestamp_ms():
    assert parse_timestamp("02:03.250") == 123.25
    assert parse_timestamp("00:00.000") == 0.0


def test_parse_timestamp_no_millis():
    assert parse_timestamp("00:01:05") == 65.0


def test_vtt_basic():
    vtt = """WEBVTT

00:00.000 --> 00:00:29.980
Thank you for listening.
"""
    segs = vtt_to_segments_with_text(vtt)
    assert segs == [(0.0, 29.98, "Thank you for listening.")]


def test_vtt_multiline_and_multiple_cues():
    vtt = """WEBVTT

00:00:01.000 --> 00:00:02.000
line one
line two

00:00:03.000 --> 00:00:04.500
second cue
"""
    segs = vtt_to_segments_with_text(vtt)
    assert segs == [
        (1.0, 2.0, "line one line two"),
        (3.0, 4.5, "second cue"),
    ]


def test_vtt_cue_settings_tail():
    vtt = "00:01.000 --> 00:02.000 align:start position:0%\nhello\n"
    segs = vtt_to_segments_with_text(vtt)
    assert segs == [(1.0, 2.0, "hello")]


def test_vtt_malformed_cue_skipped():
    vtt = """garbage --> alsogarbage
text under bad cue

00:00:01.000 --> 00:00:02.000
good
"""
    segs = vtt_to_segments_with_text(vtt)
    assert segs == [(1.0, 2.0, "good")]


def test_vtt_empty():
    assert vtt_to_segments_with_text("") == []
    assert vtt_to_segments_with_text("WEBVTT\n\nno cues here\n") == []
