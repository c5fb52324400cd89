"""Frame-sampling edge cases: the one-to-many fan-out must be exact at
the boundaries (multi-frame payloads, payloads smaller than one frame,
empty payloads) — the shapes a real video/image pipeline hits first."""

import hashlib

from pythonvectordb_spark.operators.media import media_frame_sample, text_as_media


def _frames_of(payload: bytes, frame_bytes: int = 256, stride: int = 4):
    step = frame_bytes * stride
    out, i = [], 0
    while i * step < len(payload):
        f = payload[i * step : i * step + frame_bytes]
        out.append((i, len(f), hashlib.md5(f).hexdigest()))
        i += 1
    return out


def test_frame_sample_multi_frame_fanout(spark):
    """A payload spanning several strides must emit one row per sampled
    frame — the driver testdata never exceeds one frame, so this fixture
    is the real exercise of the 1-to-many shape."""
    long_text = ("frame payload segment " * 300)[:5000]  # 5 frames at step 1024
    df = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    rows = sorted(
        (r.frame_idx, r.frame_len, r.frame_md5)
        for r in media_frame_sample(text_as_media(df)).collect()
    )
    assert rows == _frames_of(long_text.encode())
    assert len(rows) == 5


def test_frame_sample_boundary_payloads(spark):
    """Payload smaller than one frame -> exactly one short frame; empty
    payload -> zero frames; payload of exactly one step -> one full frame
    (the next frame would start AT the length, not before it)."""
    rows_in = [
        (1, "tiny"),                 # < frame_bytes
        (2, ""),                     # empty
        (3, "x" * 1024),             # exactly one step
        (4, "y" * 1025),             # one byte into the second stride
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    got = {}
    for r in media_frame_sample(text_as_media(df)).collect():
        got.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_len, r.frame_md5))
    for d in got.values():
        d.sort()
    assert got.get(1) == _frames_of(b"tiny")
    assert 2 not in got  # empty payload emits nothing
    assert got.get(3) == _frames_of(b"x" * 1024)
    assert [i for i, _, _ in got[3]] == [0]
    assert got.get(4) == _frames_of(b"y" * 1025)
    assert [i for i, _, _ in got[4]] == [0, 1]
    assert got[4][1][1] == 1  # second frame carries the single spill byte
