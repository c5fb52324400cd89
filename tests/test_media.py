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


# ---------------------------------------------------------------------------
# pure-stdlib PNG codec (functions/png.py) — the REAL image decode path
# ---------------------------------------------------------------------------


def _crafted_png(arr, ftypes):
    """Encode ``arr`` (greyscale uint8) using the given per-row filter
    types — exercises decode paths our own encoder (filter 0 only)
    never emits."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape
    out = bytearray()
    prev = np.zeros(w, dtype="int32")
    for y in range(h):
        cur = arr[y].astype("int32")
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for x in range(w):
            left = int(cur[x - 1]) if x >= 1 else 0
            up = int(prev[x])
            ul = int(arr[y - 1, x - 1]) if (y > 0 and x >= 1) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out.append((int(cur[x]) - pred) & 0xFF)
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_grey_and_rgb():
    import numpy as np

    from pythonvectordb_spark.functions.png import png_decode, png_encode

    rng = np.random.default_rng(7)
    grey = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(grey)), grey)
    rgb = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(rgb)), rgb)


def test_png_decode_all_filter_types():
    """Sub/Up/Average/Paeth scanlines (and a mix) must reconstruct —
    externally-produced baseline PNGs use all five."""
    import numpy as np

    from pythonvectordb_spark.functions.png import png_decode

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(10, 8), dtype=np.uint8)
    for fts in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(png_decode(_crafted_png(arr, fts)), arr), fts


def test_png_decode_rejects_garbage():
    import pytest

    from pythonvectordb_spark.functions.png import png_decode

    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_media_image_stats_real_decode(spark):
    """End-to-end: text -> REAL PNG payload -> decode -> stats, checked
    against the pixel definition computed independently in Python."""
    import hashlib as hl

    import numpy as np

    from pythonvectordb_spark.operators.media import (
        PNG_SIDE,
        media_image_stats,
        text_as_png,
    )

    texts = [(1, "hello world"), (2, ""), (3, "x" * 500)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in media_image_stats(text_as_png(df)).collect()}
    for doc_id, text in texts:
        chain = b"".join(
            hl.md5(f"{text}:{i}".encode()).digest()
            for i in range(PNG_SIDE * PNG_SIDE // 16)
        )
        px = np.frombuffer(chain, dtype=np.uint8)
        r = got[doc_id]
        assert (r.width, r.height, r.n_pixels) == (PNG_SIDE, PNG_SIDE, PNG_SIDE**2)
        assert r.pixel_sum == int(px.astype("int64").sum())
        assert r.pixel_md5 == hl.md5(chain.hex().encode()).hexdigest()


def test_media_image_resize_real_box_filter(spark):
    """Decode -> 2x2 integer box downsample -> re-encode -> decode must
    equal an independent numpy computation from the pixel definition."""
    import hashlib as hl

    import numpy as np

    from pythonvectordb_spark.operators.media import (
        PNG_SIDE,
        media_image_resize,
        text_as_png,
    )

    texts = [(1, "resize me"), (2, "")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in media_image_resize(text_as_png(df), factor=2).collect()}
    for doc_id, text in texts:
        chain = b"".join(
            hl.md5(f"{text}:{i}".encode()).digest()
            for i in range(PNG_SIDE * PNG_SIDE // 16)
        )
        arr = np.frombuffer(chain, dtype=np.uint8).reshape(PNG_SIDE, PNG_SIDE)
        small = (
            arr.reshape(8, 2, 8, 2).astype(np.int64).sum(axis=(1, 3)) // 4
        ).astype(np.uint8)
        r = got[doc_id]
        assert (r.out_width, r.out_height) == (8, 8)
        assert r.resized_sum == int(small.astype(np.int64).sum())
        assert r.resized_md5 == hl.md5(small.tobytes().hex().encode()).hexdigest()


def test_wav_roundtrip_and_stdlib_crosscheck():
    """Encode -> decode is identity, and the stdlib wave module (an
    independent RIFF parser) agrees with our encoder's output."""
    import io
    import wave

    import numpy as np

    from pythonvectordb_spark.functions.wav import wav_decode, wav_encode

    s = np.array([0, 1, -1, 32767, -32768, 12345, -12345], dtype=np.int16)
    payload = wav_encode(s, 16000)
    rate, back = wav_decode(payload)
    assert rate == 16000
    assert np.array_equal(back, s)
    w = wave.open(io.BytesIO(payload))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 1, 2)
    assert w.readframes(len(s)) == s.astype("<i2").tobytes()


def test_wav_decode_walks_extra_and_odd_chunks():
    """Real-world WAVs interleave LIST/fact chunks and pad odd lengths;
    the chunk walk must skip them and still find fmt/data."""
    import struct

    import numpy as np

    from pythonvectordb_spark.functions.wav import wav_decode, wav_encode

    s = np.array([7, -7, 100], dtype=np.int16)
    canonical = wav_encode(s, 8000)
    fmt_and_data = canonical[12:]
    odd_chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    rebuilt = (
        b"RIFF"
        + struct.pack("<I", 4 + len(odd_chunk) + len(fmt_and_data))
        + b"WAVE"
        + odd_chunk
        + fmt_and_data
    )
    rate, back = wav_decode(rebuilt)
    assert rate == 8000 and np.array_equal(back, s)


def test_wav_decode_rejects_bad_payloads():
    import struct

    import numpy as np
    import pytest as pt

    from pythonvectordb_spark.functions.wav import wav_decode, wav_encode

    with pt.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wav at all")
    # non-PCM format tag
    good = bytearray(wav_encode(np.array([1], dtype=np.int16), 8000))
    good[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with pt.raises(ValueError, match="format tag"):
        wav_decode(bytes(good))
    # stereo
    good = bytearray(wav_encode(np.array([1], dtype=np.int16), 8000))
    good[22:24] = struct.pack("<H", 2)
    with pt.raises(ValueError, match="mono"):
        wav_decode(bytes(good))
    # missing data chunk
    with pt.raises(ValueError, match="missing"):
        wav_decode(wav_encode(np.array([], dtype=np.int16), 8000)[:36])


def test_media_audio_stats_real_decode(spark):
    """End-to-end: payloads are genuine WAVs; the reported stats match an
    independent recomputation from the sample definition."""
    import hashlib as hl

    import numpy as np

    from pythonvectordb_spark.operators.media import (
        WAV_MUL_I,
        WAV_MUL_ID,
        WAV_N_BASE,
        WAV_N_MOD,
        WAV_RATE_BASE,
        WAV_RATE_STEP,
        media_audio_stats,
        value_as_wav,
    )

    df = spark.createDataFrame([(3,), (10,), (401,)], "doc_id long")
    got = {r.doc_id: r for r in media_audio_stats(value_as_wav(df)).collect()}
    for did in (3, 10, 401):
        n = WAV_N_BASE + did % WAV_N_MOD
        i = np.arange(n, dtype=np.int64)
        s = (did * WAV_MUL_ID + i * WAV_MUL_I) % 65536 - 32768
        r = got[did]
        assert r.n_samples == n
        assert r.sample_rate == WAV_RATE_BASE + (did % 3) * WAV_RATE_STEP
        assert r.peak == int(np.abs(s).max())
        assert r.sum_sq == int((s * s).sum())
        expect = hl.md5(s.astype("<i2").tobytes().hex().encode("ascii")).hexdigest()
        assert r.pcm_md5 == expect


def test_media_audio_resample_box_decimate(spark):
    """2:1 decimation: unsigned-domain floor means of sample pairs, rate
    halved, odd trailing sample dropped; stats recomputed independently."""
    import hashlib as hl

    import numpy as np

    from pythonvectordb_spark.operators.media import (
        WAV_MUL_I,
        WAV_MUL_ID,
        WAV_N_BASE,
        WAV_N_MOD,
        WAV_RATE_BASE,
        WAV_RATE_STEP,
        media_audio_resample,
        value_as_wav,
    )

    df = spark.createDataFrame([(5,), (42,)], "doc_id long")
    got = {r.doc_id: r for r in media_audio_resample(value_as_wav(df), factor=2).collect()}
    for did in (5, 42):
        n = WAV_N_BASE + did % WAV_N_MOD
        i = np.arange(n, dtype=np.int64)
        m = (did * WAV_MUL_ID + i * WAV_MUL_I) % 65536  # unsigned samples
        n_out = n // 2
        out = (m[: n_out * 2].reshape(n_out, 2).sum(axis=1) // 2 - 32768).astype("<i2")
        r = got[did]
        assert r.n_samples == n_out
        assert r.sample_rate == (WAV_RATE_BASE + (did % 3) * WAV_RATE_STEP) // 2
        o64 = out.astype(np.int64)
        assert r.sum_sq == int((o64 * o64).sum())
        assert r.pcm_md5 == hl.md5(out.tobytes().hex().encode("ascii")).hexdigest()


# pure-stdlib baseline JPEG codec (functions/jpeg.py) — the REAL lossy
# image decode path (DCT/Huffman/zigzag/DPCM, tables read from the stream)


def test_jpeg_constant_block_contract():
    """The oracle's integer contract: an 8x8 constant block at value v
    decodes to exactly clamp(3*round((v-128)/3) + 128) — for EVERY v."""
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    for v in range(256):
        img = np.full((8, 8), v, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img))
        t = v - 128
        r = (abs(t) + 1) // 3 * (1 if t >= 0 else -1)
        expect = min(255, max(0, 128 + 3 * r))
        assert dec.shape == (8, 8) and (dec == expect).all(), (v, expect, dec[0, 0])


def test_jpeg_roundtrip_bounded_error_and_odd_dims():
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 32
    # smooth content reconstructs nearly exactly
    grad = np.tile((np.arange(64, dtype=np.uint8) * 4), (32, 1))
    back = jpeg_decode(jpeg_encode(grad))
    assert int(np.abs(back.astype(int) - grad.astype(int)).max()) <= 4
    # non-multiple-of-8 dims pad internally and crop on decode
    odd = rng.integers(0, 256, size=(13, 19), dtype=np.uint8)
    assert jpeg_decode(jpeg_encode(odd)).shape == (13, 19)


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must build Huffman/quant tables FROM the DHT/DQT
    segments, not assume the encoder's: re-encode with a custom quant
    table and check the decode honors it."""
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    q = np.full((8, 8), 1, dtype=np.int32)  # near-lossless table
    img = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
    dec = jpeg_decode(jpeg_encode(img, qtable=q))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_decode_rejects_garbage():
    import pytest

    from pythonvectordb_spark.functions.jpeg import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"definitely not a jpeg")


def test_media_jpeg_stats_real_decode(spark):
    """End-to-end: text -> genuine JPEG payload -> full marker/Huffman/
    IDCT decode -> stats, checked against the block-constant contract
    computed independently in Python."""
    import hashlib as hl

    import numpy as np

    from pythonvectordb_spark.operators.media import (
        JPEG_SIDE,
        media_jpeg_stats,
        text_as_jpeg,
    )

    texts = [(1, "hello world"), (2, ""), (3, "x" * 500)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in media_jpeg_stats(text_as_jpeg(df)).collect()}
    for doc_id, text in texts:
        d = hl.md5(text.encode()).digest()[:4]
        dec_vals = []
        for v in d:
            t = v - 128
            r = (abs(t) + 1) // 3 * (1 if t >= 0 else -1)
            dec_vals.append(min(255, max(0, 128 + 3 * r)))
        arr = np.empty((16, 16), dtype=np.uint8)
        arr[:8, :8], arr[:8, 8:], arr[8:, :8], arr[8:, 8:] = dec_vals
        row = got[doc_id]
        assert (row.width, row.height, row.n_pixels) == (JPEG_SIDE, JPEG_SIDE, 256)
        assert row.pixel_sum == 64 * sum(dec_vals)
        assert row.pixel_md5 == hl.md5(arr.tobytes().hex().encode()).hexdigest()


def test_media_jpeg_roundtrip_bound(spark):
    from pythonvectordb_spark.operators.media import media_jpeg_roundtrip_error

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta beta"), (3, "")], "doc_id long, text string"
    )
    rows = media_jpeg_roundtrip_error(df).collect()
    assert len(rows) == 3
    assert all(r.within_bound == 1 for r in rows)


def test_jpeg_decoder_skips_app_segments():
    """Externally-produced baseline JPEGs carry APP0/JFIF and COM
    segments before SOF — the marker walker must skip any unknown
    length-prefixed segment, not desync."""
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    img = np.full((8, 8), 99, dtype=np.uint8)
    data = jpeg_encode(img)
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    patched = data[:2] + app0 + com + data[2:]
    assert np.array_equal(jpeg_decode(patched), jpeg_decode(data))


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn support (round-6 VERDICT ask): a stream encoded with any
    restart interval must decode bit-identically to the plain decode —
    the decoder byte-aligns at each interval, verifies the RSTn sequence
    number, and resets DPCM state."""
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(41, 53), dtype=np.uint8)  # 42 MCUs
    plain = jpeg_decode(jpeg_encode(img))
    for ri in (1, 2, 3, 5, 7, 100):
        enc = jpeg_encode(img, restart_interval=ri)
        assert (b"\xff\xdd" in enc) and ((b"\xff\xd0" in enc) == (ri <= 42))
        assert np.array_equal(jpeg_decode(enc), plain), f"ri={ri}"
    # the DPCM reset is real: constant image stays on the exact contract
    c = np.full((24, 24), 99, dtype=np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(c, restart_interval=2)),
        jpeg_decode(jpeg_encode(c)),
    )


def test_jpeg_restart_marker_out_of_sequence_rejected():
    """A corrupted RSTn sequence number must raise, not silently desync
    (spec E.2.4: the number cycles 0-7 and is the resync anchor)."""
    import numpy as np
    import pytest

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)  # 4 MCUs
    enc = bytearray(jpeg_encode(img, restart_interval=1))
    i = bytes(enc).index(b"\xff\xd0")
    enc[i + 1] = 0xD5  # RST0 -> RST5: out of sequence
    with pytest.raises(ValueError):
        jpeg_decode(bytes(enc))


def test_jpeg_fill_bytes_before_marker():
    """0xFF fill bytes may pad before any marker (spec B.1.1.2) — the
    walker must skip them instead of desyncing."""
    import numpy as np

    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    img = np.full((8, 8), 77, dtype=np.uint8)
    data = jpeg_encode(img)
    assert data[2:4] == b"\xff\xdb"
    filled = data[:2] + b"\xff\xff" + data[2:]  # fill before DQT
    assert np.array_equal(jpeg_decode(filled), jpeg_decode(data))
