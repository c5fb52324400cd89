"""Multimodal queries: PNG/JPEG/WAV codec statistics, resize and frame-sample plumbing.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DataFrame,
    F,
    MM,
    O,
    SparkSession,
    _tokens,
    l2_norm,
    load_table,
)


def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings: one multimodal row (text + vector + scalars)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    return joined.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        F.size(_tokens("text")).alias("n_tokens"),
        F.round(l2_norm("embedding"), 9).alias("emb_norm"),
    )


def o_multimodal_join() -> str:
    return f"""
SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
       CAST(len({O.sql_tokens('d.text')}) AS INT) AS n_tokens,
       round({O.sql_l2_norm('e.embedding')}, 9) AS emb_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> Arrow-batched mapInPandas feature extraction
    (stub decode: byte length + md5), oracle-checked end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_features(MM.text_as_media(docs))


def o_media_features() -> str:
    return """
SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_md5
FROM documents
"""


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (new round 4): build genuine mono
    16-bit PCM WAV payloads from the closed-form sample definition
    (`media.value_as_wav` — lengths/rates vary per row so header
    parsing is load-bearing), then chunk-walk + parse them with the
    pure-stdlib codec (`functions/wav.py`) and report sample count /
    parsed rate / integer peak / exact sum of squares / PCM digest. The
    oracle recomputes the same stats straight from the sample
    DEFINITION, so a codec regression (chunk walk, header offsets,
    endianness) breaks the value hash — the audio half of the media
    stand-in retires for uncompressed formats."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_audio_stats(MM.value_as_wav(docs))


def o_media_audio_stats() -> str:
    n_max = MM.WAV_N_BASE + MM.WAV_N_MOD  # range upper bound covers all rows
    s = f"(doc_id * {MM.WAV_MUL_ID} + i * {MM.WAV_MUL_I}) % 65536 - 32768"
    # little-endian int16 hex: two's complement low byte then high byte
    u16 = "((s + 65536) % 65536)"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST({MM.WAV_N_BASE} + doc_id % {MM.WAV_N_MOD} AS BIGINT) AS n_samples,
         CAST({MM.WAV_RATE_BASE} + (doc_id % 3) * {MM.WAV_RATE_STEP} AS INT)
           AS sample_rate
  FROM documents
),
smp AS (
  SELECT b.doc_id, r.i, {s} AS s
  FROM base b CROSS JOIN range(0, {n_max}) r(i)
  WHERE r.i < b.n_samples
),
agg AS (
  SELECT doc_id,
         CAST(max(abs(s)) AS INT) AS peak,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         md5(string_agg(printf('%02x%02x',
                               CAST({u16} % 256 AS INT),
                               CAST({u16} // 256 AS INT)),
                        '' ORDER BY i)) AS pcm_md5
  FROM smp GROUP BY doc_id
)
SELECT base.doc_id, base.n_samples, base.sample_rate,
       agg.peak, agg.sum_sq, agg.pcm_md5
FROM base JOIN agg USING (doc_id)
"""


def q_media_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resample round trip (new round 4): decode each WAV,
    2:1 integer box decimate (unsigned-domain floor mean — portable
    across engines, see `media.media_audio_resample`), re-encode at the
    halved rate, decode again, report stats. The oracle computes the
    identical decimation straight from the closed-form sample
    definition."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_audio_resample(MM.value_as_wav(docs), factor=2)


def o_media_audio_resample(factor: int = 2) -> str:
    n_out_max = (MM.WAV_N_BASE + MM.WAV_N_MOD) // factor + 1
    m = lambda i: f"((doc_id * {MM.WAV_MUL_ID} + ({i}) * {MM.WAV_MUL_I}) % 65536)"  # noqa: E731
    # unsigned box mean of the block, back to signed
    s = (
        "("
        + " + ".join(m(f"{factor} * r.j + {t}") for t in range(factor))
        + f") // {factor} - 32768"
    )
    u16 = "((s + 65536) % 65536)"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(({MM.WAV_N_BASE} + doc_id % {MM.WAV_N_MOD}) // {factor} AS BIGINT)
           AS n_out,
         CAST(({MM.WAV_RATE_BASE} + (doc_id % 3) * {MM.WAV_RATE_STEP}) // {factor}
           AS INT) AS out_rate
  FROM documents
),
smp AS (
  SELECT b.doc_id, r.j, {s} AS s
  FROM base b CROSS JOIN range(0, {n_out_max}) r(j)
  WHERE r.j < b.n_out
),
agg AS (
  SELECT doc_id,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         md5(string_agg(printf('%02x%02x',
                               CAST({u16} % 256 AS INT),
                               CAST({u16} // 256 AS INT)),
                        '' ORDER BY j)) AS pcm_md5
  FROM smp GROUP BY doc_id
)
SELECT base.doc_id, base.n_out AS n_samples, base.out_rate AS sample_rate,
       agg.sum_sq, agg.pcm_md5
FROM base JOIN agg USING (doc_id)
"""


def q_media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end (new round 4): build genuine PNG
    payloads whose 16x16 grey pixels are an md5 chain of the text
    (`media.text_as_png`), then zlib-decompress + unfilter them with the
    pure-stdlib codec (`functions/png.py`) and report dims / pixel sum /
    pixel digest. The oracle recomputes the same stats straight from the
    pixel DEFINITION, so a codec regression (filter math, scanline
    layout, chunk parsing) breaks the value hash — this retires the
    'decode is a stand-in' marker for images."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_image_stats(MM.text_as_png(docs))


def o_media_image_stats() -> str:
    side = 16  # MM.PNG_SIDE; 16 md5 digests of 16 bytes = 256 pixels
    n_digests = side * side // 16
    n_px = side * side
    return f"""
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, {n_digests}) r(i)
  GROUP BY doc_id
),
sums AS (
  SELECT doc_id,
         CAST(sum(('0x' || substr(hexpix, CAST(2 * j + 1 AS INT), 2))::BIGINT)
              AS BIGINT) AS pixel_sum
  FROM px CROSS JOIN range(0, {n_px}) s(j)
  GROUP BY doc_id
)
SELECT px.doc_id, CAST({side} AS INT) AS width, CAST({side} AS INT) AS height,
       CAST({n_px} AS BIGINT) AS n_pixels, sums.pixel_sum,
       md5(px.hexpix) AS pixel_md5
FROM px JOIN sums USING (doc_id)
"""


def q_media_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (new round 4): decode each `text_as_png` PNG,
    2x2 box-downsample with integer-exact floor means, re-encode and
    decode again (both codec directions exercised per row), report
    resized dims / sum / digest. The oracle computes the identical
    downsample straight from the pixel definition."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_image_resize(MM.text_as_png(docs), factor=2)


def o_media_image_resize() -> str:
    def byte_at(idx_expr: str) -> str:
        return f"('0x' || substr(hexpix, 2 * ({idx_expr}) + 1, 2))::BIGINT"

    base = "32 * rc.r + 2 * cc.c"
    v = (
        "("
        + " + ".join(byte_at(f"{base} + {off}") for off in (0, 1, 16, 17))
        + ") // 4"
    )
    return f"""
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, 16) r(i)
  GROUP BY doc_id
),
rv AS (
  SELECT doc_id, rc.r AS r, cc.c AS c, {v} AS v
  FROM px CROSS JOIN range(0, 8) rc(r) CROSS JOIN range(0, 8) cc(c)
)
SELECT doc_id, CAST(8 AS INT) AS out_width, CAST(8 AS INT) AS out_height,
       CAST(sum(v) AS BIGINT) AS resized_sum,
       md5(string_agg(lpad(lower(hex(v)), 2, '0'), '' ORDER BY r, c)) AS resized_md5
FROM rv GROUP BY doc_id
"""


def q_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end-to-end (new round 5): build genuine
    JPEG payloads — real DQT/DHT/SOF/SOS markers, canonical Huffman
    entropy coding, zigzag, DPCM — whose 16x16 grey image is a 2x2 grid
    of CONSTANT 8x8 blocks valued at bytes 0-3 of md5(text)
    (`media.text_as_jpeg`), then parse + entropy-decode + dequantize +
    IDCT them with the pure-stdlib codec (`functions/jpeg.py`) and
    report dims / pixel sum / pixel digest. Constant blocks make the
    lossy DCT path bit-exact (decoded value = clamp(3*round((v-128)/3)
    + 128), never a half-integer — jpeg.py module docstring), so the
    oracle recomputes the decoded pixels straight from that integer
    definition: a codec bug anywhere in the marker/Huffman/zigzag/DPCM/
    IDCT pipeline breaks the value hash. Retires the 'JPEG is a
    stand-in' marker (SURVEY §2.12 multimodal)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_jpeg_stats(MM.text_as_jpeg(docs))


def o_media_jpeg_stats() -> str:
    # round(t/3) in pure integers: (|t|+1)//3 with the sign restored
    # (t = v-128 is never a half-multiple of 3, so no tie-break issue)
    def dec(v: str) -> str:
        return (
            f"GREATEST(0, LEAST(255, 128 + 3 * (CASE WHEN {v} >= 128 "
            f"THEN ({v} - 127) // 3 ELSE -((129 - {v}) // 3) END)))"
        )

    def hx(d: str) -> str:
        return f"lpad(lower(hex({d})), 2, '0')"

    return f"""
WITH v AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 2))::BIGINT AS v0,
         ('0x' || substr(md5(text), 3, 2))::BIGINT AS v1,
         ('0x' || substr(md5(text), 5, 2))::BIGINT AS v2,
         ('0x' || substr(md5(text), 7, 2))::BIGINT AS v3
  FROM documents
),
dec AS (
  SELECT doc_id, {dec('v0')} AS d0, {dec('v1')} AS d1,
         {dec('v2')} AS d2, {dec('v3')} AS d3
  FROM v
)
SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(256 AS BIGINT) AS n_pixels,
       CAST(64 * (d0 + d1 + d2 + d3) AS BIGINT) AS pixel_sum,
       md5(repeat(repeat({hx('d0')}, 8) || repeat({hx('d1')}, 8), 8)
           || repeat(repeat({hx('d2')}, 8) || repeat({hx('d3')}, 8), 8)) AS pixel_md5
FROM dec
"""


def q_media_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-codec reconstruction guarantee (the `approx_percentile_error`
    pattern, new round 5): full-noise 16x16 images from the md5 chain of
    the text — every pixel independent, the hardest case for a DCT
    codec — encoded then decoded through the REAL JPEG pipeline. Emits
    the original pixel sum (hash-matched against the oracle's own
    computation from the pixel definition, pinning WHAT was encoded)
    and a max-abs-reconstruction-error bound check (measured max 21 on
    the deterministic fixtures at sf0.01; bound 48) that the oracle asserts as
    constant 1."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_jpeg_roundtrip_error(docs)


def o_media_jpeg_roundtrip() -> str:
    return """
WITH px AS (
  SELECT doc_id,
         string_agg(md5(text || ':' || CAST(i AS VARCHAR)), '' ORDER BY i) AS hexpix
  FROM documents CROSS JOIN range(0, 16) r(i)
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(sum(('0x' || substr(hexpix, CAST(2 * j + 1 AS INT), 2))::BIGINT)
            AS BIGINT) AS orig_sum,
       CAST(1 AS BIGINT) AS within_bound
FROM px CROSS JOIN range(0, 256) s(j)
GROUP BY doc_id
"""


def q_media_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow execution shape (raw RecordBatches, no pandas) —
    byte-identical to the mapInPandas path, same oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_features_arrow(MM.text_as_media(docs))


def o_media_features_arrow() -> str:
    # the Arrow twin is bit-equal to the mapInPandas path by contract,
    # so it shares the expression version's oracle verbatim
    return o_media_features()


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: tile-and-truncate every payload to 64 bytes via
    mapInPandas (binary in/out), value-checked by md5."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_resize(MM.text_as_media(docs), target_bytes=64)


def o_media_resize() -> str:
    # ASCII corpus (verified): octet_length == length, so string repeat/
    # substr mirror the byte-level tile-and-truncate exactly.
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS INT) AS orig_bytes,
       md5(substr(repeat(text, CAST(ceil(64.0 / length(text)) AS INT)), 1, 64)) AS resized_md5
FROM documents
"""


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: every 2nd 64-byte frame per payload —
    one-to-many mapInPandas fan-out (the video-frame extraction shape).
    Frame/stride sized BELOW the corpus's document lengths (testdata
    docs are ~50-550 chars) so the oracle actually witnesses multi-frame
    fan-out per payload, not a degenerate one-frame-per-doc mapping."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_frame_sample(MM.text_as_media(docs), frame_bytes=64, stride=2)


def o_media_frame_sample() -> str:
    # the frame bound is derived from each payload's own length (lateral
    # range), not a fixed cap — no latent divergence if documents grow
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(t.i AS INT) AS frame_idx,
       CAST(length(substr(text, CAST(t.i AS BIGINT) * 128 + 1, 64)) AS INT) AS frame_len,
       md5(substr(text, CAST(t.i AS BIGINT) * 128 + 1, 64)) AS frame_md5
FROM documents
CROSS JOIN unnest(range(0, CAST(ceil(length(text) / 128.0) AS BIGINT))) t(i)
"""
