"""Multimodal plumbing: binary columns, Arrow-batched decode stub."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import multimodal


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="x" * 1000)]
    )


def test_attach_binary_schema_and_meta(spark):
    out = multimodal.attach_binary(_df(spark))
    assert dict(out.dtypes)["content"] == "binary"
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].meta.n_bytes == 11
    assert rows[1].meta.mime == "text/plain"
    assert bytes(rows[1].content) == b"hello world"


def test_extract_features_batch_contract(spark):
    feats = multimodal.extract_features(multimodal.attach_binary(_df(spark)))
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows[1].features) == multimodal.FEATURE_DIM
    assert rows[2].n_bytes == 1000
    # deterministic stub: same input -> same features
    again = {r.doc_id: r for r in
             multimodal.extract_features(multimodal.attach_binary(_df(spark))).collect()}
    assert rows[1].features == again[1].features


def _tiny_bmp(w, h, rgb):
    return multimodal.encode_bmp([[rgb] * w for _ in range(h)])


def _tiny_wav(samples, rate=8000):
    import io
    import struct
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return bio.getvalue()


def test_bmp_codec_roundtrip():
    rows = [[(10, 20, 30), (200, 100, 50)], [(0, 0, 0), (255, 255, 255)]]
    w, h, decoded = multimodal.decode_bmp(multimodal.encode_bmp(rows))
    assert (w, h) == (2, 2)
    assert decoded == rows


def test_real_features_bmp_and_wav(spark):
    """fake=False is a REAL decode for stdlib formats: a solid-gray BMP
    yields a flat vector at gray/255, and a constant-amplitude WAV
    yields all-ones after peak normalization."""
    bmp = _tiny_bmp(8, 8, (128, 128, 128))
    wav = _tiny_wav([1000] * 64)
    df = spark.createDataFrame(
        [(1, bmp), (2, wav)], "doc_id long, content binary"
    )
    got = {r.doc_id: r.features for r in
           multimodal.extract_features(df, fake=False).collect()}
    assert got[1] == [round(128 / 255.0, 6)] * multimodal.FEATURE_DIM
    assert got[2] == [1.0] * multimodal.FEATURE_DIM


def test_real_resize_bmp_nearest_neighbor(spark):
    """fake=False resize really decodes, resamples, and re-encodes BMP."""
    red = (200, 10, 10)
    df = spark.createDataFrame(
        [(1, _tiny_bmp(8, 4, red))], "doc_id long, content binary"
    )
    [row] = multimodal.resize_images(df, width=3, height=2, fake=False).collect()
    w, h, decoded = multimodal.decode_bmp(bytes(row.content))
    assert (w, h) == (3, 2)
    assert all(px == red for r in decoded for px in r)


def test_real_decode_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        multimodal.real_media_features(b"\x89PNG\r\n" + b"0" * 64, 8)
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"not a bmp at all")


def test_resize_images_fixed_output_size(spark, sf_dir):
    from flink_log_analysis_spark.operators import multimodal
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(20)
    binr = multimodal.attach_binary(docs)
    out = multimodal.resize_images(binr, width=8, height=8).collect()
    assert len(out) == 20
    assert all(len(r.content) == 64 for r in out)
    assert all(r.width == 8 and r.height == 8 for r in out)
    # deterministic: same input -> same bytes
    again = multimodal.resize_images(binr, width=8, height=8).collect()
    assert {r.doc_id: bytes(r.content) for r in out} == \
           {r.doc_id: bytes(r.content) for r in again}


def test_sample_frames_explodes_rows(spark, sf_dir):
    from flink_log_analysis_spark.operators import multimodal
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(10)
    binr = multimodal.attach_binary(docs)
    out = multimodal.sample_frames(binr, n_frames=4, frame_bytes=16).collect()
    assert len(out) == 40
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    assert all(0 < len(r.frame) <= 16 for r in out)


def test_unsupported_real_codecs_raise(spark, sf_dir):
    """Formats beyond the stdlib codecs still fail loudly: text/plain
    payloads are neither BMP nor WAV (pillow/librosa territory), and
    real video frame sampling stays stubbed (ffmpeg territory)."""
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(1)
    binr = multimodal.attach_binary(docs)
    with pytest.raises(Exception, match="pillow|librosa"):
        multimodal.extract_features(binr, fake=False).collect()
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(binr, fake=False)


def test_wav_roundtrip_stats_match_formula(spark):
    """Real encode -> Arrow boundary -> real decode must reproduce the
    closed-form sample stats exactly."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import multimodal

    df = spark.createDataFrame([Row(doc_id=i) for i in (0, 7, 31)])
    out = {r.doc_id: r for r in multimodal.wav_roundtrip_stats(df).collect()}
    for did in (0, 7, 31):
        n = multimodal.WAV_BASE_SAMPLES + did % multimodal.WAV_LEN_MOD
        samples = [multimodal.wav_sample(did, k) for k in range(n)]
        r = out[did]
        assert r.rate == multimodal.WAV_RATE and r.n_channels == 1
        assert r.n_samples == n
        assert r.sample_sum == sum(samples)
        assert (r.sample_min, r.sample_max) == (min(samples), max(samples))
        assert r.n_bytes == 44 + 2 * n


def test_bmp_roundtrip_stats_match_formula(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import multimodal

    df = spark.createDataFrame([Row(doc_id=i) for i in (0, 5, 11)])
    out = {r.doc_id: r for r in multimodal.bmp_roundtrip_stats(df).collect()}
    for did in (0, 5, 11):
        w = multimodal.BMP_BASE_W + did % multimodal.BMP_W_MOD
        h = multimodal.BMP_BASE_H + did % multimodal.BMP_H_MOD
        px = [
            multimodal.bmp_pixel(did, r, c)
            for r in range(h)
            for c in range(w)
        ]
        rec = out[did]
        assert (rec.width, rec.height) == (w, h)
        assert rec.r_sum == sum(p[0] for p in px)
        assert rec.g_sum == sum(p[1] for p in px)
        assert rec.b_sum == sum(p[2] for p in px)
        assert rec.n_bytes == 54 + h * ((w * 3 + 3) // 4 * 4)


def test_png_codec_roundtrip_all_filters():
    """Every RFC 2083 filter type must survive encode -> decode
    bit-exactly, and nontrivial filters must actually change the
    encoded bytes (so the cycling contract isn't vacuously green)."""
    import random

    from flink_log_analysis_spark.operators import multimodal

    rng = random.Random(11)
    rows = [
        [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(7)
        ]
        for _ in range(6)
    ]
    plain = multimodal.encode_png(rows)
    for ft in range(5):
        buf = multimodal.encode_png(rows, [ft] * len(rows))
        assert multimodal.decode_png(buf) == (7, 6, rows)
        if ft:
            assert buf != plain
    # mixed filters, non-square, 1-pixel edge cases
    for w, h in ((1, 1), (1, 5), (5, 1)):
        g = [
            [(r * 31 % 256, c * 17 % 256, (r + c) % 256) for c in range(w)]
            for r in range(h)
        ]
        buf = multimodal.encode_png(g, [(r * 3) % 5 for r in range(h)])
        assert multimodal.decode_png(buf) == (w, h, g)


def test_png_codec_rejects_garbage_and_bad_crc():
    import pytest

    from flink_log_analysis_spark.operators import multimodal

    with pytest.raises(ValueError):
        multimodal.decode_png(b"not a png")
    buf = bytearray(multimodal.encode_png([[(1, 2, 3)]]))
    buf[-20] ^= 0xFF  # corrupt inside the IDAT body
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(buf))


def test_png_roundtrip_stats_match_formula(spark):
    """PNG sibling of the BMP contract: channel sums match the pixel
    formula and pixel_match certifies full filter reconstruction."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import multimodal

    df = spark.createDataFrame([Row(doc_id=i) for i in (0, 5, 13)])
    out = {r.doc_id: r for r in multimodal.png_roundtrip_stats(df).collect()}
    for did in (0, 5, 13):
        w = multimodal.PNG_BASE_W + did % multimodal.PNG_W_MOD
        h = multimodal.PNG_BASE_H + did % multimodal.PNG_H_MOD
        px = [
            multimodal.bmp_pixel(did, r, c)
            for r in range(h)
            for c in range(w)
        ]
        rec = out[did]
        assert (rec.width, rec.height) == (w, h)
        assert rec.r_sum == sum(p[0] for p in px)
        assert rec.g_sum == sum(p[1] for p in px)
        assert rec.b_sum == sum(p[2] for p in px)
        assert rec.pixel_match is True


def test_real_resize_png_nearest_neighbor(spark):
    """fake=False resize dispatches on format: a PNG payload comes back
    as a valid PNG of the target dimensions with NN-sampled pixels."""
    from flink_log_analysis_spark.operators import multimodal

    rows = [
        [((r * 37) % 256, (c * 53) % 256, (r + c) % 256) for c in range(8)]
        for r in range(4)
    ]
    png = multimodal.encode_png(rows, [(r * 2) % 5 for r in range(4)])
    df = spark.createDataFrame([(1, png)], "doc_id long, content binary")
    out = multimodal.resize_images(df, width=4, height=2, fake=False).first()
    assert (out.width, out.height) == (4, 2)
    w2, h2, got = multimodal.decode_png(bytes(out.content))
    assert (w2, h2) == (4, 2)
    exp = [[rows[(r * 4) // 2][(c * 8) // 4] for c in range(4)]
           for r in range(2)]
    assert got == exp
