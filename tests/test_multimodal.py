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


def test_real_decode_is_explicitly_stubbed(spark):
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(
            multimodal.attach_binary(_df(spark)), fake=False
        )


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


def test_real_codec_paths_are_stubbed(spark, sf_dir):
    import pytest
    from flink_log_analysis_spark.operators import multimodal
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(1)
    binr = multimodal.attach_binary(docs)
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(binr, fake=False)
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(binr, fake=False)
