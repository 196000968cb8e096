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
