"""Persisted IVF index: layout, partition-pruned reads, and identity
with the in-memory composition (operators/similarity.py
write_ivf_index / knn_ivf_persisted).

The load-bearing assertion is the PLAN one: the search's vector scan
must show a PartitionFilters entry on ``cell`` (files outside the
probed cells never enter the scan), with an unfiltered read as the
negative control — same pattern as tests/test_bucketing.py.
"""

import os

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import similarity
from flink_log_analysis_spark.session import read_table

N_CELLS = 16
K = 5


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _live(spark, path: str) -> str:
    """The index's live generation directory (pointer-resolved —
    every build stages into a uuid-unique generation since r12, so
    tests never hardcode ``{path}/vectors``)."""
    return similarity.vectors_dir(spark, path)


def _vecs(spark, path: str):
    return spark.read.parquet(_live(spark, path))


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = read_table(spark, sf_dir, "embeddings")
    similarity.write_ivf_index(emb, path, n_cells=N_CELLS, seed=42)
    return path


def test_layout_cell_partitioned(spark, index_path):
    # two-level layout: base build under ingest=base, cells below it;
    # the fresh build staged into a uuid-unique generation (never the
    # shared name 'vectors' — two concurrent builds can't collide) and
    # published it via the pointer
    live = _live(spark, index_path)
    assert os.path.basename(live).startswith("vectors-g1p")
    assert not os.path.exists(f"{index_path}/vectors")
    cells = [
        d for d in os.listdir(f"{live}/ingest=base")
        if d.startswith("cell=")
    ]
    assert len(cells) == N_CELLS


def test_meta_roundtrip(spark, index_path):
    centroids, _, ranges, n_cells = similarity.read_ivf_meta(
        spark, index_path
    )
    assert n_cells == N_CELLS
    assert len(centroids) == N_CELLS
    r = ranges.collect()[0]
    assert len(r["mn_arr"]) == len(centroids[0])


def test_search_scan_is_partition_pruned(spark, sf_dir, index_path):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    res, cells = similarity.knn_ivf_persisted(
        spark, index_path, queries, k=K, n_probe=2
    )
    # a 4-query x 2-probe batch cannot cover all 16 cells
    assert 0 < len(cells) < N_CELLS
    # the pruned scan is visible in the plan: the parquet scan node
    # carries a PartitionFilters entry over the cell column...
    filtered = _vecs(spark, index_path).filter(
        F.col("cell").isin(cells)
    )
    plan = _plan(filtered)
    assert "PartitionFilters" in plan, plan
    pf_line = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "cell" in pf_line and "[]" not in pf_line, pf_line
    # ...and the negative control (no cell predicate) shows an EMPTY
    # PartitionFilters — the pruning comes from the predicate, not
    # from the layout alone.
    unfiltered_plan = _plan(_vecs(spark, index_path))
    neg = next(
        (ln for ln in unfiltered_plan.splitlines()
         if "PartitionFilters" in ln),
        "PartitionFilters: []",
    )
    assert "[]" in neg, neg


def test_persisted_matches_inmemory(spark, sf_dir, index_path):
    """Codes on disk lose nothing: the pruned-scan search returns
    byte-identical rows to knn_ivf_quantized over the same fit."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    res, _ = similarity.knn_ivf_persisted(
        spark, index_path, queries, k=K, n_probe=2
    )
    centroids, _, _, n_cells = similarity.read_ivf_meta(spark, index_path)
    mem = similarity.knn_ivf_quantized(
        emb, queries, k=K, n_cells=n_cells, n_probe=2, centroids=centroids
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0
    assert res.count() == 4 * K


def test_append_ingests_without_refit(spark, sf_dir, tmp_path):
    """ivf_index_append: base index from part of the corpus, append
    the rest — every row indexed, appended rows land in existing cell
    partitions, and the pruned search over the appended index matches
    the in-memory composition under the SAME fit artifacts."""
    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "appendix")
    base = emb.filter(F.col("vec_id") % 5 != 3)
    incoming = emb.filter(F.col("vec_id") % 5 == 3)
    similarity.write_ivf_index(base, path, n_cells=N_CELLS, seed=42)
    similarity.ivf_index_append(spark, path, incoming)

    vecs = _vecs(spark, path)
    assert vecs.count() == emb.count()
    # no new cell directories appeared: append assigns to EXISTING
    # cells (checked across every ingest= partition of the live gen)
    live = _live(spark, path)
    cells = {
        int(d.split("=")[1])
        for ing in os.listdir(live)
        if ing.startswith("ingest=")
        for d in os.listdir(f"{live}/{ing}")
        if d.startswith("cell=")
    }
    assert cells <= set(range(N_CELLS))
    # appended ids are present and searchable
    n_inc = incoming.count()
    assert vecs.join(
        incoming.select("vec_id"), "vec_id"
    ).count() == n_inc

    queries = emb.filter(F.col("vec_id") < 4)
    res, _ = similarity.knn_ivf_persisted(
        spark, path, queries, k=K, n_probe=2
    )
    cents, _, ranges, n_cells = similarity.read_ivf_meta(spark, path)
    mem = similarity.knn_ivf_quantized(
        emb, queries, k=K, n_cells=n_cells, n_probe=2,
        centroids=cents, ranges=ranges,
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def test_ensure_index_recovers_from_torn_build(spark, monkeypatch, tmp_path):
    """A build interrupted mid-write (directories exist, no marker)
    must be torn down and rebuilt, not trusted."""
    from flink_log_analysis_spark.plans import llm_similarity as plan

    fake = str(tmp_path / "torn")
    monkeypatch.setattr(plan, "_ivf_index_path", lambda sf: fake)
    # simulate the torn state: meta dir exists but is an empty shell
    os.makedirs(f"{fake}/meta")
    path = plan._ensure_ivf_index(spark, "/root/testdata/sf0.001")
    assert path == fake
    assert os.path.exists(f"{fake}/_BUILT")
    # the rebuilt meta is readable — the wedge the guard prevents
    _, _, _, n_cells = similarity.read_ivf_meta(spark, fake)
    assert n_cells == plan.IVF_INDEX_CELLS


def test_ensure_index_prunes_stale_fingerprints(spark, monkeypatch, tmp_path):
    """r8 advisory: testdata regeneration changes the fingerprint
    suffix; superseded '{leaf}-*' sibling dirs (and their .build
    orphans) must be pruned, while same-fingerprint .build dirs and
    other-leaf dirs are left alone."""
    from flink_log_analysis_spark.plans import llm_similarity as plan

    base = tmp_path / "idx"
    base.mkdir()
    fresh = str(base / "sf0.001-aaaaaaaaaaaa")
    (base / "sf0.001-000000000000").mkdir()          # stale fingerprint
    (base / "sf0.001-000000000000.build-1").mkdir()  # stale orphan
    (base / "sf0.001-aaaaaaaaaaaa.build-7").mkdir()  # same-fp builder
    (base / "sf0.1-bbbbbbbbbbbb").mkdir()            # other leaf
    monkeypatch.setattr(plan, "_ivf_index_path", lambda sf: fresh)
    path = plan._ensure_ivf_index(spark, "/root/testdata/sf0.001")
    assert path == fresh and os.path.exists(f"{fresh}/_BUILT")
    left = sorted(os.listdir(base))
    assert "sf0.001-000000000000" not in left
    assert "sf0.001-000000000000.build-1" not in left
    assert "sf0.001-aaaaaaaaaaaa.build-7" in left
    assert "sf0.1-bbbbbbbbbbbb" in left
    # idempotent second call: marker present, nothing rebuilt or pruned
    assert plan._ensure_ivf_index(spark, "/root/testdata/sf0.001") == fresh


def test_stream_ingest_with_checkpoint_restart(spark, sf_dir, tmp_path):
    """Streaming ANN ingest (streaming/ann_ingest.py): batches drain
    through foreachBatch into the persisted index; a RESTART on the
    same checkpoint processes only new files; a replayed batch_id is
    skipped (durable markers); and the stream-final index search
    equals the in-memory composition over the full corpus under the
    same fit artifacts."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        ivf_append_batch,
        ivf_ingest_stream,
        stream_ingest_id,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(
        emb.filter(F.col("vec_id") % 5 < 3), idx, n_cells=4, seed=42
    )
    base_count = _vecs(spark, idx).count()
    inputs, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")

    def arrive(rem: int, name: str) -> None:
        emb.filter(F.col("vec_id") % 5 == rem).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{inputs}/{name}")

    def drain() -> list[int]:
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inputs)
        )
        return ivf_ingest_stream(spark, idx, stream, ckpt)

    arrive(3, "b0")
    assert drain() == [0]
    count_after_b0 = _vecs(spark, idx).count()
    assert count_after_b0 > base_count
    # restart on the same checkpoint: only the NEW file is processed
    arrive(4, "b1")
    assert drain() == [0, 1]
    total = _vecs(spark, idx).count()
    assert total == emb.count()
    # idle restart: nothing new, nothing re-appended
    assert drain() == [0, 1]
    assert _vecs(spark, idx).count() == total
    ingest = stream_ingest_id(ckpt)
    # forced replay of a committed batch id: marker-skipped, unchanged
    replayed = ivf_append_batch(
        spark, idx, emb.filter(F.col("vec_id") % 5 == 3),
        batch_id=0, ingest_id=ingest,
    )
    assert replayed is False
    assert _vecs(spark, idx).count() == total
    # replay WITHOUT the marker (crash-after-commit window): the
    # deterministic partition overwrite replaces the batch's own rows
    # — no duplicates, same total
    os.remove(f"{idx}/_ingest_commits/{ingest}-batch-0")
    assert ivf_append_batch(
        spark, idx, emb.filter(F.col("vec_id") % 5 == 3),
        batch_id=0, ingest_id=ingest,
    ) is True
    assert _vecs(spark, idx).count() == total
    assert committed_batches(idx, ingest) == [0, 1]
    # stream-final identity with the in-memory composition
    queries = emb.filter(F.col("vec_id") < 3)
    res, _ = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    cents, _, ranges, n_cells = similarity.read_ivf_meta(spark, idx)
    mem = similarity.knn_ivf_quantized(
        emb, queries, k=K, n_cells=n_cells, n_probe=2,
        centroids=cents, ranges=ranges,
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0
    # a SECOND stream into the same index restarts batch ids at 0:
    # its batch 0 is a DIFFERENT batch (different ingest id), so it
    # must neither be skipped by the first stream's marker nor
    # overwrite the first stream's partition (r9 review finding)
    other = stream_ingest_id(str(tmp_path / "ck2"))
    batch2 = emb.filter(F.col("vec_id") % 5 == 2)
    assert ivf_append_batch(
        spark, idx, batch2, batch_id=0, ingest_id=other
    ) is True
    assert (
        _vecs(spark, idx).count()
        == total + batch2.count()
    )
    assert committed_batches(idx, other) == [0]
    assert committed_batches(idx) == [0, 0, 1]


def test_compact_folds_ingests_preserving_search(spark, sf_dir, tmp_path):
    """ivf_index_compact: after >=3 streamed micro-batches the index
    holds base + 3 ingest partitions; compaction folds them into the
    base cell layout with byte-identical search results, a reduced
    file count, and the commit markers (the post-compaction replay
    guard) intact."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        ivf_ingest_stream,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(
        emb.filter(F.col("vec_id") % 5 < 2), idx, n_cells=4, seed=42
    )
    inputs, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    for i, rem in enumerate((2, 3, 4)):
        emb.filter(F.col("vec_id") % 5 == rem).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{inputs}/b{i}")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(inputs)
    )
    assert ivf_ingest_stream(spark, idx, stream, ckpt) == [0, 1, 2]
    total = _vecs(spark, idx).count()
    queries = emb.filter(F.col("vec_id") < 4)
    pre, pre_cells = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    pre_rows = sorted(map(tuple, pre.collect()))
    pre_gen = _live(spark, idx)
    ingests_before = {
        d for d in os.listdir(pre_gen) if d.startswith("ingest=")
    }
    assert len(ingests_before) == 4  # base + 3 micro-batches

    stats = similarity.ivf_index_compact(spark, idx)
    assert stats["ingests_folded"] == 4
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == total
    # manifest-pointer publish: the consolidated layout lives in the
    # next GENERATION directory and _current repoints readers (no
    # directory rename anywhere)
    live = similarity.vectors_dir(spark, idx)
    # uuid-unique staging, one generation past the base build's g1
    assert live.startswith(f"{idx}/vectors-g2p")
    # reader grace: the superseded generation SURVIVES the repoint (a
    # reader that resolved the old pointer mid-scan still completes —
    # see test_compaction_reader_grace_and_vacuum); the vacuum is the
    # deleter of record
    assert os.path.isdir(pre_gen)
    # the generation is self-contained: the meta rode along
    assert os.path.isdir(f"{live}/_meta")
    # layout folded to the base ingest only; cells unchanged
    assert {
        d
        for d in os.listdir(live)
        if d.startswith("ingest=")
    } == {"ingest=base"}
    assert spark.read.parquet(live).count() == total
    # search identity + unchanged pruning
    post, post_cells = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert sorted(map(tuple, post.collect())) == pre_rows
    assert post_cells == pre_cells
    # markers survive: a restarted stream still skips committed batches
    assert committed_batches(idx) == [0, 1, 2]
    # idempotent re-run: nothing left to fold
    again = similarity.ivf_index_compact(spark, idx)
    assert again["ingests_folded"] == 0
    assert again["files_after"] == stats["files_after"]


def test_compact_keep_ingests_exempts_active_stream(spark, sf_dir, tmp_path):
    """keep_ingests: an exempted ingest partition survives compaction
    untouched while the rest fold into base."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(
        emb.filter(F.col("vec_id") % 5 < 3), idx, n_cells=4, seed=42
    )
    similarity.ivf_index_append(
        spark, idx, emb.filter(F.col("vec_id") % 5 == 3),
        ingest_key="s1-b0",
    )
    similarity.ivf_index_append(
        spark, idx, emb.filter(F.col("vec_id") % 5 == 4),
        ingest_key="live-b0",
    )
    total = _vecs(spark, idx).count()
    stats = similarity.ivf_index_compact(
        spark, idx, keep_ingests=("live-b0",)
    )
    assert stats["ingests_folded"] == 2
    live = similarity.vectors_dir(spark, idx)
    assert {
        d for d in os.listdir(live) if d.startswith("ingest=")
    } == {"ingest=base", "ingest=live-b0"}
    assert spark.read.parquet(live).count() == total


def test_committed_batches_skips_stray_files(spark, tmp_path):
    """r9 advisory: a non-marker file in _ingest_commits (torn upload,
    editor dropping) must be skipped, not raise and break every drain."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
    )

    idx = str(tmp_path / "idx")
    d = f"{idx}/_ingest_commits"
    os.makedirs(d)
    for name in (
        "aaaa-batch-0", "aaaa-batch-2", "aaaa-batch-1.tmp~",
        "aaaa-batch-", "stray.txt", ".aaaa-batch-3.crc",
    ):
        with open(f"{d}/{name}", "w") as fh:
            fh.write("x")
    assert committed_batches(idx, "aaaa") == [0, 2]
    assert committed_batches(idx) == [0, 2]


def test_fsio_seam_roundtrip(spark, tmp_path):
    """sources/fsio: the Hadoop-FS marker seam behaves like the os
    path it replaced (write/exists/list/rename/count/delete)."""
    from flink_log_analysis_spark.sources import fsio

    root = str(tmp_path / "fs")
    fsio.write_text(f"{root}/a/m1", "ok", spark)
    assert fsio.exists(f"{root}/a/m1", spark)
    assert not fsio.exists(f"{root}/a/m2", spark)
    assert fsio.list_names(f"{root}/a", spark) == ["m1"]
    assert fsio.list_names(f"{root}/missing", spark) == []
    fsio.write_text(f"{root}/a/m2", "ok", spark)
    assert fsio.count_files(f"{root}/a", spark=spark) == 2
    assert fsio.rename(f"{root}/a", f"{root}/b", spark)
    assert sorted(fsio.list_names(f"{root}/b", spark)) == ["m1", "m2"]
    fsio.delete(f"{root}/b", spark=spark)
    assert not fsio.exists(f"{root}/b", spark)


def test_fsio_no_session_fallback(monkeypatch, tmp_path):
    """Callers without an active SparkSession (introspection in
    tests) fall back to plain os operations with identical semantics."""
    from flink_log_analysis_spark.sources import fsio

    monkeypatch.setattr(fsio, "_active", lambda: None)
    root = str(tmp_path / "fs")
    fsio.write_text(f"{root}/a/m1", "ok")
    assert fsio.exists(f"{root}/a/m1")
    assert fsio.list_names(f"{root}/a") == ["m1"]
    assert fsio.list_names(f"{root}/nope") == []
    assert fsio.count_files(root) == 1
    assert fsio.rename(f"{root}/a", f"{root}/b")
    fsio.delete(f"{root}/b")
    assert not fsio.exists(f"{root}/b")


def test_two_streams_interleaved_ingest_one_index(spark, sf_dir, tmp_path):
    """Two REAL checkpointed streams (own input dirs, own checkpoints)
    interleave availableNow drains into ONE index: batch ids restart
    at 0 per checkpoint, yet neither stream's markers skip the other's
    batches or overwrite its partitions, every ingested row is
    searchable afterwards, and the final search equals the in-memory
    composition over the full corpus (VERDICT r9 optional-depth)."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        ivf_ingest_stream,
        stream_ingest_id,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(
        emb.filter(F.col("vec_id") % 6 < 2), idx, n_cells=4, seed=42
    )

    def arrive(where: str, rem: int, name: str) -> None:
        emb.filter(F.col("vec_id") % 6 == rem).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{where}/{name}")

    def drain(inputs: str, ckpt: str) -> list[int]:
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inputs)
        )
        return ivf_ingest_stream(spark, idx, stream, ckpt)

    in_a, ck_a = str(tmp_path / "in_a"), str(tmp_path / "ck_a")
    in_b, ck_b = str(tmp_path / "in_b"), str(tmp_path / "ck_b")
    counts = [_vecs(spark, idx).count()]

    # interleaved drains: A b0, B b0, A b1, B b1 — each drain must
    # ingest its own new file (no cross-skip from the other stream's
    # markers, whose batch numbering is identical)
    arrive(in_a, 2, "b0")
    assert drain(in_a, ck_a) == [0]
    counts.append(_vecs(spark, idx).count())
    arrive(in_b, 4, "b0")
    assert drain(in_b, ck_b) == [0]
    counts.append(_vecs(spark, idx).count())
    arrive(in_a, 3, "b1")
    assert drain(in_a, ck_a) == [0, 1]
    counts.append(_vecs(spark, idx).count())
    arrive(in_b, 5, "b1")
    assert drain(in_b, ck_b) == [0, 1]
    counts.append(_vecs(spark, idx).count())
    assert counts == sorted(set(counts)), "every drain must append rows"
    assert counts[-1] == emb.count()

    # audit trail: two distinct ingest ids, each with batches [0, 1]
    id_a, id_b = stream_ingest_id(ck_a), stream_ingest_id(ck_b)
    assert id_a != id_b
    assert committed_batches(idx, id_a) == [0, 1]
    assert committed_batches(idx, id_b) == [0, 1]
    assert committed_batches(idx) == [0, 0, 1, 1]

    # both streams' rows are searchable: persisted == in-memory over
    # the FULL corpus under the same fit artifacts
    queries = emb.filter(F.col("vec_id") < 3)
    res, _ = similarity.knn_ivf_persisted(spark, idx, queries, k=K, n_probe=2)
    cents, _, ranges, n_cells = similarity.read_ivf_meta(spark, idx)
    mem = similarity.knn_ivf_quantized(
        emb, queries, k=K, n_cells=n_cells, n_probe=2,
        centroids=cents, ranges=ranges,
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def test_pq_persisted_pruned_and_matches_inmemory(spark, tmp_path):
    """The persisted IVF-PQ index: (a) meta round-trips centroids and
    codebooks exactly, (b) the search scan carries a PartitionFilters
    entry on cell (negative control: the unfiltered read shows an
    empty one), and (c) persisted results are byte-identical to the
    in-memory knn_ivf_pq composition over the same formula artifacts."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    idx = str(tmp_path / "pqidx")
    similarity.write_pq_index(corpus, idx, centers, books)
    got_cents, got_books = similarity.read_pq_meta(spark, idx)
    assert got_cents == centers and got_books == books

    queries = corpus.filter("vec_id % 32 = 0")
    res, cells = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert 0 < len(cells) < 8
    filtered = _vecs(spark, idx).filter(
        F.col("cell").isin(cells)
    )
    pf = next(
        ln for ln in _plan(filtered).splitlines()
        if "PartitionFilters" in ln
    )
    assert "cell" in pf and "[]" not in pf, pf
    neg = next(
        (ln for ln in _plan(
            _vecs(spark, idx)).splitlines()
         if "PartitionFilters" in ln),
        "PartitionFilters: []",
    )
    assert "[]" in neg, neg

    mem = similarity.knn_ivf_pq(corpus, queries, centers, books,
                                k=K, n_probe=2)
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def _small_pq_fixture(spark, tmp_path):
    """(corpus, centers, books, idx) — a small formula corpus with a
    PQ index base-built from 2/5 of it (the lifecycle tests' shared
    starting point)."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    idx = str(tmp_path / "pqidx")
    similarity.write_pq_index(
        corpus.filter(F.col("vec_id") % 5 < 2), idx, centers, books
    )
    return corpus, centers, books, idx


def test_pq_append_ingests_without_refit(spark, tmp_path):
    """pq_index_append: an incoming batch assigns to the persisted
    centroids and encodes with the persisted codebooks; after the
    remaining corpus is appended, the persisted search is
    byte-identical to the in-memory composition over the FULL corpus."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 >= 2)
    )
    live = similarity.vectors_dir(spark, idx)
    assert spark.read.parquet(live).count() == corpus.count()
    queries = corpus.filter("vec_id % 32 = 0")
    res, cells = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert 0 < len(cells) < 8
    mem = similarity.knn_ivf_pq(
        corpus, queries, centers, books, k=K, n_probe=2
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def test_pq_stream_ingest_restart_and_replay(spark, tmp_path):
    """pq_ingest_stream: the PQ index absorbs a checkpointed stream
    with the same exactly-once mechanics as the scalar index — a
    restart processes only new files, a marker-present replay is
    skipped, a marker-less replay overwrites its own partition."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        pq_append_batch,
        pq_ingest_stream,
        stream_ingest_id,
    )

    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    inputs, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")

    def arrive(rem: int, name: str) -> None:
        corpus.filter(F.col("vec_id") % 5 == rem).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{inputs}/{name}")

    def drain() -> list[int]:
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inputs)
        )
        return pq_ingest_stream(spark, idx, stream, ckpt)

    arrive(2, "b0")
    arrive(3, "b1")
    assert drain() == [0, 1]
    live = similarity.vectors_dir(spark, idx)
    after_two = spark.read.parquet(live).count()
    # restart on the same checkpoint: only the NEW file is processed
    arrive(4, "b2")
    assert drain() == [0, 1, 2]
    total = spark.read.parquet(live).count()
    assert total == corpus.count() > after_two
    ingest = stream_ingest_id(ckpt)
    # marker-present replay: skipped, unchanged
    assert pq_append_batch(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 2),
        batch_id=0, ingest_id=ingest,
    ) is False
    # marker-less replay (crash-after-commit window): deterministic
    # partition overwrite — no duplicates
    os.remove(f"{idx}/_ingest_commits/{ingest}-batch-0")
    assert pq_append_batch(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 2),
        batch_id=0, ingest_id=ingest,
    ) is True
    assert spark.read.parquet(live).count() == total
    assert committed_batches(idx, ingest) == [0, 1, 2]
    # stream-final identity with the in-memory full-corpus composition
    queries = corpus.filter("vec_id % 32 = 0")
    res, _ = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    mem = similarity.knn_ivf_pq(
        corpus, queries, centers, books, k=K, n_probe=2
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def test_pq_compact_folds_and_repoints(spark, tmp_path):
    """Compaction on the PQ layout: ingest partitions fold to one
    file per cell, the manifest pointer repoints to the next
    generation, the old generation is gone, markers survive, and the
    search is byte-identical. A post-compaction append lands in the
    LIVE generation and a second compaction advances it again."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        pq_append_batch,
        stream_ingest_id,
    )

    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    ingest = stream_ingest_id(str(tmp_path / "ck"))
    for b, rem in enumerate((2, 3, 4)):
        assert pq_append_batch(
            spark, idx, corpus.filter(F.col("vec_id") % 5 == rem),
            batch_id=b, ingest_id=ingest,
        ) is True
    total = _vecs(spark, idx).count()
    queries = corpus.filter("vec_id % 32 = 0")
    pre, pre_cells = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    pre_rows = sorted(map(tuple, pre.collect()))

    base_gen = _live(spark, idx)
    stats = similarity.ivf_index_compact(spark, idx)
    assert stats["ingests_folded"] == 4
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == total
    live = similarity.vectors_dir(spark, idx)
    assert live.startswith(f"{idx}/vectors-g2p")
    assert os.path.isdir(base_gen)  # reader grace keeps g1
    assert os.path.isdir(f"{live}/_meta")
    assert {
        d for d in os.listdir(live) if d.startswith("ingest=")
    } == {"ingest=base"}
    post, post_cells = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert sorted(map(tuple, post.collect())) == pre_rows
    assert post_cells == pre_cells
    assert committed_batches(idx, ingest) == [0, 1, 2]
    # post-compaction ingest lands in the live generation...
    assert pq_append_batch(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 0),
        batch_id=3, ingest_id=ingest,
    ) is True
    assert spark.read.parquet(live).count() > total
    # ...and the next compaction advances the generation once more;
    # the grace window (newest 1 superseded) keeps g2 and trims g1
    stats2 = similarity.ivf_index_compact(spark, idx)
    assert stats2["ingests_folded"] == 2
    live2 = similarity.vectors_dir(spark, idx)
    assert live2.startswith(f"{idx}/vectors-g3p")
    assert os.path.isdir(live) and not os.path.exists(base_gen)


def test_vectors_dir_legacy_fallback_and_generations(spark, tmp_path):
    """A legacy index without a _current pointer resolves to its
    original vectors directory; the generation sequence is
    vectors -> vectors-g1 -> vectors-g2."""
    legacy = str(tmp_path / "legacy")
    os.makedirs(f"{legacy}/vectors")
    assert similarity.vectors_dir(spark, legacy) == f"{legacy}/vectors"
    assert similarity._next_generation("vectors") == "vectors-g1"
    assert similarity._next_generation("vectors-g1") == "vectors-g2"
    assert similarity._next_generation("vectors-g9") == "vectors-g10"
    # unique staging names carry a uuid token (NOT a pid — containers
    # share low pids across hosts) and parse back to their generation
    # number regardless of the token
    uniq = similarity._next_generation("vectors", unique=True)
    assert uniq.startswith("vectors-g1p") and len(uniq) > len("vectors-g1p")
    assert uniq != similarity._next_generation("vectors", unique=True)
    assert similarity._next_generation(uniq) == "vectors-g2"
    assert similarity._next_generation("vectors-g3pabcdef12") == "vectors-g4"
    assert similarity._gen_num("vectors") == 0
    assert similarity._gen_num("vectors-g7p00ff00ff") == 7


def test_index_vacuum_removes_only_older_generations(spark, tmp_path):
    """index_vacuum: only EXACT-grammar vectors trees STRICTLY OLDER
    than the live generation are deleted — same-or-newer trees may be
    a concurrent maintainer's in-flight staging or just-published
    generation and must survive (r11 review); merely-prefixed siblings
    (vectors_backup, vectors.compact-<pid>) are never candidates (r11
    advisory — they used to parse as generation 0 and be swept); and
    grace_keep retains the newest N older generations. Markers and
    the live tree always survive; search is unchanged."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 >= 2)
    )
    queries = corpus.filter("vec_id % 32 = 0")
    pre, _ = similarity.knn_pq_persisted(spark, idx, queries, k=K, n_probe=2)
    pre_rows = sorted(map(tuple, pre.collect()))
    g1 = _live(spark, idx)  # the base build's generation (g1p<token>)
    # manufacture: a stale legacy shell (gen 0), NEWER orphans (g2 —
    # a crashed staging attempt + a concurrent maintainer's copy), and
    # non-generation siblings that merely share the name prefix
    os.makedirs(f"{idx}/vectors")
    os.makedirs(f"{idx}/vectors-g2paaaaaaaa/ingest=zzz")
    os.makedirs(f"{idx}/vectors-g2pbbbbbbbb")
    os.makedirs(f"{idx}/vectors_backup")
    os.makedirs(f"{idx}/vectors.compact-1234")
    os.makedirs(f"{idx}/_ingest_commits", exist_ok=True)
    with open(f"{idx}/_ingest_commits/aaaa-batch-0", "w") as fh:
        fh.write("ok")
    stats = similarity.index_vacuum(spark, idx)
    assert stats["live"] == os.path.basename(g1)
    # only the strictly-older EXACT-grammar tree goes
    assert stats["removed"] == ["vectors"]
    assert os.path.exists(f"{idx}/vectors-g2paaaaaaaa")  # newer: kept
    assert os.path.exists(f"{idx}/vectors_backup")       # not a generation
    assert os.path.exists(f"{idx}/vectors.compact-1234")
    # grace_keep at vacuum time retains the newest older generation
    os.makedirs(f"{idx}/vectors")  # the legacy shell reappears
    assert similarity.index_vacuum(spark, idx, grace_keep=1)[
        "removed"
    ] == []
    assert os.path.exists(f"{idx}/vectors")
    assert similarity.index_vacuum(spark, idx)["removed"] == ["vectors"]
    post, _ = similarity.knn_pq_persisted(spark, idx, queries, k=K, n_probe=2)
    assert sorted(map(tuple, post.collect())) == pre_rows
    # two compactions advance live to g3: the g2 orphans become
    # strictly older and age out (the publish's own grace trim only
    # ever keeps the newest one)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 0),
        ingest_key="late-b0",
    )
    similarity.ivf_index_compact(spark, idx)   # live -> g2p<token>
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 1),
        ingest_key="late2-b0",
    )
    similarity.ivf_index_compact(spark, idx)   # live -> g3p<token>
    live = os.path.basename(_live(spark, idx))
    assert live.startswith("vectors-g3p")
    # the second compaction's grace trim kept exactly ONE gen-2 tree
    # (same-generation ties break by name — WHICH of the manufactured
    # orphans vs the real g2 survives depends on the random uuid
    # token, so the assertion is token-agnostic); the vacuum then
    # removes that last superseded generation
    g2_left = [
        n for n in os.listdir(idx)
        if similarity._GEN_NAME_RE.fullmatch(n)
        and similarity._gen_num(n) == 2
    ]
    assert len(g2_left) == 1
    stats3 = similarity.index_vacuum(spark, idx)
    assert stats3["removed"] == g2_left
    gens_left = {
        n for n in os.listdir(idx)
        if similarity._GEN_NAME_RE.fullmatch(n)
    }
    assert gens_left == {live}
    assert os.path.exists(f"{idx}/_ingest_commits/aaaa-batch-0")
    assert os.path.exists(f"{idx}/vectors_backup")
    # (no search-identity check here: the late appends deliberately
    # re-ingested rows, which legitimately changes top-k; identity
    # after vacuum is asserted above on the unchanged corpus)


def test_compaction_reader_grace_and_vacuum(spark, tmp_path):
    """Reader grace (r11 verdict item 3): a reader that resolved the
    generation BEFORE a compaction repoints can still complete its
    scan afterwards — the publish keeps the superseded generation
    (grace_keep=1 default) and only index_vacuum deletes it, on the
    deployment's schedule. grace_keep=0 restores the immediate
    delete for throwaway single-process indexes."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 >= 2)
    )
    # a reader resolves the live generation... (the one pointer read
    # every search does)
    resolved_gen, resolved_meta = similarity._gen_and_meta(spark, idx)
    rows_at_resolve = spark.read.parquet(resolved_gen).count()
    # ...then a compaction repoints mid-scan
    stats = similarity.ivf_index_compact(spark, idx)
    assert stats["ingests_folded"] == 2
    assert similarity.vectors_dir(spark, idx) != resolved_gen
    # the pre-repoint read STILL completes: generation + meta intact
    assert spark.read.parquet(resolved_gen).count() == rows_at_resolve
    assert spark.read.parquet(resolved_meta).count() == 1
    # the vacuum is the deleter of record
    vac = similarity.index_vacuum(spark, idx)
    assert vac["removed"] == [os.path.basename(resolved_gen)]
    assert not os.path.exists(resolved_gen)
    # grace_keep=0: a rebuild-publish deletes the superseded
    # generation immediately (the pre-r12 behavior, opt-in)
    live_before = _live(spark, idx)
    similarity.write_pq_index(
        corpus, idx, centers, books, grace_keep=0
    )
    assert not os.path.exists(live_before)
    assert _live(spark, idx) != live_before


def test_append_raises_when_compaction_repoints_midflight(
    spark, tmp_path, monkeypatch
):
    """r11 advisory: a batch append resolves the live generation once
    and then writes — a compaction that repoints mid-append would
    silently strand the batch in a superseded tree. The post-write
    pointer re-check must raise instead, and the normal retry path
    (re-running the append) lands the batch in the NEW generation."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 == 2)
    )
    stale = similarity._gen_and_meta(spark, idx)
    similarity.ivf_index_compact(spark, idx)  # repoints; grace keeps old
    # simulate the race: the append resolved the OLD generation
    monkeypatch.setattr(
        similarity, "_gen_and_meta", lambda s, p: stale
    )
    batch = corpus.filter(F.col("vec_id") % 5 == 3)
    with pytest.raises(RuntimeError, match="raced a compaction"):
        similarity.pq_index_append(spark, idx, batch, ingest_key="s-b0")
    monkeypatch.undo()
    # here the compaction ran BEFORE the racing write (it never saw
    # the batch — recovery case (a) in _assert_batch_visible), so a
    # re-run is the correct recovery and must not duplicate rows
    live = _live(spark, idx)
    before = spark.read.parquet(live).count()
    similarity.pq_index_append(spark, idx, batch, ingest_key="s-b0")
    assert spark.read.parquet(live).count() == before + batch.count()


def test_index_tuning_record_roundtrip_and_default(spark, sf_dir, tmp_path):
    """tune_index_n_probe records the tuned depth at {path}/_tuning;
    knn_ivf_persisted(n_probe=None) searches at that default and a
    never-tuned index falls back to 2. The tuner resolves centroids
    from the index's own meta, so its answer equals the in-memory
    tuner given the same constants."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.write_ivf_index(emb, idx, n_cells=4, seed=42)
    queries = emb.filter(F.col("vec_id") < 4)
    # untuned: None falls back to n_probe=2
    assert similarity.index_tuned_n_probe(spark, idx) is None
    r_none, _ = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=None
    )
    r_two, _ = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert sorted(map(tuple, r_none.collect())) == sorted(
        map(tuple, r_two.collect())
    )
    # tune against the persisted index == in-memory tuner on its meta
    p, hits, n_truth = similarity.tune_index_n_probe(
        spark, idx, emb, queries, k=K, target_recall=0.9
    )
    cents, _, _, _ = similarity.read_ivf_meta(spark, idx)
    assert (p, hits, n_truth) == similarity.tune_n_probe(
        emb, queries, cents, k=K, target_recall=0.9
    )
    assert similarity.index_tuned_n_probe(spark, idx) == p
    assert 1 <= p <= 4 and hits <= n_truth == len(queries.collect()) * K
    # the default-depth search now probes at the tuned depth
    r_tuned, _ = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=None
    )
    r_explicit, _ = similarity.knn_ivf_persisted(
        spark, idx, queries, k=K, n_probe=p
    )
    assert sorted(map(tuple, r_tuned.collect())) == sorted(
        map(tuple, r_explicit.collect())
    )
    # the record survives compaction (index-level, not generational)
    similarity.ivf_index_append(
        spark, idx, emb.limit(0), ingest_key="noop-b0"
    )
    assert similarity.index_tuned_n_probe(spark, idx) == p
    # k-guard: a depth tuned for k=K must not default a different-k
    # search (recall@k curves differ by k) — the guarded read returns
    # None and the search falls back to 2
    assert similarity.index_tuned_n_probe(spark, idx, k=K) == p
    assert similarity.index_tuned_n_probe(spark, idx, k=K + 7) is None
    # rebuild invalidation: a refit publishes new centroids, so the
    # stale record is deleted with the superseded generation
    similarity.write_ivf_index(emb, idx, n_cells=4, seed=99)
    assert similarity.index_tuned_n_probe(spark, idx) is None


def test_pq_persisted_rerank_recovers_full_precision(spark, tmp_path):
    """The persisted ADC-shortlist + exact-re-rank composition at a
    CANDIDATE-COVERING shortlist equals the full-precision IVF search
    over the same corpus/centers/probe — the local pin behind
    knn_pq_persisted_rerank's verbatim reuse of knn_ivf's value-exact
    oracle. Also pins that an UNDERSIZED shortlist is what breaks the
    equality guarantee's premise (its result is a subset-quality
    approximation, not necessarily equal)."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    idx = str(tmp_path / "pqidx")
    similarity.write_pq_index(corpus, idx, centers, books)
    queries = corpus.filter("vec_id % 32 = 0")
    full = similarity.knn_ivf(
        corpus, queries, k=K, n_probe=2, centroids=centers
    )
    # covering shortlist: nearest-center occupancy can exceed the
    # construction's per-cluster width, so size with margin and
    # verify the coverage premise against the index's own occupancy
    occ = (
        spark.read.parquet(similarity.vectors_dir(spark, idx))
        .groupBy("cell").count().agg(F.max("count")).first()[0]
    )
    covering = 4 * 16 * 2
    assert covering >= 2 * occ  # 2 probes of the fullest cell fit
    res, cells = similarity.knn_pq_persisted_rerank(
        spark, idx, corpus, queries, k=K, n_probe=2, shortlist=covering
    )
    assert 0 < len(cells) < 8
    assert res.exceptAll(full).count() == 0
    assert full.exceptAll(res).count() == 0
    # undersized shortlist: still k rows per query, but equality with
    # the full-precision search is no longer guaranteed (and with
    # shortlist=k the re-rank can only reorder the ADC top-k, which
    # measurably diverges on this geometry)
    tiny, _ = similarity.knn_pq_persisted_rerank(
        spark, idx, corpus, queries, k=K, n_probe=2, shortlist=K
    )
    assert tiny.groupBy("query_id").count().agg(
        F.max("count")
    ).first()[0] == K


def test_rerank_raises_on_noncovering_corpus(spark, tmp_path):
    """knn_pq_persisted_rerank's corpus-coverage contract (r12
    advisory): a shortlisted neighbor the caller's corpus cannot
    supply raises loudly instead of being silently dropped from the
    final top-k (an inner join used to shrink the result quietly —
    easy to hit when the index has appended batches the caller's
    corpus snapshot predates)."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    # the index holds vec_id % 5 < 2; hand the re-rank a corpus
    # missing most of those ids
    stale = corpus.filter(F.col("vec_id") % 5 == 0)
    queries = corpus.filter("vec_id % 32 = 0")
    res, _ = similarity.knn_pq_persisted_rerank(
        spark, idx, stale, queries, k=K, n_probe=2, shortlist=40
    )
    with pytest.raises(Exception, match="absent from the supplied corpus"):
        res.collect()
    # the covering corpus still succeeds through the guarded path
    ok, _ = similarity.knn_pq_persisted_rerank(
        spark, idx, corpus, queries, k=K, n_probe=2, shortlist=40
    )
    assert ok.count() > 0


def test_legacy_meta_survives_upgrade_grace(spark, tmp_path):
    """Upgrading a legacy (pre-pointer) index keeps its root meta for
    the reader-grace window (r12 advisory): a legacy reader that
    resolved _gen_and_meta just before the repoint reads BOTH its
    codes tree and {path}/meta after the publish returns; the vacuum
    sweeps the pair together."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    import shutil

    legacy = str(tmp_path / "legacy_idx")
    os.makedirs(legacy)
    live = _live(spark, idx)
    shutil.copytree(live, f"{legacy}/vectors")
    shutil.move(f"{legacy}/vectors/_meta", f"{legacy}/meta")
    # a legacy reader resolves the fallback pair
    gen, meta = similarity._gen_and_meta(spark, legacy)
    assert gen == f"{legacy}/vectors" and meta == f"{legacy}/meta"
    queries = corpus.filter("vec_id % 32 = 0")
    pre, _ = similarity.knn_pq_persisted(spark, legacy, queries, k=K)
    pre_n = pre.count()  # materialize NOW — the legacy files go away
    assert pre_n > 0
    # the upgrade rebuild (default grace_keep=1) supersedes the
    # legacy generation but keeps tree AND root meta for grace
    similarity.write_pq_index(corpus, legacy, centers, books)
    assert os.path.basename(_live(spark, legacy)).startswith("vectors-g1p")
    assert os.path.exists(f"{legacy}/vectors")
    assert os.path.exists(f"{legacy}/meta")
    # the grace reader's pair still reads end-to-end
    c2, b2 = similarity.read_pq_meta(spark, legacy, meta_path=meta)
    assert c2 == centers and b2 == books
    assert spark.read.parquet(gen).count() > 0
    # the vacuum is the deleter of record for BOTH
    stats = similarity.index_vacuum(spark, legacy)
    assert "vectors" in stats["removed"]
    assert not os.path.exists(f"{legacy}/vectors")
    assert not os.path.exists(f"{legacy}/meta")
    # new readers are unaffected throughout
    post, _ = similarity.knn_pq_persisted(spark, legacy, queries, k=K)
    assert post.count() == pre_n


def test_vacuum_sweeps_orphaned_legacy_meta(spark, tmp_path):
    """A root meta whose legacy tree is already gone (an older
    publisher's half-upgrade) is swept by the vacuum once past the
    grace deadline — and only then (grace_keep>0 leaves it)."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    from flink_log_analysis_spark.sources import fsio

    fsio.write_text(f"{idx}/meta_probe", "x", spark)  # sibling control
    with open(f"{idx}/meta", "w") as fh:
        fh.write("orphan")
    kept = similarity.index_vacuum(spark, idx, grace_keep=1)
    assert os.path.exists(f"{idx}/meta")
    assert "meta" not in kept["removed"]
    swept = similarity.index_vacuum(spark, idx, grace_keep=0)
    assert "meta" in swept["removed"]
    assert not os.path.exists(f"{idx}/meta")
    assert os.path.exists(f"{idx}/meta_probe")


def test_tuning_deleted_before_repoint(spark, tmp_path, monkeypatch):
    """The _tuning record is deleted BEFORE the pointer swap (r12
    advisory): a publish that crashes at the repoint leaves NO state
    in which a new pointer could pair with a depth tuned for the old
    geometry. Simulated by failing the pointer PUT itself — after the
    failure the old generation is still live and the tuning record is
    already gone (the crash costs a re-tune, never silent recall
    degradation)."""
    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    from flink_log_analysis_spark.sources import fsio

    fsio.write_text(
        f"{idx}/{similarity.TUNING_FILE}",
        "n_probe=3\nk=5\ntarget_permille=950\nhits=1\nn_truth=1",
        spark,
    )
    old_live = _live(spark, idx)
    real_write = fsio.write_text

    def failing_write(path, text, spark=None):
        if path.endswith(similarity.CURRENT_POINTER):
            raise RuntimeError("simulated crash at the pointer PUT")
        return real_write(path, text, spark)

    monkeypatch.setattr(
        "flink_log_analysis_spark.operators.similarity.fsio.write_text",
        failing_write,
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        similarity.write_pq_index(corpus, idx, centers, books)
    monkeypatch.undo()
    # old generation still live; stale tuning record already deleted
    assert _live(spark, idx) == old_live
    assert not os.path.exists(f"{idx}/{similarity.TUNING_FILE}")
    assert similarity.index_tuned_n_probe(spark, idx) is None


def test_lifecycle_torture_three_maintainers_one_pointer(
    spark, tmp_path, monkeypatch
):
    """Composes ALL the lifecycle guards on ONE pointer (r12 optional
    depth — the per-pair guards exercised together): a checkpointed
    stream ingest interrupted by a compaction (the restart must skip
    the folded batch via its marker and deliver the next batch into
    the NEW generation), a batch append racing that compaction into
    the post-write liveness guard and recovering via case (a), a
    grace reader that resolved pre-compaction completing AFTER the
    publish, a concurrent maintainer's newer orphan staging surviving
    every sweep, and the vacuum as the grace deadline — with the
    search byte-identical to the in-memory composition at the end."""
    from flink_log_analysis_spark.streaming.ann_ingest import (
        committed_batches,
        pq_ingest_stream,
        stream_ingest_id,
    )

    corpus, centers, books, idx = _small_pq_fixture(spark, tmp_path)
    inputs, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")

    def arrive(rem: int, name: str) -> None:
        corpus.filter(F.col("vec_id") % 5 == rem).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{inputs}/{name}")

    def drain() -> list[int]:
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inputs)
        )
        return pq_ingest_stream(spark, idx, stream, ckpt)

    # stream delivers its first micro-batch, then pauses (checkpoint)
    arrive(2, "b0")
    assert drain() == [0]
    # a reader and a doomed append both resolve the pre-compaction pair
    grace_gen, grace_meta = similarity._gen_and_meta(spark, idx)
    stale = (grace_gen, grace_meta)
    # maintainer 1: compaction folds base + stream batch, repoints
    stats = similarity.ivf_index_compact(spark, idx)  # grace_keep=1
    assert stats["ingests_folded"] == 2
    live = _live(spark, idx)
    assert live != grace_gen
    # the grace reader completes AFTER the publish: codes AND meta
    assert spark.read.parquet(grace_gen).count() > 0
    c_g, b_g = similarity.read_pq_meta(spark, idx, meta_path=grace_meta)
    assert c_g == centers and b_g == books
    # maintainer 2: an append that resolved the OLD generation races
    # the compaction — the post-write liveness guard must raise
    monkeypatch.setattr(similarity, "_gen_and_meta", lambda s, p: stale)
    batch3 = corpus.filter(F.col("vec_id") % 5 == 3)
    with pytest.raises(RuntimeError, match="raced a compaction"):
        similarity.pq_index_append(spark, idx, batch3, ingest_key="r-b0")
    monkeypatch.undo()
    # recovery case (a): the compaction never saw the raced batch, so
    # a plain re-run lands it in the LIVE generation, no duplicates
    before = spark.read.parquet(live).count()
    similarity.pq_index_append(spark, idx, batch3, ingest_key="r-b0")
    assert spark.read.parquet(live).count() == before + batch3.count()
    # a concurrent maintainer's NEWER staging must survive every sweep
    os.makedirs(f"{idx}/vectors-g9pdeadbeef")
    # maintainer 3: the vacuum is the grace deadline — the superseded
    # generation (and only it) goes; live + newer orphan survive
    swept = similarity.index_vacuum(spark, idx)
    assert swept["removed"] == [os.path.basename(grace_gen)]
    assert not os.path.exists(grace_gen)
    assert os.path.exists(f"{idx}/vectors-g9pdeadbeef")
    assert _live(spark, idx) == live
    # the stream restarts across the fold: batch 0's marker makes the
    # folded batch a skip, batch 1 lands in the live generation
    arrive(4, "b1")
    assert drain() == [0, 1]
    ingest = stream_ingest_id(ckpt)
    assert committed_batches(idx, ingest) == [0, 1]
    assert spark.read.parquet(_live(spark, idx)).count() == corpus.count()
    # end-state identity: the persisted search over the tortured index
    # equals the in-memory composition over the full corpus, bit-equal
    queries = corpus.filter("vec_id % 32 = 0")
    res, _ = similarity.knn_pq_persisted(spark, idx, queries, k=K, n_probe=2)
    mem = similarity.knn_ivf_pq(
        corpus, queries, centers, books, k=K, n_probe=2
    )
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0


def test_residual_pq_index_full_lifecycle(spark, tmp_path):
    """The residual codec as a PERSISTED index property: the flag
    rides the generation meta (read_pq_codec; pre-flag indexes read as
    raw), search dispatches to residual scoring off it, appends encode
    with the index's own codec, compaction carries the flag forward,
    and the rerank composition recovers the full-precision IVF answer
    over a residual index — at every stage byte-identical to the
    in-memory residual composition."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    idx = str(tmp_path / "respq")
    similarity.write_pq_index(
        corpus.filter(F.col("vec_id") % 5 < 2), idx, centers, books,
        residual=True,
    )
    c_r, b_r, flag = similarity.read_pq_codec(spark, idx)
    assert flag is True and c_r == centers and b_r == books
    # append encodes with the index's codec (no caller argument)
    similarity.pq_index_append(
        spark, idx, corpus.filter(F.col("vec_id") % 5 >= 2)
    )
    queries = corpus.filter("vec_id % 32 = 0")
    mem = similarity.knn_ivf_pq_residual(
        corpus, queries, centers, books, k=K, n_probe=2
    )
    res, cells = similarity.knn_pq_persisted(
        spark, idx, queries, k=K, n_probe=2
    )
    assert 0 < len(cells) < 8
    assert res.exceptAll(mem).count() == 0
    assert mem.exceptAll(res).count() == 0
    # the residual codes genuinely differ from raw codes at the same
    # fit artifacts — the dispatch is load-bearing, not cosmetic
    raw_idx = str(tmp_path / "rawpq")
    similarity.write_pq_index(corpus, raw_idx, centers, books)
    assert similarity.read_pq_codec(spark, raw_idx)[2] is False
    raw_codes = spark.read.parquet(_live(spark, raw_idx)).select(
        "vec_id", "pq_code"
    )
    res_codes = spark.read.parquet(_live(spark, idx)).select(
        "vec_id", "pq_code"
    )
    assert raw_codes.exceptAll(res_codes).count() > 0
    # compaction folds ingests and carries the codec flag forward
    stats = similarity.ivf_index_compact(spark, idx)
    assert stats["ingests_folded"] == 2
    assert similarity.read_pq_codec(spark, idx)[2] is True
    res2, _ = similarity.knn_pq_persisted(spark, idx, queries, k=K,
                                          n_probe=2)
    assert res2.exceptAll(mem).count() == 0
    assert mem.exceptAll(res2).count() == 0
    # the rerank composition over a RESIDUAL index still recovers the
    # full-precision IVF search (the retention argument is codec-
    # independent once the shortlist covers the probed candidates)
    full = similarity.knn_ivf(
        corpus, queries, k=K, n_probe=2, centroids=centers
    )
    rr, _ = similarity.knn_pq_persisted_rerank(
        spark, idx, corpus, queries, k=K, n_probe=2, shortlist=64
    )
    assert rr.exceptAll(full).count() == 0
    assert full.exceptAll(rr).count() == 0


def test_build_index_once_prunes_versions_not_qualified_siblings(tmp_path):
    """r14: the stale-sibling pruner must remove only PURE version/
    fingerprint successors of its own leaf ("...-v3" when building
    "...-v4", and their .build orphans) — never a dash-qualified
    sibling root like "...-res-v4", which is a DIFFERENT index whose
    deletion forces its row's rebuild into whatever timed window runs
    it next (found live: the raw manycell-PQ build deleted the
    residual index on every build)."""
    import os

    from flink_log_analysis_spark.plans.llm_similarity import (
        _build_index_once,
    )

    base = tmp_path / "roots"
    base.mkdir()
    stale = base / "c64d8-m4cw16-v3"
    stale.mkdir()
    (stale / "_BUILT").write_text("ok")
    stale_orphan = base / "c64d8-m4cw16-v3.build-999"
    stale_orphan.mkdir()
    residual = base / "c64d8-m4cw16-res-v4"
    residual.mkdir()
    (residual / "_BUILT").write_text("ok")
    (residual / "data").write_text("payload")

    target = str(base / "c64d8-m4cw16-v4")
    _build_index_once(
        target, "_BUILT", lambda tmp: os.makedirs(tmp, exist_ok=True)
    )
    assert os.path.exists(f"{target}/_BUILT")
    assert not stale.exists()          # pure stale version pruned
    assert not stale_orphan.exists()   # its build orphan pruned
    assert residual.exists()           # qualified sibling SPARED
    assert (residual / "data").read_text() == "payload"
    # idempotent: marker hit returns early, nothing else touched
    _build_index_once(
        target, "_BUILT", lambda tmp: (_ for _ in ()).throw(AssertionError)
    )
    assert residual.exists()
