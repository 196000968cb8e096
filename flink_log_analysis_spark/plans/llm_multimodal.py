"""Multimodal-column plans: binary metadata and the mapInPandas
decode/resize/frame-sample plumbing.

All four plans are fully oracle-checked: the stubbed codec is
deterministic byte arithmetic (stripe means, index resample, strided
slices), which DuckDB reproduces over ``hex(encode(text))`` — byte i
of the payload is hex pair ``substring(h, 2*i+1, 2)``. Binary outputs
are projected as hex strings on BOTH sides so the value hash compares
a canonical text form of the exact bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..operators import phash as phash_ops
from ..session import read_table


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_bin = multimodal.attach_binary(docs)
    return with_bin.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha").alias("sha"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.attach_binary(docs))
    return feats.select(
        "doc_id", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (stubbed codec): fixed-shape binary out,
    projected as hex so the oracle hash covers the exact bytes."""
    docs = read_table(spark, sf_dir, "documents")
    resized = multimodal.resize_images(
        multimodal.attach_binary(docs), width=16, height=16
    )
    return resized.select(
        "doc_id", "width", "height", F.hex("content").alias("content_hex")
    )


def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (stubbed codec): row-expanding UDF,
    frames projected as hex for the oracle hash."""
    docs = read_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(
        multimodal.attach_binary(docs), n_frames=4, frame_bytes=64
    )
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


def wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stdlib WAV codec certified end-to-end: synth (closed-form
    integers) -> real encode -> Arrow boundary -> real decode -> exact
    integer stats; the oracle evaluates the closed form directly and
    never sees a WAV byte (the logpipe independent-derivation
    pattern, applied to the audio codec)."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.wav_roundtrip_stats(docs)


def bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP twin of wav_roundtrip: real stdlib encode/decode certified
    against a closed-form pixel-formula oracle (header layout, row
    order, padding, BGR<->RGB all on the line)."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.bmp_roundtrip_stats(docs)


def png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG sibling of bmp_roundtrip: real stdlib struct+zlib codec
    (chunk framing, CRCs, deflate, per-scanline filters cycling
    through all five RFC 2083 types) certified against the same
    closed-form pixel-formula oracle; pixel_match stands in for
    n_bytes because a zlib stream's length has no closed form."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.png_roundtrip_stats(docs)


ORACLE = {
    "bmp_roundtrip": f"""
        WITH dims AS (
            SELECT doc_id,
                   {multimodal.BMP_BASE_W} + doc_id % {multimodal.BMP_W_MOD}
                       AS w,
                   {multimodal.BMP_BASE_H} + doc_id % {multimodal.BMP_H_MOD}
                       AS h
            FROM documents
        ), rs AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, h - 1)) AS r
            FROM dims
        ), px AS (
            SELECT doc_id, w, h, r,
                   unnest(generate_series(0, w - 1)) AS c
            FROM rs
        ), vals AS (
            SELECT doc_id, w, h,
                   (doc_id + r * 7 + c * 13) % 256 AS rv,
                   (doc_id * 3 + r * 11 + c) % 256 AS gv,
                   (doc_id * 5 + r + c * 29) % 256 AS bv
            FROM px
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(SUM(rv) AS BIGINT) AS r_sum,
               CAST(SUM(gv) AS BIGINT) AS g_sum,
               CAST(SUM(bv) AS BIGINT) AS b_sum,
               CAST(54 + h * (((w * 3 + 3) // 4) * 4) AS INTEGER)
                   AS n_bytes
        FROM vals GROUP BY doc_id, w, h
    """,
    "png_roundtrip": f"""
        WITH dims AS (
            SELECT doc_id,
                   {multimodal.PNG_BASE_W} + doc_id % {multimodal.PNG_W_MOD}
                       AS w,
                   {multimodal.PNG_BASE_H} + doc_id % {multimodal.PNG_H_MOD}
                       AS h
            FROM documents
        ), rs AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, h - 1)) AS r
            FROM dims
        ), px AS (
            SELECT doc_id, w, h, r,
                   unnest(generate_series(0, w - 1)) AS c
            FROM rs
        ), vals AS (
            SELECT doc_id, w, h,
                   (doc_id + r * 7 + c * 13) % 256 AS rv,
                   (doc_id * 3 + r * 11 + c) % 256 AS gv,
                   (doc_id * 5 + r + c * 29) % 256 AS bv
            FROM px
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(SUM(rv) AS BIGINT) AS r_sum,
               CAST(SUM(gv) AS BIGINT) AS g_sum,
               CAST(SUM(bv) AS BIGINT) AS b_sum,
               TRUE AS pixel_match
        FROM vals GROUP BY doc_id, w, h
    """,
    "wav_roundtrip": f"""
        WITH ks AS (
            SELECT doc_id,
                   unnest(generate_series(
                       0,
                       {multimodal.WAV_BASE_SAMPLES}
                           + doc_id % {multimodal.WAV_LEN_MOD} - 1)) AS k
            FROM documents
        ), s AS (
            SELECT doc_id,
                   (doc_id * 31 + k * 17) % {multimodal.WAV_VAL_MOD}
                       - {multimodal.WAV_VAL_SHIFT} AS v
            FROM ks
        )
        SELECT doc_id,
               CAST({multimodal.WAV_RATE} AS INTEGER) AS rate,
               CAST(1 AS INTEGER) AS n_channels,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS sample_sum,
               CAST(MIN(v) AS INTEGER) AS sample_min,
               CAST(MAX(v) AS INTEGER) AS sample_max,
               CAST(44 + 2 * COUNT(*) AS INTEGER) AS n_bytes
        FROM s GROUP BY doc_id
    """,
    "binary_meta": """
        SELECT doc_id, 'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS sha
        FROM documents
    """,
    # Byte i (0-based) of the utf-8 payload is hex pair
    # substring(h, 2*i+1, 2) of h = lower(hex(encode(text))); the three
    # oracles below replay the stub codecs' byte arithmetic exactly
    # (multimodal.py decode/resample/frame-slice).
    "media_features": f"""
        WITH b AS (
            SELECT doc_id,
                   lower(hex(encode(text))) AS h,
                   octet_length(encode(text)) AS n,
                   greatest(octet_length(encode(text))
                            // {multimodal.FEATURE_DIM}, 1) AS stripe
            FROM documents
        )
        SELECT doc_id,
               CAST(n AS INTEGER) AS n_bytes,
               round(list_sum(list_transform(range(0, stripe),
                     i -> CAST('0x' || substring(h, 2*i+1, 2) AS INTEGER)))
                     / stripe / 255.0, 6) AS f0
        FROM b
    """,
    "media_resize": """
        WITH b AS (
            SELECT doc_id, lower(hex(encode(text))) AS h,
                   greatest(octet_length(encode(text)), 1) AS n
            FROM documents
        )
        SELECT doc_id, 16 AS width, 16 AS height,
               upper(array_to_string(list_transform(range(0, 256),
                     i -> substring(h, 2*((i*n)//256)+1, 2)), '')) AS content_hex
        FROM b
    """,
    "media_frames": """
        WITH b AS (
            SELECT doc_id, lower(hex(encode(text))) AS h,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        f AS (SELECT doc_id, h, n, unnest(range(0, 4)) AS frame_idx FROM b)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               upper(substring(
                   h,
                   2*least(frame_idx*greatest(n//4, 1), greatest(n-1, 0))+1,
                   2*64)) AS frame_hex
        FROM f
    """,
}

def phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashes over the real codec tier (VERDICT r14
    item 5 — operators/phash.py): closed-form synthetic image family
    -> REAL BMP encode -> Arrow boundary -> REAL decode -> integer
    block sums -> relational bit fold into a (hash_hi, hash_lo)
    64-bit block-mean hash. Every bit is an exact integer
    cross-multiplication, so the oracle derives the hashes from the
    pixel formula alone — a hash match certifies codec round-trip,
    grid bucketing, and the bit fold end-to-end."""
    docs = read_table(spark, sf_dir, "documents")
    return phash_ops.phash_signatures(docs.select("doc_id"))


def phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate pairs (Hamming <= PH_MAX_DIST) via
    the pigeonhole chunk join over the signatures — the image member
    of the dedup family (the simhash banding shape: candidates from
    4 equi-joins on 16-bit chunks, one bit_count(xor) verify per
    candidate, never all-pairs). The synthetic family guarantees
    both populations: 4 brightness/patch variants per group
    (within-group Hamming ~0-4) and structurally distinct groups
    (cross-group ~32/64). The ORACLE all-pairs joins its replayed
    hashes — quadratic is an oracle's budget, never the engine's."""
    docs = read_table(spark, sf_dir, "documents")
    sig = phash_ops.phash_signatures(docs.select("doc_id"))
    return phash_ops.near_dups(sig)


_PHASH_SIG_CACHE: dict[str, str] = {}


def _phash_corpus_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing corpus's signature table (5 BIGINTs per image),
    parquet-materialized ONCE per (session, sf_dir) — the build-once
    artifact the incremental row's docstring describes, in the
    llm_dedup._corpus_index convention (parquet survives
    release_checkpoints). bench.py prebuilds it (recorded under
    "phash_corpus_sigs") so the timed row measures the steady-state
    per-batch cost: the batch's own decode+hash plus the banded
    join. Cache key is sf_dir with no content fingerprint (ADVICE
    r16): regenerating the documents table at the same path within
    one interpreter would leave this probing a stale table — fine
    for the harness (testdata is immutable per process) and the
    documented trade of the _corpus_index convention."""
    path = _PHASH_SIG_CACHE.get(sf_dir)
    if path is None:
        from ..session import shared_tmp_dir

        corpus = (
            read_table(spark, sf_dir, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") % 4 != 3)
        )
        path = shared_tmp_dir("loganalysis_phsig_")
        phash_ops.phash_signatures(corpus).write.mode(
            "overwrite"
        ).parquet(f"{path}/sigs")
        _PHASH_SIG_CACHE[sf_dir] = path
    return spark.read.parquet(f"{path}/sigs")


def phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arriving-batch perceptual matching against the STANDING
    signature index (operators/phash.py match_against_corpus) — the
    image member of the incremental-ingest family: the batch is each
    group's variant-3 image (a new edit of an existing picture, the
    realistic arrival), the corpus is everything else, and the output
    is (new, corpus, hamming) pairs within the bound — never
    batch x batch or corpus x corpus. The corpus signature table
    comes prebuilt from :func:`_phash_corpus_sigs` (5 BIGINTs per
    image — the persisted build-once artifact); each execution pays
    the batch's own decode+hash plus the banded join, the
    steady-state cost of continuous ingest. The oracle derives both
    populations' hashes from the pixel formula and all-pairs joins
    them (quadratic is an oracle's budget, not the engine's)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    batch = docs.filter(F.col("doc_id") % 4 == 3)
    return phash_ops.match_against_corpus(
        phash_ops.phash_signatures(batch),
        _phash_corpus_sigs(spark, sf_dir),
    )


ORACLE["phash_incremental"] = (
    "WITH "
    + phash_ops.signatures_sql()
    + f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                + bit_count(xor(a.hash_lo, b.hash_lo)) AS INTEGER)
               AS hamming
    FROM sig a JOIN sig b
      ON a.doc_id % 4 = 3 AND b.doc_id % 4 <> 3
    WHERE bit_count(xor(a.hash_hi, b.hash_hi))
          + bit_count(xor(a.hash_lo, b.hash_lo))
          <= {phash_ops.PH_MAX_DIST}
    """
)


def dct_phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic DCT pHash made EXACT (the documented one-batch
    swap the block-mean row promised): 63 low-frequency DCT
    coefficients of the 8x8 block-mean matrix under a fixed-point
    integer basis (cos table computed once in Python at scale 2^15
    and spliced into BOTH engines — the unigram exp-once convention,
    so libm cos divergence cannot exist), bit = coefficient > the
    63-value integer median (an order statistic — no averaging, no
    floats anywhere). The engine broadcast-joins the 4032-row
    coefficient table against the exploded block sums (partial-agg
    back to 63 coefficients, ~the decode's own row volume); the
    oracle splices the same table as VALUES. Near-dup banding over
    these hashes is the already-certified phash_near_dups machinery
    (same two-word shape)."""
    docs = read_table(spark, sf_dir, "documents")
    return phash_ops.dct_phash_signatures(docs.select("doc_id"))


ORACLE["dct_phash_signatures"] = (
    "WITH "
    + phash_ops.dct_signatures_sql()
    + " SELECT doc_id, width, height, hash_hi, hash_lo FROM dsig"
)

ORACLE["phash_signatures"] = (
    "WITH "
    + phash_ops.signatures_sql()
    + " SELECT doc_id, width, height, hash_hi, hash_lo FROM sig"
)

ORACLE["phash_near_dups"] = (
    "WITH "
    + phash_ops.signatures_sql()
    + f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                + bit_count(xor(a.hash_lo, b.hash_lo)) AS INTEGER)
               AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hash_hi, b.hash_hi))
          + bit_count(xor(a.hash_lo, b.hash_lo))
          <= {phash_ops.PH_MAX_DIST}
    """
)

QUERIES = {
    "binary_meta": binary_meta,
    "media_features": media_features,
    "media_resize": media_resize,
    "media_frames": media_frames,
    "wav_roundtrip": wav_roundtrip,
    "bmp_roundtrip": bmp_roundtrip,
    "png_roundtrip": png_roundtrip,
    "phash_signatures": phash_signatures,
    "phash_near_dups": phash_near_dups,
    "dct_phash_signatures": dct_phash_signatures,
    "phash_incremental": phash_incremental,
}
