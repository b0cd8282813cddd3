"""Multimodal-column queries: binary payload synthesis, decode,
feature extraction, and frame sampling over the documents table.

The payloads are deterministic (fake codec, operators/multimodal.py),
so every mapInPandas pipeline here has an exact SQL oracle that
recomputes the same bytes arithmetically — the Arrow plumbing is
what's actually under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_images,
    grouped_demean,
    payload_byte_stats,
    resize_images,
    sample_frames,
    synthesize_images,
)
from ..sources.readers import read_parquet_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


def _payload(docs: DataFrame) -> DataFrame:
    return docs.withColumn("payload", F.encode("text", "UTF-8"))


# ---------------------------------------------------------------------------
# Synthesize → decode: binary payload with (width, height) header and
# deterministic pixels; the oracle recomputes pixel i = (i*31+doc_id)%256.
@query(
    "multimodal_image_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               16 + n_chars % 32 AS width,
               8 + doc_id % 16 AS height
        FROM documents
    ), p AS (
        SELECT doc_id, width, height, width * height AS n_pixels,
               list_transform(generate_series(0, width * height - 1),
                              i -> (i * 31 + doc_id) % 256) AS px
        FROM d
    )
    SELECT doc_id, width, height, n_pixels,
           CAST(list_sum(px) AS DOUBLE) / n_pixels AS mean_pixel,
           list_max(px) AS max_pixel
    FROM p
    ORDER BY doc_id
    """,
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return decode_images(synthesize_images(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Byte statistics over a real binary column (text bytes as payload;
# the fixture text is pure printable ASCII, so the oracle's per-char
# ascii() equals the UTF-8 byte value).
@query(
    "multimodal_payload_bytes",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        j -> ascii(substr(text, j, 1)))) AS BIGINT)
               AS byte_sum,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        j -> ascii(substr(text, j, 1)))) AS DOUBLE)
               / length(text) AS mean_byte
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_payload_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _payload(_t(spark, sf_dir, "documents"))
    return payload_byte_stats(docs, "doc_id", "payload").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Nearest-neighbor resize to 8×8: output pixel (x,y) samples source
# flat index (y*h//8)*w + (x*w//8); the oracle replays the same
# index arithmetic over the synthetic pixel function.
@query(
    "multimodal_resize_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               16 + n_chars % 32 AS w,
               8 + doc_id % 16 AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(((((y * h) // 8) * w + ((x * w) // 8)) * 31 + doc_id) % 256)
                AS DOUBLE) / 64 AS mean_pixel
    FROM d,
         generate_series(0, 7) gy(y),
         generate_series(0, 7) gx(x)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    resized = resize_images(synthesize_images(docs), out_w=8, out_h=8)
    return resized.select("doc_id", "width", "height", "mean_pixel").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-user demeaned event values. The mean
# is computed in floored micro-units so both engines derive the same
# double (floor semantics agree; round's tie-breaking does not).
@query(
    "grouped_demean_events",
    oracle="""
    WITH m AS (
        SELECT user_id,
               CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1000000 AS mean_v
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.value, e.value - m.mean_v AS demeaned
    FROM events e JOIN m ON e.user_id = m.user_id
    ORDER BY e.user_id, e.value
    """,
)
def grouped_demean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    return grouped_demean(ev, "user_id", "value").orderBy("user_id", "value")


# ---------------------------------------------------------------------------
# Video-shaped frame sampling: 64-byte frames, keep every 4th (incl.
# the trailing partial frame); oracle selects the same byte ranges.
@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_frames,
           CAST(ceil(ceil(length(text) / 64.0) / 4.0) AS BIGINT) AS n_sampled,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                j -> CASE WHEN ((j - 1) // 64) % 4 = 0
                          THEN ascii(substr(text, j, 1)) ELSE 0 END)) AS BIGINT)
               AS sampled_byte_sum
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _payload(_t(spark, sf_dir, "documents"))
    return sample_frames(
        docs, "doc_id", "payload", frame_bytes=64, every=4
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Audio modality: synthesize → features. The oracle recomputes sample
# i = ((doc_id*31 + i*17) % 256) - 128 arithmetically; energy/peak are
# integer-exact, duration is one exact division.
@query(
    "multimodal_audio_features",
    oracle="""
    WITH d AS (
        SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    ), s AS (
        SELECT doc_id, n,
               list_transform(generate_series(0, n - 1),
                              i -> ((doc_id * 31 + i * 17) % 256) - 128) AS w
        FROM d
    )
    SELECT doc_id,
           8000 AS sample_rate,
           CAST(n AS INTEGER) AS n_samples,
           CAST(n AS DOUBLE) / 8000 AS duration_s,
           CAST(list_sum(list_transform(w, x -> x * x)) AS DOUBLE) / n AS energy,
           CAST(list_max(list_transform(w, x -> abs(x))) AS INTEGER) AS peak,
           CAST(len(list_filter(generate_series(2, n),
                                i -> (w[i - 1] < 0) <> (w[i] < 0))) AS BIGINT)
               AS zero_crossings
    FROM s
    ORDER BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_features, synthesize_audio

    docs = _t(spark, sf_dir, "documents")
    return audio_features(synthesize_audio(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Content-hash dedup over BINARY payloads — the media twin of
# dedup_exact_documents: identical images/audio re-crawled under
# different ids collapse on their byte fingerprint (what production
# media pipelines do before any decode). md5 runs JVM-side over the
# binary column; one fingerprint shuffle, keep = min id per digest.
# The fixture's payload is the text bytes, which carry real duplicate
# structure; exactness rides DuckDB's identical md5-over-BLOB.
@query(
    "multimodal_dedup_payloads",
    oracle="""
    WITH p AS (
      -- DuckDB's md5(VARCHAR) hashes the string's UTF-8 bytes — the
      -- same bytes Spark's md5(encode(text,'UTF-8')) sees
      SELECT doc_id, md5(text) AS digest,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    firsts AS (
      SELECT digest, MIN(doc_id) AS keeper FROM p GROUP BY digest
    )
    SELECT p.doc_id, p.digest,
           CAST(p.n_bytes AS BIGINT) AS n_bytes,
           (p.doc_id = f.keeper) AS kept
    FROM p JOIN firsts f USING (digest)
    ORDER BY p.doc_id
    """,
)
def multimodal_dedup_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _payload(_t(spark, sf_dir, "documents"))
    p = docs.select(
        "doc_id",
        F.md5(F.col("payload")).alias("digest"),
        F.length(F.col("payload")).cast("bigint").alias("n_bytes"),
    )
    firsts = p.groupBy("digest").agg(F.min("doc_id").alias("keeper"))
    return (
        p.join(firsts, "digest")
        .select(
            "doc_id",
            "digest",
            "n_bytes",
            (F.col("doc_id") == F.col("keeper")).alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Perceptual near-dup pairs over the synthetic image corpus (r7):
# dHash (9x8 nearest-sample grid, adjacent-comparison bits) with
# 4-chunk pigeonhole blocking — the image twin of the SimHash text
# path, catching re-encodes/perturbations that byte-level md5 dedup
# (multimodal_dedup_payloads) misses. The oracle replays the fake
# codec's pixel arithmetic, the exact grid/bit construction (two
# signed 32-bit halves), and brute-force Hamming <= 3 pairing, so
# the hash pins the whole perceptual pipeline.
@query(
    "multimodal_phash_neardup",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               16 + n_chars % 32 AS w,
               8 + doc_id % 16 AS h
        FROM documents
    ),
    g AS (
        SELECT d.doc_id, r.r, c.c,
               ((((r.r * d.h // 8) * d.w + (c.c * d.w // 9)) * 31
                 + d.doc_id) % 256) AS px
        FROM d, generate_series(0, 7) r(r), generate_series(0, 8) c(c)
    ),
    bits AS (
        SELECT l.doc_id, l.r * 8 + l.c AS b
        FROM g l JOIN g rt
          ON rt.doc_id = l.doc_id AND rt.r = l.r AND rt.c = l.c + 1
        WHERE l.c <= 7 AND l.px < rt.px
    ),
    hashes AS (
        SELECT d.doc_id,
               CAST(coalesce(SUM(CASE WHEN b >= 32
                                      THEN (1::BIGINT << (b - 32)) END), 0)
                    AS BIGINT) AS hi,
               CAST(coalesce(SUM(CASE WHEN b < 32
                                      THEN (1::BIGINT << b) END), 0)
                    AS BIGINT) AS lo
        FROM d LEFT JOIN bits USING (doc_id)
        GROUP BY d.doc_id
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    ) t
    WHERE hamming <= 3
    ORDER BY id_a, id_b
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import dhash_images, dhash_neardup_pairs

    docs = _t(spark, sf_dir, "documents")
    imgs = synthesize_images(docs)
    return dhash_neardup_pairs(dhash_images(imgs), max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# Video near-dup by TEMPORAL fingerprint matching (r7): per-frame
# 1-D dHash signatures (9 sampled bytes, adjacent comparisons),
# 3-frame shingles, stop-gram frequency cap, pairs sharing >= 2
# distinct shingles. Sequence structure — not per-frame similarity —
# is what identifies a re-encoded copy; the oracle replays frame
# slicing, position sampling, bit packing, the document-frequency
# cap, and the pair count byte-for-byte on the text-bytes payloads.
@query(
    "multimodal_video_neardup",
    oracle="""
    WITH f AS (
        SELECT d.doc_id, d.text, g.f AS fidx, g.f * 64 AS f0,
               least(64, length(d.text) - g.f * 64) AS L
        FROM documents d,
             LATERAL unnest(range(0,
                 CAST(ceil(length(d.text) / 64.0) AS BIGINT))) AS g(f)
    ),
    sig AS (
        SELECT doc_id, fidx,
               CAST(list_sum(list_transform(generate_series(0, 7),
                   c -> CASE WHEN ascii(substr(text, f0 + (c * L) // 9 + 1, 1))
                              < ascii(substr(text, f0 + ((c + 1) * L) // 9 + 1, 1))
                        THEN (1 << c) ELSE 0 END)) AS INTEGER) AS s
        FROM f
    ),
    grams AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT a.doc_id,
                   CAST(a.s AS VARCHAR) || ',' || CAST(b.s AS VARCHAR)
                       || ',' || CAST(c.s AS VARCHAR) AS g
            FROM sig a
            JOIN sig b ON b.doc_id = a.doc_id AND b.fidx = a.fidx + 1
            JOIN sig c ON c.doc_id = a.doc_id AND c.fidx = a.fidx + 2
        ) t
    ),
    kept AS (
        SELECT doc_id, g FROM grams
        WHERE g IN (SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 50)
    )
    SELECT id_a, id_b, shared_grams FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS shared_grams
        FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) t
    WHERE shared_grams >= 2
    ORDER BY id_a, id_b
    """,
)
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import video_neardup_pairs

    docs = _payload(_t(spark, sf_dir, "documents"))
    return video_neardup_pairs(
        docs, "doc_id", "payload", frame_bytes=64, gram=3,
        min_shared=2, max_df=50,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Audio near-dup by temporal envelope-signature matching (r7): the
# third modality of the perceptual family. Per 16-sample PCM window,
# 9 segment |sample| energies -> 8 adjacent-comparison bits; 3-window
# shingles with the shared stop-gram/pair machinery of the video
# matcher. Oracle replays the synthetic PCM arithmetic, segment
# boundaries, bit packing, df cap, and pair counts.
@query(
    "multimodal_audio_neardup",
    oracle="""
    WITH d AS (
        SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    ),
    w AS (
        SELECT d.doc_id, g.k AS widx,
               least(16, d.n - g.k * 16) AS L
        FROM d,
             LATERAL unnest(range(0, CAST(ceil(d.n / 16.0) AS BIGINT)))
                 AS g(k)
    ),
    en AS (
        SELECT doc_id, widx,
               list_transform(generate_series(0, 8), c ->
                   coalesce(list_sum(list_transform(
                       range((c * L) // 9, ((c + 1) * L) // 9),
                       j -> abs(((doc_id * 31 + (widx * 16 + j) * 17) % 256)
                                - 128))), 0)) AS es
        FROM w
    ),
    sig AS (
        SELECT doc_id, widx,
               CAST(list_sum(list_transform(generate_series(0, 7),
                   c -> CASE WHEN es[c + 1] < es[c + 2]
                             THEN (1 << c) ELSE 0 END)) AS INTEGER) AS s
        FROM en
    ),
    grams AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT a.doc_id,
                   CAST(a.s AS VARCHAR) || ',' || CAST(b.s AS VARCHAR)
                       || ',' || CAST(c.s AS VARCHAR) AS g
            FROM sig a
            JOIN sig b ON b.doc_id = a.doc_id AND b.widx = a.widx + 1
            JOIN sig c ON c.doc_id = a.doc_id AND c.widx = a.widx + 2
        ) t
    ),
    kept AS (
        SELECT doc_id, g FROM grams
        WHERE g IN (SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 50)
    )
    SELECT id_a, id_b, shared_grams FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS shared_grams
        FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) t
    WHERE shared_grams >= 2
    ORDER BY id_a, id_b
    """,
)
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_neardup_pairs, synthesize_audio

    docs = _t(spark, sf_dir, "documents")
    return audio_neardup_pairs(
        synthesize_audio(docs), "doc_id", "payload", window=16,
        gram=3, min_shared=2, max_df=50,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Incremental media dedup (r7): the STORE variant of
# multimodal_dedup_payloads — a persisted digest store accumulates
# every payload fingerprint ever admitted, and each new batch keeps
# only payloads whose md5 is absent from the store AND not duplicated
# earlier within the batch (min doc_id wins). Processing the corpus
# as id-ordered batches reproduces the one-shot dedup exactly — the
# same contract as dedup_passages_incremental, on binary payloads.
# Store rows are 16-byte digests; the batch probe is one left_anti
# join on the digest key (cost ∝ batch × store-bucket, never corpus²).
@query(
    "incremental_media_dedup",
    oracle="""
    WITH p AS (
        SELECT doc_id, md5(text) AS digest FROM documents
    ),
    firsts AS (
        SELECT digest, MIN(doc_id) AS keeper FROM p GROUP BY digest
    )
    SELECT p.doc_id, p.digest
    FROM p JOIN firsts f USING (digest)
    WHERE p.doc_id = f.keeper
    ORDER BY p.doc_id
    """,
)
def incremental_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathlib import Path

    from .etlops import _fresh_wh

    docs = _payload(_t(spark, sf_dir, "documents"))
    p = docs.select(
        "doc_id", F.md5(F.col("payload")).alias("digest")
    )
    wh = _fresh_wh(spark, f"mediadedup_{Path(sf_dir).name}")
    store = "media.digests"
    kept_tables = []
    # three id-ordered batches exercise store growth + within-batch dups
    for i, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        batch = p.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        batch_first = batch.groupBy("digest").agg(
            F.min("doc_id").alias("doc_id")
        )
        if wh.table_exists(store):
            fresh = batch_first.join(
                wh.read(store), "digest", "left_anti"
            )
        else:
            fresh = batch_first
        # materialize the survivors to DISK before growing the store:
        # a persist() is not enough — Spark's cache manager RECACHES
        # plans that reference a written path, so the store append
        # would recompute the anti-join against the grown store and
        # the batch would eliminate itself (debugged live, r7)
        kept_t = f"media.kept_b{i}"
        wh.overwrite(fresh.select("doc_id", "digest"), kept_t)
        kept_tables.append(kept_t)
        wh.append(wh.read(kept_t).select("digest"), store)
    out = wh.read(kept_tables[0])
    for t in kept_tables[1:]:
        out = out.unionByName(wh.read(t))
    return out.select("doc_id", "digest").orderBy("doc_id")
