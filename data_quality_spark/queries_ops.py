"""Driver-contract queries for the training-data operators (ops/*) plus the
web-text quality-filter pipeline, each paired with a DuckDB oracle SQL string
generated FROM THE SAME CONSTANTS (salts, hyperplanes, stopword lists,
thresholds) the Spark operators use — one source of truth, two renderings.

Near/exact-duplicate queries inject deterministic duplicates (documents has
none naturally): modified copies at doc_id+1_000_000 / +2_000_000, the
golden-corpus style of the reference's test_df.xlsx marked rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_spark.ops import dedup as D
from data_quality_spark.ops import graph as G
from data_quality_spark.ops import multimodal as M
from data_quality_spark.ops import similarity as S
from data_quality_spark.ops import textops as T
from data_quality_spark.ops.hashing import sql_hash64
from data_quality_spark.functions.textstats import ALL_STOPWORDS, STOPWORDS, SYMBOL_CLASS
from data_quality_spark.functions.scrub import ALL_PATTERNS


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared corpora: deterministic injected duplicates
# ---------------------------------------------------------------------------

NEAR_SUFFIX = " zz qq ww ee rr tt"


def _near_dup_corpus(spark, sf_dir) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    extra = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(extra)


SQL_NEAR_CORPUS = f"""
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || '{NEAR_SUFFIX}', lang, source
  FROM documents WHERE doc_id % 25 = 0
"""


def _exact_dup_corpus(spark, sf_dir) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = docs.where(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(extra)


SQL_EXACT_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 31 = 0
"""

# DuckDB fragments mirroring ops.dedup shingling
SQL_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
SQL_SHINGLES = (
    "list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] "
    "for i in range(1, greatest(len(toks) - 1, 1))])"
)


# ---------------------------------------------------------------------------
# dedup 1 — exact
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return D.exact_dup_groups(_exact_dup_corpus(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_EXACT = f"""
WITH corpus AS ({SQL_EXACT_CORPUS})
SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keep_id
FROM corpus WHERE text IS NOT NULL
GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_group_sizes(spark, sf_dir):
    """Corpus duplication profile (dedup.dup_group_sizes) over the seeded
    exact-dup corpus: distinct-text count per occurrence multiplicity."""
    return D.dup_group_sizes(_exact_dup_corpus(spark, sf_dir), "text")


SQL_DEDUP_GROUP_SIZES = f"""
WITH corpus AS ({SQL_EXACT_CORPUS}),
per_text AS (
  SELECT md5(text) AS h, count(*) AS group_size
  FROM corpus WHERE text IS NOT NULL GROUP BY 1
)
SELECT group_size, count(*) AS n_groups FROM per_text GROUP BY 1
"""


def q_dedup_exact_drop(spark, sf_dir):
    """Survivor set after exact dedup (min doc_id per distinct text;
    null-text rows pass through)."""
    return D.drop_exact_dups(
        _exact_dup_corpus(spark, sf_dir), "doc_id", "text"
    ).select("doc_id")


SQL_DEDUP_EXACT_DROP = f"""
WITH corpus AS ({SQL_EXACT_CORPUS})
SELECT min(doc_id) AS doc_id FROM corpus WHERE text IS NOT NULL GROUP BY md5(text)
UNION ALL
SELECT doc_id FROM corpus WHERE text IS NULL
"""

# incremental dedup: the corpus is split by portable hash into an already-
# ingested snapshot (seen) and a new batch; the new batch additionally gets
# re-crawled copies of seen content (doc_id%3, +10000 ids) and in-batch
# duplicates (doc_id%5==1, +20000 ids) so both drop classes are exercised.
INCR_SALT = "incr_v1"


def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup of a new crawl batch vs a persisted
    seen-hash index (ops.dedup.dedup_incremental): re-crawled copies of
    seen texts drop against the index, in-batch copies drop keeping the
    min doc_id; only the surviving new-batch ids are returned."""
    from data_quality_spark.ops.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), f"#{INCR_SALT}"),
        F.lit(T.SAMPLE_DENOM),
    )
    seen_docs = docs.where(bucket < T.SAMPLE_DENOM // 2)
    new_raw = docs.where(bucket >= T.SAMPLE_DENOM // 2)
    recrawl = seen_docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    inbatch = new_raw.where(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    new_batch = new_raw.unionByName(recrawl).unionByName(inbatch)
    seen = D.seen_hash_index(seen_docs, "text")
    return D.dedup_incremental(new_batch, seen, "doc_id", "text").select("doc_id")


def _sql_dedup_incremental() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{INCR_SALT}")
    half = T.SAMPLE_DENOM // 2
    return f"""
WITH seen_docs AS (SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} < {half}),
new_raw AS (SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} >= {half}),
new_batch AS (
  SELECT doc_id, text FROM new_raw
  UNION ALL SELECT doc_id + 10000, text FROM seen_docs WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id + 20000, text FROM new_raw WHERE doc_id % 5 = 1),
fresh AS (
  SELECT doc_id, text FROM new_batch
  WHERE text IS NOT NULL
    AND md5(text) NOT IN (SELECT DISTINCT md5(text) FROM seen_docs WHERE text IS NOT NULL))
SELECT min(doc_id) AS doc_id FROM fresh GROUP BY md5(text)
UNION ALL
SELECT doc_id FROM new_batch WHERE text IS NULL
"""


# ---------------------------------------------------------------------------
# dedup 1a-bis — Bloom-filter incremental dedup (Dolma-style)
# ---------------------------------------------------------------------------

# Small enough that the sf0.01 seen-half fills ~60% of the filter — the
# query then exercises REAL false positives, deterministically reproduced
# by the oracle (same md5 positions both sides).
BLOOM_TEST_M = 4096


def _sql_bloom_pos(md5_expr: str, m: int, k: int) -> str:
    """The k Bloom position expressions (DuckDB) for one document hash —
    rendered from the same salt scheme as ops.dedup.bloom_positions."""
    return ", ".join(
        f"({sql_hash64(md5_expr, f'#bloom{i // 2}', 1 + 15 * (i % 2))}) % {m}"
        for i in range(k)
    )


def q_dedup_bloom(spark, sf_dir):
    """Bloom-filter incremental dedup (ops.dedup.dedup_bloom_incremental):
    the corpus splits into a seen snapshot — of which only the m-bit Bloom
    bitmap is retained — and a new batch with exact re-crawls (+10000) and
    in-batch copies (+20000). Returns per-probe-row (maybe_seen, kept);
    false positives at the deliberately small test m are part of the
    verified contract (deterministic given the md5 position scheme)."""
    from data_quality_spark.ops.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), f"#{INCR_SALT}"),
        F.lit(T.SAMPLE_DENOM),
    )
    seen_docs = docs.where(bucket < T.SAMPLE_DENOM // 2)
    new_raw = docs.where(bucket >= T.SAMPLE_DENOM // 2)
    recrawl = seen_docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    inbatch = new_raw.where(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    new_batch = new_raw.unionByName(recrawl).unionByName(inbatch)
    bloom = D.bloom_build(seen_docs, "text", m=BLOOM_TEST_M)
    # persist the flagged batch (bounded: one small-batch projection) so the
    # bitmap probe runs ONCE and the keeper semi-join hits an
    # InMemoryRelation instead of distributing over the 3-way union
    flagged = D.bloom_maybe_seen(new_batch, bloom, "text", m=BLOOM_TEST_M).persist()
    kept = D.bloom_keep(flagged, "doc_id", "text").select(
        "doc_id", F.lit(True).alias("kept")
    )
    result = (
        flagged.select("doc_id", "maybe_seen")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id", "maybe_seen", F.coalesce("kept", F.lit(False)).alias("kept")
        )
    )
    # materialize the (small, id-level) result driver-side and rebuild it so
    # NOTHING stays pinned in executor storage after the call returns —
    # localCheckpoint would free the flagged cache but leave its own result
    # blocks pinned for the session lifetime (r3 advice); collect+rebuild
    # releases both (bounded: 3 narrow columns over one batch's ids)
    rows = result.collect()
    flagged.unpersist()
    return spark.createDataFrame(
        rows, "doc_id long, maybe_seen boolean, kept boolean"
    )


def _sql_dedup_bloom() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{INCR_SALT}")
    half = T.SAMPLE_DENOM // 2
    pos = _sql_bloom_pos("md5(text)", BLOOM_TEST_M, D.BLOOM_K)
    return f"""
WITH seen_docs AS (
  SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} < {half}),
new_raw AS (
  SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} >= {half}),
new_batch AS (
  SELECT doc_id, text FROM new_raw
  UNION ALL SELECT doc_id + 10000, text FROM seen_docs WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id + 20000, text FROM new_raw WHERE doc_id % 5 = 1),
seen_pos AS (
  SELECT DISTINCT unnest([{pos}]) AS pos
  FROM seen_docs WHERE text IS NOT NULL),
probe_pos AS (
  SELECT doc_id, unnest([{pos}]) AS pos
  FROM new_batch WHERE text IS NOT NULL),
flags AS (
  SELECT doc_id, bool_and(pos IN (SELECT pos FROM seen_pos)) AS maybe_seen
  FROM probe_pos GROUP BY doc_id),
all_flags AS (
  SELECT b.doc_id, coalesce(f.maybe_seen, FALSE) AS maybe_seen, b.text
  FROM new_batch b LEFT JOIN flags f USING (doc_id)),
keep_ids AS (
  SELECT min(doc_id) AS doc_id FROM all_flags
  WHERE NOT maybe_seen AND text IS NOT NULL GROUP BY md5(text))
SELECT doc_id, maybe_seen,
       (text IS NULL OR doc_id IN (SELECT doc_id FROM keep_ids)) AS kept
FROM all_flags
"""


# ---------------------------------------------------------------------------
# dedup 1a-ter — paragraph-level Bloom dedup (Dolma's paragraph mode)
# ---------------------------------------------------------------------------

# Both engines stage the same multi-paragraph text2 per doc: a 17-residue
# banner (fully covered by the seen half -> always dropped in new docs), a
# unique body line (never dropped except Bloom FPs), a blank separator
# (min_chars=1 -> always kept), an even-id-only shared para, and a
# 201-residue tail (partially covered -> mixed drops). Seen-half paragraphs
# fill ~2/3 of the 4096-bit test filter, so FP drops occur and are
# reproduced deterministically by the oracle.


def _bloom_para_spark_text2(doc_id, text):
    i17 = (doc_id % 17).cast("string")
    i3 = (doc_id % 3).cast("string")
    i201 = (doc_id % 201).cast("string")
    return F.concat_ws(
        "\n",
        F.concat(F.lit("common banner "), i17),
        F.concat(F.lit("body "), doc_id.cast("string"), F.lit(" "),
                 F.substring(text, 1, 40)),
        F.lit(""),
        F.when(doc_id % 2 == 0, F.concat(F.lit("shared "), i3)),
        F.concat(F.lit("tail "), i201),
    )


_SQL_BLOOM_PARA_TEXT2 = """concat_ws(chr(10),
  'common banner ' || (doc_id % 17),
  'body ' || doc_id || ' ' || substring(text, 1, 40),
  '',
  CASE WHEN doc_id % 2 = 0 THEN 'shared ' || (doc_id % 3) END,
  'tail ' || (doc_id % 201))"""


def q_dedup_bloom_paras(spark, sf_dir):
    """Paragraph-level Bloom dedup (ops.dedup.bloom_para_build +
    remove_seen_paragraphs): only the seen half's paragraph BITMAP is
    retained; each new-batch doc is rewritten with its already-seen
    paragraphs removed (order preserved, blanks kept, NULL text passes
    through). Map-only probe — no paragraph ever shuffles."""
    from data_quality_spark.ops.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    staged = docs.select(
        "doc_id",
        _bloom_para_spark_text2(F.col("doc_id"), F.col("text")).alias("t2"),
    )
    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), f"#{INCR_SALT}"),
        F.lit(T.SAMPLE_DENOM),
    )
    seen = staged.where(bucket < T.SAMPLE_DENOM // 2)
    newb = staged.where(bucket >= T.SAMPLE_DENOM // 2)
    nulls = newb.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 30_000).alias("doc_id"),
        F.lit(None).cast("string").alias("t2"),
    )
    probe = newb.unionByName(nulls)
    bloom = D.bloom_para_build(seen, "t2", m=BLOOM_TEST_M)
    return D.remove_seen_paragraphs(
        probe, bloom, "t2", m=BLOOM_TEST_M
    ).select("doc_id", "text_clean")


def _sql_dedup_bloom_paras() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{INCR_SALT}")
    half = T.SAMPLE_DENOM // 2
    pos = _sql_bloom_pos("md5(para)", BLOOM_TEST_M, D.BLOOM_K)
    return f"""
WITH base AS (
  SELECT doc_id, {_SQL_BLOOM_PARA_TEXT2} AS t2
  FROM documents WHERE text IS NOT NULL),
seen AS (SELECT t2 FROM base WHERE ({h}) % {T.SAMPLE_DENOM} < {half}),
newb AS (
  SELECT doc_id, t2 FROM base WHERE ({h}) % {T.SAMPLE_DENOM} >= {half}
  UNION ALL
  SELECT doc_id + 30000, NULL FROM base
  WHERE ({h}) % {T.SAMPLE_DENOM} >= {half} AND doc_id % 50 = 0),
seen_pos AS (
  SELECT DISTINCT unnest([{pos}]) AS pos
  FROM (SELECT unnest(string_split(t2, chr(10))) AS para FROM seen)
  WHERE length(para) >= 1),
paras AS (
  SELECT doc_id, unnest(string_split(t2, chr(10))) AS para,
         generate_subscripts(string_split(t2, chr(10)), 1) AS ord
  FROM newb WHERE t2 IS NOT NULL),
flags AS (
  SELECT doc_id, ord, bool_and(pos IN (SELECT pos FROM seen_pos)) AS seen
  FROM (SELECT doc_id, ord, unnest([{pos}]) AS pos
        FROM paras WHERE length(para) >= 1)
  GROUP BY doc_id, ord),
kept AS (
  SELECT p.doc_id, p.ord, p.para
  FROM paras p LEFT JOIN flags f USING (doc_id, ord)
  WHERE NOT coalesce(f.seen, FALSE)),
reb AS (
  SELECT doc_id, coalesce(string_agg(para, chr(10) ORDER BY ord), '') AS tc
  FROM kept GROUP BY doc_id)
SELECT n.doc_id,
       CASE WHEN n.t2 IS NULL THEN NULL ELSE coalesce(r.tc, '') END AS text_clean
FROM newb n LEFT JOIN reb r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# dedup 1b — incremental MinHash vs persisted signature index
# ---------------------------------------------------------------------------

NINCR_THRESHOLD = 0.5


# per-process record of sig-index parquets this session wrote (a stale file
# from an older code version must not be trusted — rebuild once per process)
_SIG_INDEX_BUILT: set[str] = set()


def _persisted_sig_index(spark, sf_dir, seen_docs):
    """The seen snapshot's signature index, PERSISTED per sf — the
    operator's real-world contract (cross-batch dedup probes a STORED
    index; it never re-shingles historical text). Rebuilding the index
    inside every q_dedup_minhash_incr call charged the probe operator for
    index construction — at scale those are different jobs on different
    cadences (index: once per ingested batch; probe: every new batch)."""
    import os

    from data_quality_spark.pipeline.expected import EXPECTED_DIR

    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(EXPECTED_DIR, f"sig_index_{key}.parquet")
    if sf_dir not in _SIG_INDEX_BUILT:
        os.makedirs(EXPECTED_DIR, exist_ok=True)
        D.minhash_signature_index(seen_docs, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(path)
        _SIG_INDEX_BUILT.add(sf_dir)
    return spark.read.parquet(path)


def q_dedup_minhash_incr(spark, sf_dir):
    """Cross-batch near-dup matches (ops.dedup.minhash_incremental_matches):
    the corpus splits by portable hash into a seen snapshot (whose persisted
    signature index is all that is retained) and a new batch that includes
    near-dup re-crawls of seen content (NEAR_SUFFIX-modified copies at
    +10000 ids); matches are verified by signature-estimated Jaccard."""
    from data_quality_spark.ops.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), f"#{INCR_SALT}"),
        F.lit(T.SAMPLE_DENOM),
    )
    seen_docs = docs.where(bucket < T.SAMPLE_DENOM // 2)
    new_raw = docs.where(bucket >= T.SAMPLE_DENOM // 2)
    recrawl = seen_docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    new_batch = new_raw.unionByName(recrawl)
    index = _persisted_sig_index(spark, sf_dir, seen_docs)
    return D.minhash_incremental_matches(
        new_batch, index, "doc_id", "text", threshold=NINCR_THRESHOLD
    )


def _sql_dedup_minhash_incr() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{INCR_SALT}")
    half = T.SAMPLE_DENOM // 2
    k = D.MINHASH_K
    mh = ",\n    ".join(
        "list_min(list_transform(sh, s -> "
        + sql_hash64("s", f"#{i // 2}", 1 + 15 * (i % 2))
        + "))"
        for i in range(k)
    )
    # packed bigint band keys — mirror of ops.dedup._band_key's md5 scheme
    band_keys = ",\n      ".join(
        sql_hash64(
            "('" + str(b) + "_' || "
            + " || '_' || ".join(
                f"(mh[{b * D.LSH_ROWS + j + 1}])::VARCHAR"
                for j in range(D.LSH_ROWS)
            )
            + ")"
        )
        for b in range(D.LSH_BANDS)
    )
    return f"""
WITH seen_docs AS (
  SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} < {half}),
new_batch AS (
  SELECT doc_id, text FROM documents WHERE ({h}) % {T.SAMPLE_DENOM} >= {half}
  UNION ALL
  SELECT doc_id + 10000, text || '{NEAR_SUFFIX}'
  FROM seen_docs WHERE doc_id % 3 = 0),
ssig AS (
  SELECT doc_id, [{mh}] AS mh
  FROM (SELECT doc_id, {SQL_SHINGLES} AS sh
        FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM seen_docs))
  WHERE len(sh) > 0),
nsig AS (
  SELECT doc_id, [{mh}] AS mh
  FROM (SELECT doc_id, {SQL_SHINGLES} AS sh
        FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM new_batch))
  WHERE len(sh) > 0),
sband AS (SELECT doc_id AS seen_id, unnest([
      {band_keys}
  ]) AS band_key FROM ssig),
nband AS (SELECT doc_id AS new_id, unnest([
      {band_keys}
  ]) AS band_key FROM nsig),
sok AS (SELECT band_key FROM sband GROUP BY 1 HAVING count(*) <= {D.MAX_BUCKET}),
nok AS (SELECT band_key FROM nband GROUP BY 1 HAVING count(*) <= {D.MAX_BUCKET}),
cand AS (
  SELECT DISTINCT new_id, seen_id
  FROM nband JOIN sband USING (band_key)
  JOIN nok USING (band_key) JOIN sok USING (band_key)),
ver AS (
  SELECT new_id, seen_id,
         round(len(list_filter(range(1, {k + 1}), i -> a.mh[i] = b.mh[i]))
               / {k}.0, 6) AS sig_jaccard
  FROM cand JOIN nsig a ON a.doc_id = new_id JOIN ssig b ON b.doc_id = seen_id)
SELECT new_id, seen_id, sig_jaccard FROM ver WHERE sig_jaccard >= {NINCR_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# dedup 1c — corpus-level duplicated-span removal (C4 / Lee et al. rewrite)
# ---------------------------------------------------------------------------

# 4 sentences: even when a doc's unpunctuated last sentence merges with the
# banner's first, the trailing 3-sentence spans still repeat corpus-wide
SPAN_BANNER = (
    " Spam offer one. Spam offer two. Spam offer three. Spam offer four."
)


def q_dedup_span_removal(spark, sf_dir):
    """C4-style duplicated-span removal (ops.dedup.remove_dup_spans): every
    20th doc gets a shared 4-sentence banner appended; all banner spans
    after the first corpus occurrence are removed and the affected docs are
    rebuilt from their surviving sentences."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0, F.concat(F.col("text"), F.lit(SPAN_BANNER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return D.remove_dup_spans(corpus, "doc_id", "text")


# paragraph-grain fixture: every 15th doc gains a shared spam paragraph
# (corpus-wide duplicate → removed after the first occurrence) and every
# 7th doc gains a SHORT duplicated line that min_chars must protect
PARA_SPAM = "Subscribe to our newsletter for exclusive spam offers today"
PARA_SHORT = "ok"
PARA_MIN_CHARS = 10


def q_dedup_span_removal_para(spark, sf_dir):
    """Paragraph-grain duplicated-span removal (Dolma-style exact paragraph
    dedup with an in-corpus first-occurrence keeper): n=1 paragraph spans
    over newline-split docs; paragraphs shorter than min_chars (blank
    lines, 'ok') are never candidates, so formatting survives."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 15 == 0, F.lit("\n" + PARA_SPAM))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit("\n" + PARA_SHORT))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return D.remove_dup_spans(
        corpus, "doc_id", "text", n=1, unit="paragraph",
        min_chars=PARA_MIN_CHARS,
    )


def _sql_dedup_span_removal_para() -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 15 = 0 THEN chr(10) || '{PARA_SPAM}'
                      ELSE '' END
              || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{PARA_SHORT}'
                      ELSE '' END AS text
  FROM documents),
base AS (
  SELECT doc_id AS id, string_split(text, chr(10)) AS s
  FROM corpus WHERE text IS NOT NULL),
occ AS (
  SELECT id, i AS start, md5(s[i]) AS key
  FROM base, unnest(range(1, len(s) + 1)) AS t(i)
  WHERE length(s[i]) >= {PARA_MIN_CHARS}),
marked AS (
  SELECT id, start,
         count(*) OVER (PARTITION BY key) AS n_occ,
         min((id, start)) OVER (PARTITION BY key) AS keeper
  FROM occ),
rem AS (
  SELECT DISTINCT id, start AS idx
  FROM marked WHERE n_occ > 1 AND (id, start) <> keeper),
sent AS (
  SELECT id, i AS idx, s[i] AS sent
  FROM base, unnest(range(1, len(s) + 1)) AS t(i)),
kept AS (
  SELECT s2.id, s2.idx, s2.sent FROM sent s2
  WHERE NOT EXISTS (SELECT 1 FROM rem r WHERE r.id = s2.id AND r.idx = s2.idx)),
nrem AS (SELECT id, count(*) AS n_removed FROM rem GROUP BY 1),
rebuilt AS (
  SELECT id, string_agg(sent, chr(10) ORDER BY idx) AS txt
  FROM kept WHERE id IN (SELECT id FROM nrem) GROUP BY id)
SELECT c.doc_id,
       CASE WHEN nrem.id IS NOT NULL THEN coalesce(rebuilt.txt, '')
            ELSE c.text END AS text_dedup,
       coalesce(nrem.n_removed, 0) AS n_removed
FROM corpus c
LEFT JOIN nrem ON nrem.id = c.doc_id
LEFT JOIN rebuilt ON rebuilt.id = c.doc_id
"""


def _sql_dedup_span_removal() -> str:
    n = D.SPAN_N
    key = " || chr(2) || ".join(
        f"s[i+{j}]" if j else "s[i]" for j in range(n)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, CASE WHEN doc_id % 20 = 0 THEN text || '{SPAN_BANNER}'
                      ELSE text END AS text
  FROM documents),
base AS (
  SELECT doc_id AS id,
         string_split(regexp_replace(text, '{D.SPAN_SPLIT_PAT}',
                                     '\\1' || chr(1), 'g'), chr(1)) AS s
  FROM corpus WHERE text IS NOT NULL),
occ AS (
  SELECT id, i AS start, md5({key}) AS key
  FROM base, unnest(range(1, len(s) - {n - 2})) AS t(i)),
marked AS (
  SELECT id, start,
         count(*) OVER (PARTITION BY key) AS n_occ,
         min((id, start)) OVER (PARTITION BY key) AS keeper
  FROM occ),
rem AS (
  SELECT DISTINCT id, start + j AS idx
  FROM marked, unnest(range(0, {n})) AS u(j)
  WHERE n_occ > 1 AND (id, start) <> keeper),
sent AS (
  SELECT id, i AS idx, s[i] AS sent
  FROM base, unnest(range(1, len(s) + 1)) AS t(i)),
kept AS (
  SELECT s2.id, s2.idx, s2.sent FROM sent s2
  WHERE NOT EXISTS (SELECT 1 FROM rem r WHERE r.id = s2.id AND r.idx = s2.idx)),
nrem AS (SELECT id, count(*) AS n_removed FROM rem GROUP BY 1),
rebuilt AS (
  SELECT id, string_agg(sent, ' ' ORDER BY idx) AS txt
  FROM kept WHERE id IN (SELECT id FROM nrem) GROUP BY id)
SELECT c.doc_id,
       CASE WHEN nrem.id IS NOT NULL THEN coalesce(rebuilt.txt, '')
            ELSE c.text END AS text_dedup,
       coalesce(nrem.n_removed, 0) AS n_removed
FROM corpus c
LEFT JOIN nrem ON nrem.id = c.doc_id
LEFT JOIN rebuilt ON rebuilt.id = c.doc_id
"""


# ---------------------------------------------------------------------------
# dedup 2 — MinHash + LSH (K=12, 4 bands x 3 rows, verify J >= 0.5)
# ---------------------------------------------------------------------------

MINHASH_THRESHOLD = 0.5


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(
        _near_dup_corpus(spark, sf_dir), "doc_id", "text",
        threshold=MINHASH_THRESHOLD,
    )


def _sql_minhash_lsh(corpus_sql: str | None = None) -> str:
    """MinHash+LSH oracle body over any (doc_id, text) corpus CTE — shared
    by the document-grain and paragraph-grain queries (same signatures,
    bands, bucket caps, verify)."""
    mh = [
        "list_min(list_transform(sh, s -> "
        + sql_hash64("s", f"#{i // 2}", 1 + 15 * (i % 2))
        + "))"
        for i in range(D.MINHASH_K)
    ]
    bands = []
    for b in range(D.LSH_BANDS):
        vals = " || '_' || ".join(
            f"({mh[b * D.LSH_ROWS + j]})::VARCHAR" for j in range(D.LSH_ROWS)
        )
        # packed bigint band key — mirror of ops.dedup._band_key
        bands.append(sql_hash64(f"('{b}_' || {vals})"))
    band_list = ",\n      ".join(bands)
    return f"""
WITH corpus AS ({corpus_sql or SQL_NEAR_CORPUS}),
sh0 AS (
  SELECT doc_id, {SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus)
),
sigs AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
banded AS (
  SELECT doc_id, unnest([
      {band_list}
  ]) AS band_key
  FROM sigs
),
-- mirror of the Spark-side bucket cap (ops.dedup.MAX_BUCKET): degenerate
-- band keys never generate candidates in EITHER engine
ok_buckets AS (
  SELECT band_key FROM banded GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {D.MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r USING (band_key) JOIN ok_buckets USING (band_key)
  WHERE l.doc_id < r.doc_id
),
verified AS (
  SELECT id_a, id_b,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               6) AS jaccard
  FROM cand JOIN sigs a ON a.doc_id = id_a JOIN sigs b ON b.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {MINHASH_THRESHOLD}
"""


def q_dedup_para_minhash(spark, sf_dir):
    """Paragraph-grain near-dup pairs (Dolma's paragraph dedupe, the fuzzy
    sibling of dedup_para_bloom's exact mode): deterministic paragraph
    units (two 120-char slices per doc + a near-dup ' zz' variant every
    25th doc, over the exact-dup-augmented corpus so full copies yield
    identical cross-doc paragraphs), unit id = doc_id*10 + para_idx, then
    the UNCHANGED document-grain MinHash+LSH path runs over the units —
    paragraph dedup is a reparameterization, not a new engine."""
    base = _exact_dup_corpus(spark, sf_dir).where(F.col("text").isNotNull())
    p0 = F.substring(F.col("text"), 1, 120)
    p1 = F.substring(F.col("text"), 121, 120)
    p2 = F.when(F.col("doc_id") % 25 == 0, F.concat(p0, F.lit(" zz")))
    paras = (
        base.select(
            "doc_id", F.posexplode(F.array(p0, p1, p2)).alias("idx", "para")
        )
        .where(F.col("para").isNotNull() & (F.length("para") >= 60))
        .select(
            (F.col("doc_id") * 10 + F.col("idx")).alias("doc_id"),
            F.col("para").alias("text"),
        )
    )
    return D.minhash_lsh_pairs(
        paras, "doc_id", "text", threshold=MINHASH_THRESHOLD
    )


SQL_PARA_CORPUS = f"""
  SELECT doc_id * 10 + idx AS doc_id, para AS text FROM (
    SELECT doc_id, 0 AS idx, substring(text, 1, 120) AS para
    FROM ({SQL_EXACT_CORPUS}) WHERE text IS NOT NULL
    UNION ALL
    SELECT doc_id, 1, substring(text, 121, 120)
    FROM ({SQL_EXACT_CORPUS}) WHERE text IS NOT NULL
    UNION ALL
    SELECT doc_id, 2, substring(text, 1, 120) || ' zz'
    FROM ({SQL_EXACT_CORPUS}) WHERE text IS NOT NULL AND doc_id % 25 = 0
  ) WHERE len(para) >= 60
"""


def q_dedup_minhash_drop(spark, sf_dir):
    """Near-dedup survivor set (keep-lowest policy over the verified
    MinHash-LSH pairs): the row set a training pipeline actually feeds
    downstream."""
    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=MINHASH_THRESHOLD
    )
    return D.drop_near_dups(corpus, "doc_id", pairs).select("doc_id")


def _sql_minhash_drop() -> str:
    return f"""
SELECT doc_id FROM ({SQL_NEAR_CORPUS})
WHERE doc_id NOT IN (SELECT id_b FROM ({_sql_minhash_lsh()}))
"""


def q_dedup_cluster_drop(spark, sf_dir):
    """Cluster-exact survivor set: ONE survivor (min id) per connected
    component of the verified near-dup pair graph
    (drop_near_dups(policy='cluster') — bounded min-label propagation).
    Oracle: the same components via a DuckDB recursive CTE."""
    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(
        corpus, "doc_id", "text", threshold=MINHASH_THRESHOLD
    )
    return D.drop_near_dups(corpus, "doc_id", pairs, policy="cluster").select(
        "doc_id"
    )


def _sql_cluster_drop() -> str:
    # connected components in SQL: reach(a,b) = b reachable from a over the
    # undirected pair graph; component label = min reachable id (incl.
    # self); survivors = rows that are their own label (plus rows not in
    # the graph at all)
    return f"""
WITH RECURSIVE
pairs AS ({_sql_minhash_lsh()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
label AS (
  SELECT src AS id, least(min(dst), src) AS label FROM reach GROUP BY src
)
SELECT doc_id FROM ({SQL_NEAR_CORPUS})
WHERE doc_id NOT IN (SELECT id FROM label WHERE label <> id)
"""


# ---------------------------------------------------------------------------
# dedup 3 — SimHash (32-bit, 4 byte-bands, Hamming <= 6)
# ---------------------------------------------------------------------------

SIMHASH_MAX_HAMMING = 6


def q_dedup_simhash(spark, sf_dir):
    return D.simhash_pairs(
        _near_dup_corpus(spark, sf_dir), "doc_id", "text",
        max_hamming=SIMHASH_MAX_HAMMING,
    )


def _sql_simhash() -> str:
    bit_terms = " +\n      ".join(
        f"CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {j}) & 1)) - n > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(D.SIMHASH_BITS)
    )
    band_bits = D.SIMHASH_BITS // D.SIMHASH_BANDS
    mask = (1 << band_bits) - 1
    # packed bigint band key — mirror of ops.dedup.simhash_pairs
    band_list = ",\n      ".join(
        f"{b * (1 << D.SIMHASH_BITS)} + ((simhash >> {b * band_bits}) & {mask})"
        for b in range(D.SIMHASH_BANDS)
    )
    return f"""
WITH corpus AS ({SQL_NEAR_CORPUS}),
sh0 AS (
  SELECT doc_id, {SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus)
),
sigs AS (
  SELECT doc_id,
         list_transform(sh, s -> {sql_hash64('s')}) AS hs,
         len(sh) AS n
  FROM sh0 WHERE len(sh) > 0
),
sims AS (
  SELECT doc_id, ({bit_terms})::BIGINT AS simhash FROM sigs
),
banded AS (
  SELECT doc_id, simhash, unnest([
      {band_list}
  ]) AS band_key
  FROM sims
),
ok_buckets AS (
  SELECT band_key FROM banded GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {D.MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.simhash AS sim_a, r.simhash AS sim_b
  FROM banded l JOIN banded r USING (band_key) JOIN ok_buckets USING (band_key)
  WHERE l.doc_id < r.doc_id
)
SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# dedup 4 — blocked exact n-gram Jaccard (baseline/verifier)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.5


def q_dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(
        _near_dup_corpus(spark, sf_dir), "doc_id", "text",
        block_cols=["source"], threshold=JACCARD_THRESHOLD,
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH corpus AS ({SQL_NEAR_CORPUS}),
sh0 AS (
  SELECT doc_id, source, {SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, source, {SQL_TOKS} AS toks FROM corpus)
),
sigs AS (SELECT doc_id, source, sh FROM sh0 WHERE len(sh) > 0),
pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b,
         round(len(list_intersect(l.sh, r.sh))::DOUBLE /
               (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))),
               6) AS jaccard
  FROM sigs l JOIN sigs r USING (source)
  WHERE l.doc_id < r.doc_id
)
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# similarity 1 — brute-force cosine top-k
# ---------------------------------------------------------------------------

QUERY_VEC_ID = 7
TOPK = 10


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_sim_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.topk_cosine(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), TOPK)


SQL_COSINE = """
  round(CASE WHEN sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)])) > 0
              AND sqrt(list_sum([q[i]*q[i] for i in range(1, len(q)+1)])) > 0
             THEN list_sum([v[i]*q[i] for i in range(1, len(v)+1)])
                  / (sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)]))
                     * sqrt(list_sum([q[i]*q[i] for i in range(1, len(q)+1)])))
             ELSE 0.0 END, 6)
"""

SQL_SIM_TOPK = f"""
WITH q0 AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT vec_id, {SQL_COSINE} AS cos_sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), q0
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


# ---------------------------------------------------------------------------
# similarity 2 — near-dup cosine pairs within label blocks
# ---------------------------------------------------------------------------

COSINE_PAIR_THRESHOLD = 0.25


def q_sim_cosine_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_pairs(
        emb, "vec_id", "embedding", ["label"], COSINE_PAIR_THRESHOLD
    )


SQL_SIM_COSINE_PAIRS = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         round(CASE WHEN sqrt(list_sum([l.v[i]*l.v[i] for i in range(1, len(l.v)+1)])) > 0
                     AND sqrt(list_sum([r.v[i]*r.v[i] for i in range(1, len(r.v)+1)])) > 0
                    THEN list_sum([l.v[i]*r.v[i] for i in range(1, len(l.v)+1)])
                         / (sqrt(list_sum([l.v[i]*l.v[i] for i in range(1, len(l.v)+1)]))
                            * sqrt(list_sum([r.v[i]*r.v[i] for i in range(1, len(r.v)+1)])))
                    ELSE 0.0 END, 6) AS cos_sim
  FROM e l JOIN e r USING (label)
  WHERE l.vec_id < r.vec_id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {COSINE_PAIR_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# similarity 3 — LSH-bucketed ANN top-k
# ---------------------------------------------------------------------------


def q_sim_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), TOPK)


def _sql_ann_lsh() -> str:
    hp_lits = [
        "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
        for plane in S.HYPERPLANES
    ]
    sig_terms = " +\n      ".join(
        f"CASE WHEN round(list_sum([v[i] * ({hp_lits[b]})[i] for i in range(1, len(v)+1)]), 6) >= 0 "
        f"THEN {1 << b} ELSE 0 END"
        for b in range(S.N_HYPERPLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v, ({sig_terms})::BIGINT AS lsh_sig FROM e
),
q0 AS (SELECT v AS q, lsh_sig AS qsig FROM sigs WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT vec_id, {SQL_COSINE} AS cos_sim
  FROM sigs, q0 WHERE sigs.lsh_sig = q0.qsig
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


# ---------------------------------------------------------------------------
# similarity 3b — LSH-bucketed near-dup pairs (no blocking key)
# ---------------------------------------------------------------------------

LSH_PAIR_THRESHOLD = 0.99


def _emb_with_near_dups(spark, sf_dir) -> DataFrame:
    """embeddings ∪ perturbed copies (vec_id%20==0 → +1e6, each component
    nudged by 0.001·((vec_id+i)%7−3) — a single IEEE op, identical in any
    engine) so the near-dup query has deterministic positives."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # perturb FIRST, shift the id after: a single select would let Spark's
    # lateral-column-alias resolution bind the transform's vec_id to the
    # NEW (+1e6) alias, silently changing the perturbation
    pert = (
        emb.where(F.col("vec_id") % 20 == 0)
        .withColumn(
            "v",
            F.transform(
                "v", lambda x, i: x + 0.001 * (((F.col("vec_id") + i) % 7) - 3)
            ),
        )
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "v")
    )
    return emb.unionByName(pert)


SQL_EMB_NEAR_CORPUS = """
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [v[i] + 0.001 * ((vec_id + i - 1) % 7 - 3) for i in range(1, len(v)+1)]
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  WHERE vec_id % 20 = 0
"""


def q_sim_lsh_pairs(spark, sf_dir):
    return S.cosine_lsh_pairs(
        _emb_with_near_dups(spark, sf_dir), "vec_id", "v",
        threshold=LSH_PAIR_THRESHOLD,
    )


def _sql_sim_lsh_pairs() -> str:
    table_keys = []
    for t, planes in enumerate(S.PAIR_HYPERPLANES):
        hp_lits = [
            "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]" for p in planes
        ]
        sig = " + ".join(
            f"CASE WHEN round(list_sum([v[i] * ({hp_lits[b]})[i] for i in range(1, len(v)+1)]), 6) >= 0 "
            f"THEN {1 << b} ELSE 0 END"
            for b in range(len(planes))
        )
        # packed bigint band key — mirror of ops.similarity band packing
        table_keys.append(f"{t << 32} + ({sig})")
    bands = ",\n      ".join(table_keys)
    return f"""
WITH e AS ({SQL_EMB_NEAR_CORPUS}),
banded AS (
  SELECT vec_id, v, unnest([
      {bands}
  ]) AS band_key
  FROM e
),
ok_buckets AS (
  SELECT band_key FROM banded GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {D.MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
         l.v AS va, r.v AS vb
  FROM banded l JOIN banded r USING (band_key) JOIN ok_buckets USING (band_key)
  WHERE l.vec_id < r.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(CASE WHEN sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)])) > 0
                     AND sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)])) > 0
                    THEN list_sum([va[i]*vb[i] for i in range(1, len(va)+1)])
                         / (sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)]))
                            * sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)])))
                    ELSE 0.0 END, 6) AS cos_sim
  FROM cand
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {LSH_PAIR_THRESHOLD}
"""


def q_sim_lsh_drop(spark, sf_dir):
    """Embedding-side survivor set: drop the higher id of every verified
    cosine-LSH near-dup pair (keep-lowest; the embedding twin of
    dedup_minhash_drop)."""
    emb = _emb_with_near_dups(spark, sf_dir)
    pairs = S.cosine_lsh_pairs(emb, "vec_id", "v", threshold=LSH_PAIR_THRESHOLD)
    return D.drop_near_dups(emb, "vec_id", pairs).select("vec_id")


def _sql_sim_lsh_drop() -> str:
    return f"""
SELECT vec_id FROM ({SQL_EMB_NEAR_CORPUS})
WHERE vec_id NOT IN (SELECT id_b FROM ({_sql_sim_lsh_pairs()}))
"""


# ---------------------------------------------------------------------------
# similarity 3c — cross-corpus embedding decontamination
# ---------------------------------------------------------------------------

# eval fixture: ids ≡ 0 (mod 25) become PERTURBED near-copies (leaked
# benchmark docs → cosine ≈ 1), ids ≡ 7 (mod 25) become component-REVERSED
# vectors (semantically unrelated → well below threshold); eval ids live in
# a +2M / +3M id space so best_train_id can never alias an eval id.


def _decon_eval(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    leaked = (
        emb.where(F.col("vec_id") % 25 == 0)
        .withColumn(
            "v",
            F.transform(
                "v", lambda x, i: x + 0.001 * (((F.col("vec_id") + i) % 7) - 3)
            ),
        )
        .select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.col("v").alias("embedding"),
        )
    )
    clean = (
        emb.where(F.col("vec_id") % 25 == 7)
        .select(
            (F.col("vec_id") + 3_000_000).alias("vec_id"),
            F.reverse("v").alias("embedding"),
        )
    )
    return leaked.unionByName(clean)


def q_sim_decontaminate(spark, sf_dir):
    """Cross-corpus embedding decontamination
    (similarity.embedding_decontaminate): per-eval-doc max cosine over the
    whole training corpus in ONE mapInPandas corpus scan (eval matrix
    shipped once, running per-eval max across batches, n_eval tiny rows
    per partition) — the semantic twin of text_decontaminate for
    paraphrased benchmark leakage. Fixture: perturbed near-copies must
    flag contaminated, reversed vectors must not."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.embedding_decontaminate(
        emb, _decon_eval(spark, sf_dir), "vec_id", "embedding",
        threshold=SIM_DECON_THRESHOLD,
    )


SIM_DECON_THRESHOLD = 0.97


def _sql_sim_decontaminate() -> str:
    ev = """
  SELECT vec_id + 2000000 AS id,
         [v[i] + 0.001 * ((vec_id + i - 1) % 7 - 3) for i in range(1, len(v)+1)] AS v
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  WHERE vec_id % 25 = 0
  UNION ALL
  SELECT vec_id + 3000000,
         [v[len(v) + 1 - i] for i in range(1, len(v)+1)]
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  WHERE vec_id % 25 = 7
"""
    train = "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings"
    return S.sql_embedding_decontaminate(
        train, ev, threshold=SIM_DECON_THRESHOLD
    )


# ---------------------------------------------------------------------------
# similarity 4 — IVF coarse-quantizer centroids (long format) + IVF top-k
# ---------------------------------------------------------------------------


def q_sim_label_centroids(spark, sf_dir):
    """Per-cell centroid components in long format (cell, pos, n, val) —
    the IVF coarse-quantizer table."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        emb.select(F.col("label").alias("cell"), F.posexplode(v).alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("x"), 6).alias("val"))
    )


SQL_SIM_LABEL_CENTROIDS = """
SELECT label AS cell, i - 1 AS pos, count(*) AS n,
       round(avg((embedding::DOUBLE[])[i]), 6) AS val
FROM embeddings, generate_series(1, 64) t(i)
GROUP BY 1, 2
"""

IVF_NPROBE = 2


_LABELC_CACHE: dict[str, list] = {}


def _label_centroids_persisted(spark, sf_dir):
    """Persisted label-cell quantizer (the ivf_topk default path): computed
    ONCE per sf, written via save_centroids, reused driver-side — repeated
    IVF queries issue no centroid job (test-pinned). The SQL oracle still
    recomputes its centroids independently (centl CTE), so the persistence
    shortcut is itself verified."""
    import os

    from data_quality_spark.pipeline.expected import EXPECTED_DIR

    if sf_dir not in _LABELC_CACHE:
        path = os.path.join(EXPECTED_DIR, "label_centroids.parquet")
        emb = _t(spark, sf_dir, "embeddings")
        rows = S.label_centroids(emb, "embedding", "label").collect()
        S.save_centroids(path, rows)
        _LABELC_CACHE[sf_dir] = S.load_centroids(path)
    return _LABELC_CACHE[sf_dir]


def q_sim_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, "vec_id", "embedding", "label",
        _query_vec(spark, sf_dir), TOPK, n_probe=IVF_NPROBE,
        centroids=_label_centroids_persisted(spark, sf_dir),
    )


SQL_SIM_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
centl AS (
  SELECT label, i - 1 AS pos, round(avg(v[i]), 6) AS val
  FROM e, generate_series(1, 64) t(i) GROUP BY 1, 2
),
cent AS (SELECT label, list(val ORDER BY pos) AS c FROM centl GROUP BY 1),
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
ranked AS (
  SELECT label,
         CASE WHEN sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)])) > 0
               AND sqrt(list_sum([q[i]*q[i] for i in range(1, len(q)+1)])) > 0
              THEN list_sum([c[i]*q[i] for i in range(1, len(c)+1)])
                   / (sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)]))
                      * sqrt(list_sum([q[i]*q[i] for i in range(1, len(q)+1)])))
              ELSE 0.0 END AS cs
  FROM cent, q0 ORDER BY cs DESC, label LIMIT {IVF_NPROBE}
),
scored AS (
  SELECT vec_id, {SQL_COSINE} AS cos_sim
  FROM (SELECT vec_id, v FROM e WHERE label IN (SELECT label FROM ranked)), q0
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


# ---------------------------------------------------------------------------
# similarity 5 — TRAINED IVF: deterministic k-means coarse quantizer,
# persisted centroid table, probe search against it
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITER = 3


def _kmeans_path() -> str:
    import os

    from data_quality_spark.pipeline.expected import EXPECTED_DIR

    return os.path.join(EXPECTED_DIR, "kmeans_centroids.parquet")


_KMEANS_CACHE: dict[str, list[list[float]]] = {}


def _train_and_persist_kmeans(spark, sf_dir) -> list[list[float]]:
    """Train (deterministic — no RNG anywhere) and persist the centroid
    table; the SQL oracle reads the SAME persisted table, verifying the
    probe/search side independently while the training side is pinned by
    the python-twin pytest. Training is memoized per sf_dir so the
    centroids and the search query share one run — but the parquet is
    REWRITTEN on every call (the file path is shared across sf_dirs, and
    the oracle that runs next must see THIS sf's centroids)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if sf_dir in _KMEANS_CACHE:
        cents = _KMEANS_CACHE[sf_dir]
    else:
        emb = _t(spark, sf_dir, "embeddings")
        cents = S.train_kmeans_cells(
            emb, "vec_id", "embedding", KMEANS_K, KMEANS_ITER
        )
    tbl = pa.Table.from_pylist(
        [
            {"cell": cell, "pos": pos, "val": float(val)}
            for cell, c in enumerate(cents)
            for pos, val in enumerate(c)
        ],
        schema=pa.schema(
            [("cell", pa.int32()), ("pos", pa.int32()), ("val", pa.float64())]
        ),
    )
    os.makedirs(os.path.dirname(_kmeans_path()), exist_ok=True)
    pq.write_table(tbl, _kmeans_path())
    _KMEANS_CACHE[sf_dir] = cents
    return cents


def q_sim_kmeans_centroids(spark, sf_dir):
    cents = _train_and_persist_kmeans(spark, sf_dir)
    return S.centroids_to_df(spark, cents)


def _sql_kmeans_centroids() -> str:
    return f"SELECT cell, pos, val FROM read_parquet('{_kmeans_path()}')"


IVF_KM_NPROBE = 2


def q_sim_ivf_kmeans_topk(spark, sf_dir):
    cents = _train_and_persist_kmeans(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    return S.ivf_topk_trained(
        emb, "vec_id", "embedding", cents, _query_vec(spark, sf_dir),
        TOPK, n_probe=IVF_KM_NPROBE,
    )


def _sql_cent_cos(rhs: str) -> str:
    """Cosine of a centroid list `c` (already DOUBLE[]) vs vector `rhs`,
    rounded 6dp like the in-plan assignment expression — shared by the
    trained-IVF and IVF-PQ oracles."""
    return f"""
      round(CASE WHEN sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)])) > 0
                  AND sqrt(list_sum([{rhs}[i]*{rhs}[i] for i in range(1, len({rhs})+1)])) > 0
                 THEN list_sum([c[i]*{rhs}[i] for i in range(1, len(c)+1)])
                      / (sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)]))
                         * sqrt(list_sum([{rhs}[i]*{rhs}[i] for i in range(1, len({rhs})+1)])))
                 ELSE 0.0 END, 6)
    """


def _sql_ivf_kmeans_topk() -> str:
    cos_cq = _sql_cent_cos("q")
    cos_cv = _sql_cent_cos("v")
    return f"""
WITH cent AS (
  SELECT cell, list(val ORDER BY pos) AS c
  FROM read_parquet('{_kmeans_path()}') GROUP BY 1
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cell FROM cent, q0 ORDER BY {cos_cq} DESC, cell LIMIT {IVF_KM_NPROBE}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos_cv} DESC, cent.cell
           ) AS rn
    FROM e, cent
  ) WHERE rn = 1
),
scored AS (
  SELECT e.vec_id, {SQL_COSINE} AS cos_sim
  FROM e JOIN assign USING (vec_id), q0
  WHERE assign.cell IN (SELECT cell FROM probe)
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


# ---------------------------------------------------------------------------
# similarity 5b — product quantization (compressed-index ADC search)
# ---------------------------------------------------------------------------


def _pq_path() -> str:
    import os

    from data_quality_spark.pipeline.expected import EXPECTED_DIR

    return os.path.join(EXPECTED_DIR, "pq_codebooks.parquet")


_PQ_CACHE: dict[str, list] = {}


def _train_and_persist_pq(spark, sf_dir) -> list:
    """Deterministic PQ codebooks, persisted for the SQL oracle (the
    _train_and_persist_kmeans contract: training pinned by pytest, the
    encode/ADC search side verified independently by the oracle)."""
    if sf_dir in _PQ_CACHE:
        books = _PQ_CACHE[sf_dir]
    else:
        emb = _t(spark, sf_dir, "embeddings")
        books = S.train_pq(emb, "vec_id", "embedding")
    # geometry-pinned persistence (sub, code, pos, val) + .meta.json sidecar
    S.save_codebooks(_pq_path(), books)
    _PQ_CACHE[sf_dir] = books
    return books


def q_sim_pq_topk(spark, sf_dir):
    """PQ ADC top-k (similarity.pq_encode + pq_topk_adc): the corpus is
    encoded to m code ids per vector and searched via the broadcast
    query-distance table — the embeddings are never read at query time."""
    books = _train_and_persist_pq(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    codes = S.pq_encode(emb, "vec_id", "embedding", books)
    return S.pq_topk_adc(codes, "vec_id", books, _query_vec(spark, sf_dir),
                         TOPK)


def _sql_pq_ev_cte() -> str:
    """Zero-coalesced embedding CTE for the PQ encode twins: the engine's
    encoders stack NULL vectors as zeros (_stack_vecs convention), so the
    SQL side must encode the same zero vector, not propagate NULL through
    the l2 chain (which would tie every code and always pick code 0)."""
    zeros = "[" + ", ".join(["0.0"] * S.EMB_DIM) + "]"
    return (f"ev AS (SELECT vec_id, COALESCE(embedding::DOUBLE[], {zeros})"
            " AS v FROM embeddings)")


def _pq_l2_chain(vec: str) -> str:
    """Squared-L2 of one sub-vector vs a codebook entry `c`, rendered as an
    explicit left-associated `+` chain — the SAME IEEE addition sequence as
    the engine's dim-ordered numpy accumulation, so encode argmins agree
    with no rounding. `sub` is 0-based; DuckDB lists are 1-indexed."""
    dsub = S.EMB_DIM // S.PQ_M
    return " + ".join(
        f"({vec}[sub*{dsub}+{i}] - c[{i}]) * ({vec}[sub*{dsub}+{i}] - c[{i}])"
        for i in range(1, dsub + 1)
    )


def _sql_pq_topk() -> str:
    return f"""
WITH cb AS (
  SELECT sub, code, list(val ORDER BY pos) AS c
  FROM read_parquet('{_pq_path()}') GROUP BY 1, 2
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_sql_pq_ev_cte()},
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT ev.vec_id, cb.sub, cb.code,
           row_number() OVER (
             PARTITION BY ev.vec_id, cb.sub
             ORDER BY {_pq_l2_chain('v')} ASC, cb.code
           ) AS rn
    FROM ev, cb
  ) WHERE rn = 1
),
qt AS (
  SELECT cb.sub, cb.code,
         CAST(round(({_pq_l2_chain('q')}) * 1000000, 0) AS BIGINT) AS t6
  FROM cb, q0
),
adc AS (
  SELECT codes.vec_id, SUM(qt.t6) AS t
  FROM codes JOIN qt USING (sub, code) GROUP BY 1
)
SELECT vec_id, t / 1000000.0 AS adc_dist
FROM adc ORDER BY t, vec_id LIMIT {TOPK}
"""


def q_sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ search (similarity.pq_encode_with_cells + ivfpq_topk): the
    trained coarse quantizer prunes to IVF_KM_NPROBE cells, ADC scores only
    those cells' compressed codes."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    books = _train_and_persist_pq(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    idx = S.pq_encode_with_cells(emb, "vec_id", "embedding", books, cents)
    return S.ivfpq_topk(idx, "vec_id", books, cents,
                        _query_vec(spark, sf_dir), TOPK,
                        n_probe=IVF_KM_NPROBE)


def _sql_ivfpq_topk() -> str:
    return f"""
WITH cent AS (
  SELECT cell, list(val ORDER BY pos) AS c
  FROM read_parquet('{_kmeans_path()}') GROUP BY 1
),
cb AS (
  SELECT sub, code, list(val ORDER BY pos) AS c
  FROM read_parquet('{_pq_path()}') GROUP BY 1, 2
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_sql_pq_ev_cte()},
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cell FROM cent, q0
  ORDER BY {_sql_cent_cos('q')} DESC, cell LIMIT {IVF_KM_NPROBE}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {_sql_cent_cos('v')} DESC, cent.cell
           ) AS rn
    FROM e, cent
  ) WHERE rn = 1
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT ev.vec_id, cb.sub, cb.code,
           row_number() OVER (
             PARTITION BY ev.vec_id, cb.sub
             ORDER BY {_pq_l2_chain('v')} ASC, cb.code
           ) AS rn
    FROM ev, cb
  ) WHERE rn = 1
),
qt AS (
  SELECT cb.sub, cb.code,
         CAST(round(({_pq_l2_chain('q')}) * 1000000, 0) AS BIGINT) AS t6
  FROM cb, q0
),
adc AS (
  SELECT codes.vec_id, SUM(qt.t6) AS t
  FROM codes
  JOIN qt USING (sub, code)
  JOIN assign ON assign.vec_id = codes.vec_id
  WHERE assign.cell IN (SELECT cell FROM probe)
  GROUP BY 1
)
SELECT vec_id, t / 1000000.0 AS adc_dist
FROM adc ORDER BY t, vec_id LIMIT {TOPK}
"""


def _pq_res_path() -> str:
    import os

    from data_quality_spark.pipeline.expected import EXPECTED_DIR

    return os.path.join(EXPECTED_DIR, "pq_res_codebooks.parquet")


_PQ_RES_CACHE: dict[str, list] = {}


def _train_and_persist_pq_residual(spark, sf_dir) -> list:
    """Residual PQ codebooks (trained on v − centroid[cell] of the
    persisted coarse quantizer), persisted for the SQL oracle."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    if sf_dir in _PQ_RES_CACHE:
        books = _PQ_RES_CACHE[sf_dir]
    else:
        emb = _t(spark, sf_dir, "embeddings")
        books = S.train_pq_residual(emb, "vec_id", "embedding", cents)
    S.save_codebooks(_pq_res_path(), books)
    _PQ_RES_CACHE[sf_dir] = books
    return books


def q_sim_ivfpq_res_topk(spark, sf_dir):
    """Residual IVF-PQ (similarity.pq_encode_residual +
    ivfpq_residual_topk): codes quantize the residual vs the assigned
    coarse centroid; search uses one ADC table per probed cell."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    books = _train_and_persist_pq_residual(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    idx = S.pq_encode_residual(emb, "vec_id", "embedding", books, cents)
    return S.ivfpq_residual_topk(idx, "vec_id", books, cents,
                                 _query_vec(spark, sf_dir), TOPK,
                                 n_probe=IVF_KM_NPROBE)


def _pq_res_l2_chain(vec: str) -> str:
    """Squared-L2 of one RESIDUAL sub-vector ((vec − cc) sliced) vs a
    codebook entry `c`, left-associated like _pq_l2_chain; `cc` is the
    assigned (or probed) cell's centroid list."""
    dsub = S.EMB_DIM // S.PQ_M
    t = lambda i: (f"(({vec}[sub*{dsub}+{i}] - cc[sub*{dsub}+{i}]) - c[{i}])")
    return " + ".join(f"{t(i)} * {t(i)}" for i in range(1, dsub + 1))


def _sql_ivfpq_res_ctes() -> str:
    """The shared CTE chain of the residual IVF-PQ oracles (codebooks,
    zero-coalesced embeddings, probe, coarse assignment, residual encode,
    per-probed-cell integer ADC tables) — ONE definition so a fix to any
    CTE (e.g. the NULL-embedding ev coalesce) applies to both twins."""
    return f"""
WITH cent AS (
  SELECT cell, list(val ORDER BY pos) AS c
  FROM read_parquet('{_kmeans_path()}') GROUP BY 1
),
cbr AS (
  SELECT sub, code, list(val ORDER BY pos) AS c
  FROM read_parquet('{_pq_res_path()}') GROUP BY 1, 2
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_sql_pq_ev_cte()},
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cell FROM cent, q0
  ORDER BY {_sql_cent_cos('q')} DESC, cell LIMIT {IVF_KM_NPROBE}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {_sql_cent_cos('v')} DESC, cent.cell
           ) AS rn
    FROM e, cent
  ) WHERE rn = 1
),
centcc AS (SELECT cell, c AS cc FROM cent),
codes AS (
  SELECT vec_id, cell, sub, code FROM (
    SELECT ev.vec_id, assign.cell, cbr.sub, cbr.code,
           row_number() OVER (
             PARTITION BY ev.vec_id, cbr.sub
             ORDER BY {_pq_res_l2_chain('v')} ASC, cbr.code
           ) AS rn
    FROM ev
    JOIN assign USING (vec_id)
    JOIN centcc ON centcc.cell = assign.cell
    CROSS JOIN cbr
  ) WHERE rn = 1
),
qt AS (
  SELECT centcc.cell, cbr.sub, cbr.code,
         CAST(round(({_pq_res_l2_chain('q')}) * 1000000, 0) AS BIGINT) AS t6
  FROM centcc
  JOIN probe USING (cell)
  CROSS JOIN cbr
  CROSS JOIN q0
)"""


def _sql_ivfpq_res_topk() -> str:
    return f"""
{_sql_ivfpq_res_ctes()},
adc AS (
  SELECT codes.vec_id, SUM(qt.t6) AS t
  FROM codes
  JOIN qt ON qt.cell = codes.cell AND qt.sub = codes.sub
         AND qt.code = codes.code
  GROUP BY 1
)
SELECT vec_id, t / 1000000.0 AS adc_dist
FROM adc ORDER BY t, vec_id LIMIT {TOPK}
"""


def q_sim_ivfpq_rerank(spark, sf_dir):
    """Full production IVF-PQ search (similarity.ivfpq_rerank): coarse
    probe → residual ADC nominates candidates from the compressed index →
    exact cosine re-rank on only those embeddings."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    books = _train_and_persist_pq_residual(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    idx = S.pq_encode_residual(emb, "vec_id", "embedding", books, cents)
    return S.ivfpq_rerank(idx, emb, "vec_id", "embedding", books, cents,
                          _query_vec(spark, sf_dir), TOPK,
                          n_probe=IVF_KM_NPROBE, n_candidates=PQ_RERANK_CAND)


def _sql_ivfpq_rerank() -> str:
    return f"""
{_sql_ivfpq_res_ctes()},
cand AS (
  SELECT codes.vec_id, SUM(qt.t6) AS t
  FROM codes
  JOIN qt ON qt.cell = codes.cell AND qt.sub = codes.sub
         AND qt.code = codes.code
  GROUP BY 1
  ORDER BY t, vec_id LIMIT {PQ_RERANK_CAND}
),
scored AS (
  SELECT e.vec_id, {SQL_COSINE} AS cos_sim
  FROM e JOIN cand USING (vec_id), q0
)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


PQ_RERANK_CAND = 50


def q_sim_pq_rerank(spark, sf_dir):
    """Two-stage PQ retrieval (similarity.pq_topk_rerank): ADC nominates
    PQ_RERANK_CAND candidates from the compressed codes, exact cosine
    re-ranks only those rows."""
    books = _train_and_persist_pq(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    codes = S.pq_encode(emb, "vec_id", "embedding", books)
    return S.pq_topk_rerank(codes, emb, "vec_id", "embedding", books,
                            _query_vec(spark, sf_dir), TOPK,
                            n_candidates=PQ_RERANK_CAND)


def _sql_pq_rerank() -> str:
    return f"""
WITH cb AS (
  SELECT sub, code, list(val ORDER BY pos) AS c
  FROM read_parquet('{_pq_path()}') GROUP BY 1, 2
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_sql_pq_ev_cte()},
q0 AS (SELECT v AS q FROM e WHERE vec_id = {QUERY_VEC_ID}),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT ev.vec_id, cb.sub, cb.code,
           row_number() OVER (
             PARTITION BY ev.vec_id, cb.sub
             ORDER BY {_pq_l2_chain('v')} ASC, cb.code
           ) AS rn
    FROM ev, cb
  ) WHERE rn = 1
),
qt AS (
  SELECT cb.sub, cb.code,
         CAST(round(({_pq_l2_chain('q')}) * 1000000, 0) AS BIGINT) AS t6
  FROM cb, q0
),
cand AS (
  SELECT codes.vec_id, SUM(qt.t6) AS t
  FROM codes JOIN qt USING (sub, code) GROUP BY 1
  ORDER BY t, vec_id LIMIT {PQ_RERANK_CAND}
),
scored AS (
  SELECT e.vec_id, {SQL_COSINE} AS cos_sim
  FROM e JOIN cand USING (vec_id), q0
)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id LIMIT {TOPK}
"""


# ---------------------------------------------------------------------------
# similarity 6 — SemDeDup semantic dedup over the trained k-means cells
# ---------------------------------------------------------------------------

SEMANTIC_THRESHOLD = 0.99


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic near-dup pairs
    (similarity.semantic_dedup_pairs): every embedding is assigned to its
    nearest trained-k-means cell and cosine is compared within cells only,
    over the perturbed near-dup corpus (deterministic positives — the same
    corpus sim_lsh_pairs uses)."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    emb = _emb_with_near_dups(spark, sf_dir)
    return S.semantic_dedup_pairs(emb, "vec_id", "v", cents, SEMANTIC_THRESHOLD)


def _sql_dedup_semantic() -> str:
    # nearest-cell assignment (same CTE shape the sim_ivf_kmeans_topk
    # oracle uses: 6dp-rounded cosine, ties to the lowest cell id), then
    # within-cell pairs with 6dp-rounded cosine >= threshold
    cos_cv = """
      round(CASE WHEN sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)])) > 0
                  AND sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)])) > 0
                 THEN list_sum([c[i]*v[i] for i in range(1, len(c)+1)])
                      / (sqrt(list_sum([c[i]*c[i] for i in range(1, len(c)+1)]))
                         * sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)])))
                 ELSE 0.0 END, 6)
    """
    return f"""
WITH cent AS (
  SELECT cell, list(val ORDER BY pos) AS c
  FROM read_parquet('{_kmeans_path()}') GROUP BY 1
),
e AS ({SQL_EMB_NEAR_CORPUS}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos_cv} DESC, cent.cell
           ) AS rn
    FROM e, cent
  ) WHERE rn = 1
),
a AS (SELECT e.vec_id, e.v, assign.cell FROM e JOIN assign USING (vec_id)),
cand AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b, l.v AS va, r.v AS vb
  FROM a l JOIN a r USING (cell)
  WHERE l.vec_id < r.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(CASE WHEN sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)])) > 0
                     AND sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)])) > 0
                    THEN list_sum([va[i]*vb[i] for i in range(1, len(va)+1)])
                         / (sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)]))
                            * sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)])))
                    ELSE 0.0 END, 6) AS cos_sim
  FROM cand
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {SEMANTIC_THRESHOLD}
"""


def q_dedup_semantic_drop(spark, sf_dir):
    """Semantic-dedup survivor set (keep-lowest within each verified pair)
    — the SemDeDup end-to-end shape: quantize, compare within cells, drop
    losers by anti-join."""
    cents = _train_and_persist_kmeans(spark, sf_dir)
    emb = _emb_with_near_dups(spark, sf_dir)
    return S.semantic_dedup_drop(
        emb, "vec_id", "v", cents, SEMANTIC_THRESHOLD
    ).select("vec_id")


def _sql_dedup_semantic_drop() -> str:
    return f"""
SELECT vec_id FROM ({SQL_EMB_NEAR_CORPUS})
WHERE vec_id NOT IN (SELECT id_b FROM ({_sql_dedup_semantic()}))
"""


# ---------------------------------------------------------------------------
# text 00 — URL/host blocklist filtering (RefinedWeb-style URL stage)
# ---------------------------------------------------------------------------

URL_BLOCKLIST = ["bad.example", "ads.example"]


def _synthetic_urls():
    """Deterministic per-doc url over 5 host shapes (subdomain of a blocked
    host, blocked apex, clean, blocked with port, clean with credentials) —
    both engines construct the same url per doc_id."""
    i = F.col("doc_id").cast("string")
    return (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://spam.bad.example/p/"), i))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("http://bad.example/p/"), i))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("https://ok.example/p/"), i))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("https://ads.example:8080/t?x="), i))
        .otherwise(F.concat(F.lit("https://user:pw@sub.ok.example/p/"), i))
    )


SQL_SYNTH_URL = """
  CASE doc_id % 5
    WHEN 0 THEN 'https://spam.bad.example/p/' || doc_id
    WHEN 1 THEN 'http://bad.example/p/' || doc_id
    WHEN 2 THEN 'https://ok.example/p/' || doc_id
    WHEN 3 THEN 'https://ads.example:8080/t?x=' || doc_id
    ELSE 'https://user:pw@sub.ok.example/p/' || doc_id
  END
"""


def q_text_url_blocklist(spark, sf_dir):
    """Kept rows after the host blocklist stage (textops
    .url_blocklist_filter, literal-blocklist map-only path): a doc drops
    when its host or any parent domain is blocklisted."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_urls().alias("url")
    )
    return T.url_blocklist_filter(docs, "url", URL_BLOCKLIST)


def _sql_text_url_blocklist() -> str:
    bl = ", ".join(f"'{b}'" for b in URL_BLOCKLIST)
    return f"""
WITH u AS (SELECT doc_id, {SQL_SYNTH_URL} AS url FROM documents),
h AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '{T.HOST_RE}', 1)) AS host
  FROM u
)
SELECT doc_id, url, host FROM h
WHERE NOT list_has_any(
  [array_to_string((string_split(host, '.'))[i:], '.')
   for i in range(1, len(string_split(host, '.')) + 1)],
  [{bl}])
"""


# ---------------------------------------------------------------------------
# text 0b — soft URL spam scoring (graded companion of the hard blocklist)
# ---------------------------------------------------------------------------


def q_text_url_spam(spark, sf_dir):
    """RefinedWeb-style weighted-fragment URL spam scoring (textops
    .url_spam_score) over the synthetic urls: 'spam.bad.example' hosts
    score 1.0 (dropped at the default threshold), 'ads.example' trackers
    score 0.5 (ads. + track fragments, kept), clean hosts 0.0 — a pure
    map-only codegen projection, no regex, no shuffle."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_urls().alias("url")
    )
    return T.url_spam_score(docs, "url")


def _sql_text_url_spam() -> str:
    terms = []
    for frag in sorted(T.URL_SPAM_FRAGMENTS_DEFAULT):
        pts = T.URL_SPAM_FRAGMENTS_DEFAULT[frag]
        terms.append(
            f"(length(u) - length(replace(u, '{frag}', ''))) / {len(frag)}"
            f" * {pts}"
        )
    total = "\n     + ".join(terms)
    return f"""
WITH base AS (SELECT doc_id, {SQL_SYNTH_URL} AS url FROM documents),
lo AS (SELECT doc_id, url, lower(url) AS u FROM base),
s AS (
  SELECT doc_id, url,
     ({total}) / 100.0 AS spam_score
  FROM lo)
SELECT doc_id, url, spam_score,
       spam_score < {T.URL_SPAM_THRESHOLD} AS url_keep
FROM s
"""


# ---------------------------------------------------------------------------
# text 0c — tokenizer fertility profile per language
# ---------------------------------------------------------------------------


def q_text_fertility(spark, sf_dir):
    """Per-language tokenizer-fertility stats (textops.fertility_stats):
    whitespace vs BPE-ish pre-token counts and chars/bytes per token —
    ONE scan + one tiny-key aggregate; every ratio a single exact double
    division of integer sums (bit-portable, no rounding)."""
    return T.fertility_stats(_t(spark, sf_dir, "documents"), "lang", "text")


def _sql_text_fertility() -> str:
    return rf"""
WITH g AS (
  SELECT lang AS grp, count(*) AS n_docs,
         sum(len({SQL_TOKS}))::BIGINT AS ws_tokens,
         sum(len(list_filter(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'),
                             x -> x <> '')))::BIGINT AS bpe_tokens,
         sum(length(text))::BIGINT AS n_chars,
         sum(strlen(text))::BIGINT AS n_bytes
  FROM documents WHERE text IS NOT NULL GROUP BY 1)
SELECT grp, n_docs, ws_tokens, bpe_tokens,
       ws_tokens::DOUBLE / n_docs AS toks_per_doc,
       bpe_tokens::DOUBLE / nullif(ws_tokens, 0) AS fertility,
       n_chars::DOUBLE / nullif(bpe_tokens, 0) AS chars_per_tok,
       n_bytes::DOUBLE / nullif(bpe_tokens, 0) AS bytes_per_tok
FROM g
"""


# ---------------------------------------------------------------------------
# text 0d — latest-snapshot keeper (cross-crawl revision dedup)
# ---------------------------------------------------------------------------


def q_text_crawl_latest(spark, sf_dir):
    """Latest-snapshot keeper (textops.latest_snapshot): three synthetic
    crawls of the corpus (staggered membership, versioned text) collapse
    to one row per doc from its newest crawl — struct-max aggregation,
    no window sort."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    snaps = None
    for k in range(3):
        s = docs.where((F.col("doc_id") + k) % (k + 2) == 0).select(
            "doc_id",
            F.lit(202401 + k).cast("bigint").alias("crawl_id"),
            F.concat(F.col("text"), F.lit(f" v{k}")).alias("text"),
        )
        snaps = s if snaps is None else snaps.unionByName(s)
    return T.latest_snapshot(snaps, "doc_id", "crawl_id", ["text"])


def _sql_text_crawl_latest() -> str:
    parts = [
        f"SELECT doc_id, {202401 + k} AS crawl_id, text || ' v{k}' AS text"
        f" FROM documents WHERE (doc_id + {k}) % {k + 2} = 0"
        for k in range(3)
    ]
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH snaps AS ({u})
SELECT doc_id, max(crawl_id) AS crawl_id,
       arg_max(text, crawl_id) AS text
FROM snaps GROUP BY 1
"""


def q_text_crawl_latest_tied(spark, sf_dir):
    """Tie-semantics pin for latest_snapshot (r4 ADVICE): the fixture
    PRODUCES tied crawl_ids per doc (two snapshots share crawl 202401 with
    different texts), so the documented tie rule — max payload struct, i.e.
    lexicographic max text among max-crawl rows — is what the hash gate
    actually verifies (the untied fixture could never exercise it)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(
        "doc_id", F.lit(202401).cast("bigint").alias("crawl_id"),
        F.concat(F.col("text"), F.lit(" a1")).alias("text"))
    b = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.lit(202401).cast("bigint").alias("crawl_id"),
        F.concat(F.col("text"), F.lit(" b1")).alias("text"))
    c = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.lit(202402).cast("bigint").alias("crawl_id"),
        F.concat(F.col("text"), F.lit(" c2")).alias("text"))
    snaps = a.unionByName(b).unionByName(c)
    return T.latest_snapshot(snaps, "doc_id", "crawl_id", ["text"])


def _sql_text_crawl_latest_tied() -> str:
    # engine tie rule restated in ANSI SQL: max crawl_id first, then
    # lexicographic max text among the rows tied on it (= struct max)
    return """
WITH snaps AS (
  SELECT doc_id, 202401 AS crawl_id, text || ' a1' AS text FROM documents
  UNION ALL
  SELECT doc_id, 202401, text || ' b1' FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 202402, text || ' c2' FROM documents WHERE doc_id % 3 = 0),
mx AS (SELECT doc_id, max(crawl_id) AS crawl_id FROM snaps GROUP BY 1)
SELECT s.doc_id, s.crawl_id, max(s.text) AS text
FROM snaps s JOIN mx USING (doc_id, crawl_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# graph 1 — host-rank quality prior (CCNet/RefinedWeb-style crawl ranks)
# ---------------------------------------------------------------------------

HOST_RANK_N_HOSTS = 23
HOST_RANK_FANOUT = 3


def _synthetic_host_edges(spark, sf_dir):
    """Deterministic host link graph derived from doc_id: each doc's host
    h{doc_id%23} links to h{(doc_id*7+j)%23} for j=1..3 — both engines
    construct the same edge multiset."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = lambda e: F.concat(  # noqa: E731
        F.lit("h"), e.cast("string"), F.lit(".example")
    )
    edges = docs.select(
        host(F.col("doc_id") % HOST_RANK_N_HOSTS).alias("src_host"),
        F.explode(
            F.array(
                *[
                    host((F.col("doc_id") * 7 + F.lit(j)) % HOST_RANK_N_HOSTS)
                    for j in range(1, HOST_RANK_FANOUT + 1)
                ]
            )
        ).alias("dst_host"),
    )
    return G.edges_from_pages(edges, "src_host", "dst_host")


def q_graph_host_rank(spark, sf_dir):
    """Host-graph PageRank quality prior (ops.graph.host_rank): damped
    power iteration in exact integer micro-units over a deterministic
    synthetic host graph — the CommonCrawl-rank signal CCNet/RefinedWeb
    threshold before fetching content. Bit-portable: bigint sums are
    order-independent, so Spark and the unrolled-CTE DuckDB oracle agree
    exactly."""
    return G.host_rank(_synthetic_host_edges(spark, sf_dir))


def _sql_graph_host_rank() -> str:
    h = HOST_RANK_N_HOSTS
    edges = f"""
  SELECT 'h' || (doc_id % {h}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {h}) <> ((doc_id * 7 + j) % {h})
"""
    return G.sql_host_rank(edges)


def q_graph_host_rank_wt(spark, sf_dir):
    """WEIGHTED host rank: the same synthetic graph but each doc's j-th
    outlink carries weight j (1..3, summed per host pair) — NON-uniform
    per-src weights, so rank genuinely flows proportionally to link
    weight (a uniform-weight fixture would floor-divide to the exact
    unweighted result). The (src, dst, w) shape is what
    host_edges_from_pages_html(weighted=True) produces. Same exact
    integer micro-unit arithmetic (rank × w fits bigint)."""
    edges = (
        _synthetic_host_edges_raw(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.sum("w_unit").alias("w"))
    )
    return G.host_rank(edges, weight_col="w")


def _synthetic_host_edges_raw(spark, sf_dir):
    """Pre-aggregation (src, dst, w_unit) rows — one per (doc, outlink),
    the j-th outlink weighted j; the unweighted query's edges_from_pages
    collapses the same pairs to distinct."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = lambda e: F.concat(  # noqa: E731
        F.lit("h"), e.cast("string"), F.lit(".example")
    )
    pair = lambda j: F.struct(  # noqa: E731
        host((F.col("doc_id") * 7 + F.lit(j)) % HOST_RANK_N_HOSTS).alias("d"),
        F.lit(j).cast("bigint").alias("w"),
    )
    return (
        docs.select(
            host(F.col("doc_id") % HOST_RANK_N_HOSTS).alias("src"),
            F.explode(
                F.array(*[pair(j) for j in range(1, HOST_RANK_FANOUT + 1)])
            ).alias("dw"),
        )
        .select("src", F.col("dw.d").alias("dst"), F.col("dw.w").alias("w_unit"))
        .where(F.col("src") != F.col("dst"))
    )


TRUST_SEEDS = ("h0.example", "h1.example", "h2.example")


def q_graph_trust_rank(spark, sf_dir):
    """TrustRank (Gyöngyi 2004) over the synthetic host graph: rank mass
    enters ONLY through the trusted seed hosts (teleport vector), so every
    host's score is its link-distance-discounted reachability from trust —
    the classic spam-demotion variant of the crawl-rank prior. Exact
    integer arithmetic; bit-exact vs the unrolled-CTE oracle."""
    return G.host_rank(
        _synthetic_host_edges(spark, sf_dir), teleport=TRUST_SEEDS
    )


def _sql_graph_rank_edges() -> str:
    h = HOST_RANK_N_HOSTS
    return f"""
  SELECT 'h' || (doc_id % {h}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {h}) <> ((doc_id * 7 + j) % {h})
"""


def _sql_graph_host_rank_wt() -> str:
    h = HOST_RANK_N_HOSTS
    edges = f"""
  SELECT src, dst, sum(j)::BIGINT AS w FROM (
    SELECT 'h' || (doc_id % {h}) || '.example' AS src,
           'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst, j
    FROM documents, unnest([1, 2, 3]) AS t(j)
    WHERE (doc_id % {h}) <> ((doc_id * 7 + j) % {h})
  ) GROUP BY 1, 2
"""
    return G.sql_host_rank(edges, weighted=True)


def _sql_graph_trust_rank() -> str:
    return G.sql_host_rank(_sql_graph_rank_edges(), teleport=TRUST_SEEDS)


# personalized rank: non-uniform teleport weights (CCNet-style quality
# prior from a labeled seed set), over a graph that HAS dangling hosts so
# the per-iteration dangling-mass fold is exercised by the driver gate
HOST_RANK_SRC_MOD = 17  # only h0..h16 ever link out -> h17..h22 dangling
PERSONAL_SEEDS = {
    "h0.example": 4.0,   # non-uniform: h0 gets 4x h2's teleport share
    "h1.example": 2.0,
    "h2.example": 1.0,
    "h99.example": 1.0,  # absent from the graph: lost-mass semantics
}


def _synthetic_dangling_edges(spark, sf_dir):
    """Host link graph where only h0..h16 link out (src = doc_id % 17)
    while destinations span h0..h22 — hosts h17..h22 are DANGLING and
    park rank mass that the fold must redistribute each iteration."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = lambda e: F.concat(  # noqa: E731
        F.lit("h"), e.cast("string"), F.lit(".example")
    )
    edges = docs.select(
        host(F.col("doc_id") % HOST_RANK_SRC_MOD).alias("src_host"),
        F.explode(
            F.array(
                *[
                    host((F.col("doc_id") * 7 + F.lit(j)) % HOST_RANK_N_HOSTS)
                    for j in range(1, HOST_RANK_FANOUT + 1)
                ]
            )
        ).alias("dst_host"),
    )
    return G.edges_from_pages(edges, "src_host", "dst_host")


def q_graph_personal_rank(spark, sf_dir):
    """Personalized PageRank (ops.graph.host_rank(teleport=dict)): the
    teleport vector is a weighted labeled seed set — the CCNet-style
    'quality prior from trusted hosts' generalizing TrustRank's uniform
    seeds. The fixture graph has 6 dangling hosts, so the per-iteration
    dangling-mass fold (through the teleport vector, exact PERS_SCALE
    integer arithmetic) is live in this query; one seed is absent from
    the graph, pinning the documented lost-mass semantics."""
    return G.host_rank(
        _synthetic_dangling_edges(spark, sf_dir), teleport=PERSONAL_SEEDS
    )


def _sql_graph_personal_rank() -> str:
    h, m = HOST_RANK_N_HOSTS, HOST_RANK_SRC_MOD
    edges = f"""
  SELECT 'h' || (doc_id % {m}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {m}) <> ((doc_id * 7 + j) % {h})
"""
    return G.sql_host_rank(edges, teleport=PERSONAL_SEEDS)


# connected components: a multi-island host graph (island g = doc_id % 4 has
# 3+g nodes, so component sizes genuinely differ) — the web-graph "mirror
# farm / link ring" detector that groups hosts before per-group quotas
CC_N_ISLANDS = 4


def _synthetic_island_edges(spark, sf_dir):
    """Deterministic undirected multi-component host graph: island
    g = doc_id % 4 has 3+g nodes 'g{g}n{i}.example'; each doc adds edge
    (a, a + 1 + doc_id%2 mod n_g) within its island — islands never
    cross-link, so the true components are known by construction."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    g = F.col("doc_id") % CC_N_ISLANDS
    n_g = g + F.lit(3)
    a = F.expr(f"doc_id div {CC_N_ISLANDS}") % n_g
    b = (a + 1 + F.col("doc_id") % 2) % n_g
    host = lambda e: F.concat(  # noqa: E731
        F.lit("g"), g.cast("string"), F.lit("n"), e.cast("string"),
        F.lit(".example"),
    )
    return docs.select(host(a).alias("src"), host(b).alias("dst"))


def q_graph_conn_comp(spark, sf_dir):
    """Undirected connected components (ops.graph.connected_components):
    large-star/small-star alternation (Kiveris 2014) — O(log n) rounds of
    bare (node, node) shuffles, the web-scale alternative to O(diameter)
    label propagation. Labels are component-minimum host ids (binary
    string compare, identical in Spark and DuckDB), so the recursive-CTE
    oracle hashes exactly."""
    return G.connected_components(_synthetic_island_edges(spark, sf_dir))


def _sql_graph_conn_comp() -> str:
    k = CC_N_ISLANDS
    edges = f"""
  SELECT 'g' || (doc_id % {k}) || 'n' ||
           ((doc_id // {k}) % ((doc_id % {k}) + 3)) || '.example' AS src,
         'g' || (doc_id % {k}) || 'n' ||
           (((doc_id // {k}) % ((doc_id % {k}) + 3) + 1 + doc_id % 2)
              % ((doc_id % {k}) + 3)) || '.example' AS dst
  FROM documents
"""
    return G.sql_connected_components(edges)


HARMONIC_RADIUS = 4


def q_graph_harmonic(spark, sf_dir):
    """Bounded-radius harmonic centrality (ops.graph.harmonic_exact) over
    the dangling-host graph: H(v) = Σ 1/d(u→v) within 4 hops, integer
    micro-unit sums (bit-portable). The 6 dangling hosts have inlinks but
    no outlinks, so they score high while contributing nothing — the
    spam-resistant inverse of outlink-manufactured rank. This exact
    pair-set BFS is the verification tier; graph.harmonic_hll is the
    O(nodes × registers) scale path it calibrates."""
    return G.harmonic_exact(
        _synthetic_dangling_edges(spark, sf_dir), radius=HARMONIC_RADIUS
    )


def q_graph_harmonic_hll(spark, sf_dir):
    """HyperBall harmonic centrality (ops.graph.harmonic_hll) — the
    O(nodes × 64-register) sketch path over the same dangling-host graph
    as graph_harmonic. Hash-exact despite being a sketch: registers come
    from portable md5 string ops, the per-round state collapses to the
    exact bigint S_t = Σ 2^(56-reg), and the oracle derives the SAME
    registers non-iteratively from exact BFS balls (the HyperBall
    invariant: sketch-of-union == union-of-sketches)."""
    return G.harmonic_hll(
        _synthetic_dangling_edges(spark, sf_dir), radius=HARMONIC_RADIUS
    )


def _sql_graph_harmonic_hll() -> str:
    h, m = HOST_RANK_N_HOSTS, HOST_RANK_SRC_MOD
    edges = f"""
  SELECT 'h' || (doc_id % {m}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {m}) <> ((doc_id * 7 + j) % {h})
"""
    return G.sql_harmonic_hll(edges, radius=HARMONIC_RADIUS)


def _sql_graph_harmonic() -> str:
    h, m = HOST_RANK_N_HOSTS, HOST_RANK_SRC_MOD
    edges = f"""
  SELECT 'h' || (doc_id % {m}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {m}) <> ((doc_id * 7 + j) % {h})
"""
    return G.sql_harmonic_exact(edges, radius=HARMONIC_RADIUS)


def _sql_dangling_edges() -> str:
    h, m = HOST_RANK_N_HOSTS, HOST_RANK_SRC_MOD
    return f"""
  SELECT 'h' || (doc_id % {m}) || '.example' AS src,
         'h' || ((doc_id * 7 + j) % {h}) || '.example' AS dst
  FROM documents, unnest([1, 2, 3]) AS t(j)
  WHERE (doc_id % {m}) <> ((doc_id * 7 + j) % {h})
"""


def q_graph_hits(spark, sf_dir):
    """HITS hubs & authorities (ops.graph.hits): Kleinberg's two-score
    complement to the PageRank prior — authority separates endorsed
    CONTENT hosts from mere linkers; high-hub/low-authority is the
    link-farm shape PageRank alone can't see. Runs on the dangling-host
    graph, so the pure-authority hosts (h17..h22: inlinks, no outlinks →
    hub exactly 0) and the L∞ integer normalization are both live. Exact
    bigint micro-units — hash-exact vs the unrolled-CTE oracle."""
    return G.hits(_synthetic_dangling_edges(spark, sf_dir))


def _sql_graph_hits() -> str:
    return G.sql_hits(_sql_dangling_edges())


def q_graph_degree_stats(spark, sf_dir):
    """Per-host in/out degree (ops.graph.degree_stats) over the distinct
    edge set of the dangling-host graph — the crawl-graph health profile
    (out_deg ≫ in_deg flags directories/link farms; in_deg = 0 flags
    frontier leaves) computed from two (host, bigint) aggregates and one
    outer join; the h17..h22 dangling hosts pin the out_deg = 0 side."""
    return G.degree_stats(_synthetic_dangling_edges(spark, sf_dir))


def _sql_graph_degree_stats() -> str:
    return G.sql_degree_stats(_sql_dangling_edges())


# ---------------------------------------------------------------------------
# graph 5 — anchor-text aggregation (the link-description prior)
# ---------------------------------------------------------------------------

# Deterministic anchor-bearing pages derived from doc_id: page for doc d
# (host h{d%23}) carries three absolute anchors to h{(d*7+j)%23} — one
# plain double-quoted, one EMPTY-body uppercase single-quoted (exercises
# (?i) + n_empty), one mixed-case multi-token — plus two decoys the
# grammar must SKIP: a relative link and an image anchor (body contains
# markup). Both engines render the identical byte string.


def _anchor_pages(spark, sf_dir):
    h = HOST_RANK_N_HOSTS
    d = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    host = lambda j: F.concat(  # noqa: E731
        F.lit("h"), s((d * 7 + F.lit(j)) % h), F.lit(".example")
    )
    html = F.concat(
        F.lit('<p>intro</p><a class="x" href="http://'), host(1),
        F.lit('/p'), s(d), F.lit('">anchor '), s(d % 11), F.lit("</a>"),
        F.lit("<A HREF='http://"), host(2), F.lit("/q"), s(d),
        F.lit("'></A>"),
        F.lit('<a href="http://'), host(3), F.lit('/r'), s(d),
        F.lit('">Go '), s(d % 5), F.lit(' Now</a>'),
        F.lit('<a href="/rel">skip</a>'
              '<a href="http://h0.example/i"><img/></a>'),
    )
    return _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("http://h"), s(d % h), F.lit(".example/p"), s(d))
        .alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def q_sketch_distinct_hll(spark, sf_dir):
    """Per-host distinct-URL cardinality via the 64-register HLL sketch
    (ops.sketches.distinct_hll) — the 100 TB replacement for
    COUNT(DISTINCT url) GROUP BY host, whose exact state is O(urls) per
    host. Hash-exact despite being a sketch: registers are portable md5
    string ops, the state collapses to one exact bigint, and the single
    float estimate is the same IEEE division in both engines. Fixture:
    urls recycle (doc_id % 40) paths over 7 hosts → true distinct = 40
    per host; the raw-HLL estimate's job here is determinism, accuracy
    is pinned at larger n by pytest."""
    from data_quality_spark.ops import sketches as SK

    d = F.col("doc_id")
    rows = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (d % 7).cast("string"), F.lit(".example"))
        .alias("host"),
        F.concat(
            F.lit("http://h"), (d % 7).cast("string"),
            F.lit(".example/p"), (d % 40).cast("string"),
        ).alias("url"),
    )
    return SK.distinct_hll(rows, "host", "url")


def _sql_sketch_distinct_hll() -> str:
    from data_quality_spark.ops import sketches as SK

    rows = """
  SELECT 'h' || (doc_id % 7) || '.example' AS host,
         'http://h' || (doc_id % 7) || '.example/p' || (doc_id % 40) AS url
  FROM documents
"""
    return SK.sql_distinct_hll(rows, "host", "url")


REG_DOMAIN_HOST_SQL = """
  CASE doc_id % 6
    WHEN 0 THEN 'www.s' || (doc_id % 9) || '.co.uk'
    WHEN 1 THEN 's' || (doc_id % 9) || '.co.uk'
    WHEN 2 THEN 'a.b.s' || (doc_id % 7) || '.com'
    WHEN 3 THEN 's' || (doc_id % 7) || '.com'
    WHEN 4 THEN 'co.uk'
    ELSE 'media.s' || (doc_id % 5) || '.com.au' END
"""


def _reg_domain_hosts(spark, sf_dir):
    d = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    host = (
        F.when(d % 6 == 0, F.concat(F.lit("www.s"), s(d % 9), F.lit(".co.uk")))
        .when(d % 6 == 1, F.concat(F.lit("s"), s(d % 9), F.lit(".co.uk")))
        .when(d % 6 == 2, F.concat(F.lit("a.b.s"), s(d % 7), F.lit(".com")))
        .when(d % 6 == 3, F.concat(F.lit("s"), s(d % 7), F.lit(".com")))
        .when(d % 6 == 4, F.lit("co.uk"))
        .otherwise(F.concat(F.lit("media.s"), s(d % 5), F.lit(".com.au")))
    )
    return _t(spark, sf_dir, "documents").select(host.alias("host"))


def q_text_reg_domain(spark, sf_dir):
    """Registered-domain rollup (textops.registered_domain): hosts
    collapse to label-before-public-suffix (public-suffix rules — the
    publisher grain quotas and per-site dedup group by; a per-host quota
    treats a.example.co.uk and example.co.uk as different sites, this
    doesn't). Pure codegen string arithmetic, no UDF/join; the NULL row
    is the public-suffix-only host class."""
    hosts = _reg_domain_hosts(spark, sf_dir)
    return hosts.groupBy(
        T.registered_domain(F.col("host")).alias("reg_domain")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    )


def _sql_text_reg_domain() -> str:
    reg = T.sql_registered_domain("host")
    return f"""
WITH hosts AS (SELECT {REG_DOMAIN_HOST_SQL} AS host FROM documents)
SELECT {reg} AS reg_domain,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT host)::BIGINT AS n_hosts
FROM hosts GROUP BY 1
"""


def q_text_len_quantiles(spark, sf_dir):
    """Exact per-language document-length quantiles
    (textops.group_quantiles): pure rank selection over the compact
    (lang, distinct length, count) frame — no float interpolation, no
    row-grain sort, engine-exact. The datasheet/filter-tuning
    distribution primitive approx_percentile can't give (its sketch is
    engine-specific)."""
    return T.group_quantiles(
        _t(spark, sf_dir, "documents"), "lang", "n_chars"
    )


def _sql_text_len_quantiles() -> str:
    return T.sql_group_quantiles(
        "SELECT lang, n_chars FROM documents", "lang", "n_chars"
    )


CMS_PROBE_TOKENS = ["spark", "join", "table", "nosuchtoken"]


def q_sketch_token_cms(spark, sf_dir):
    """Count-Min token-frequency table (ops.sketches.token_cms) over the
    documents text: the O(vocabulary)-free corpus-frequency state — the
    exchange is bounded by d·w·partitions int rows no matter the corpus.
    Exact integer cells, so the DuckDB twin builds the identical table."""
    from data_quality_spark.ops import sketches as SK

    return SK.token_cms(_t(spark, sf_dir, "documents"), "text")


def _sql_sketch_token_cms() -> str:
    from data_quality_spark.ops import sketches as SK

    return SK.sql_token_cms("SELECT text FROM documents", "text")


def q_sketch_cms_heavy(spark, sf_dir):
    """Point-frequency estimates for probe tokens from the CMS table
    (ops.sketches.cms_estimate): min over the d hashed cells, absent
    cell = 0 (the 'nosuchtoken' probe). Never underestimates; the
    deterministic hash family makes even the collision error identical
    across engines."""
    from data_quality_spark.ops import sketches as SK

    sk = SK.token_cms(_t(spark, sf_dir, "documents"), "text")
    return SK.cms_estimate(sk, CMS_PROBE_TOKENS)


def _sql_sketch_cms_heavy() -> str:
    from data_quality_spark.ops import sketches as SK

    return SK.sql_cms_estimate(
        SK.sql_token_cms("SELECT text FROM documents", "text"),
        CMS_PROBE_TOKENS,
    )


def q_graph_anchor_stats(spark, sf_dir):
    """Per-target-host anchor-text statistics (ops.graph.anchor_stats):
    inbound anchor volume, referring-host breadth, text diversity, empty
    anchors, token mass — the off-page description signal search ranking
    and anchor-spam detection both read. Map-side grammar extraction
    (extract.ANCHOR_PATTERN, Java/RE2-identical by construction); the
    exchange carries (host, host, short text) only."""
    return G.anchor_stats(_anchor_pages(spark, sf_dir))


def _sql_graph_anchor_stats() -> str:
    h = HOST_RANK_N_HOSTS
    hh = lambda j: f"'http://h' || ((doc_id * 7 + {j}) % {h}) || '.example'"  # noqa: E731
    pages = f"""
  SELECT 'http://h' || (doc_id % {h}) || '.example/p' || doc_id AS url,
         '<p>intro</p><a class="x" href="' || {hh(1)} || '/p' || doc_id
         || '">anchor ' || (doc_id % 11) || '</a>'
         || '<A HREF=''' || {hh(2)} || '/q' || doc_id || '''></A>'
         || '<a href="' || {hh(3)} || '/r' || doc_id || '">Go '
         || (doc_id % 5) || ' Now</a>'
         || '<a href="/rel">skip</a><a href="http://h0.example/i"><img/></a>'
         AS html
  FROM documents
"""
    return G.sql_anchor_stats(pages)


# ---------------------------------------------------------------------------
# text 0a — PII audit counts (scrub stage's reporting twin)
# ---------------------------------------------------------------------------


def q_text_pii_counts(spark, sf_dir):
    """Per-type PII counts (textops.pii_counts) over PII-seeded text: both
    engines append the same deterministic snippets per doc_id, so counts
    must hash-match (fixture docs carry no organic PII)."""
    docs = _t(spark, sf_dir, "documents")
    extra = (
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" contact alice@mail.example or bob@mail.example"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" call +39 123 456 789"))
        .when(F.col("doc_id") % 4 == 2,
              F.lit(" ip 10.0.0.1 card 1234 5678 9012 3456"))
        .otherwise(F.lit(""))
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), extra).alias("text")
    )
    return T.pii_counts(seeded, "doc_id", "text")


def q_text_badwords(spark, sf_dir):
    """C4-style bad-words audit (textops.badwords_counts) over
    blocklist-seeded text: deterministic snippets per doc_id exercise
    multiple hits, case-insensitive hits, and the word-boundary non-match
    ('casinos' must NOT count as 'casino') identically in both engines."""
    docs = _t(spark, sf_dir, "documents")
    extra = (
        F.when(F.col("doc_id") % 5 == 0,
               F.lit(" visit our casino, best casino around"))
        .when(F.col("doc_id") % 5 == 1, F.lit(" cheap Viagra XXX deals"))
        .when(F.col("doc_id") % 5 == 2, F.lit(" casinos are unrelated"))
        .otherwise(F.lit(""))
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), extra).alias("text")
    )
    return T.badwords_counts(seeded, "doc_id", "text")


def _sql_text_badwords() -> str:
    pat = T._badwords_pattern(T.BADWORDS_DEFAULT)
    return f"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE doc_id % 5
           WHEN 0 THEN ' visit our casino, best casino around'
           WHEN 1 THEN ' cheap Viagra XXX deals'
           WHEN 2 THEN ' casinos are unrelated'
           ELSE '' END AS text
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       len(regexp_extract_all(text, '{pat}'))::INT AS n_badwords,
       len(regexp_extract_all(text, '{pat}')) > 0 AS has_badwords
FROM seeded
"""


def _sql_text_pii_counts() -> str:
    from data_quality_spark.functions.scrub import SCRUB_PATTERNS

    count_cols = ",\n  ".join(
        f"len(regexp_extract_all(text, '{pat}'))::INT AS n_{name}"
        for name, pat, _ in SCRUB_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in SCRUB_PATTERNS)
    return f"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 0 THEN ' contact alice@mail.example or bob@mail.example'
           WHEN 1 THEN ' call +39 123 456 789'
           WHEN 2 THEN ' ip 10.0.0.1 card 1234 5678 9012 3456'
           ELSE '' END AS text
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, {count_cols}, ({total})::INT AS n_pii_total FROM seeded
"""


# ---------------------------------------------------------------------------
# text 0 — DSIR importance weights (target = one source stratum)
# ---------------------------------------------------------------------------

DSIR_TARGET_SOURCE = "src14"


def q_text_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (textops.dsir_weights): hashed-unigram
    target-vs-raw log-likelihood ratio per document, with the 'src14'
    stratum (the English one in the fixture) as the in-domain target."""
    docs = _t(spark, sf_dir, "documents")
    return T.dsir_weights(
        docs, "doc_id", "text", F.col("source") == DSIR_TARGET_SOURCE
    )


def _sql_text_dsir_weights() -> str:
    nb = T.DSIR_BUCKETS
    h = sql_hash64("tok")
    return f"""
WITH tk AS (
  SELECT doc_id, source = '{DSIR_TARGET_SOURCE}' AS tgt,
         unnest({SQL_TOKS}) AS tok
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, tgt, ({h}) % {nb} AS b, count(*) AS cnt FROM tk GROUP BY 1, 2, 3
),
raw AS (SELECT b, sum(cnt)::BIGINT AS r FROM g GROUP BY 1),
tg AS (SELECT b, sum(cnt)::BIGINT AS t FROM g WHERE tgt GROUP BY 1),
tot AS (SELECT (SELECT sum(r)::BIGINT FROM raw) AS rtot,
               (SELECT coalesce(sum(t), 0)::BIGINT FROM tg) AS ttot),
w AS (
  SELECT b, round(ln((coalesce(t, 0) + 1)::DOUBLE / (ttot + {nb}))
               - ln((r + 1)::DOUBLE / (rtot + {nb})), 6) AS w
  FROM raw LEFT JOIN tg USING (b), tot
)
SELECT doc_id, sum(cnt)::BIGINT AS n_toks, round(sum(cnt * w), 6) AS dsir_logw
FROM g JOIN w USING (b)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# text 0b — hashed linear quality classifier (train + score-and-filter)
# ---------------------------------------------------------------------------

CLF_LABEL_LANG = "en"


def q_text_clf_score(spark, sf_dir):
    """fastText-style hashed-linear classifier filter stage
    (textops.train_nb_classifier + classifier_score): train a multinomial-NB
    model with the English documents as the positive class, then score and
    keep/drop the whole corpus at the 0.5 sigmoid threshold — the
    fineweb-edu / DCLM classifier-filter shape."""
    docs = _t(spark, sf_dir, "documents")
    weights = T.train_nb_classifier(
        docs, "doc_id", "text", F.col("lang") == CLF_LABEL_LANG
    )
    return T.classifier_score(docs, "doc_id", "text", weights)


def q_text_clf_inrow(spark, sf_dir):
    """In-row twin of text_clf_score (textops.classifier_score_inrow):
    same trained model, but scoring is MAP-ONLY — per-row memoized-md5
    bucketing inside one Arrow UDF, no (id, bucket) shuffle. Must produce
    byte-identical numbers to the corpus-stage variant, so it shares the
    SAME SQL oracle."""
    docs = _t(spark, sf_dir, "documents")
    weights = T.train_nb_classifier(
        docs, "doc_id", "text", F.col("lang") == CLF_LABEL_LANG
    )
    return (
        T.classifier_score_inrow(docs.select("doc_id", "text"), "text", weights)
        .where(F.col("n_toks") > 0)
        .select("doc_id", "n_toks", "clf_logit", "clf_score", "clf_keep")
    )


def _sql_text_clf_score() -> str:
    nb = T.CLF_BUCKETS
    thr = T.CLF_THRESHOLD
    h = sql_hash64("tok")
    return f"""
WITH tk AS (
  SELECT doc_id, lang = '{CLF_LABEL_LANG}' AS pos, unnest({SQL_TOKS}) AS tok
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, pos, ({h}) % {nb} AS b, count(*) AS cnt FROM tk GROUP BY 1, 2, 3
),
cls AS (SELECT pos, b, sum(cnt)::BIGINT AS cnt FROM g GROUP BY 1, 2),
tot AS (SELECT
  (SELECT coalesce(sum(cnt), 0)::BIGINT FROM cls WHERE pos) AS ptot,
  (SELECT coalesce(sum(cnt), 0)::BIGINT FROM cls WHERE NOT pos) AS ntot,
  (SELECT count(DISTINCT doc_id) FROM g WHERE pos) AS npos,
  (SELECT count(DISTINCT doc_id) FROM g WHERE NOT pos) AS nneg),
spine AS (SELECT range::INT AS b FROM range({nb})),
w AS (
  SELECT b, round(ln((coalesce(p.cnt, 0) + 1)::DOUBLE / (ptot + {nb}))
              - ln((coalesce(n.cnt, 0) + 1)::DOUBLE / (ntot + {nb})), 6) AS w
  FROM spine LEFT JOIN (SELECT b, cnt FROM cls WHERE pos) p USING (b)
             LEFT JOIN (SELECT b, cnt FROM cls WHERE NOT pos) n USING (b), tot
),
bias AS (SELECT round(ln((npos + 1)::DOUBLE / (nneg + 1)), 6) AS bias FROM tot),
sc AS (
  SELECT doc_id, sum(cnt)::BIGINT AS n_toks,
         sum(cnt * (round(w * 1000000))::BIGINT)::BIGINT AS dot6
  FROM (SELECT doc_id, b, sum(cnt) AS cnt FROM g GROUP BY 1, 2) gg
  JOIN w USING (b)
  GROUP BY 1
),
lg AS (
  -- exact integer half-away-from-zero rounding of the rational logit
  -- (mirrors the Spark side; float round() diverges at half boundaries)
  SELECT doc_id, n_toks,
         (CASE WHEN num >= 0 THEN (2 * num + n_toks) // (2 * n_toks)
               ELSE -((2 * (-num) + n_toks) // (2 * n_toks)) END)
         / 1000000.0 AS clf_logit
  FROM (SELECT doc_id, n_toks,
               (round(bias * 1000000))::BIGINT * n_toks + dot6 AS num
        FROM sc, bias)
)
SELECT doc_id, n_toks, clf_logit,
       round(1 / (1 + exp(-clf_logit)), 6) AS clf_score,
       round(1 / (1 + exp(-clf_logit)), 6) >= {thr} AS clf_keep
FROM lg
"""


# ---------------------------------------------------------------------------
# text 0e — crawl snapshot diff (ingest ops)
# ---------------------------------------------------------------------------


def q_text_crawl_diff(spark, sf_dir):
    """Snapshot diff (textops.crawl_diff): the new crawl drops every 7th
    doc, rewrites every 5th, and adds +50000-id copies of every 11th —
    the diff classifies each key added/removed/changed/unchanged."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" upd"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 50_000).alias("doc_id"), "text"
            )
        )
    )
    return T.crawl_diff(docs, new, "doc_id", "text")


def _sql_text_crawl_diff() -> str:
    return """
WITH old_s AS (SELECT doc_id, text FROM documents),
new_s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' upd' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 50000, text FROM documents WHERE doc_id % 11 = 0),
o AS (SELECT doc_id, min(md5(text)) AS old_md5 FROM old_s GROUP BY 1),
n AS (SELECT doc_id, min(md5(text)) AS new_md5 FROM new_s GROUP BY 1)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN old_md5 IS NOT DISTINCT FROM new_md5 THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_md5, new_md5
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


# ---------------------------------------------------------------------------
# text 0d — corpus datasheet + token histogram (release reporting)
# ---------------------------------------------------------------------------


def q_text_datasheet(spark, sf_dir):
    """One-scan corpus release summary (textops.corpus_datasheet)."""
    return T.corpus_datasheet(_t(spark, sf_dir, "documents"), "text", "lang")


def _sql_text_datasheet() -> str:
    return f"""
WITH tk AS (
  SELECT text, lang,
         CASE WHEN text IS NOT NULL THEN len({SQL_TOKS}) END AS n
  FROM documents)
SELECT count(*) AS n_docs,
       count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
       count(CASE WHEN text = '' THEN 1 END) AS n_empty_text,
       count(DISTINCT lang) AS n_groups,
       coalesce(sum(n), 0)::BIGINT AS n_toks_total,
       round(avg(n), 6) AS mean_toks,
       round(quantile_cont(n, 0.5), 6) AS p50_toks,
       round(quantile_cont(n, 0.9), 6) AS p90_toks
FROM tk
"""


def q_text_token_hist(spark, sf_dir):
    """Power-of-two doc-length histogram (textops.token_histogram)."""
    return T.token_histogram(_t(spark, sf_dir, "documents"), "text")


def _sql_text_token_hist() -> str:
    return f"""
WITH tk AS (SELECT len({SQL_TOKS}) AS n FROM documents WHERE text IS NOT NULL)
SELECT CASE WHEN n <= 0 THEN 0
            ELSE (pow(2, length(bin(n)) - 1))::BIGINT END AS bucket_lo,
       count(*) AS n_docs, sum(n)::BIGINT AS n_toks
FROM tk GROUP BY 1
"""


# ---------------------------------------------------------------------------
# text 0c — domain-mixture reweighting (offline training-mix rebalancing)
# ---------------------------------------------------------------------------

MIX_TARGETS = {"en": 0.4, "fr": 0.15, "es": 0.15, "de": 0.15, "zh": 0.15}
# balance-mode targets force genuine upsampling (de: ~13% of tokens -> 30%)
MIX_BAL_TARGETS = {"en": 0.1, "fr": 0.2, "es": 0.2, "de": 0.3, "zh": 0.2}


def _sql_mix_rates_cte(targets: dict, mode: str = "down") -> str:
    tgt_sum = sum(targets.values())
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in targets.items())
    if mode == "balance":
        rate = f"round(least(ratio, {T.MIX_MAX_UPSAMPLE}), 6)"
    else:
        rate = ("CASE WHEN (SELECT max(ratio) FROM r) > 0 "
                "THEN round(ratio / (SELECT max(ratio) FROM r), 6) "
                "ELSE 0.0 END")
    return f"""
g AS (
  SELECT lang AS grp, sum(len({SQL_TOKS}))::BIGINT AS n_toks
  FROM documents WHERE text IS NOT NULL GROUP BY 1),
t AS (
  SELECT grp, n_toks,
         (CASE grp {case} ELSE 0.0 END) / {tgt_sum} AS tgt
  FROM g),
s AS (
  SELECT grp, n_toks, tgt,
         n_toks::DOUBLE / (SELECT sum(n_toks) FROM g) AS cur
  FROM t),
r AS (
  SELECT grp, n_toks, cur,
         CASE WHEN cur > 0 AND tgt > 0 THEN tgt / cur ELSE 0.0 END AS ratio
  FROM s),
rates AS (
  SELECT grp, n_toks, round(cur, 6) AS cur_share,
         {rate} AS rate
  FROM r)
"""


def q_text_mix_rates(spark, sf_dir):
    """Offline mixture rebalancing (textops.mix_rates): closed-form
    downsample-only rates that shift the corpus token mix toward the target
    language shares."""
    docs = _t(spark, sf_dir, "documents")
    return T.mix_rates(docs, "lang", "text", MIX_TARGETS)


def _sql_text_mix_rates() -> str:
    return f"""
WITH {_sql_mix_rates_cte(MIX_TARGETS)}
SELECT grp AS lang, n_toks, cur_share, rate FROM rates
"""


def q_text_mix_resample(spark, sf_dir):
    """Apply the mix: deterministic hash-threshold resampling at each
    group's rate (textops.resample_to_mix)."""
    docs = _t(spark, sf_dir, "documents")
    return T.resample_to_mix(docs, "doc_id", "lang", "text", MIX_TARGETS).select(
        "doc_id", "lang"
    )


def _sql_text_mix_resample() -> str:
    h = sql_hash64("doc_id::VARCHAR", "#mix")
    return f"""
WITH {_sql_mix_rates_cte(MIX_TARGETS)},
sel AS (SELECT grp, (round(rate * {T.SAMPLE_DENOM}))::BIGINT AS thr FROM rates)
SELECT d.doc_id, d.lang
FROM documents d JOIN sel ON d.lang = sel.grp
WHERE ({h}) % {T.SAMPLE_DENOM} < thr
"""


def q_text_mix_balance(spark, sf_dir):
    """Up+down mixture balancing (resample_to_mix mode='balance'):
    under-represented groups upsample by deterministic repetition (epoch
    factors with a `copy` ordinal), over-represented ones hash-downsample;
    the surviving token mix hits the target shares exactly in expectation
    while preserving expected corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return T.resample_to_mix(
        docs, "doc_id", "lang", "text", MIX_BAL_TARGETS, mode="balance"
    ).select("doc_id", "lang", "copy")


def _sql_text_mix_balance() -> str:
    h = sql_hash64("doc_id::VARCHAR", "#mix")
    d = T.SAMPLE_DENOM
    return f"""
WITH {_sql_mix_rates_cte(MIX_BAL_TARGETS, mode="balance")},
sel AS (SELECT grp, (round(rate * {d}))::BIGINT AS r6 FROM rates)
SELECT d.doc_id, d.lang, u.copy
FROM documents d
JOIN sel ON d.lang = sel.grp,
     unnest(range(1, (r6 // {d}
            + CASE WHEN ({h}) % {d} < r6 % {d} THEN 1 ELSE 0 END)::INT + 1)
     ) AS u(copy)
"""


# ---------------------------------------------------------------------------
# text 1 — heuristic language-ID
# ---------------------------------------------------------------------------


def q_text_langid_heur(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return T.with_heuristic_langid(docs, "text").select("doc_id", "lang_heur")


def _sql_langid_heur() -> str:
    langs = T.LANGS
    count_cols = ",\n    ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"], lower(t)))) AS c_{lang}"
        for lang in langs
    )
    g = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN c_{lang} = {g} THEN '{lang}'" for lang in langs)
    return f"""
WITH toks0 AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
counts AS (
  SELECT doc_id,
    {count_cols}
  FROM toks0
)
SELECT doc_id,
       CASE WHEN {g} = 0 THEN 'und' {case} ELSE 'und' END AS lang_heur
FROM counts
"""


# ---------------------------------------------------------------------------
# text 2 — composite quality score
# ---------------------------------------------------------------------------


def q_text_quality_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("q_score")
    )


def _sql_quality_score(extra_cols: str = "") -> str:
    ec = f"{extra_cols}, " if extra_cols else ""
    sw = ", ".join(f"'{w}'" for ws in STOPWORDS.values() for w in ws)
    return f"""
WITH f AS (
  SELECT doc_id, {ec}text, {SQL_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, {ec}
         len(toks) AS n_words,
         len(list_filter(toks, t -> list_contains([{sw}], lower(t)))) AS n_sw,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM f
)
SELECT doc_id, {ec}
       round(0.4 * least(n_words::DOUBLE / 100.0, 1.0)
             + 0.3 * least((CASE WHEN n_words > 0
                            THEN n_sw::DOUBLE / n_words ELSE 0.0 END) * 5.0, 1.0)
             + 0.3 * (n_alpha::DOUBLE / greatest(n_chars, 1)::DOUBLE),
             6) AS q_score
FROM g
"""


PR_CURVE_N = 21


def q_text_pr_curve(spark, sf_dir):
    """Score-threshold calibration (textops.pr_curve): precision/recall/F1
    of the heuristic quality score as a predictor of the corpus's
    classifier-label language, at 21 evenly spaced thresholds — the query
    a user runs before picking a gate threshold."""
    docs = _t(spark, sf_dir, "documents")
    return T.pr_curve(
        docs,
        F.col("lang") == CLF_LABEL_LANG,
        T.quality_score(F.col("text")),
        n_thresholds=PR_CURVE_N,
    )


def _sql_text_pr_curve() -> str:
    d = PR_CURVE_N - 1
    return f"""
WITH scored AS ({_sql_quality_score("lang")}),
th AS (SELECT unnest(range({PR_CURVE_N}))::INT AS i),
agg AS (
  SELECT i,
         SUM(CASE WHEN q_score >= i::DOUBLE / {d}.0 THEN 1 ELSE 0 END)
           AS n_pred,
         SUM(CASE WHEN q_score >= i::DOUBLE / {d}.0
                   AND lang = '{CLF_LABEL_LANG}' THEN 1 ELSE 0 END) AS n_tp,
         SUM(CASE WHEN lang = '{CLF_LABEL_LANG}' THEN 1 ELSE 0 END) AS n_pos
  FROM th CROSS JOIN scored GROUP BY 1
)
SELECT i::DOUBLE / {d}.0 AS threshold,
       n_pred::BIGINT AS n_pred, n_tp::BIGINT AS n_tp,
       n_pos::BIGINT AS n_pos,
       CASE WHEN n_pred > 0 THEN round(n_tp / n_pred, 6) END AS precision,
       CASE WHEN n_pos > 0 THEN round(n_tp / n_pos, 6) END AS recall,
       CASE WHEN n_pred + n_pos > 0
            THEN round(2 * n_tp / (n_pred + n_pos), 6) END AS f1
FROM agg
"""


TOPFRAC = 0.3


def q_text_quality_topfrac(spark, sf_dir):
    """Adaptive per-language quality selection (ops.textops.top_fraction):
    keep the top 30% of documents by quality score WITHIN each language —
    percent_rank over (lang) strata, doc_id tiebreak — so the cutoff adapts
    to each language's score distribution instead of a fixed threshold."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", T.quality_score(F.col("text")).alias("q_score")
    )
    return T.top_fraction(scored, "q_score", TOPFRAC, "doc_id", group_col="lang")


def _sql_quality_topfrac() -> str:
    return f"""
WITH scored AS ({_sql_quality_score("lang")}),
r AS (
  SELECT doc_id, lang, q_score,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY q_score DESC, doc_id) AS pr
  FROM scored)
SELECT doc_id, lang, q_score FROM r WHERE pr <= {TOPFRAC}
"""


SHARD_TOKENS = 500
SHARD_BUCKETS = 8
SHARD_SALT = "shard_v1"


def q_text_shard_pack(spark, sf_dir):
    """Token-aware training-shard assignment (ops.textops.pack_shards):
    docs hash into buckets, then pack into ~SHARD_TOKENS-token shards in
    deterministic hash order — the writer-side step that turns a filtered
    corpus into balanced training shards."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    staged = docs.select(
        "doc_id", F.size(T._toks(F.col("text"))).alias("n_toks")
    )
    return T.pack_shards(
        staged, "doc_id", "n_toks", SHARD_TOKENS,
        n_buckets=SHARD_BUCKETS, salt=SHARD_SALT,
    ).select("doc_id", "n_toks", "shard_bucket", "shard_seq")


def _sql_shard_pack() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{SHARD_SALT}")
    return f"""
WITH staged AS (
  SELECT doc_id, len({SQL_TOKS}) AS n_toks, ({h}) AS h,
         (({h}) % {SHARD_BUCKETS})::INT AS shard_bucket
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, n_toks, shard_bucket,
       floor(coalesce(sum(n_toks) OVER (
                PARTITION BY shard_bucket ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {SHARD_TOKENS})::INT AS shard_seq
FROM staged
"""


# ---------------------------------------------------------------------------
# text 3 — token counting (whitespace + BPE-ish)
# ---------------------------------------------------------------------------


def q_text_token_counts(spark, sf_dir):
    return T.token_counts(_t(spark, sf_dir, "documents"), "doc_id", "text")


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id,
       len({SQL_TOKS}) AS n_ws_tokens,
       len(list_filter(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'),
                       x -> x <> '')) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# text 4 — document fingerprint
# ---------------------------------------------------------------------------


def q_doc_fingerprint(spark, sf_dir):
    return T.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


SQL_DOC_FINGERPRINT = f"""
WITH sh0 AS (
  SELECT doc_id, {SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
),
hs AS (
  SELECT doc_id, list_transform(sh, s -> {sql_hash64('s')}) AS h, len(sh) AS n
  FROM sh0 WHERE len(sh) > 0
)
SELECT doc_id, list_min(h) AS fp_min, list_max(h) AS fp_max, n AS n_shingles
FROM hs
"""


# ---------------------------------------------------------------------------
# text 5 — corpus statistics: top-k tokens, per-source stats
# ---------------------------------------------------------------------------

TOP_TOKENS_K = 20


def q_text_top_tokens(spark, sf_dir):
    return T.top_tokens(_t(spark, sf_dir, "documents"), "text", TOP_TOKENS_K)


SQL_TEXT_TOP_TOKENS = f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest({SQL_TOKS}) AS token FROM documents
) GROUP BY 1 ORDER BY n DESC, token LIMIT {TOP_TOKENS_K}
"""


def q_text_ngram_repetition(spark, sf_dir):
    """Gopher-style per-doc n-gram repetition metrics (ops.textops
    .ngram_repetition): top-2-gram char fraction + duplicated-2-gram char
    fraction over the documents table."""
    return T.ngram_repetition(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_text_ngram_repetition() -> str:
    n = T.NGRAM_REP_N
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents WHERE text IS NOT NULL),
b AS (SELECT doc_id, ts, length(array_to_string(ts, ' ')) AS doc_chars
      FROM t WHERE len(ts) >= {n}),
g AS (SELECT doc_id, doc_chars,
             array_to_string(ts[i:i+{n - 1}], ' ') AS gram
      FROM (SELECT doc_id, doc_chars, ts,
                   unnest(generate_series(1, len(ts) - {n - 1})) AS i
            FROM b)),
c AS (SELECT doc_id, doc_chars, gram, count(*) AS c FROM g GROUP BY 1, 2, 3)
SELECT doc_id, sum(c)::BIGINT AS n_grams,
       round(max(c * length(gram))::DOUBLE / doc_chars, 6) AS top_ngram_frac,
       round(least(sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)::DOUBLE
                   / doc_chars, 1.0), 6) AS dup_ngram_frac
FROM c GROUP BY doc_id, doc_chars
"""


def q_text_corpus_ngrams(spark, sf_dir):
    """Top-k corpus word n-grams with counts (ops.textops.corpus_ngrams) —
    the count-collection path for an n-gram LM build."""
    return T.corpus_ngrams(_t(spark, sf_dir, "documents"), "text")


def _sql_text_corpus_ngrams() -> str:
    n, k = T.CORPUS_NGRAM_N, T.CORPUS_NGRAM_K
    return f"""
WITH t AS (SELECT {SQL_TOKS} AS ts FROM documents),
g AS (SELECT array_to_string(ts[i:i+{n - 1}], ' ') AS gram
      FROM (SELECT ts, unnest(generate_series(1, len(ts) - {n - 1})) AS i
            FROM t WHERE len(ts) >= {n}))
SELECT gram, count(*) AS n FROM g
GROUP BY 1 ORDER BY n DESC, gram LIMIT {k}
"""


def q_text_encoding_flags(spark, sf_dir):
    """Encoding-noise signals (ops.textops.encoding_flags): replacement
    chars, mojibake artifact fraction, control-char fraction, enc_ok gate —
    the ftfy-ish heuristic tier, pure codegen over the documents table."""
    return T.encoding_flags(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_text_encoding_flags() -> str:
    lit_counts = " + ".join(
        f"(length(text) - length(replace(text, '{m}', ''))) / {len(m)}"
        for m in T.MOJIBAKE_LITS
    )
    return f"""
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
         (length(text) - length(replace(text, chr(65533), '')))::BIGINT
           AS n_replacement,
         round(({lit_counts})::DOUBLE
               / greatest(length(text), 1), 6) AS moji_frac,
         round((length(text) - length(regexp_replace(text,
                 '{T.CTRL_CLASS}', '', 'g')))::DOUBLE
               / greatest(length(text), 1), 6) AS ctrl_frac
  FROM documents
)
SELECT *, coalesce(n_replacement = 0 AND moji_frac < {T.ENC_MOJI_MAX}
                   AND ctrl_frac < {T.ENC_CTRL_MAX}, false) AS enc_ok
FROM m
"""


def q_text_chunk(spark, sf_dir):
    """Fixed-token training-sequence chunking with overlap
    (ops.textops.chunk_documents) over the documents table."""
    return T.chunk_documents(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_text_chunk() -> str:
    mx, ov = T.CHUNK_MAX_TOKENS, T.CHUNK_OVERLAP
    stride = mx - ov
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents WHERE text IS NOT NULL),
s AS (SELECT doc_id, ts,
             unnest(generate_series(1, greatest(len(ts) - {ov}, 1), {stride}))
               AS st
      FROM t WHERE len(ts) >= 1)
SELECT doc_id, ((st - 1) / {stride})::BIGINT AS chunk_id,
       least(len(ts) - st + 1, {mx})::INT AS n_tokens,
       array_to_string(ts[st:st+{mx - 1}], ' ') AS chunk_text
FROM s
"""


def q_text_group_stats(spark, sf_dir):
    return T.group_doc_stats(_t(spark, sf_dir, "documents"), "source", "text")


SQL_TEXT_GROUP_STATS = f"""
SELECT source AS grp, count(*) AS n_docs,
       sum(len({SQL_TOKS}))::BIGINT AS total_words,
       round(avg(len({SQL_TOKS})), 6) AS avg_words,
       count(DISTINCT lang) AS n_langs
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# text 6 — benchmark-contamination scan (probe n-gram overlap vs corpus)
# ---------------------------------------------------------------------------


def q_text_normalize(spark, sf_dir):
    """Canonical text normalization (lowercase, ws-collapse, trim) — the
    form exact-dedup keys at scale are computed over."""
    docs = _t(spark, sf_dir, "documents")
    return T.with_normalized(docs, "text").select(
        "doc_id", F.md5(F.col("text_norm")).alias("norm_md5"),
        F.length("text_norm").alias("n_chars_norm"),
    )


SQL_TEXT_NORMALIZE = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'))) AS norm_md5,
       length(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'))) AS n_chars_norm
FROM documents
"""


HOST_QUOTA = 10


def q_host_quota(spark, sf_dir):
    """Per-source admission cap: first 10 docs per source by doc_id (caps
    any one host/domain's contribution to a training corpus)."""
    docs = _t(spark, sf_dir, "documents")
    return T.group_quota(docs, "source", "doc_id", HOST_QUOTA).select(
        "doc_id", "source"
    )


SQL_HOST_QUOTA = f"""
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= {HOST_QUOTA}
"""

# deterministic stratified sampling: per-language downsampling rates for a
# training mix (md5-portable hash threshold — same constants both engines)
SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.1}
SAMPLE_DEFAULT = 0.05
SAMPLE_SALT = "mix_v1"


def q_text_sample_stratified(spark, sf_dir):
    """Reproducible per-language corpus downsampling (training-mix rates):
    row kept iff hash64(doc_id||'#mix_v1') mod 1e6 < rate(lang)·1e6 —
    stable under repartitioning, engines, and re-runs (ops.textops
    .sample_stratified)."""
    docs = _t(spark, sf_dir, "documents")
    return T.sample_stratified(
        docs, "doc_id", SAMPLE_FRACTIONS, strata_col="lang",
        salt=SAMPLE_SALT, default_fraction=SAMPLE_DEFAULT,
    ).select("doc_id", "lang")


def _sql_sample_stratified() -> str:
    h = sql_hash64("doc_id::VARCHAR", f"#{SAMPLE_SALT}")
    denom = T.SAMPLE_DENOM
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {int(round(v * denom))}"
        for k, v in SAMPLE_FRACTIONS.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE ({h}) % {denom}
      < CASE {cases} ELSE {int(round(SAMPLE_DEFAULT * denom))} END
"""


def q_text_line_dedup(spark, sf_dir):
    """In-document repeated-line removal (boilerplate suppression): both
    engines build the same adversarial text (doc text + FOOTER + the same
    text + FOOTER again) and must keep exactly the first occurrence of
    every line."""
    docs = _t(spark, sf_dir, "documents")
    t2 = F.concat_ws(
        "\n", F.col("text"), F.lit("FOOTER"), F.col("text"), F.lit("FOOTER")
    )
    return docs.select(
        "doc_id", T.remove_repeated_lines(t2).alias("text_dedup")
    ).where(F.col("text").isNotNull())


def _sql_line_dedup() -> str:
    # blank lines (paragraph breaks) always survive; non-blank lines keep
    # their first occurrence only — mirror of remove_repeated_lines
    t2 = "text || chr(10) || 'FOOTER' || chr(10) || text || chr(10) || 'FOOTER'"
    return f"""
SELECT doc_id,
       array_to_string(
         list_filter(ls, (x, i) -> x = '' OR list_position(ls, x) = i),
         chr(10)
       ) AS text_dedup
FROM (SELECT doc_id, string_split({t2}, chr(10)) AS ls
      FROM documents WHERE text IS NOT NULL)
"""


# boilerplate-line threshold for the oracle query: the two banners appear in
# all 500 docs, SUBSCRIBE NOW in ~72 (doc_id%7), RARE PROMO in ~18 (doc_id%29)
# — so the threshold separates removed (>=50 docs) from kept (<50) lines.
BOILER_MIN_DOCS = 50


def _boiler_spark_text(docs):
    return F.concat_ws(
        "\n",
        F.col("text"),
        F.lit("COOKIE BANNER - accept all"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("SUBSCRIBE NOW")),
        F.when(F.col("doc_id") % 29 == 0, F.lit("RARE PROMO")),
        F.lit("(c) example.com all rights reserved"),
    )


def q_text_boilerplate(spark, sf_dir):
    """Corpus-level boilerplate line removal (ops.textops.remove_boilerplate):
    lines appearing verbatim in >= BOILER_MIN_DOCS distinct documents are
    stripped from every document, first-seen order preserved. Both engines
    build the same adversarial multi-line text (doc text + always-banners +
    modular-arithmetic-gated lines straddling the threshold)."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.where(F.col("text").isNotNull()).select(
        "doc_id", _boiler_spark_text(docs).alias("text2")
    )
    return T.remove_boilerplate(
        staged, "doc_id", "text2", BOILER_MIN_DOCS
    ).select("doc_id", "text_clean")


def _sql_boilerplate() -> str:
    t2 = """concat_ws(chr(10), text, 'COOKIE BANNER - accept all',
      CASE WHEN doc_id % 7 = 0 THEN 'SUBSCRIBE NOW' END,
      CASE WHEN doc_id % 29 = 0 THEN 'RARE PROMO' END,
      '(c) example.com all rights reserved')"""
    return f"""
WITH t2 AS (SELECT doc_id, {t2} AS text2 FROM documents WHERE text IS NOT NULL),
docline AS (SELECT doc_id, unnest(list_distinct(string_split(text2, chr(10)))) AS line FROM t2),
freq AS (SELECT line FROM docline WHERE length(line) >= 1
         GROUP BY line HAVING count(*) >= {BOILER_MIN_DOCS}),
fl AS (SELECT coalesce(list(line), []) AS flines FROM freq)
SELECT doc_id,
       array_to_string(
         list_filter(string_split(text2, chr(10)),
                     x -> NOT list_contains(fl.flines, x)), chr(10)
       ) AS text_clean
FROM t2, fl
"""


def q_text_url_canon(spark, sf_dir):
    """URL canonicalization (tracking params / fragments / default ports)
    over synthetic adversarial urls — both engines construct the same url
    per doc_id, so the canonical forms must hash-match."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id").cast("string")
    raw = (
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.lit("https://ex.example:443/p/"), i,
                        F.lit("?utm_source=x&keep="), i, F.lit("#frag")))
        .when(F.col("doc_id") % 6 == 1,
              F.concat(F.lit("http://ex.example:80/p/"), i, F.lit("#sec")))
        .when(F.col("doc_id") % 6 == 2,
              F.concat(F.lit("https://ex.example/p/"), i,
                       F.lit("?utm_a=1&utm_b=2")))
        .when(F.col("doc_id") % 6 == 3,
              F.concat(F.lit("https://ex.example/p/"), i,
                       F.lit("?gclid=abc&x=1&fbclid=z")))
        .when(F.col("doc_id") % 6 == 4,
              F.concat(F.lit("http://ex.example:8080/p/"), i,
                       F.lit("?a=1&utm_x=")))
        .otherwise(F.concat(F.lit("https://ex.example/p/"), i))
    )
    return docs.select(
        "doc_id", raw.alias("url_raw"), T.canonicalize_url(raw).alias("url_canon")
    )


def _sql_url_canon() -> str:
    raw = """CASE doc_id % 6
      WHEN 0 THEN 'https://ex.example:443/p/' || doc_id || '?utm_source=x&keep=' || doc_id || '#frag'
      WHEN 1 THEN 'http://ex.example:80/p/' || doc_id || '#sec'
      WHEN 2 THEN 'https://ex.example/p/' || doc_id || '?utm_a=1&utm_b=2'
      WHEN 3 THEN 'https://ex.example/p/' || doc_id || '?gclid=abc&x=1&fbclid=z'
      WHEN 4 THEN 'http://ex.example:8080/p/' || doc_id || '?a=1&utm_x='
      ELSE 'https://ex.example/p/' || doc_id END"""
    canon = "url_raw"
    for pat, _, duck_repl in T.URL_CANON_STEPS:
        canon = f"regexp_replace({canon}, '{pat.replace(chr(39), chr(39)*2)}', '{duck_repl}', 'g')"
    return f"""
SELECT doc_id, url_raw, {canon} AS url_canon
FROM (SELECT doc_id, {raw} AS url_raw FROM documents)
"""


TOKEN_BUDGET = 2_000


def q_text_token_budget(spark, sf_dir):
    """Per-source TOKEN budget: admit docs per source (by doc_id order)
    while the running whitespace-token total before them is under the
    budget — the row crossing the budget is the last admitted
    (ops.textops.token_budget_cap; the LLM-mix sibling of host_quota)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""))
    return T.token_budget_cap(
        docs, "source", "doc_id", toks.cast("long"), TOKEN_BUDGET
    ).select("doc_id", "source")


def _sql_token_budget() -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         coalesce(sum(len({SQL_TOKS})) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tok_before
  FROM documents
) WHERE tok_before < {TOKEN_BUDGET}
"""


def q_text_contamination(spark, sf_dir):
    """Probe set = every 50th doc (stand-in benchmark/eval set); corpus =
    the rest. Output: per-probe fraction of its distinct 3-gram shingles
    found anywhere in the corpus."""
    docs = _t(spark, sf_dir, "documents")
    probe = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return T.contamination(corpus, probe, "doc_id", "text")


def _sql_contamination() -> str:
    h = sql_hash64("s")
    return f"""
WITH probe_sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(sh, s -> {h})) AS h
  FROM (
    SELECT doc_id, {SQL_SHINGLES} AS sh
    FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0)
  )
),
corpus_sh AS (
  SELECT DISTINCT unnest(list_transform(sh, s -> {h})) AS h
  FROM (
    SELECT {SQL_SHINGLES} AS sh
    FROM (SELECT {SQL_TOKS} AS toks FROM documents WHERE doc_id % 50 <> 0)
  )
)
, stats AS (
  SELECT doc_id,
         count(*) AS n_shingles,
         sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
         round(sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS overlap
  FROM probe_sh p LEFT JOIN corpus_sh c USING (h)
  GROUP BY doc_id
)
SELECT p0.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(s.n_hit, 0) AS n_hit,
       s.overlap
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 50 = 0) p0
LEFT JOIN stats s USING (doc_id)
"""


DECONT_MIN_HITS = 2


def q_text_decontaminate(spark, sf_dir):
    """Decontamination drop (textops.decontaminate): remove corpus docs
    sharing >= 2 distinct 3-gram shingles with the probe (benchmark) set;
    returns the kept training ids."""
    docs = _t(spark, sf_dir, "documents")
    probe = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return T.decontaminate(
        corpus, probe, "doc_id", "text", min_hits=DECONT_MIN_HITS
    ).select("doc_id")


def _sql_text_decontaminate() -> str:
    h = sql_hash64("s")
    return f"""
WITH probe_h AS (
  SELECT DISTINCT unnest(list_transform(sh, s -> {h})) AS h
  FROM (
    SELECT {SQL_SHINGLES} AS sh
    FROM (SELECT {SQL_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0)
  )
),
corpus_sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(sh, s -> {h})) AS h
  FROM (
    SELECT doc_id, {SQL_SHINGLES} AS sh
    FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents WHERE doc_id % 50 <> 0)
  )
),
contaminated AS (
  SELECT doc_id FROM corpus_sh JOIN probe_h USING (h)
  GROUP BY 1 HAVING count(*) >= {DECONT_MIN_HITS}
)
SELECT doc_id FROM documents
WHERE doc_id % 50 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


# ---------------------------------------------------------------------------
# multimodal — binary payload plumbing through mapInPandas
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark, sf_dir):
    media = M.synthesize_media(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return M.decode_media_meta(media)


def q_multimodal_real_meta(spark, sf_dir):
    """REAL header decode round-trip: the fixture builder writes genuine
    PNG IHDR / JPEG SOF0/2 / GIF screen-descriptor / WebP VP8+VP8L
    prefixes encoding id-arithmetic dimensions; decode_media_meta(
    real_decode=True) must parse those exact values back out of the
    bytes (the oracle recomputes them arithmetically — any parser bug
    breaks the hash). wav rows carry no image header and pin the
    fake-decoder fallback."""
    media = M.synthesize_media_real(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return M.decode_media_meta(media, real_decode=True).select(
        "media_id", "n_bytes", "format", "width", "height"
    )


FRAME_EVERY_N = 2


def q_multimodal_frames(spark, sf_dir):
    """1→N frame sampling over the synthesized media table: every 2nd
    256-char window of each decoded payload, with per-frame digest."""
    media = M.synthesize_media(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return M.sample_frames(media, every_n=FRAME_EVERY_N)


SQL_MULTIMODAL_FRAMES = f"""
WITH media AS (
  SELECT doc_id AS media_id, text AS s FROM documents WHERE text IS NOT NULL
),
idx AS (
  SELECT media_id, s,
         unnest(CASE WHEN length(s) > 0
                THEN range(0, CAST(ceil(length(s) / {M.FRAME_CHARS}.0) AS INT),
                           {FRAME_EVERY_N})
                ELSE [] END) AS frame_idx
  FROM media
)
SELECT media_id, frame_idx,
       length(substring(s, frame_idx * {M.FRAME_CHARS} + 1, {M.FRAME_CHARS}))
         AS n_chars,
       md5(substring(s, frame_idx * {M.FRAME_CHARS} + 1, {M.FRAME_CHARS}))
         AS frame_md5
FROM idx
"""


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest_md5,
       ['png','jpeg','wav'][doc_id % 3 + 1] AS format,
       64 + ('0x' || substring(md5(text), 1, 2))::INT % 192 AS width,
       64 + ('0x' || substring(md5(text), 3, 2))::INT % 192 AS height
FROM documents WHERE text IS NOT NULL
"""


# dims/header sizes mirror ops.multimodal.synthesize_media_real exactly:
# the engine round-trips them through real PNG/JPEG header BYTES, the
# oracle recomputes them arithmetically — equality proves the parse.
SQL_MULTIMODAL_REAL_META = f"""
SELECT doc_id AS media_id,
       octet_length(encode(text))
         + CASE doc_id % 5 WHEN 0 THEN {M.PNG_HEADER_LEN}
                           WHEN 1 THEN {M.JPEG_HEADER_LEN}
                           WHEN 2 THEN {M.GIF_HEADER_LEN}
                           WHEN 3 THEN CASE WHEN (doc_id // 5) % 2 = 0
                                            THEN {M.WEBP_VP8L_HEADER_LEN}
                                            ELSE {M.WEBP_VP8_HEADER_LEN} END
                           ELSE 0 END AS n_bytes,
       CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' WHEN 3 THEN 'webp'
                       ELSE 'wav' END AS format,
       CASE WHEN doc_id % 5 = 4
            THEN 64 + ('0x' || substring(md5(text), 1, 2))::INT % 192
            ELSE CAST(16 + doc_id % 625 AS INT) END AS width,
       CASE WHEN doc_id % 5 = 4
            THEN 64 + ('0x' || substring(md5(text), 3, 2))::INT % 192
            ELSE CAST(16 + (doc_id * 7) % 475 AS INT) END AS height
FROM documents WHERE text IS NOT NULL
"""


# ---------------------------------------------------------------------------
# quality filter — heuristic keep/drop over documents (SQL-expressible tier)
# ---------------------------------------------------------------------------

QF_MIN_WORDS, QF_MAX_WORDS = 10, 2000
QF_MIN_MWL, QF_MAX_MWL = 1.5, 14.0
QF_MAX_SYMBOL = 0.1
QF_MAX_REPEAT = 0.30
QF_MIN_STOPWORD = 0.10


def q_qf_heuristic_keep(spark, sf_dir):
    """Gopher/C4 heuristic rules only (the model-free tier) over documents:
    (doc_id, n_fired, keep_heur). Uses the SAME fused feature projection as
    the full pipeline."""
    from data_quality_spark.functions.textstats import with_features
    from data_quality_spark.rules.core import is_empty

    docs = _t(spark, sf_dir, "documents")
    feats = with_features(docs, "text")
    nonempty = ~is_empty("text")
    fired = [
        is_empty("text"),
        nonempty & ((F.col("f_n_words") < QF_MIN_WORDS) | (F.col("f_n_words") > QF_MAX_WORDS)),
        nonempty & ((F.col("f_mean_word_len") < QF_MIN_MWL) | (F.col("f_mean_word_len") > QF_MAX_MWL)),
        nonempty & (F.col("f_symbol_ratio") > QF_MAX_SYMBOL),
        nonempty & (F.col("f_repeated_line_fraction") > QF_MAX_REPEAT),
        nonempty & (F.col("f_stopword_density") < QF_MIN_STOPWORD),
    ]
    n_fired = sum(f.cast("int") for f in fired)
    return feats.select(
        "doc_id",
        n_fired.alias("n_fired"),
        (n_fired == 0).alias("keep_heur"),
    )


def _sql_qf_heuristic_keep() -> str:
    sw = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id, text, {SQL_TOKS} AS toks,
         list_filter(regexp_split_to_array(text, '\\n'), x -> x <> '') AS lines
  FROM documents
),
g AS (
  SELECT doc_id, text,
         len(toks) AS n_words,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
              ELSE 0.0 END AS mean_word_len,
         len(regexp_extract_all(text, '{SYMBOL_CLASS}')) AS n_sym,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dist_lines,
         len(list_filter(toks, t -> list_contains([{sw}], lower(t)))) AS n_sw
  FROM f
),
h AS (
  SELECT doc_id,
    CASE WHEN text IS NULL OR CAST(text AS VARCHAR) = '' THEN 1 ELSE 0 END AS r_empty,
    CASE WHEN text IS NOT NULL AND CAST(text AS VARCHAR) <> ''
          AND (n_words < {QF_MIN_WORDS} OR n_words > {QF_MAX_WORDS}) THEN 1 ELSE 0 END AS r_words,
    CASE WHEN text IS NOT NULL AND CAST(text AS VARCHAR) <> ''
          AND (mean_word_len < {QF_MIN_MWL} OR mean_word_len > {QF_MAX_MWL}) THEN 1 ELSE 0 END AS r_mwl,
    CASE WHEN text IS NOT NULL AND CAST(text AS VARCHAR) <> ''
          AND (CASE WHEN n_words > 0 THEN n_sym::DOUBLE / n_words
                    WHEN n_sym > 0 THEN 1e9 ELSE 0.0 END) > {QF_MAX_SYMBOL} THEN 1 ELSE 0 END AS r_sym,
    CASE WHEN text IS NOT NULL AND CAST(text AS VARCHAR) <> ''
          AND (CASE WHEN n_lines > 0 THEN (n_lines - n_dist_lines)::DOUBLE / n_lines
                    ELSE 0.0 END) > {QF_MAX_REPEAT} THEN 1 ELSE 0 END AS r_rep,
    CASE WHEN text IS NOT NULL AND CAST(text AS VARCHAR) <> ''
          AND (CASE WHEN n_words > 0 THEN n_sw::DOUBLE / n_words
                    ELSE 0.0 END) < {QF_MIN_STOPWORD} THEN 1 ELSE 0 END AS r_sw
  FROM g
)
SELECT doc_id,
       (r_empty + r_words + r_mwl + r_sym + r_rep + r_sw) AS n_fired,
       (r_empty + r_words + r_mwl + r_sym + r_rep + r_sw) = 0 AS keep_heur
FROM h
"""


# ---------------------------------------------------------------------------
# quality filter — PII/toxicity scrub (byte-identical regex chain)
# ---------------------------------------------------------------------------


def q_qf_scrub(spark, sf_dir):
    """Scrub over documents with deterministic injected PII (documents.text
    has none naturally)."""
    from data_quality_spark.functions.scrub import native_scrub

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text_pii",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example or +39 333 123 4567 at 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return docs.select(
        "doc_id", native_scrub(F.col("text_pii")).alias("scrubbed")
    )


def _sql_qf_scrub() -> str:
    expr = "text_pii"
    for _, pat, repl in ALL_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id::VARCHAR
                   || '@mail.example or +39 333 123 4567 at 10.0.0.'
                   || (doc_id % 256)::VARCHAR
              ELSE text END AS text_pii
  FROM documents
)
SELECT doc_id, {expr} AS scrubbed FROM p
"""


# ---------------------------------------------------------------------------
# quality filter — full pipeline (model stages). The langid/perplexity models
# are not SQL-expressible, so the oracle is the MATERIALIZED expected output
# of the single-process pandas reference (pipeline/expected.py): the Spark
# query regenerates it for the sf_dir it runs against, and the oracle SQL is
# a SELECT over that parquet — the same golden-corpus strategy the reference
# uses (marked expected outcomes in test_df.xlsx).
# ---------------------------------------------------------------------------


def _qf_pages(spark, sf_dir):
    """documents → the pages-table shape both qf harness queries annotate
    (same construction the pandas reference's pages_from_documents uses)."""
    from data_quality_spark.pipeline import expected as EXP

    docs = _t(spark, sf_dir, "documents")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    return docs.select(
        F.concat(F.lit(EXP.URL_PREFIX), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit(EXP.HTML_PRE), esc, F.lit(EXP.HTML_POST)), "UTF-8"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


_QF_EXPECTED_FOR: list = [None]


def _refresh_qf_expected(sf_dir):
    """Materialize the pandas-reference oracle for THIS sf_dir — shared by
    every qf harness query so a gate run pays the full reference pipeline
    (langid + perplexity over the corpus) once per sf, not once per query.
    Rewritten when the sf changes (the parquet path is shared across sfs,
    the kmeans-persistence contract)."""
    from data_quality_spark.pipeline import expected as EXP

    if _QF_EXPECTED_FOR[0] != sf_dir:
        EXP.write_qf_expected(sf_dir)
        _QF_EXPECTED_FOR[0] = sf_dir


def q_qf_pipeline_annotate(spark, sf_dir):
    from data_quality_spark.pipeline.quality_filter import annotate_pages

    _refresh_qf_expected(sf_dir)
    ann = annotate_pages(_qf_pages(spark, sf_dir))
    return ann.select(
        "url", "keep", "lang_pred", F.round("ppl", 4).alias("ppl_r"),
        F.size("fired_rules").alias("n_fired"),
    )


def q_qf_rule_ablation(spark, sf_dir):
    """Per-rule gate telemetry (pipeline.quality_filter.rule_ablation):
    for each rule, total firing documents and sole-firing documents — the
    count a curator recovers by relaxing exactly that gate. Oracle = the
    same materialized pandas-reference frame the qf family verifies
    against (fired list column)."""
    from data_quality_spark.pipeline.quality_filter import (
        annotate_pages,
        rule_ablation,
    )

    _refresh_qf_expected(sf_dir)
    return rule_ablation(annotate_pages(_qf_pages(spark, sf_dir)))


def _sql_qf_rule_ablation() -> str:
    from data_quality_spark.pipeline.expected import QF_EXPECTED_PATH

    return f"""
WITH ex AS (
  SELECT len(fired) AS n, unnest(fired) AS rule
  FROM read_parquet('{QF_EXPECTED_PATH}')
)
SELECT rule, COUNT(*)::BIGINT AS n_fired,
       SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_sole
FROM ex GROUP BY 1
"""


def _sql_qf_pipeline_annotate() -> str:
    from data_quality_spark.pipeline.expected import QF_EXPECTED_PATH

    return (
        "SELECT url, keep, lang_pred, ppl_r, n_fired "
        f"FROM read_parquet('{QF_EXPECTED_PATH}')"
    )


QF_HOST_MOD = 13  # synthetic host spread for the keep-rate rollup


def q_qf_host_keep_rates(spark, sf_dir):
    """Host-level keep-rate telemetry + blocklist induction
    (textops.host_keep_stats) over the REAL pipeline's per-doc verdicts:
    docs are spread across 13 synthetic hosts (doc_id % 13 from the url
    tail), aggregated to (n_docs, n_keep, keep_rate, blocked) — the
    CCNet-style crawl feedback loop that promotes consistently-failing
    hosts into the cheap URL blocklist before the next fetch. Oracle =
    the same pandas-reference expected frame the qf family pins."""
    from data_quality_spark.pipeline.quality_filter import annotate_pages

    _refresh_qf_expected(sf_dir)
    ann = annotate_pages(_qf_pages(spark, sf_dir))
    hosted = ann.select(
        F.concat(
            F.lit("h"),
            (F.regexp_extract("url", r"([0-9]+)$", 1).cast("bigint")
             % QF_HOST_MOD).cast("string"),
            F.lit(".example"),
        ).alias("host"),
        "keep",
    )
    return T.host_keep_stats(hosted, "host", "keep")


def _sql_qf_host_keep_rates() -> str:
    from data_quality_spark.pipeline.expected import QF_EXPECTED_PATH

    rows = f"""
  SELECT 'h' || (regexp_extract(url, '([0-9]+)$', 1)::BIGINT % {QF_HOST_MOD})
           || '.example' AS host,
         keep
  FROM read_parquet('{QF_EXPECTED_PATH}')
"""
    return T.sql_host_keep_stats(rows)


# ---------------------------------------------------------------------------
# global period intersection — range-partitioned scale path (no global window)
# ---------------------------------------------------------------------------


# per-sf cache of the overlap plan state (boundaries + stitch table): the
# first call pays the slim sampling job, repeat calls on the same input run
# ONLY the flag pass (r3 verdict "what's wrong" #3 — repeat callers were
# paying the sampling job every time).  Keyed by sf_dir; the input is a
# deterministic function of it.
_OVERLAP_STATE_CACHE: dict[str, dict] = {}


def q_period_overlap_global(spark, sf_dir):
    """Global (un-keyed) overlap detection over events periods, via the
    range-partition + boundary-stitch operator (ops/intervals.py) — the
    scale replacement for Window.partitionBy(lit(1))."""
    from data_quality_spark.ops import intervals as IV

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn(
            "end_ts",
            F.expr("timestampadd(SECOND, CAST(FLOOR(value) AS INT) % 40 + 1, ts)"),
        )
        .withColumnRenamed("ts", "start_ts")
        .select("event_id", "start_ts", "end_ts")
    )
    state = _OVERLAP_STATE_CACHE.get(sf_dir)
    if state is None:
        state = IV.compute_overlap_state(
            ev, "start_ts", "end_ts", tiebreak_cols=["event_id"]
        )
        _OVERLAP_STATE_CACHE[sf_dir] = state
    out = IV.overlapping_periods_global(
        ev, "start_ts", "end_ts", tiebreak_cols=["event_id"], state=state
    )
    return out.select("event_id")


SQL_PERIOD_OVERLAP_GLOBAL = """
WITH periods AS (
  SELECT event_id, ts AS start_ts,
         ts + INTERVAL 1 SECOND * (CAST(FLOOR(value) AS INT) % 40 + 1) AS end_ts
  FROM events
), flagged AS (
  SELECT event_id, start_ts, end_ts,
         coalesce(lag(end_ts) OVER w > start_ts, false) AS chk
  FROM periods
  WINDOW w AS (ORDER BY start_ts, end_ts, event_id)
), doubled AS (
  SELECT event_id, chk OR coalesce(lead(chk) OVER w2, false) AS double_chk
  FROM flagged
  WINDOW w2 AS (ORDER BY start_ts, end_ts, event_id)
)
SELECT event_id FROM doubled WHERE double_chk
"""


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

def q_dedup_dup_spans(spark, sf_dir):
    """Cross-document repeated-span fraction (ops.dedup.dup_span_stats):
    every 8-token window is hashed corpus-wide; a document's dup_frac is
    the share of its windows whose exact token sequence occurs in >= 2
    distinct documents — the exact-substring dedup signal (Lee et al.
    2022) over the exact-dup-augmented corpus (full copies must come out
    at dup_frac = 1.0; organic near-dups at partial fractions)."""
    corpus = _exact_dup_corpus(spark, sf_dir)
    return D.dup_span_stats(corpus, "doc_id", "text")


def _sql_dedup_dup_spans() -> str:
    w = D.DUP_SPAN_W
    h = sql_hash64(f"array_to_string(ts[i:i+{w - 1}], ' ')")
    return f"""
WITH corpus AS ({SQL_EXACT_CORPUS}),
t AS (SELECT doc_id, {SQL_TOKS} AS ts FROM corpus WHERE text IS NOT NULL),
w AS (SELECT doc_id, {h} AS whash
      FROM (SELECT doc_id, ts, UNNEST(generate_series(1, len(ts) - {w - 1})) AS i
            FROM t WHERE len(ts) >= {w})),
d AS (SELECT whash FROM (SELECT DISTINCT whash, doc_id FROM w)
      GROUP BY whash HAVING count(*) >= {D.DUP_SPAN_MIN_DOCS})
SELECT w.doc_id, count(*) AS n_windows, count(d.whash) AS n_dup,
       count(d.whash)::DOUBLE / count(*) AS dup_frac
FROM w LEFT JOIN d ON w.whash = d.whash
GROUP BY w.doc_id
"""


# ---------------------------------------------------------------------------
# dedup 12 — token-grain duplicated-span REMOVAL (ExactSubstr rewrite twin
# of the dup_spans REPORT op; sentence-grain twin is dedup_span_removal)
# ---------------------------------------------------------------------------


def q_dedup_span_removal_tok(spark, sf_dir):
    """Token-grain exact-substring removal (ops.dedup
    .remove_dup_token_spans) over the exact-dup-augmented corpus: the
    injected full copies must come back with ALL their windows removed
    (text_dedup = '' for the copy, original kept byte-identical at its
    first occurrence), and any organically repeated 8-token run is excised
    everywhere but its first corpus occurrence."""
    corpus = _exact_dup_corpus(spark, sf_dir)
    return D.remove_dup_token_spans(corpus, "doc_id", "text")


def _sql_dedup_span_removal_tok() -> str:
    w = D.DUP_SPAN_W
    h = sql_hash64(f"array_to_string(ts[i:i+{w - 1}], ' ')")
    return f"""
WITH corpus AS ({SQL_EXACT_CORPUS}),
t AS (SELECT doc_id AS id, {SQL_TOKS} AS ts
      FROM corpus WHERE text IS NOT NULL),
occ AS (
  SELECT id, i AS start, {h} AS key
  FROM (SELECT id, ts, unnest(generate_series(1, len(ts) - {w - 1})) AS i
        FROM t WHERE len(ts) >= {w})),
marked AS (
  SELECT id, start,
         count(*) OVER (PARTITION BY key) AS n_occ,
         min((id, start)) OVER (PARTITION BY key) AS keeper
  FROM occ),
rem AS (
  SELECT DISTINCT id, start + j AS idx
  FROM marked, unnest(range(0, {w})) AS u(j)
  WHERE n_occ > 1 AND (id, start) <> keeper),
tok AS (SELECT id, i AS idx, ts[i] AS tok
        FROM t, unnest(range(1, len(ts) + 1)) AS x(i)),
kept AS (
  SELECT t2.id, t2.idx, t2.tok FROM tok t2
  WHERE NOT EXISTS (SELECT 1 FROM rem r WHERE r.id = t2.id AND r.idx = t2.idx)),
nrem AS (SELECT id, count(*) AS n_removed FROM rem GROUP BY 1),
rebuilt AS (
  SELECT id, string_agg(tok, ' ' ORDER BY idx) AS txt
  FROM kept WHERE id IN (SELECT id FROM nrem) GROUP BY id)
SELECT c.doc_id,
       CASE WHEN nrem.id IS NOT NULL THEN coalesce(rebuilt.txt, '')
            ELSE c.text END AS text_dedup,
       coalesce(nrem.n_removed, 0) AS n_removed
FROM corpus c
LEFT JOIN nrem ON nrem.id = c.doc_id
LEFT JOIN rebuilt ON rebuilt.id = c.doc_id
"""


# ---------------------------------------------------------------------------
# text 0e — readability scoring + weighted priority sampling
# ---------------------------------------------------------------------------


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease per document (textops.readability): exact
    integer milli-unit arithmetic over three portable counts (\\s+ words,
    [.!?]+ sentence runs, vowel-group syllables) + band labels — one
    map-only codegen projection, the classic curriculum/quality feature
    next to the Gopher ratios."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return T.readability(docs, "doc_id", "text")


def _sql_text_readability() -> str:
    return T.sql_readability(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    )


def q_text_weighted_sample(spark, sf_dir):
    """Deterministic weight-proportional document sample
    (textops.weighted_sample, priority sampling): 64 docs weighted by
    whitespace token count + 1 — integer priority (h·10^6) div w over the
    portable md5 hash, TakeOrderedAndProject plan (per-partition top-k
    heaps, never a global sort). Reproducible across runs, partitionings,
    and engines."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = docs.select(
        "doc_id",
        (F.size(F.filter(F.split(F.col("text"), r"\s+"),
                         lambda x: x != "")) + F.lit(1))
        .cast("bigint").alias("w_tokens"),
    )
    return T.weighted_sample(w, "doc_id", "w_tokens", k=64)


def _sql_text_weighted_sample() -> str:
    rows = rf"""
  SELECT doc_id, (len({SQL_TOKS}) + 1)::BIGINT AS w_tokens
  FROM documents WHERE text IS NOT NULL
"""
    return T.sql_weighted_sample(rows, "doc_id", "w_tokens", k=64)


def q_text_ngram_novelty(spark, sf_dir):
    """Per-doc n-gram novelty (textops.ngram_novelty): fraction of the
    doc's distinct 3-grams first owned (min doc_id) by this doc — the
    marginal-contribution signal for curriculum ordering and recombined-
    boilerplate dropping. Gram text never shuffles (60-bit portable md5);
    novelty is an exact bigint/bigint double division."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return T.ngram_novelty(docs, "doc_id", "text")


def _sql_text_ngram_novelty() -> str:
    return T.sql_ngram_novelty(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    )


def q_text_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary-growth curve (textops.vocab_growth): 16
    doc_id-range buckets, per-bucket token counts and first-appearance
    vocabulary, cumulative sums over the B-row result — no global sort
    anywhere (range bucketing from one 2-scalar agg + min-bucket agg on
    token hashes)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return T.vocab_growth(docs, "doc_id", "text")


def _sql_text_vocab_growth() -> str:
    return T.sql_vocab_growth(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    )


OPS_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_group_sizes": q_dedup_group_sizes,
    "dedup_incremental": q_dedup_incremental,
    "dedup_bloom": q_dedup_bloom,
    "dedup_para_bloom": q_dedup_bloom_paras,
    "dedup_minhash_incr": q_dedup_minhash_incr,
    "dedup_span_removal": q_dedup_span_removal,
    "dedup_span_removal_para": q_dedup_span_removal_para,
    "dedup_span_removal_tok": q_dedup_span_removal_tok,
    "dedup_dup_spans": q_dedup_dup_spans,
    "dedup_exact_drop": q_dedup_exact_drop,
    "period_overlap_global": q_period_overlap_global,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_para_minhash": q_dedup_para_minhash,
    "dedup_minhash_drop": q_dedup_minhash_drop,
    "dedup_cluster_drop": q_dedup_cluster_drop,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "sim_topk_cosine": q_sim_topk_cosine,
    "sim_cosine_pairs": q_sim_cosine_pairs,
    "sim_ann_lsh": q_sim_ann_lsh,
    "sim_lsh_pairs": q_sim_lsh_pairs,
    "sim_lsh_drop": q_sim_lsh_drop,
    "sim_label_centroids": q_sim_label_centroids,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_kmeans_centroids": q_sim_kmeans_centroids,
    "sim_ivf_kmeans_topk": q_sim_ivf_kmeans_topk,
    "sim_pq_topk": q_sim_pq_topk,
    "sim_pq_rerank": q_sim_pq_rerank,
    "sim_ivfpq_topk": q_sim_ivfpq_topk,
    "sim_ivfpq_res_topk": q_sim_ivfpq_res_topk,
    "sim_ivfpq_rerank": q_sim_ivfpq_rerank,
    "sim_decontaminate": q_sim_decontaminate,
    "dedup_semantic": q_dedup_semantic,
    "dedup_semantic_drop": q_dedup_semantic_drop,
    "text_url_blocklist": q_text_url_blocklist,
    "graph_host_rank": q_graph_host_rank,
    "graph_host_rank_wt": q_graph_host_rank_wt,
    "graph_trust_rank": q_graph_trust_rank,
    "graph_personal_rank": q_graph_personal_rank,
    "graph_conn_comp": q_graph_conn_comp,
    "graph_harmonic": q_graph_harmonic,
    "graph_harmonic_hll": q_graph_harmonic_hll,
    "graph_anchor_stats": q_graph_anchor_stats,
    "graph_hits": q_graph_hits,
    "graph_degree_stats": q_graph_degree_stats,
    "sketch_distinct_hll": q_sketch_distinct_hll,
    "sketch_token_cms": q_sketch_token_cms,
    "sketch_cms_heavy": q_sketch_cms_heavy,
    "text_len_quantiles": q_text_len_quantiles,
    "text_reg_domain": q_text_reg_domain,
    "text_crawl_latest": q_text_crawl_latest,
    "text_crawl_latest_tied": q_text_crawl_latest_tied,
    "text_url_spam": q_text_url_spam,
    "text_fertility": q_text_fertility,
    "text_readability": q_text_readability,
    "text_weighted_sample": q_text_weighted_sample,
    "text_ngram_novelty": q_text_ngram_novelty,
    "text_vocab_growth": q_text_vocab_growth,
    "text_pii_counts": q_text_pii_counts,
    "text_badwords": q_text_badwords,
    "text_dsir_weights": q_text_dsir_weights,
    "text_clf_score": q_text_clf_score,
    "text_clf_inrow": q_text_clf_inrow,
    "text_mix_rates": q_text_mix_rates,
    "text_mix_resample": q_text_mix_resample,
    "text_mix_balance": q_text_mix_balance,
    "text_datasheet": q_text_datasheet,
    "text_crawl_diff": q_text_crawl_diff,
    "text_token_hist": q_text_token_hist,
    "text_langid_heur": q_text_langid_heur,
    "text_quality_score": q_text_quality_score,
    "text_pr_curve": q_text_pr_curve,
    "text_quality_topfrac": q_text_quality_topfrac,
    "text_shard_pack": q_text_shard_pack,
    "text_token_counts": q_text_token_counts,
    "text_top_tokens": q_text_top_tokens,
    "text_ngram_repetition": q_text_ngram_repetition,
    "text_corpus_ngrams": q_text_corpus_ngrams,
    "text_encoding_flags": q_text_encoding_flags,
    "text_chunk": q_text_chunk,
    "text_group_stats": q_text_group_stats,
    "text_contamination": q_text_contamination,
    "text_decontaminate": q_text_decontaminate,
    "text_normalize": q_text_normalize,
    "host_quota": q_host_quota,
    "text_sample_stratified": q_text_sample_stratified,
    "text_token_budget": q_text_token_budget,
    "text_line_dedup": q_text_line_dedup,
    "text_url_canon": q_text_url_canon,
    "text_boilerplate": q_text_boilerplate,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_real_meta": q_multimodal_real_meta,
    "multimodal_frames": q_multimodal_frames,
    "qf_heuristic_keep": q_qf_heuristic_keep,
    "qf_scrub": q_qf_scrub,
    "qf_pipeline_annotate": q_qf_pipeline_annotate,
    "qf_rule_ablation": q_qf_rule_ablation,
    "qf_host_keep_rates": q_qf_host_keep_rates,
}

OPS_ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_group_sizes": SQL_DEDUP_GROUP_SIZES,
    "dedup_incremental": _sql_dedup_incremental(),
    "dedup_bloom": _sql_dedup_bloom(),
    "dedup_para_bloom": _sql_dedup_bloom_paras(),
    "dedup_minhash_incr": _sql_dedup_minhash_incr(),
    "dedup_span_removal": _sql_dedup_span_removal(),
    "dedup_span_removal_para": _sql_dedup_span_removal_para(),
    "dedup_span_removal_tok": _sql_dedup_span_removal_tok(),
    "dedup_dup_spans": _sql_dedup_dup_spans(),
    "dedup_exact_drop": SQL_DEDUP_EXACT_DROP,
    "period_overlap_global": SQL_PERIOD_OVERLAP_GLOBAL,
    "dedup_minhash_lsh": _sql_minhash_lsh(),
    "dedup_para_minhash": _sql_minhash_lsh(SQL_PARA_CORPUS),
    "dedup_minhash_drop": _sql_minhash_drop(),
    "dedup_cluster_drop": _sql_cluster_drop(),
    "dedup_simhash": _sql_simhash(),
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "sim_topk_cosine": SQL_SIM_TOPK,
    "sim_cosine_pairs": SQL_SIM_COSINE_PAIRS,
    "sim_ann_lsh": _sql_ann_lsh(),
    "sim_lsh_pairs": _sql_sim_lsh_pairs(),
    "sim_lsh_drop": _sql_sim_lsh_drop(),
    "sim_label_centroids": SQL_SIM_LABEL_CENTROIDS,
    "sim_ivf_topk": SQL_SIM_IVF_TOPK,
    "sim_kmeans_centroids": _sql_kmeans_centroids(),
    "sim_ivf_kmeans_topk": _sql_ivf_kmeans_topk(),
    "sim_pq_topk": _sql_pq_topk(),
    "sim_pq_rerank": _sql_pq_rerank(),
    "sim_ivfpq_topk": _sql_ivfpq_topk(),
    "sim_ivfpq_res_topk": _sql_ivfpq_res_topk(),
    "sim_ivfpq_rerank": _sql_ivfpq_rerank(),
    "sim_decontaminate": _sql_sim_decontaminate(),
    "dedup_semantic": _sql_dedup_semantic(),
    "dedup_semantic_drop": _sql_dedup_semantic_drop(),
    "text_url_blocklist": _sql_text_url_blocklist(),
    "graph_host_rank": _sql_graph_host_rank(),
    "graph_host_rank_wt": _sql_graph_host_rank_wt(),
    "graph_trust_rank": _sql_graph_trust_rank(),
    "graph_personal_rank": _sql_graph_personal_rank(),
    "graph_conn_comp": _sql_graph_conn_comp(),
    "graph_harmonic": _sql_graph_harmonic(),
    "graph_harmonic_hll": _sql_graph_harmonic_hll(),
    "graph_anchor_stats": _sql_graph_anchor_stats(),
    "graph_hits": _sql_graph_hits(),
    "graph_degree_stats": _sql_graph_degree_stats(),
    "sketch_distinct_hll": _sql_sketch_distinct_hll(),
    "sketch_token_cms": _sql_sketch_token_cms(),
    "sketch_cms_heavy": _sql_sketch_cms_heavy(),
    "text_len_quantiles": _sql_text_len_quantiles(),
    "text_reg_domain": _sql_text_reg_domain(),
    "text_crawl_latest": _sql_text_crawl_latest(),
    "text_crawl_latest_tied": _sql_text_crawl_latest_tied(),
    "text_url_spam": _sql_text_url_spam(),
    "text_fertility": _sql_text_fertility(),
    "text_readability": _sql_text_readability(),
    "text_weighted_sample": _sql_text_weighted_sample(),
    "text_ngram_novelty": _sql_text_ngram_novelty(),
    "text_vocab_growth": _sql_text_vocab_growth(),
    "text_pii_counts": _sql_text_pii_counts(),
    "text_badwords": _sql_text_badwords(),
    "text_dsir_weights": _sql_text_dsir_weights(),
    "text_clf_score": _sql_text_clf_score(),
    "text_clf_inrow": _sql_text_clf_score(),
    "text_mix_rates": _sql_text_mix_rates(),
    "text_mix_resample": _sql_text_mix_resample(),
    "text_mix_balance": _sql_text_mix_balance(),
    "text_datasheet": _sql_text_datasheet(),
    "text_crawl_diff": _sql_text_crawl_diff(),
    "text_token_hist": _sql_text_token_hist(),
    "text_langid_heur": _sql_langid_heur(),
    "text_quality_score": _sql_quality_score(),
    "text_pr_curve": _sql_text_pr_curve(),
    "text_quality_topfrac": _sql_quality_topfrac(),
    "text_shard_pack": _sql_shard_pack(),
    "text_token_counts": SQL_TOKEN_COUNTS,
    "text_top_tokens": SQL_TEXT_TOP_TOKENS,
    "text_ngram_repetition": _sql_text_ngram_repetition(),
    "text_corpus_ngrams": _sql_text_corpus_ngrams(),
    "text_encoding_flags": _sql_text_encoding_flags(),
    "text_chunk": _sql_text_chunk(),
    "text_group_stats": SQL_TEXT_GROUP_STATS,
    "text_contamination": _sql_contamination(),
    "text_decontaminate": _sql_text_decontaminate(),
    "text_normalize": SQL_TEXT_NORMALIZE,
    "host_quota": SQL_HOST_QUOTA,
    "text_sample_stratified": _sql_sample_stratified(),
    "text_token_budget": _sql_token_budget(),
    "text_line_dedup": _sql_line_dedup(),
    "text_url_canon": _sql_url_canon(),
    "text_boilerplate": _sql_boilerplate(),
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_real_meta": SQL_MULTIMODAL_REAL_META,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "qf_heuristic_keep": _sql_qf_heuristic_keep(),
    "qf_scrub": _sql_qf_scrub(),
    "qf_pipeline_annotate": _sql_qf_pipeline_annotate(),
    "qf_rule_ablation": _sql_qf_rule_ablation(),
    "qf_host_keep_rates": _sql_qf_host_keep_rates(),
}
