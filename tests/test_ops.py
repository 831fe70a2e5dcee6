"""Unit tests for the training-data operators (ops/*): dedup tiers,
similarity search, text analysis, multimodal plumbing. Small hand-built
frames with known expected outcomes (the reference's marked-golden style,
test_df.xlsx) plus cross-checks against the pure-Python hash twin."""

import hashlib

import pytest
from pyspark.sql import functions as F

from data_quality_spark.ops import dedup as D
from data_quality_spark.ops import multimodal as M
from data_quality_spark.ops import similarity as S
from data_quality_spark.ops import textops as T
from data_quality_spark.ops.hashing import portable_hash64, py_hash64


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------


def test_portable_hash_matches_python(spark):
    rows = spark.range(1).select(
        portable_hash64(F.lit("hello world")).alias("h"),
        portable_hash64(F.lit("a"), "#3").alias("hs"),
    ).collect()[0]
    assert rows["h"] == py_hash64("hello world")
    assert rows["hs"] == py_hash64("a", "#3")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def test_word_shingles(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("x  y \t z",)], "text string"
    )
    out = [r["sh"] for r in df.select(
        D.word_shingles(F.col("text")).alias("sh")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # fewer than n words
    assert out[2] == []
    assert out[3] == ["x y z"]  # whitespace runs collapse


def test_word_shingles_distinct(spark):
    df = spark.createDataFrame([("a b a b a b a",)], "text string")
    out = df.select(D.word_shingles(F.col("text")).alias("sh")).collect()[0]["sh"]
    assert sorted(out) == ["a b a", "b a b"]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog today"),          # exact dup of 1
    # near dup of 1: J=0.889, chosen to share an LSH band deterministically
    # (banding is probabilistic per-pair: P(candidate | J) = 1-(1-J^3)^4)
    (3, "the quick brown fox jumps over the lazy dog today now"),
    (4, "completely different words about spark query engines here"),
    (5, None),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dup_groups(spark):
    out = D.exact_dup_groups(_docs(spark), "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 2 and out[0]["keep_id"] == 1


def test_drop_exact_dups(spark):
    kept = D.drop_exact_dups(_docs(spark), "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5]  # 2 dropped (dup of 1); null-text row kept


def test_minhash_lsh_pairs(spark):
    pairs = D.minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0          # identical text
    assert (1, 3) in got and got[(1, 3)] >= 0.5  # near dup
    assert all(4 not in p for p in got)  # unrelated doc never pairs


def test_minhash_pairs_string_ids(spark):
    """The LSH pair/survivor path must work with STRING ids (the pipeline
    dedups on url)."""
    df = spark.createDataFrame(
        [(f"https://h/{i}", t) for i, t in DOCS], "url string, text string"
    )
    pairs = D.minhash_lsh_pairs(df, "url", "text", threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("https://h/1", "https://h/2") in got
    kept = sorted(r["url"] for r in D.drop_near_dups(df, "url", pairs).collect())
    assert "https://h/2" not in kept and "https://h/1" in kept


def test_drop_near_dups_keep_lowest(spark):
    pairs = D.minhash_lsh_pairs(_docs(spark), "doc_id", "text", threshold=0.5)
    kept = D.drop_near_dups(_docs(spark), "doc_id", pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 2 (exact dup of 1) and 3 (near dup of 1) drop; 1, 4, null-text row stay
    assert ids == [1, 4, 5]


def test_simhash_identical_and_distinct(spark):
    out = D.simhash_pairs(_docs(spark), "doc_id", "text", max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert got[(1, 2)] == 0
    assert all(4 not in p for p in got)


def test_ngram_jaccard_pairs_blocked(spark):
    df = _docs(spark).withColumn("blk", F.lit("x"))
    out = D.ngram_jaccard_pairs(
        df, "doc_id", "text", ["blk"], threshold=0.99
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [-1.0, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>, label int")


def test_topk_cosine(spark):
    out = S.topk_cosine(_vecs(spark), "vec_id", "v", [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["cos_sim"] == 1.0


def test_cosine_pairs_blocked(spark):
    out = S.cosine_pairs(_vecs(spark), "vec_id", "v", ["label"], 0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_ann_lsh_excludes_opposite_bucket(spark):
    planes = [[1.0, 0.0, 0.0]]
    df = _vecs(spark)
    sigs = df.select(
        "vec_id", S.lsh_signature(F.col("v"), planes).alias("sig")
    ).collect()
    s = {r["vec_id"]: r["sig"] for r in sigs}
    assert s[1] == 1 and s[2] == 1 and s[4] == 0
    # orthogonal vector: dot == 0 → >= 0 → bucket 1 by convention
    assert s[3] == 1


def test_ann_lsh_topk_runs(spark):
    out = S.ann_lsh_topk(
        _vecs(spark).withColumn(
            "v64", F.expr("transform(sequence(1,64), i -> element_at(v, (i-1) % 3 + 1))")
        ),
        "vec_id", "v64",
        [1.0, 0.0, 0.0] * 21 + [1.0], k=3,
    ).collect()
    assert len(out) >= 1  # query-aligned vectors land in the query bucket


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_heuristic_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the table and it is happy"),
            (2, "der hund ist auf der straße und er ist froh"),
            (3, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_heur"] for r in
           T.with_heuristic_langid(df, "text").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab 12, cd!"), (2, None)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.token_counts(df, "doc_id", "text").collect()}
    r = out[1]
    assert r["n_ws_tokens"] == 3
    # ab | 1 | 2 | , | cd | !  = 6
    assert r["n_bpe_tokens"] == 6
    # NULL text -> NULL counts (NOT size()'s legacy -1, which corrupts
    # downstream cumsums/aggregates)
    assert out[2]["n_ws_tokens"] is None and out[2]["n_bpe_tokens"] is None


def test_top_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c c"), (3, None)], "doc_id long, text string"
    )
    out = [(r["token"], r["n"]) for r in T.top_tokens(df, "text", 3).collect()]
    assert out == [("a", 3), ("c", 2), ("b", 1)]


def test_ngram_repetition(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z"), (3, "w"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           T.ngram_repetition(df, "doc_id", "text", n=2).collect()}
    # doc 1: bigrams "a b"x2, "b a", "b c"; doc_chars=9;
    # top = dup = 2*len("a b")/9 = 6/9
    assert out[1]["n_grams"] == 4
    assert out[1]["top_ngram_frac"] == round(6 / 9, 6)
    assert out[1]["dup_ngram_frac"] == round(6 / 9, 6)
    # doc 2: no repeats -> dup 0, top = one bigram's 3 chars / 5
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == 0.6
    # < n tokens or NULL -> no row
    assert 3 not in out and 4 not in out


def test_ngram_repetition_dup_cap(spark):
    # overlapping repeats can exceed doc_chars; dup_frac caps at 1.0
    df = spark.createDataFrame([(1, "a a a a a a")], "doc_id long, text string")
    r = T.ngram_repetition(df, "doc_id", "text", n=2).collect()[0]
    # 5 occurrences of "a a" (3 chars) = 15 > 11 doc chars
    assert r["dup_ngram_frac"] == 1.0


def test_corpus_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "z"), (4, None)],
        "doc_id long, text string",
    )
    out = [(r["gram"], r["n"]) for r in
           T.corpus_ngrams(df, "text", n=3, k=2).collect()]
    assert out == [("a b c", 2), ("b c d", 1)]


def test_encoding_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "clean ascii text here"),
            (2, "damaged � bytes �"),          # replacement chars
            (3, "cafÃ© naÃ¯ve"),     # 'Ã©'/'Ã¯' mojibake
            (4, "ctl\x01\x02chars"),                      # C0 controls
            (5, "tab\tand\nnewline ok"),                  # \t \n are fine
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           T.encoding_flags(df, "doc_id", "text").collect()}
    assert out[1]["enc_ok"] and out[1]["n_replacement"] == 0
    assert out[2]["n_replacement"] == 2 and not out[2]["enc_ok"]
    assert out[3]["moji_frac"] > 0.01 and not out[3]["enc_ok"]
    assert out[4]["ctrl_frac"] > 0.01 and not out[4]["enc_ok"]
    assert out[5]["enc_ok"] and out[5]["ctrl_frac"] == 0.0
    # NULL text: NULL metrics, enc_ok coalesced to False
    assert out[6]["n_chars"] is None and out[6]["enc_ok"] is False


def test_chunk_documents(spark):
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = T.chunk_documents(df, "doc_id", "text", max_tokens=4, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    # doc 1: stride 3 -> starts 1,4,7; every token covered, 1-token overlap
    assert rows == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t4 t5 t6 t7"),
        (1, 2, 4, "t7 t8 t9 t10"),
        (2, 0, 2, "a b"),          # short doc: one short chunk
    ]                               # empty/NULL docs: no rows
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        T.chunk_documents(df, "doc_id", "text", max_tokens=4, overlap=4)


def test_group_doc_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en", "s1"), (2, "d e", "de", "s1"), (3, "f", "en", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["grp"]: r for r in T.group_doc_stats(df, "source", "text").collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["total_words"] == 5
    assert got["s1"]["avg_words"] == 2.5 and got["s1"]["n_langs"] == 2
    assert got["s2"]["total_words"] == 1


def test_group_doc_stats_null_text(spark):
    """NULL-text docs count toward n_docs but contribute no words (the SQL
    oracle's len(NULL) semantics) — size(NULL) must never leak a -1."""
    df = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, None, "s1")],
        "doc_id long, text string, source string",
    )
    r = {x["grp"]: x for x in T.group_doc_stats(df, "source", "text").collect()}
    assert r["s1"]["n_docs"] == 2
    assert r["s1"]["total_words"] == 3
    assert r["s1"]["avg_words"] == 3.0


def test_contamination_short_probe_reported(spark):
    """Probe docs too short to shingle must still appear in the report as
    unmeasurable (0 shingles, NULL overlap), never be silently dropped."""
    corpus = spark.createDataFrame([(10, "w x y z q")], "doc_id long, text string")
    probe = spark.createDataFrame(
        [(1, "w x y z q"), (2, "too short")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           T.contamination(corpus, probe, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    assert got[2]["n_shingles"] == 0 and got[2]["n_hit"] == 0
    assert got[2]["overlap"] is None
    assert got[1]["overlap"] == 1.0


def test_contamination_fractions(spark):
    corpus = spark.createDataFrame(
        [(10, "w x y z q"), (11, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(1, "w x y z q"),        # every shingle present → overlap 1.0
         (2, "totally novel text never seen")],  # none present → 0.0
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           T.contamination(corpus, probe, "doc_id", "text").collect()}
    assert got[1]["overlap"] == 1.0 and got[1]["n_hit"] == got[1]["n_shingles"]
    assert got[2]["overlap"] == 0.0 and got[2]["n_hit"] == 0


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in is it that for was " * 20), (2, "#### @@@@ ^^^^")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert 0.9 <= out[1] <= 1.0
    assert out[2] <= 0.1


def test_fingerprint_matches_py_hash(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    r = T.fingerprint(df, "doc_id", "text").collect()[0]
    shingles = ["a b c", "b c d", "c d e"]
    hs = [py_hash64(s) for s in shingles]
    assert r["fp_min"] == min(hs) and r["fp_max"] == max(hs)
    assert r["n_shingles"] == 3


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_multimodal_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, None)], "doc_id long, text string"
    )
    media = M.synthesize_media(docs, "doc_id", "text")
    meta = {r["media_id"]: r for r in M.decode_media_meta(media).collect()}
    assert set(meta) == {1, 2}  # null text filtered
    d = hashlib.md5(b"hello").digest()
    assert meta[1]["digest_md5"] == hashlib.md5(b"hello").hexdigest()
    assert meta[1]["n_bytes"] == 5
    assert meta[1]["width"] == 64 + d[0] % 192
    assert meta[1]["height"] == 64 + d[1] % 192
    assert meta[1]["format"] == "jpeg"  # 1 % 3 + 1 → index 2


def test_image_header_parsers():
    """Pure-Python PNG IHDR / JPEG SOF parsing on crafted real headers,
    including marker walks, progressive SOF2, fill bytes, lookalikes and
    truncation — no codec libs involved."""
    # PNG round-trip (CRC-correct IHDR) with trailing junk
    assert M.parse_png_header(M.png_bytes(1920, 1080, b"pixels...")) == (1920, 1080)
    # a REAL minimal PNG prefix seen in the wild: 1x1
    assert M.parse_png_header(M.png_bytes(1, 1)) == (1, 1)
    # signature alone / IHDR missing / truncated → None, never a throw
    assert M.parse_png_header(M.PNG_SIG) is None
    assert M.parse_png_header(M.PNG_SIG + b"\x00\x00\x00\rIDAT" + b"\0" * 16) is None
    assert M.parse_png_header(M.png_bytes(640, 480)[:20]) is None
    assert M.parse_png_header(b"") is None

    # JPEG baseline + progressive: parser must WALK past APP0 to the SOF
    assert M.parse_jpeg_header(M.jpeg_bytes(800, 600, b"entropy")) == (800, 600)
    assert M.parse_jpeg_header(M.jpeg_bytes(33, 7, progressive=True)) == (33, 7)
    # DHT (0xC4) shares the 0xCn range but is NOT a frame header: a stream
    # with DHT before SOF0 must skip it and read the real SOF dims
    import struct as _s

    dht = b"\xff\xc4" + _s.pack(">H", 5) + b"\x00\x01\x02"
    com = b"\xff\xfe" + _s.pack(">H", 9) + b"comment"
    sof = M.jpeg_bytes(256, 128)[2:]  # strip SOI, reuse APP0+SOF tail
    assert M.parse_jpeg_header(b"\xff\xd8" + com + dht + sof) == (256, 128)
    # fill bytes (0xFF padding) between segments are legal
    assert M.parse_jpeg_header(b"\xff\xd8\xff" + M.jpeg_bytes(12, 34)[2:]) == (12, 34)
    # SOS before any SOF / EOI / garbage / truncated-in-SOF → None
    sos = b"\xff\xda" + _s.pack(">H", 4) + b"\0\0"
    assert M.parse_jpeg_header(b"\xff\xd8" + sos) is None
    assert M.parse_jpeg_header(b"\xff\xd8\xff\xd9") is None
    assert M.parse_jpeg_header(b"\xff\xd8junk") is None
    assert M.parse_jpeg_header(M.jpeg_bytes(100, 100)[:24]) is None

    # sniff dispatch
    assert M.sniff_image(M.png_bytes(5, 6)) == ("png", 5, 6)
    assert M.sniff_image(M.jpeg_bytes(7, 8)) == ("jpeg", 7, 8)
    assert M.sniff_image(b"RIFF....WAVE") is None


def test_multimodal_real_decode_headers(spark):
    """decode_media_meta(real_decode=True) end-to-end: PNG/JPEG/GIF/WebP
    payloads carry genuine headers whose dims must round-trip bit-exactly;
    the wav row (no image header) falls back to the fake decoder +
    declared format."""
    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(10)],
        "doc_id long, text string",
    )
    media = M.synthesize_media_real(docs, "doc_id", "text")
    meta = {r["media_id"]: r for r in
            M.decode_media_meta(media, real_decode=True).collect()}
    assert set(meta) == set(range(10))
    hdr_len = {
        0: M.PNG_HEADER_LEN, 1: M.JPEG_HEADER_LEN, 2: M.GIF_HEADER_LEN,
    }
    fmt_of = {0: "png", 1: "jpeg", 2: "gif", 3: "webp", 4: "wav"}
    for i in range(10):
        r = meta[i]
        body = f"document body {i}".encode()
        k = i % 5
        assert r["format"] == fmt_of[k]
        if k == 4:
            d = hashlib.md5(body).digest()
            assert (r["width"], r["height"]) == (64 + d[0] % 192, 64 + d[1] % 192)
            assert r["n_bytes"] == len(body)
            continue
        assert (r["width"], r["height"]) == (16 + i % 625, 16 + (i * 7) % 475)
        if k == 3:
            hl = (M.WEBP_VP8L_HEADER_LEN if (i // 5) % 2 == 0
                  else M.WEBP_VP8_HEADER_LEN)
        else:
            hl = hdr_len[k]
        assert r["n_bytes"] == hl + len(body)
        if k == 0:
            assert r["digest_md5"] == hashlib.md5(
                M.png_bytes(r["width"], r["height"], body)).hexdigest()
    # real_decode=False on the same payloads: all dims fake, formats declared
    fake = {r["media_id"]: r for r in M.decode_media_meta(media).collect()}
    for i in (0, 1, 2, 3):
        assert fake[i]["format"] == meta[i]["format"]  # declared == sniffed here
        assert (fake[i]["width"], fake[i]["height"]) != (
            meta[i]["width"], meta[i]["height"])


def test_gif_webp_header_parsers():
    """Pure-python GIF / WebP header parsers: round-trip through the
    builders for every variant, plus truncation / corruption classes."""
    assert M.parse_gif_header(M.gif_bytes(640, 480, b"frames")) == (640, 480)
    assert M.parse_gif_header(M.gif_bytes(1, 1)) == (1, 1)
    assert M.parse_gif_header(b"GIF89a" + b"\x00" * 3) is None   # truncated
    assert M.parse_gif_header(M.gif_bytes(2, 2).replace(b"GIF", b"JIF")) is None
    # zero width in the screen descriptor -> not a usable image
    assert M.parse_gif_header(b"GIF89a\x00\x00\x05\x00\x70\x00\x00") is None
    for lossless in (False, True):
        b = M.webp_bytes(123, 457, b"bits", lossless=lossless)
        assert M.parse_webp_header(b) == (123, 457)
        fmt, w, h = M.sniff_image(b)
        assert (fmt, w, h) == ("webp", 123, 457)
    assert M.parse_webp_header(M.webp_bytes(5, 6)[:20]) is None   # truncated
    bad_sync = bytearray(M.webp_bytes(5, 6))
    bad_sync[23] = 0x00
    assert M.parse_webp_header(bytes(bad_sync)) is None
    # VP8X extended canvas: hand-built chunk
    vp8x = (b"RIFF" + (4 + 8 + 10).to_bytes(4, "little") + b"WEBP"
            + b"VP8X" + (10).to_bytes(4, "little") + bytes([0, 0, 0, 0])
            + (799).to_bytes(3, "little") + (599).to_bytes(3, "little"))
    assert M.parse_webp_header(vp8x) == (800, 600)
    assert M.sniff_image(M.gif_bytes(9, 9)) == ("gif", 9, 9)
    # 14-bit guard rails on the builder
    import pytest as _pytest
    with _pytest.raises(ValueError):
        M.webp_bytes(20000, 5, lossless=True)


def test_media_meta_native_agrees_with_pandas_path(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], "doc_id long, text string"
    )
    media = M.synthesize_media(docs, "doc_id", "text")
    native = {r["media_id"]: r for r in M.media_meta_native(media).collect()}
    pandas_path = {r["media_id"]: r for r in M.decode_media_meta(media).collect()}
    assert set(native) == set(pandas_path)
    for k in native:
        assert native[k]["digest_md5"] == pandas_path[k]["digest_md5"]
        assert native[k]["n_bytes"] == pandas_path[k]["n_bytes"]


def test_sample_frames_udf_matches_native(spark):
    """1→N frame sampling: Arrow mapInPandas path == Catalyst
    sequence+explode twin, including empty and multi-frame payloads."""
    docs = spark.createDataFrame(
        [(1, "x" * 700), (2, "short"), (3, "y" * 256), (4, None)],
        "doc_id long, text string",
    )
    media = M.synthesize_media(docs, "doc_id", "text")
    udf = sorted(
        map(tuple, M.sample_frames(media, every_n=2).collect())
    )
    native = sorted(
        map(tuple, M.sample_frames(media, every_n=2, strategy="native").collect())
    )
    assert udf == native and len(udf) > 0
    # 700 chars → frames 0,1,2 → sampled 0,2; frame 2 has 700-512=188 chars
    by_doc = [(r for r in udf if r[0] == 1)]
    f1 = [r for r in udf if r[0] == 1]
    assert [(r[1], r[2]) for r in f1] == [(0, 256), (2, 188)]


def test_resize_media_udf_matches_native(spark):
    docs = spark.createDataFrame(
        [(1, "z" * 500), (2, "tiny")], "doc_id long, text string"
    )
    media = M.synthesize_media(docs, "doc_id", "text")
    udf = {r["media_id"]: r for r in M.resize_media(media, 32, 32).collect()}
    nat = {r["media_id"]: r
           for r in M.resize_media(media, 32, 32, strategy="native").collect()}
    assert set(udf) == set(nat)
    for k in udf:
        assert bytes(udf[k]["payload"]) == bytes(nat[k]["payload"])
        assert udf[k]["width"] == 32 and udf[k]["height"] == 32
    assert len(bytes(udf[1]["payload"])) == (32 * 32) // 16  # budget-capped


# ---------------------------------------------------------------------------
# global period intersection (range-partitioned scale path)
# ---------------------------------------------------------------------------


def test_overlapping_periods_global_matches_window(spark):
    """The range-partition + boundary-stitch operator must equal the
    single-partition global-window rule on the same input."""
    import datetime as dt

    from pyspark.sql import Window

    from data_quality_spark.ops.intervals import overlapping_periods_global

    base = dt.datetime(2024, 1, 1)
    rows = []
    # clusters of overlapping periods + isolated ones, adversarial ties
    for i in range(300):
        start = base + dt.timedelta(minutes=3 * i)
        dur = 5 if i % 7 == 0 else 2  # every 7th overlaps its successor
        rows.append((i, start, start + dt.timedelta(minutes=dur)))
    rows.append((1000, base, base + dt.timedelta(minutes=2)))  # tie with i=0
    df = spark.createDataFrame(
        rows, "event_id long, start_ts timestamp, end_ts timestamp"
    )

    got = sorted(
        r["event_id"]
        for r in overlapping_periods_global(
            df, "start_ts", "end_ts", tiebreak_cols=["event_id"],
            num_partitions=7,
        ).collect()
    )

    w = Window.orderBy("start_ts", "end_ts", "event_id")
    chk = F.coalesce(F.lag("end_ts").over(w) > F.col("start_ts"), F.lit(False))
    flagged = df.withColumn("chk", chk)
    ko = flagged.withColumn(
        "double_chk",
        F.col("chk") | F.coalesce(F.lead("chk").over(w), F.lit(False)),
    ).where("double_chk")
    exp = sorted(r["event_id"] for r in ko.collect())
    assert got == exp and len(exp) > 0


def test_overlapping_periods_global_multibatch(spark):
    """A partition larger than arrow.maxRecordsPerBatch arrives as SEVERAL
    pandas batches inside one mapInPandas call; the lag/lead chain must run
    across batch boundaries, stitching only at true partition edges
    (regression: the batch-as-partition bug flagged in round-1 ADVICE)."""
    import datetime as dt

    from pyspark.sql import Window

    from data_quality_spark.ops.intervals import overlapping_periods_global

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        start = base + dt.timedelta(minutes=3 * i)
        dur = 5 if i % 7 == 0 else 2
        rows.append((i, start, start + dt.timedelta(minutes=dur)))
    df = spark.createDataFrame(
        rows, "event_id long, start_ts timestamp, end_ts timestamp"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        got = sorted(
            r["event_id"]
            for r in overlapping_periods_global(
                df, "start_ts", "end_ts", tiebreak_cols=["event_id"],
                num_partitions=3,  # ~666 rows/partition = ~14 batches each
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    w = Window.orderBy("start_ts", "end_ts", "event_id")
    chk = F.coalesce(F.lag("end_ts").over(w) > F.col("start_ts"), F.lit(False))
    ko = (
        df.withColumn("chk", chk)
        .withColumn(
            "dchk", F.col("chk") | F.coalesce(F.lead("chk").over(w), F.lit(False))
        )
        .where("dchk")
    )
    exp = sorted(r["event_id"] for r in ko.collect())
    assert got == exp and len(exp) > 400


def test_overlapping_periods_global_extremes_exclude(spark):
    import datetime as dt

    from data_quality_spark.ops.intervals import overlapping_periods_global

    base = dt.datetime(2024, 1, 1)
    # touching endpoints: [0,10) and [10,20)
    df = spark.createDataFrame(
        [(1, base, base + dt.timedelta(minutes=10)),
         (2, base + dt.timedelta(minutes=10), base + dt.timedelta(minutes=20))],
        "event_id long, start_ts timestamp, end_ts timestamp",
    )
    strict = overlapping_periods_global(
        df, "start_ts", "end_ts", ["event_id"]).count()
    touching = overlapping_periods_global(
        df, "start_ts", "end_ts", ["event_id"], extremes_exclude=True).count()
    assert strict == 0 and touching == 2


def test_pair_band_keys_udf_matches_native_fold(spark, sf_dir):
    """The vectorized Arrow signature UDF must produce EXACTLY the band keys
    the interpreted Catalyst fold produces (bit-identical dots + identical
    round-then-sign decisions) over the real embeddings corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    native = (
        emb.select(
            "vec_id",
            F.array(
                *[
                    F.lit(t << 32).cast("long")
                    + S.lsh_signature(F.col("v"), planes).cast("long")
                    for t, planes in enumerate(S.PAIR_HYPERPLANES)
                ]
            ).alias("keys"),
        )
        .collect()
    )
    udf = {
        r["vec_id"]: r["keys"]
        for r in emb.select(
            "vec_id",
            S._pair_band_keys_udf(S.PAIR_HYPERPLANES)(F.col("v")).alias("keys"),
        ).collect()
    }
    assert len(native) > 0
    for r in native:
        assert udf[r["vec_id"]] == r["keys"], r["vec_id"]


def test_ivf_topk_probes_nearest_cell(spark):
    """Cell 0 holds query-aligned vectors; n_probe=1 must search only cell
    0 and find them; the opposite-direction vector in cell 1 never appears."""
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0], 0),
        (3, [0.8, 0.2, 0.0], 0),
        (4, [-1.0, 0.0, 0.0], 1),
        (5, [-0.9, -0.1, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, label int")
    out = S.ivf_topk(df, "vec_id", "v", "label", [1.0, 0.0, 0.0],
                     k=10, n_probe=1, dim=3).collect()
    ids = [r["vec_id"] for r in out]
    assert ids == [1, 2, 3]


def test_assign_cells_udf_matches_native_expr(spark, sf_dir):
    """The Arrow assignment UDF and the Catalyst fold expression must agree
    on every vector (same rounded cosines, same tie resolution)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = S.train_kmeans_cells(emb, "vec_id", "v", 4, 1)
    native = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", S.assign_cells(F.col("v"), cents, "native").alias("c")
        ).collect()
    }
    udf = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", S.assign_cells(F.col("v"), cents, "udf").alias("c")
        ).collect()
    }
    assert len(native) > 0 and native == udf


def test_train_kmeans_matches_python_twin(spark, sf_dir):
    """Deterministic Lloyd's: same init (k smallest ids), same rounded-6dp
    assignment/means — a plain-numpy twin must land on the same centroids
    (tolerance one 6dp grid step for partial-sum-order noise in the mean)."""
    import numpy as np
    import pyarrow.parquet as pq

    from data_quality_spark.pipeline.expected import round_half_up

    K, ITERS = 4, 2
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = np.array(S.train_kmeans_cells(emb, "vec_id", "embedding", K, ITERS))

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    V = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    cents = V[:K].copy()

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    for _ in range(ITERS):
        assign = []
        for v in V:
            nv = np.sqrt(seq_dot(v, v))
            best = None
            for ci, c in enumerate(cents):
                nc = np.sqrt(seq_dot(c, c))
                cs = seq_dot(v, c) / (nv * nc) if nv > 0 and nc > 0 else 0.0
                cs = round_half_up(cs, 6)
                if best is None or cs > best[0]:
                    best = (cs, ci)
            assign.append(best[1])
        assign = np.array(assign)
        new = []
        for ci in range(K):
            members = V[assign == ci]
            if len(members):
                new.append([round_half_up(float(m), 6)
                            for m in members.mean(axis=0)])
            else:
                new.append(list(cents[ci]))
        cents = np.array(new)
    assert np.allclose(got, cents, atol=2e-6), np.abs(got - cents).max()


def test_ivf_kmeans_recall(spark, sf_dir):
    """Trained-IVF probe search must recover most of the exact top-10 at
    n_probe=2 of 8 cells (recall < 1 by construction — the documented
    approximation that makes the scan touch ~n_probe/k of the corpus)."""
    from data_quality_spark.queries_ops import _query_vec

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir)
    cents = S.train_kmeans_cells(emb, "vec_id", "embedding", 8, 3)
    approx = {r["vec_id"] for r in
              S.ivf_topk_trained(emb, "vec_id", "embedding", cents, q,
                                 k=10, n_probe=2).collect()}
    exact = {r["vec_id"] for r in
             S.topk_cosine(emb, "vec_id", "embedding", q, k=10).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, recall


def test_pq_encode_and_adc_exact(spark):
    """With hand-built codebooks, encode picks the nearest sub-centroid
    (lowest code on ties) and ADC distances equal the hand-computed
    6dp-micro-unit table sums; ordering ties break by id."""
    # dim 4, m=2 subspaces of d_sub=2, k=2 codes each
    books = [
        [[0.0, 0.0], [10.0, 10.0]],   # subspace 0
        [[0.0, 0.0], [10.0, 10.0]],   # subspace 1
    ]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.0, 9.9, 10.0]),   # codes (0, 1)
            (2, [9.9, 10.0, 0.1, 0.0]),   # codes (1, 0)
            (3, [5.0, 5.0, 5.0, 5.0]),    # equidistant -> ties -> (0, 0)
        ],
        "vec_id bigint, embedding array<double>",
    )
    codes = {r["vec_id"]: list(r["codes"]) for r in
             S.pq_encode(df, "vec_id", "embedding", books).collect()}
    assert codes == {1: [0, 1], 2: [1, 0], 3: [0, 0]}

    q = [0.0, 0.0, 0.0, 0.0]
    res = S.pq_topk_adc(
        S.pq_encode(df, "vec_id", "embedding", books), "vec_id", books, q,
        k=3,
    ).collect()
    # table: sub dist to code0 = 0, to code1 = 200 -> micro-units 0 / 2e8
    got = [(r["vec_id"], r["adc_dist"]) for r in res]
    assert got == [(3, 0.0), (1, 200.0), (2, 200.0)]  # tie 1<2 by id


def test_train_pq_deterministic(spark, sf_dir):
    """Codebook training is RNG-free: two runs produce identical books,
    and encode emits one in-range code per subspace."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = S.train_pq(emb, "vec_id", "embedding")
    b2 = S.train_pq(emb, "vec_id", "embedding")
    assert b1 == b2
    assert len(b1) == S.PQ_M and all(len(bk) == S.PQ_K for bk in b1)
    row = S.pq_encode(emb, "vec_id", "embedding", b1).first()
    assert len(row["codes"]) == S.PQ_M
    assert all(0 <= c < S.PQ_K for c in row["codes"])

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        S.train_pq(emb, "vec_id", "embedding", m=7)


def test_pq_rerank_recall(spark, sf_dir):
    """ADC-nominate + exact-cosine re-rank must beat raw ADC's recall of
    the exact top-10 (the point of the second stage) and return the
    topk_cosine output contract."""
    from data_quality_spark.queries_ops import _query_vec

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir)
    books = S.train_pq(emb, "vec_id", "embedding")
    codes = S.pq_encode(emb, "vec_id", "embedding", books)
    rer = S.pq_topk_rerank(codes, emb, "vec_id", "embedding", books, q,
                           k=10, n_candidates=50)
    assert rer.columns == ["vec_id", "cos_sim"]
    got = {r["vec_id"] for r in rer.collect()}
    exact = {r["vec_id"] for r in
             S.topk_cosine(emb, "vec_id", "embedding", q, k=10).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, recall


def test_ivfpq_index_fusion_and_pruning(spark, sf_dir):
    """The (cell, codes) index builds in ONE Arrow stage, and IVF-PQ search
    equals plain ADC search restricted to the probed cells (the pruning is
    a filter, not a different scorer)."""
    from data_quality_spark.queries_ops import _query_vec

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir)
    cents = S.train_kmeans_cells(emb, "vec_id", "embedding", 8, 3)
    books = S.train_pq(emb, "vec_id", "embedding")
    idx = S.pq_encode_with_cells(emb, "vec_id", "embedding", books, cents)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1  # cell + codes fused

    got = [(r["vec_id"], r["adc_dist"]) for r in
           S.ivfpq_topk(idx, "vec_id", books, cents, q, k=5,
                        n_probe=2).collect()]
    import math

    from data_quality_spark.pipeline.expected import round_half_up

    def cos(c):
        d = na = nb = 0.0
        for a, b in zip(c, q):
            d += a * b
            na += a * a
            nb += b * b
        na, nb = math.sqrt(na), math.sqrt(nb)
        return round_half_up(d / (na * nb), 6) if na > 0 and nb > 0 else 0.0

    probe = sorted(range(len(cents)), key=lambda i: (-cos(cents[i]), i))[:2]
    manual = [(r["vec_id"], r["adc_dist"]) for r in
              S.pq_topk_adc(idx.where(F.col("cell").isin(probe)), "vec_id",
                            books, q, k=5).collect()]
    assert got == manual and len(got) == 5


def test_residual_pq_fuses_and_tightens_error(spark, sf_dir):
    """The residual index builds in one fused Arrow stage, and residual
    codes reconstruct the corpus with no worse mean squared error than
    raw-vector codes (the reason IVF-PQ encodes residuals). Deterministic
    data + RNG-free training make this a fixed comparison, not a flake."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = S.train_kmeans_cells(emb, "vec_id", "embedding", 8, 3)
    books_raw = S.train_pq(emb, "vec_id", "embedding")
    books_res = S.train_pq_residual(emb, "vec_id", "embedding", cents)

    idx_res = S.pq_encode_residual(emb, "vec_id", "embedding", books_res,
                                   cents)
    plan = idx_res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1  # assign + residual-encode

    V = {r["vec_id"]: np.asarray(r["embedding"], float) for r in
         emb.select("vec_id", "embedding").collect()}
    C = np.asarray(cents)
    BR, BS = np.asarray(books_raw), np.asarray(books_res)
    dsub = S.EMB_DIM // S.PQ_M

    def mse(index_rows, books, use_cell):
        errs = []
        for r in index_rows:
            rec = np.concatenate([books[s][r["codes"][s]]
                                  for s in range(S.PQ_M)])
            if use_cell:
                rec = rec + C[r["cell"]]
            errs.append(float(((V[r["vec_id"]] - rec) ** 2).sum()))
        return sum(errs) / len(errs)

    raw_rows = S.pq_encode_with_cells(emb, "vec_id", "embedding", books_raw,
                                      cents).collect()
    res_rows = idx_res.collect()
    assert dsub * S.PQ_M == S.EMB_DIM
    assert mse(res_rows, BS, True) <= mse(raw_rows, BR, False)

    # search returns k rows from probed cells only
    from data_quality_spark.queries_ops import _query_vec

    q = _query_vec(spark, sf_dir)
    out = S.ivfpq_residual_topk(idx_res, "vec_id", books_res, cents, q,
                                k=5, n_probe=2).collect()
    assert len(out) == 5 and out[0]["adc_dist"] <= out[-1]["adc_dist"]


def test_pq_null_embedding_parity(spark, tmp_path, monkeypatch):
    """A NULL embedding encodes as the ZERO vector on both engines: the
    engine stacks NULLs as zeros (_stack_vecs), and the SQL twin's
    zero-coalescing ev CTE must reproduce the same codes/ADC result —
    without it the l2 chain is all-NULL and every code ties to 0."""
    import duckdb
    import numpy as np
    import pandas as pd

    from data_quality_spark import queries_ops as Q
    from data_quality_spark.pipeline import expected as E

    monkeypatch.setattr(E, "EXPECTED_DIR", str(tmp_path))

    # hand codebooks: 8 subs x 2 codes x 8 dims — code 0 = ones, code 1 = 3s
    books = [[[1.0] * 8, [3.0] * 8] for _ in range(8)]
    pd.DataFrame(
        [(s, j, p, v) for s, bk in enumerate(books)
         for j, c in enumerate(bk) for p, v in enumerate(c)],
        columns=["sub", "code", "pos", "val"],
    ).to_parquet(Q._pq_path())

    rows = [
        (Q.QUERY_VEC_ID, [1.0] * 64),          # query: near code 0
        (100, None),                           # NULL -> zero vector
        (101, [0.0] * 64),                     # explicit zeros: same codes
        (102, [3.0] * 64),                     # near code 1
    ]
    sdf = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    codes = {r["vec_id"]: list(r["codes"]) for r in
             S.pq_encode(sdf, "vec_id", "embedding", books).collect()}
    assert codes[100] == codes[101]  # NULL == zero vector

    eng = [(r["vec_id"], r["adc_dist"]) for r in
           S.pq_topk_adc(S.pq_encode(sdf, "vec_id", "embedding", books),
                         "vec_id", books, [1.0] * 64, k=4).collect()]

    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [np.asarray(r[1], dtype=np.float32)
                       if r[1] is not None else None for r in rows]}
    )
    con.register("embeddings", pdf)
    ora = [tuple(r) for r in con.execute(Q._sql_pq_topk()).fetchall()]
    assert eng == ora, (eng, ora)


def test_ivfpq_rerank_recall(spark, sf_dir):
    """Probe + residual ADC + exact re-rank recovers most of the exact
    top-10 (both recall mitigations active) and keeps the topk_cosine
    output contract."""
    from data_quality_spark.queries_ops import _query_vec

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir)
    cents = S.train_kmeans_cells(emb, "vec_id", "embedding", 8, 3)
    books = S.train_pq_residual(emb, "vec_id", "embedding", cents)
    idx = S.pq_encode_residual(emb, "vec_id", "embedding", books, cents)
    out = S.ivfpq_rerank(idx, emb, "vec_id", "embedding", books, cents, q,
                         k=10, n_probe=2, n_candidates=50)
    assert out.columns == ["vec_id", "cos_sim"]
    got = {r["vec_id"] for r in out.collect()}
    exact = {r["vec_id"] for r in
             S.topk_cosine(emb, "vec_id", "embedding", q, k=10).collect()}
    assert len(got & exact) / len(exact) >= 0.7


def test_label_centroids_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 3.0], 0), (2, [3.0, 5.0], 0), (3, [10.0, 0.0], 1)],
        "vec_id long, v array<double>, label int",
    )
    cents = {r["cell"]: (r["n"], r["centroid"]) for r in
             S.label_centroids(df, "v", "label", dim=2).collect()}
    assert cents[0] == (2, [2.0, 4.0])
    assert cents[1] == (1, [10.0, 0.0])


def test_overlapping_periods_global_no_materialization_and_colocated_pids(spark):
    """Round-3 contract: the global interval operator must run with NO
    localCheckpoint/cache anywhere in its plan (partition ids are a
    deterministic expression of the row key), and must stay correct when
    several pid groups share one shuffle task AND partitions arrive as
    multiple Arrow batches."""
    import datetime as dt

    from pyspark.sql import Window

    from data_quality_spark.ops.intervals import (
        overlap_flags_global,
        overlapping_periods_global,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(900):
        start = base + dt.timedelta(minutes=3 * i)
        dur = 5 if i % 7 == 0 else 2
        rows.append((i, start, start + dt.timedelta(minutes=dur)))
    df = spark.createDataFrame(
        rows, "event_id long, start_ts timestamp, end_ts timestamp"
    )
    flagged = overlap_flags_global(
        df, "start_ts", "end_ts", tiebreak_cols=["event_id"], num_partitions=6
    )
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Checkpoint" not in plan and "InMemoryTableScan" not in plan
    assert flagged.count() == len(rows)  # 1:1 row preservation

    # forced co-location: 6 pid ranges funneled into 2 shuffle tasks, with
    # 50-row Arrow batches → pid transitions mid-task and mid-batch
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        got = sorted(
            r["event_id"]
            for r in overlap_flags_global(
                df, "start_ts", "end_ts", tiebreak_cols=["event_id"],
                num_partitions=6, shuffle_partitions=2,
            ).where(F.col("__overlap_ko")).collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    w = Window.orderBy("start_ts", "end_ts", "event_id")
    chk = F.coalesce(F.lag("end_ts").over(w) > F.col("start_ts"), F.lit(False))
    exp = sorted(
        r["event_id"]
        for r in df.withColumn("chk", chk)
        .withColumn("d", F.col("chk") | F.coalesce(F.lead("chk").over(w), F.lit(False)))
        .where("d")
        .collect()
    )
    assert got == exp and len(exp) > 200


def test_ivf_persisted_centroids_default(spark, sf_dir, tmp_path, monkeypatch):
    """ivf_topk(centroids_path=...) must compute the quantizer ONCE, persist
    it, and on later calls load it driver-side WITHOUT a centroid job over
    the corpus — pinned by swapping in a corpus that would yield different
    centroids and observing the persisted ones still drive the probe."""
    import os

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(i % 5 - 2) for i in range(64)]
    path = str(tmp_path / "cent.parquet")

    first = S.ivf_topk(emb, "vec_id", "embedding", "label", q,
                       k=5, n_probe=2, centroids_path=path).collect()
    assert os.path.exists(path)
    # round-trip preserves cell type and values exactly
    loaded = S.load_centroids(path)
    computed = {r["cell"]: list(r["centroid"])
                for r in S.label_centroids(emb, "embedding", "label").collect()}
    assert {r["cell"]: r["centroid"] for r in loaded} == computed
    assert all(isinstance(r["cell"], type(next(iter(computed)))) for r in loaded)

    # with the file in place, a repeated call must NOT recompute centroids:
    # any call into label_centroids now fails the test outright
    def _boom(*a, **k):
        raise AssertionError("centroid job issued despite persisted table")

    monkeypatch.setattr(S, "label_centroids", _boom)
    rows = S.ivf_topk(emb, "vec_id", "embedding", "label", q,
                      k=5, n_probe=2, centroids_path=path).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in first]


def test_drop_near_dups_cluster_policy(spark):
    """policy='cluster' keeps exactly one survivor (min id) per connected
    component, including shapes keep-lowest gets wrong: pairs (a,c),(b,c)
    leave {a,b} under keep-lowest but only {a} under cluster."""
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 9)], "id long, text string"
    )
    # components: {1,2,3} via (1,3),(2,3); chain {4,5,6}; isolated 7, 8
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 5), (5, 6)], "id_a long, id_b long"
    )
    kl = sorted(r["id"] for r in D.drop_near_dups(docs, "id", pairs).collect())
    assert kl == [1, 2, 4, 7, 8]  # keep-lowest: b=2 survives the (a,c),(b,c) shape
    cl = sorted(
        r["id"]
        for r in D.drop_near_dups(docs, "id", pairs, policy="cluster").collect()
    )
    assert cl == [1, 4, 7, 8]  # one survivor per component
    # a long chain converges too (diameter 6 < max_iter)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    cl2 = sorted(
        r["id"]
        for r in D.drop_near_dups(docs, "id", chain, policy="cluster").collect()
    )
    assert cl2 == [1]


def test_sample_stratified_deterministic(spark, sf_dir):
    """Hash-threshold sampling is a pure function of (id, salt): the kept
    set is identical under repartitioning (Spark's own samplers are not),
    monotone in the fraction, and disjoint-ish across salts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept1 = {r["doc_id"] for r in T.sample_stratified(
        docs, "doc_id", 0.3, salt="s1").select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in T.sample_stratified(
        docs.repartition(13), "doc_id", 0.3, salt="s1").select("doc_id").collect()}
    assert kept1 == kept2 and 0 < len(kept1) < docs.count()
    # monotone: a larger fraction strictly contains a smaller one
    kept_small = {r["doc_id"] for r in T.sample_stratified(
        docs, "doc_id", 0.1, salt="s1").select("doc_id").collect()}
    assert kept_small <= kept1
    # per-stratum rates: lang-keyed fractions apply per row's language
    strat = T.sample_stratified(
        docs, "doc_id", {"en": 1.0}, strata_col="lang", default_fraction=0.0)
    rows = strat.select("lang").distinct().collect()
    assert {r["lang"] for r in rows} == {"en"}


def test_token_budget_cap(spark):
    """Rows admitted per group while tokens-before < budget: the crossing
    row IS admitted, later rows are not; every nonempty group contributes
    at least its first row even when it alone exceeds the budget."""
    rows = [
        ("a", 1, 40), ("a", 2, 50), ("a", 3, 20), ("a", 4, 5),
        ("b", 1, 500),  # single giant doc: still admitted
        ("b", 2, 1),
        ("c", 1, 10),
    ]
    df = spark.createDataFrame(rows, "grp string, i int, toks long")
    out = sorted(
        (r["grp"], r["i"])
        for r in T.token_budget_cap(df, "grp", "i", "toks", budget=100).collect()
    )
    # a: before-sums 0,40,90,110 → i=1,2,3 admitted (3 crosses), 4 not
    # b: i=1 admitted (before 0), i=2 not (before 500)
    # c: admitted
    assert out == [("a", 1), ("a", 2), ("a", 3), ("b", 1), ("c", 1)]


def test_overlapping_periods_global_null_field_fallback(spark):
    """NULL start values with DIFFERING ends can split across range
    partitions (null==null compares equal on the first field), breaking
    the fused pid==rank identity — the operator must detect it and fall
    back to the explicit stitch job, matching the window oracle."""
    import datetime as dt

    from pyspark.sql import Window

    from data_quality_spark.ops.intervals import overlap_flags_global

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 120 null-start rows with distinct ends (forces null keys into
    # several range partitions) + a real overlapping tail
    for i in range(120):
        rows.append((i, None, base + dt.timedelta(minutes=i)))
    for i in range(120, 200):
        start = base + dt.timedelta(minutes=3 * i)
        dur = 5 if i % 7 == 0 else 2
        rows.append((i, start, start + dt.timedelta(minutes=dur)))
    df = spark.createDataFrame(rows, "event_id long, s timestamp, e timestamp")
    got = sorted(
        r["event_id"]
        for r in overlap_flags_global(
            df, "s", "e", tiebreak_cols=["event_id"], num_partitions=8
        ).where(F.col("__overlap_ko")).collect()
    )
    w = Window.orderBy("s", "e", "event_id")
    chk = F.coalesce(F.lag("e").over(w) > F.col("s"), F.lit(False))
    exp = sorted(
        r["event_id"]
        for r in df.withColumn("chk", chk)
        .withColumn("d", F.col("chk") | F.coalesce(F.lead("chk").over(w), F.lit(False)))
        .where("d")
        .collect()
    )
    assert got == exp and len(exp) > 10


def test_overlap_state_reuse_and_persistence(spark, tmp_path, monkeypatch):
    """Round-4 contract (r3 verdict 'what's wrong' #3): repeat callers must
    be able to skip the slim range-sampling job entirely by passing a
    precomputed/persisted plan state — pinned by poisoning the sampler and
    observing state-driven calls still produce the window-oracle answer."""
    import datetime as dt

    from pyspark.sql import Window

    from data_quality_spark.ops import intervals as IV

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        start = base + dt.timedelta(minutes=3 * i)
        dur = 5 if i % 7 == 0 else 2
        rows.append((i, start, start + dt.timedelta(minutes=dur)))
    df = spark.createDataFrame(
        rows, "event_id long, start_ts timestamp, end_ts timestamp"
    )
    w = Window.orderBy("start_ts", "end_ts", "event_id")
    chk = F.coalesce(F.lag("end_ts").over(w) > F.col("start_ts"), F.lit(False))
    exp = sorted(
        r["event_id"]
        for r in df.withColumn("chk", chk)
        .withColumn(
            "d", F.col("chk") | F.coalesce(F.lead("chk").over(w), F.lit(False))
        )
        .where("d")
        .collect()
    )

    state = IV.compute_overlap_state(
        df, "start_ts", "end_ts", tiebreak_cols=["event_id"], num_partitions=6
    )
    path = str(tmp_path / "overlap_state.json")
    IV.save_overlap_state(state, path)
    loaded = IV.load_overlap_state(path)

    def _boom(*a, **k):
        raise AssertionError("sampling job must not run when state is given")

    monkeypatch.setattr(IV, "_sample_partitions", _boom)

    for st, kw in [(state, {}), (None, {"state_path": path}), (loaded, {})]:
        got = sorted(
            r["event_id"]
            for r in IV.overlap_flags_global(
                df, "start_ts", "end_ts", tiebreak_cols=["event_id"],
                state=st, **kw,
            ).where(F.col("__overlap_ko")).collect()
        )
        assert got == exp and len(exp) > 50

    # geometry pinning: a state computed for different sort columns fails
    # loudly instead of mis-partitioning
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sort columns"):
        IV.overlap_flags_global(
            df, "end_ts", "start_ts", tiebreak_cols=["event_id"], state=state
        ).count()


def test_overlap_state_stale_input_raises(spark):
    """Round-5 ADVICE: state reuse against a CHANGED table must fail loudly
    (per-pid recorded __n vs observed count), never silently mis-stitch the
    prev_end/next-chk chain at partition boundaries."""
    import datetime as dt

    from pyspark.errors.exceptions.captured import PythonException

    from data_quality_spark.ops import intervals as IV

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=3 * i),
         base + dt.timedelta(minutes=3 * i + 2))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, start_ts timestamp, end_ts timestamp"
    )
    state = IV.compute_overlap_state(
        df, "start_ts", "end_ts", tiebreak_cols=["event_id"],
        num_partitions=6,
    )
    # same state, DIFFERENT data: one appended row shifts one pid's count
    extra = spark.createDataFrame(
        [(999, base + dt.timedelta(minutes=100),
          base + dt.timedelta(minutes=101))],
        "event_id long, start_ts timestamp, end_ts timestamp",
    )
    import pytest as _pytest

    with _pytest.raises(PythonException, match="overlap state is stale"):
        IV.overlap_flags_global(
            df.unionByName(extra), "start_ts", "end_ts",
            tiebreak_cols=["event_id"], state=state,
        ).count()
    # unchanged input still passes through the guard
    n = IV.overlap_flags_global(
        df, "start_ts", "end_ts", tiebreak_cols=["event_id"], state=state
    ).count()
    assert n == 300


def test_q_period_overlap_global_caches_state(spark, monkeypatch):
    """The registered query memoizes the plan state per sf_dir: the second
    invocation runs ONLY the flag pass (compute_overlap_state poisoned)."""
    from data_quality_spark import queries_ops as QO
    from data_quality_spark.ops import intervals as IV

    sf_dir = "/root/testdata/sf0.001"
    QO._OVERLAP_STATE_CACHE.pop(sf_dir, None)
    first = QO.q_period_overlap_global(spark, sf_dir).count()

    def _boom(*a, **k):
        raise AssertionError("state must be cached after the first call")

    monkeypatch.setattr(IV, "compute_overlap_state", _boom)
    second = QO.q_period_overlap_global(spark, sf_dir).count()
    assert first == second


def test_remove_repeated_lines(spark):
    rows = [
        (1, "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter"),
        (2, "only\nunique\nlines"),
        (3, ""),
        (4, None),
        # paragraph breaks (blank lines) are STRUCTURE, not content: every
        # one survives — a plain distinct would merge para2/para3
        (5, "para1\n\npara2\n\npara3"),
        (6, "a\n\na\n\nb"),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {r["i"]: r["d"] for r in df.select(
        "i", T.remove_repeated_lines(F.col("t")).alias("d")).collect()}
    assert got[1] == "nav\nbody one\nbody two\nfooter"
    assert got[2] == "only\nunique\nlines"
    assert got[3] == ""
    assert got[4] is None
    assert got[5] == "para1\n\npara2\n\npara3"
    assert got[6] == "a\n\n\nb"  # repeated 'a' dropped, both breaks kept


def test_canonicalize_url(spark):
    cases = {
        "https://h.example/p?utm_source=a&x=1#frag": "https://h.example/p?x=1",
        "https://h.example/p?utm_a=1&utm_b=2": "https://h.example/p",
        "http://h.example:80/p": "http://h.example/p",
        "https://h.example:443/": "https://h.example/",
        "http://h.example:8080/p": "http://h.example:8080/p",  # non-default kept
        "https://h.example/p?gclid=z&keep=2": "https://h.example/p?keep=2",
        "https://h.example/p?fbclid=q": "https://h.example/p",
        "https://h.example/plain": "https://h.example/plain",
        # utm value empty; surviving param promoted to '?'
        "https://h.example/p?utm_x=&a=1": "https://h.example/p?a=1",
    }
    df = spark.createDataFrame([(i, u) for i, u in enumerate(cases)],
                               "i int, u string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", T.canonicalize_url(F.col("u")).alias("c")).collect()}
    for i, (raw, exp) in enumerate(cases.items()):
        assert got[i] == exp, (raw, got[i], exp)


def test_remove_boilerplate_both_strategies(spark):
    # BANNER appears in 4 docs (>= min_docs=3), SEMI in 2 (< 3, kept);
    # doc 4 is ALL boilerplate -> ''; doc 5 NULL -> NULL; blank lines kept
    # (min_line_chars=1 means '' is never boilerplate even though shared).
    rows = [
        (1, "alpha\nBANNER\n\nbody one"),
        (2, "BANNER\nbody two\nSEMI"),
        (3, "body three\n\nBANNER\nSEMI"),
        (4, "BANNER"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    bl = {r["line"]: r["n_docs"]
          for r in T.boilerplate_lines(df, "t", 3).collect()}
    assert bl == {"BANNER": 4}
    expected = {
        1: "alpha\n\nbody one",
        2: "body two\nSEMI",
        3: "body three\n\nSEMI",
        4: "",
        5: None,
    }
    for strategy in ("broadcast", "join"):
        got = {r["i"]: r["text_clean"] for r in T.remove_boilerplate(
            df, "i", "t", 3, strategy=strategy).collect()}
        assert got == expected, strategy


def test_remove_boilerplate_broadcast_cap(spark):
    # every line is shared by both docs -> 2 boilerplate lines > cap of 1
    df = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\ny")], "i int, t string")
    with pytest.raises(ValueError, match="max_broadcast"):
        T.remove_boilerplate(df, "i", "t", 2, max_broadcast=1)


def test_dup_span_stats(spark):
    """Exact-substring dedup signal: full copies -> dup_frac 1.0, partial
    overlap -> the exact shared-window fraction, unique docs -> 0.0,
    NULL/short docs -> no row."""
    out = {r["doc_id"]: r for r in
           D.dup_span_stats(_docs(spark), "doc_id", "text").collect()}
    # docs 1/2 are byte-identical (10 tokens, 3 8-token windows): all dup
    assert out[1]["n_windows"] == 3 and out[1]["dup_frac"] == 1.0
    assert out[2]["dup_frac"] == 1.0
    # doc 3 shares its 10-token prefix with 1/2; its 4th window covers the
    # appended token -> 3 of 4 windows duplicated
    assert out[3]["n_windows"] == 4 and out[3]["n_dup"] == 3
    assert out[3]["dup_frac"] == 0.75
    # doc 4 is unique (exactly w tokens -> 1 window)
    assert out[4]["n_windows"] == 1 and out[4]["dup_frac"] == 0.0
    # NULL text yields no row
    assert 5 not in out


def test_dup_span_stats_stride(spark):
    """stride>1 samples every k-th window start; a full copy is still
    caught at dup_frac 1.0 with fewer windows."""
    out = {r["doc_id"]: r for r in
           D.dup_span_stats(_docs(spark), "doc_id", "text", stride=2).collect()}
    # doc 1: starts 1,3 of [1..3] -> 2 windows, both duplicated
    assert out[1]["n_windows"] == 2 and out[1]["dup_frac"] == 1.0


def test_dedup_incremental(spark):
    seen = D.seen_hash_index(
        spark.createDataFrame([(1, "dup-old"), (2, None)], "i int, t string"),
        "t",
    )
    new = spark.createDataFrame(
        [(10, "dup-old"), (11, "x"), (12, "x"), (13, "y"), (14, None)],
        "i int, t string",
    )
    got = sorted(r["i"] for r in D.dedup_incremental(new, seen, "i", "t").collect())
    # 10 drops vs the index, 12 drops in-batch (11 is min id), null passes
    assert got == [11, 13, 14]


def _py_bloom_positions(text: str, m: int, k: int) -> list[int]:
    md5 = hashlib.md5(text.encode()).hexdigest()
    return [py_hash64(md5, f"#bloom{i // 2}", 1 + 15 * (i % 2)) % m for i in range(k)]


def test_bloom_build_matches_python(spark):
    texts = [f"doc number {i}" for i in range(30)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    m, k = 256, D.BLOOM_K
    got = {r["word_idx"]: r["bits"] for r in D.bloom_build(df, "t", m=m).collect()}
    exp = {}
    for t in texts:
        for p in _py_bloom_positions(t, m, k):
            exp[p >> 6] = exp.get(p >> 6, 0) | (1 << (p & 63))
    # signed-vs-unsigned: Spark stores the bit pattern in a signed bigint
    assert {w: b & 0xFFFFFFFFFFFFFFFF for w, b in got.items()} == exp


def test_bloom_incremental_with_false_positives(spark):
    # m=64 forces real false positives: the py twin decides which new texts
    # FP-collide, and the operator must make the SAME (deterministic) calls
    m, k = 64, D.BLOOM_K
    seen_texts = [f"seen {i}" for i in range(12)]
    set_pos = {p for t in seen_texts for p in _py_bloom_positions(t, m, k)}
    # deterministically pick probes so >=1 genuinely-new text FP-collides
    # and >=1 does not (the twin decides which; no luck involved)
    cands = [f"new {i}" for i in range(500)]
    fp = next(t for t in cands
              if all(p in set_pos for p in _py_bloom_positions(t, m, k)))
    clean = [t for t in cands
             if not all(p in set_pos for p in _py_bloom_positions(t, m, k))][:5]
    new_rows = [(i, t) for i, t in enumerate([fp] + clean)] + [
        (10, "seen 3"),      # true positive: re-crawl of a seen doc
        (11, clean[0]),      # in-batch exact dup of id 1
        (12, None),          # null text passes through
    ]
    seen = spark.createDataFrame([(t,) for t in seen_texts], "t string")
    new = spark.createDataFrame(new_rows, "i int, t string")
    bloom = D.bloom_build(seen, "t", m=m)

    flagged = {r["i"]: r["maybe_seen"]
               for r in D.bloom_maybe_seen(new, bloom, "t", m=m).collect()}
    exp_flag = {i: (t is not None
                    and all(p in set_pos for p in _py_bloom_positions(t, m, k)))
                for i, t in new_rows}
    assert flagged == exp_flag
    assert exp_flag[10] is True          # true positive always flagged
    assert exp_flag[0] is True           # the chosen FP text is flagged
    assert not all(exp_flag[i] for i in range(1, 6))

    kept = sorted(r["i"] for r in D.dedup_bloom_incremental(
        new, bloom, "i", "t", m=m).collect())
    exp_seen_hashes = set()
    exp_kept = []
    for i, t in sorted(new_rows):
        if t is None:
            exp_kept.append(i)
        elif not exp_flag[i] and t not in exp_seen_hashes:
            exp_seen_hashes.add(t)
            exp_kept.append(i)
    assert kept == sorted(exp_kept)


def test_bloom_merge(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(10)], "t string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(10)], "t string")
    m = 256
    merged = D.bloom_merge(D.bloom_build(a, "t", m=m), D.bloom_build(b, "t", m=m))
    both = D.bloom_build(a.unionByName(b), "t", m=m)
    assert (
        sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))
    )


def _py_para_clean(text, set_pos, m, k, min_chars=1):
    if text is None:
        return None
    kept = []
    for p in text.split("\n"):
        if len(p) < min_chars:
            kept.append(p)
        elif not all(q in set_pos for q in _py_bloom_positions(p, m, k)):
            kept.append(p)
    return "\n".join(kept)


def _py_para_positions(text, m, k, min_chars=1):
    for p in text.split("\n"):
        if len(p) >= min_chars:
            yield from _py_bloom_positions(p, m, k)


def test_bloom_para_build_matches_python(spark):
    texts = ["alpha\nbeta\n\ngamma", "beta\ndelta", "\n\n"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    m, k = 512, D.BLOOM_K
    got = {r["word_idx"]: r["bits"] & 0xFFFFFFFFFFFFFFFF
           for r in D.bloom_para_build(df, "t", m=m).collect()}
    exp = {}
    for t in texts:
        for p in _py_para_positions(t, m, k):
            exp[p >> 6] = exp.get(p >> 6, 0) | (1 << (p & 63))
    assert got == exp


def test_remove_seen_paragraphs(spark):
    m, k = 2048, D.BLOOM_K
    seen_texts = ["nav bar\ncookie notice", "footer (c) corp\nxy"]
    set_pos = {p for t in seen_texts for p in _py_para_positions(t, m, k)}
    new_rows = [
        (0, "fresh para one\nnav bar\nfresh para two"),   # middle drops
        (1, "cookie notice\nfooter (c) corp"),             # fully dropped
        (2, "nav bar\n\nstill here"),                      # blank survives
        (3, None),                                         # null passthrough
        (4, ""),                                           # empty stays ''
        (5, "xy\nabove is short-but-seen"),                # min_chars guard
    ]
    df = spark.createDataFrame(new_rows, "i int, t string")
    bloom = D.bloom_para_build(
        spark.createDataFrame([(t,) for t in seen_texts], "t string"), "t", m=m
    )
    got = {r["i"]: r["text_clean"]
           for r in D.remove_seen_paragraphs(df, bloom, "t", m=m).collect()}
    exp = {i: _py_para_clean(t, set_pos, m, k) for i, t in new_rows}
    assert got == exp
    assert got[0] == "fresh para one\nfresh para two"
    assert got[1] == ""
    assert got[2] == "\nstill here"
    assert got[3] is None and got[4] == ""
    # 'xy' IS in the seen filter but survives under min_chars=3
    got3 = {r["i"]: r["text_clean"]
            for r in D.remove_seen_paragraphs(
                df, bloom, "t", m=m, min_chars=3).collect()}
    assert got3[5].startswith("xy\n")


def test_tokenizer_ascii_whitespace_contract(spark):
    """The \\s+ tokenize contract is ASCII on EVERY engine: python's twin
    must not split on unicode whitespace (NBSP etc.) that Java regex /
    DuckDB RE2 treat as a plain character."""
    from data_quality_spark.functions.textstats import col_tokens, py_tokens

    texts = ["foo\xa0bar baz", "a b c", "　ideographic d"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["toks"] for r in
           df.select(col_tokens(F.col("t")).alias("toks")).collect()]
    assert got == [py_tokens(t) for t in texts]
    assert py_tokens("foo\xa0bar baz") == ["foo\xa0bar", "baz"]


def test_classifier_inrow_matches_corpus_stage(spark):
    """classifier_score_inrow must equal classifier_score BIT FOR BIT on
    every shared column, emit n_toks=0/NULL-score rows for empty docs, and
    keep a shuffle-free (map-only) plan."""
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "junk junk spam words"),
        (3, None),
        (4, ""),
        (5, "   \t  "),
        (6, "alpha spam beta junk mixed"),
        (7, "beta"),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    w = T.train_nb_classifier(df, "i", "t", F.col("i") % 2 == 1)
    cols = ["i", "n_toks", "clf_logit", "clf_score", "clf_keep"]
    a = sorted(map(tuple, T.classifier_score(df, "i", "t", w).select(cols).collect()))
    inrow = T.classifier_score_inrow(df, "t", w)
    b = sorted(map(tuple,
                   inrow.where(F.col("n_toks") > 0).select(cols).collect()))
    assert a == b
    empties = {r["i"]: (r["n_toks"], r["clf_logit"], r["clf_score"], r["clf_keep"])
               for r in inrow.where(F.col("n_toks") == 0).collect()}
    assert empties == {3: (0, None, None, None), 4: (0, None, None, None),
                       5: (0, None, None, None)}
    plan = inrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring itself is map-only


def test_top_fraction(spark):
    rows = [(i, "a", float(i)) for i in range(1, 11)] + [(99, "b", 1.0)]
    df = spark.createDataFrame(rows, "i int, g string, s double")
    # grouped: top 30% of 10 rows -> percent_rank (r-1)/9 <= 0.3 -> ranks 1..3
    got = sorted(r["i"] for r in
                 T.top_fraction(df, "s", 0.3, "i", group_col="g").collect())
    # group a: scores 10,9,8 kept; group b: single row pr=0 always kept
    assert got == [8, 9, 10, 99]
    # global (no group): one total order over all 11 rows
    got = sorted(r["i"] for r in T.top_fraction(df, "s", 0.2, "i").collect())
    assert got == [8, 9, 10]
    # ascending: keep the LOWEST scores
    got = sorted(r["i"] for r in T.top_fraction(
        df.where("g = 'a'"), "s", 0.3, "i", group_col="g",
        descending=False).collect())
    assert got == [1, 2, 3]


def test_pack_shards(spark):
    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "i int, n int")
    out = T.pack_shards(df, "i", "n", 250, n_buckets=1, salt="t").collect()
    order = sorted(range(10), key=lambda i: (py_hash64(str(i), "#t"), i))
    exp, run = {}, 0
    for i in order:
        exp[i] = run // 250
        run += 100
    assert {r["i"]: r["shard_seq"] for r in out} == exp
    assert all(r["shard_bucket"] == 0 for r in out)
    out2 = T.pack_shards(df, "i", "n", 250, n_buckets=4, salt="t").collect()
    assert all(
        r["shard_bucket"] == py_hash64(str(r["i"]), "#t") % 4 for r in out2
    )


def test_drop_near_dups_cluster_pointer_jumping(spark):
    # 64-node chain 0-1-2-...-63: plain neighbor-min needs ~63 hops; the
    # pointer-jumped propagation must collapse it within ~log2(64)+margin
    # rounds — max_iter=8 would leave stragglers without the jump.
    n = 64
    df = spark.createDataFrame([(i, f"t{i}") for i in range(n)],
                               "doc_id long, text string")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    kept = D.drop_near_dups(df, "doc_id", pairs, policy="cluster",
                            max_iter=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0]


def test_semantic_dedup_pairs_cell_bounded(spark):
    import math

    def vec(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # trained quantizer: two cells at 0° and 20° (decision boundary 10°)
    cents = [vec(0.0), vec(20.0)]
    df = spark.createDataFrame(
        [(1, vec(1.0)), (2, vec(2.0)), (3, vec(9.5)), (4, vec(10.5)),
         (5, vec(19.0))],
        "vec_id int, v array<double>",
    )
    out = S.semantic_dedup_pairs(df, "vec_id", "v", cents, 0.995).collect()
    # (1,2): same cell, cos(1°)≈0.99985 — reported.
    # (3,4): cos(1°) too, but straddles the cell boundary → cross-cell,
    # never compared (the SemDeDup recall trade).
    # (4,5): same cell 1, cos(8.5°)≈0.989 < 0.995 — below threshold.
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    survivors = S.semantic_dedup_drop(df, "vec_id", "v", cents, 0.995)
    assert sorted(r["vec_id"] for r in survivors.collect()) == [1, 3, 4, 5]


def test_dsir_weights_shift_toward_target(spark):
    df = spark.createDataFrame(
        [(1, "alpha alpha beta", True), (2, "alpha beta", True),
         (3, "gamma delta gamma", False), (4, "alpha gamma", False),
         (5, None, False)],
        "doc_id int, text string, tgt boolean",
    )
    out = {r["doc_id"]: r for r in
           T.dsir_weights(df, "doc_id", "text", F.col("tgt")).collect()}
    assert 5 not in out                       # NULL text → no row
    assert out[1]["n_toks"] == 3
    # docs made of target-corpus tokens outscore off-target docs
    assert out[1]["dsir_logw"] > out[3]["dsir_logw"]
    assert out[2]["dsir_logw"] > out[3]["dsir_logw"]
    # mixed doc sits between
    assert out[3]["dsir_logw"] < out[4]["dsir_logw"] < out[1]["dsir_logw"]


def test_cosine_pairs_udf_matches_native(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, i % 3, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ] + [(100, 0, None)]
    df = spark.createDataFrame(rows, "vec_id int, blk int, v array<double>")
    a = S.cosine_pairs(df, "vec_id", "v", ["blk"], -1.0, strategy="udf")
    b = S.cosine_pairs(df, "vec_id", "v", ["blk"], -1.0, strategy="native")
    ra = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in a.collect()}
    rb = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in b.collect()}
    assert ra == rb and len(ra) > 100


def test_url_blocklist_filter_literal_and_df(spark):
    rows = [
        (1, "https://spam.bad.example/p/1"),
        (2, "http://bad.example/p/2"),
        (3, "https://ok.example/p/3"),
        (4, "https://ads.example:8080/t?x=4"),
        (5, "https://user:pw@sub.ok.example/p/5"),
        (6, "https://notbad.example/p/6"),   # 'notbad.example' != 'bad.example'
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    kept = T.url_blocklist_filter(df, "url", ["bad.example", "ads.example"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 5, 6]
    hosts = {r["doc_id"]: r["host"] for r in kept.collect()}
    assert hosts[5] == "sub.ok.example"      # credentials stripped
    # DataFrame blocklist path (anti-join) agrees
    bl = spark.createDataFrame([("bad.example",), ("ads.example",)],
                               "host string")
    kept2 = T.url_blocklist_filter(df, "url", bl)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [3, 5, 6]
    # exact-host mode: subdomain of a blocked host survives
    kept3 = T.url_blocklist_filter(df, "url", ["bad.example"],
                                   include_subdomains=False)
    assert 1 in {r["doc_id"] for r in kept3.collect()}


def test_url_spam_score(spark):
    df = spark.createDataFrame(
        [(1, "https://ok.example/articles/7"),
         (2, "https://CASINO-party.example/win"),    # case-folded match
         (3, "https://ads.example/track?track=1"),   # ads.(30) + 2x track(20)
         (4, "https://porn.example/xxx/xxx")],       # 100 + 2x80
        "doc_id int, url string",
    )
    out = {r["doc_id"]: r for r in T.url_spam_score(df, "url").collect()}
    assert out[1]["spam_score"] == 0.0 and out[1]["url_keep"]
    assert out[2]["spam_score"] == 1.0 and not out[2]["url_keep"]
    assert out[3]["spam_score"] == 0.7 and out[3]["url_keep"]
    assert out[4]["spam_score"] == 2.6 and not out[4]["url_keep"]
    # custom fragment weights override the default list
    custom = {r["doc_id"]: r for r in T.url_spam_score(
        df, "url", fragments={"articles": 150}).collect()}
    assert custom[1]["spam_score"] == 1.5 and not custom[1]["url_keep"]
    assert custom[4]["spam_score"] == 0.0 and custom[4]["url_keep"]


def test_fertility_stats(spark):
    df = spark.createDataFrame(
        [(1, "en", "hello world"),            # 2 ws toks, 2 bpe toks
         (2, "en", "it's fine"),              # 2 ws toks, 4 bpe (it ' s fine)
         (3, "el", "αβ γ"),    # greek: 2-byte chars
         (4, "el", None)],                    # NULL text excluded
        "doc_id int, lang string, text string",
    )
    out = {r["grp"]: r for r in T.fertility_stats(df, "lang", "text").collect()}
    en, el = out["en"], out["el"]
    assert en["n_docs"] == 2 and en["ws_tokens"] == 4 and en["bpe_tokens"] == 6
    assert en["toks_per_doc"] == 2.0 and en["fertility"] == 1.5
    # "hello world" + "it's fine" = 20 chars / 6 bpe toks
    assert en["chars_per_tok"] == 20 / 6
    # greek letters are non-ASCII -> bpe splits per char (punct class);
    # 4 chars, 3 bpe toks ("αβ" -> α, β as symbol chars; "γ")
    assert el["n_docs"] == 1 and el["ws_tokens"] == 2
    # multi-byte script signal: bytes/token strictly above chars/token
    assert el["bytes_per_tok"] > el["chars_per_tok"]


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "write a@b.example and c@d.example or +39 123 456 789"),
         (2, "clean text"), (3, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in T.pii_counts(df, "doc_id", "text").collect()}
    assert 3 not in out
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 1
    assert out[1]["n_pii_total"] == 3
    assert out[2]["n_pii_total"] == 0


def test_nb_classifier_separates_and_filters(spark):
    df = spark.createDataFrame(
        [(1, "good clean prose here", True),
         (2, "good clean words again", True),
         (3, "spam junk noise blob", False),
         (4, "junk noise spam spam", False),
         (5, "good clean junk noise", True),
         (6, None, False)],
        "doc_id int, text string, hi boolean",
    )
    w = T.train_nb_classifier(df, "doc_id", "text", F.col("hi"))
    wrows = w.collect()
    # complete bucket spine + one bias row
    assert len(wrows) == T.CLF_BUCKETS + 1
    assert sum(1 for r in wrows if r["b"] == T.CLF_BIAS_BUCKET) == 1
    out = {r["doc_id"]: r for r in
           T.classifier_score(df, "doc_id", "text", w).collect()}
    assert 6 not in out                        # NULL text → no row
    assert out[1]["n_toks"] == 4
    # positive-class vocabulary outscores negative-class vocabulary
    assert out[1]["clf_score"] > out[3]["clf_score"]
    assert out[2]["clf_score"] > out[4]["clf_score"]
    # mixed doc sits between the pure ones
    assert out[3]["clf_score"] < out[5]["clf_score"] < out[1]["clf_score"]
    # keep decision is the thresholded score
    for r in out.values():
        assert r["clf_keep"] == (r["clf_score"] >= T.CLF_THRESHOLD)
    # scoring with a persisted-model round-trip is identical (model artifact
    # contract: weights table is the whole model)
    out2 = {r["doc_id"]: r["clf_score"] for r in
            T.classifier_score(df, "doc_id", "text", w).collect()}
    assert out2 == {k: v["clf_score"] for k, v in out.items()}


def test_decontaminate_drops_overlapping_docs(spark):
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id int, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox leaps high"),   # shares 2 shingles
         (2, "quick brown fox somewhere"),        # shares 1 shingle
         (3, "totally unrelated text body here"),
         (4, "to qu br"),                         # no shared shingles
         (5, None)],
        "doc_id int, text string",
    )
    kept1 = {r["doc_id"] for r in
             T.decontaminate(corpus, probe, "doc_id", "text").collect()}
    assert kept1 == {3, 4, 5}                 # any overlap drops (min_hits=1)
    kept2 = {r["doc_id"] for r in
             T.decontaminate(corpus, probe, "doc_id", "text",
                             min_hits=2).collect()}
    assert kept2 == {2, 3, 4, 5}              # only the 2-shingle doc drops


def test_dedup_minhash_incremental(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    seen = spark.createDataFrame(
        [(1, base), (2, "completely different historical content here "
                        "about cooking pasta with fresh tomatoes")],
        "doc_id int, text string",
    )
    index = D.minhash_signature_index(seen, "doc_id", "text")
    new = spark.createDataFrame(
        [(10, base + " zz"),                     # near-dup of seen doc 1
         (11, "fresh unrelated news article about yesterday's local "
              "football match results and the crowd reaction"),
         (12, "fresh unrelated news article about yesterday's local "
              "football match results and the crowd reactions zz"),  # in-batch near-dup of 11
         (13, "tiny")],                          # no shingles -> kept
        "doc_id int, text string",
    )
    matches = D.minhash_incremental_matches(new, index, "doc_id", "text")
    assert {(r["new_id"], r["seen_id"]) for r in matches.collect()} == {(10, 1)}
    kept = {r["doc_id"] for r in
            D.dedup_minhash_incremental(new, index, "doc_id", "text").collect()}
    assert kept == {11, 13}                      # 10 drops vs index, 12 in-batch


def test_mix_rates_and_resample(spark):
    # 'a' holds 80% of tokens but targets 50% -> downsamples; 'b' is the
    # most under-represented -> keeps everything (rate 1); 'c' is absent
    # from the targets -> dropped entirely.
    rows = [(i, "a", "tok " * 8) for i in range(40)]
    rows += [(100 + i, "b", "tok " * 2) for i in range(40)]
    rows += [(200 + i, "c", "tok " * 2) for i in range(10)]
    rows += [(300, "b", None)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, text string")
    rates = {r["grp"]: r for r in
             T.mix_rates(df, "grp", "text", {"a": 0.5, "b": 0.5}).collect()}
    assert rates["b"]["rate"] == 1.0
    assert rates["c"]["rate"] == 0.0
    # a: cur share 320/480 toks vs b 80/480 (c excluded from targets but
    # counted in shares); ratio_a = .5/(2/3), ratio_b = .5/(1/6) -> rate_a
    # = ratio_a/ratio_b = 0.25
    assert abs(rates["a"]["rate"] - 0.25) < 1e-6
    kept = T.resample_to_mix(df, "doc_id", "grp", "text", {"a": 0.5, "b": 0.5})
    by_grp = {r["grp"]: r["cnt"] for r in
              kept.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert "c" not in by_grp
    assert by_grp["b"] == 41          # rate 1 keeps all rows incl. NULL text
    assert 0 < by_grp.get("a", 0) < 40  # hash-threshold downsample


def test_remove_dup_spans(spark):
    banner = "Buy now. Limited offer. Act fast."
    df = spark.createDataFrame(
        [(1, f"Unique intro one. {banner} Unique tail one."),
         (2, f"Different story here. {banner} Another ending."),
         (3, "Totally clean document. Nothing repeats here. At all."),
         (4, banner),          # exactly the banner -> fully removed
         (5, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           D.remove_dup_spans(df, "doc_id", "text").collect()}
    # first occurrence (doc 1) keeps the banner; later ones lose it
    assert banner in out[1]["text_dedup"] and out[1]["n_removed"] == 0
    assert banner not in out[2]["text_dedup"]
    assert out[2]["n_removed"] == 3
    assert out[2]["text_dedup"] == "Different story here. Another ending."
    # untouched docs pass through byte-identical
    assert out[3]["text_dedup"] == "Totally clean document. Nothing repeats here. At all."
    assert out[3]["n_removed"] == 0
    # a doc that IS the duplicated span empties out
    assert out[4]["text_dedup"] == "" and out[4]["n_removed"] == 3
    assert out[5]["text_dedup"] is None and out[5]["n_removed"] == 0


def test_remove_dup_spans_paragraph_grain(spark):
    """unit='paragraph', n=1 (Dolma-style): a paragraph duplicated across
    docs survives only at its first (id, start) occurrence; short/blank
    paragraphs are protected by min_chars; rebuild joins with newlines."""
    spam = "Subscribe now for the best unbeatable offers"
    df = spark.createDataFrame(
        [(1, f"First doc intro paragraph.\n{spam}\nFirst doc closing words."),
         (2, f"Second doc other content.\n\nok\n{spam}"),
         (3, f"{spam}\n{spam}"),  # in-doc repeat: only the cross-ref keeper row survives corpus-wide
         (4, "Clean document.\n\nok\nNothing here repeats at length."),
         (5, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           D.remove_dup_spans(df, "doc_id", "text", n=1, unit="paragraph",
                              min_chars=10).collect()}
    # keeper = min (id, start): doc 1 keeps the spam paragraph
    assert out[1]["text_dedup"] == (
        f"First doc intro paragraph.\n{spam}\nFirst doc closing words."
    )
    assert out[1]["n_removed"] == 0
    # doc 2 loses it but KEEPS the blank line and the short 'ok' paragraph
    assert out[2]["text_dedup"] == "Second doc other content.\n\nok"
    assert out[2]["n_removed"] == 1
    # both of doc 3's copies are non-keepers → doc empties
    assert out[3]["text_dedup"] == "" and out[3]["n_removed"] == 2
    # 'ok' repeats across docs 2 and 4 but is under min_chars → untouched
    assert out[4]["text_dedup"] == (
        "Clean document.\n\nok\nNothing here repeats at length."
    )
    assert out[4]["n_removed"] == 0
    assert out[5]["text_dedup"] is None and out[5]["n_removed"] == 0


def test_remove_dup_token_spans(spark):
    # 8-token copied passage with NO terminal punctuation — invisible to the
    # sentence-grain op, the exact case the token-grain variant exists for
    passage = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"intro {passage} tail1"),
         (2, f"other start {passage} other end"),
         (3, "clean document with nothing repeated anywhere at all ok"),
         (4, passage),            # exactly the passage -> fully removed
         (5, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           D.remove_dup_token_spans(df, "doc_id", "text").collect()}
    # first occurrence (doc 1) keeps the passage byte-identical
    assert out[1]["text_dedup"] == f"intro {passage} tail1"
    assert out[1]["n_removed"] == 0
    # later occurrences lose exactly the 8 passage tokens
    assert out[2]["text_dedup"] == "other start other end"
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["text_dedup"] == "" and out[4]["n_removed"] == 8
    assert out[5]["text_dedup"] is None and out[5]["n_removed"] == 0


def test_remove_dup_token_spans_overlap_merges(spark):
    # a 10-token copied run = three overlapping 8-token dup windows in the
    # copy; the union must excise ONE contiguous 10-token hole, not 24
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    df = spark.createDataFrame(
        [(1, f"keep this {run}"),
         (2, f"{run} trailing words here")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           D.remove_dup_token_spans(df, "doc_id", "text").collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["text_dedup"] == "trailing words here"
    assert out[2]["n_removed"] == 10


def test_resample_to_mix_balance_upsamples(spark):
    rows = [(i, "big", "tok " * 8) for i in range(40)]
    rows += [(100 + i, "small", "tok " * 2) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, text string")
    # big: 320/340 tokens (~94%), target 50% -> rate ~0.53 (downsample);
    # small: 20/340 (~6%), target 50% -> rate ~8.5 (upsample)
    rates = {r["grp"]: r["rate"] for r in
             T.mix_rates(df, "grp", "text", {"big": 0.5, "small": 0.5},
                         mode="balance").collect()}
    assert rates["big"] < 1.0 < rates["small"] <= T.MIX_MAX_UPSAMPLE
    out = T.resample_to_mix(df, "doc_id", "grp", "text",
                            {"big": 0.5, "small": 0.5}, mode="balance")
    pdf = out.groupBy("grp").agg(
        F.count("*").alias("n"), F.max("copy").alias("mx")).collect()
    by = {r["grp"]: r for r in pdf}
    assert by["small"]["n"] > 10            # repeated
    assert by["small"]["mx"] >= 8           # epoch factor floor(8.5)
    assert by["big"]["mx"] == 1             # downsampled side never repeats
    assert by["big"]["n"] < 40
    # determinism: same call -> identical multiset
    out2 = T.resample_to_mix(df, "doc_id", "grp", "text",
                             {"big": 0.5, "small": 0.5}, mode="balance")
    a = sorted((r["doc_id"], r["copy"]) for r in out.collect())
    b = sorted((r["doc_id"], r["copy"]) for r in out2.collect())
    assert a == b


def test_corpus_datasheet_and_token_histogram(spark):
    df = spark.createDataFrame(
        [(1, "one two three four", "en"),
         (2, "a b", "en"),
         (3, "", "fr"),
         (4, None, "fr"),
         (5, "x " * 9, "de")],     # 9 tokens -> bucket 8
        "doc_id int, text string, lang string",
    )
    d = T.corpus_datasheet(df, "text", "lang").collect()[0]
    assert d["n_docs"] == 5 and d["n_null_text"] == 1 and d["n_empty_text"] == 1
    assert d["n_groups"] == 3
    assert d["n_toks_total"] == 4 + 2 + 0 + 9
    assert d["p50_toks"] == 3.0    # sorted [0, 2, 4, 9] -> interpolated
    h = {r["bucket_lo"]: (r["n_docs"], r["n_toks"]) for r in
         T.token_histogram(df, "text").collect()}
    assert h[0] == (1, 0)          # empty string doc
    assert h[2] == (1, 2)
    assert h[4] == (1, 4)
    assert h[8] == (1, 9)
    assert None not in h           # NULL text excluded


def test_remove_dup_spans_string_and_hash_ids(spark):
    # regression: the old id*1e6+start combined key NULLed out on string
    # ids (ANSI-off cast) making the op a silent no-op, and wrapped on
    # 60-bit hash ids breaking first-occurrence keeper selection
    banner = "Buy now. Limited offer. Act fast."
    df = spark.createDataFrame(
        [("url-b", f"Alpha beta gamma. {banner}"),
         ("url-a", f"Delta epsilon zeta. {banner}")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in
           D.remove_dup_spans(df, "doc_id", "text").collect()}
    assert out["url-a"]["n_removed"] == 0        # lexicographic first kept
    assert out["url-b"]["n_removed"] == 3
    big = spark.createDataFrame(
        [((1 << 60) - 1, f"One two three. {banner}"),
         (2, f"Four five six. {banner}")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r for r in
            D.remove_dup_spans(big, "doc_id", "text").collect()}
    assert out2[2]["n_removed"] == 0             # min id is the keeper
    assert out2[(1 << 60) - 1]["n_removed"] == 3


def test_crawl_diff(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None), (6, None)],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None), (6, "now set")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["status"] for r in
           T.crawl_diff(old, new, "doc_id", "text").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged", 6: "changed"}


def test_new_ops_identity_edges(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine"),
         (3, None)],
        "doc_id int, text string",
    )
    # diff of a snapshot with itself: everything unchanged
    st = {r["status"] for r in
          T.crawl_diff(docs, docs, "doc_id", "text").collect()}
    assert st == {"unchanged"}
    # decontaminating against an empty probe set keeps everything
    empty = spark.createDataFrame([], "doc_id int, text string")
    kept = T.decontaminate(docs, empty, "doc_id", "text")
    assert kept.count() == 3
    # cross-batch near-dedup vs an EMPTY index: no matches, and the drop
    # wrapper reduces to plain in-batch near-dedup (all distinct here)
    idx = D.minhash_signature_index(empty, "doc_id", "text")
    assert D.minhash_incremental_matches(docs, idx, "doc_id", "text").count() == 0
    assert D.dedup_minhash_incremental(docs, idx, "doc_id", "text").count() == 3
    # span removal on a corpus with no repeated spans is a byte-level no-op
    out = {r["doc_id"]: r for r in
           D.remove_dup_spans(docs, "doc_id", "text").collect()}
    for r in docs.collect():
        assert out[r["doc_id"]]["text_dedup"] == r["text"]
        assert out[r["doc_id"]]["n_removed"] == 0


def test_read_warc_to_pipeline(spark, tmp_path):
    from data_quality_spark.sources import warc as W

    body_a = b"<html><main><p>" + b"Hello common crawl world today. " * 5 + b"</p></main></html>"
    body_b = b"<html><main><p>Zweiter Text hier drin.</p></main></html>"
    W.write_warc(str(tmp_path / "seg1.warc"),
                 [("https://a.example/x", "2024-01-02T03:04:05Z", body_a)])
    W.write_warc(str(tmp_path / "seg2.warc.gz"),
                 [("https://b.example/y", "2024-02-03T04:05:06Z", body_b)],
                 gzip=True)
    df = W.read_warc(spark, str(tmp_path) + "/*")
    rows = {r["url"]: r for r in df.collect()}
    # byte fidelity incl. through the per-record gzip framing
    assert bytes(rows["https://a.example/x"]["html"]) == body_a
    assert bytes(rows["https://b.example/y"]["html"]) == body_b
    assert str(rows["https://a.example/x"]["warc_ts"]).startswith("2024-01-02 03:04:05")
    assert rows["https://a.example/x"]["text"] is None
    # schema matches the pipeline input contract end-to-end
    from data_quality_spark.pipeline.quality_filter import annotate_pages

    ann = {r["url"]: r for r in
           annotate_pages(df).select("url", "text_extracted").collect()}
    assert ann["https://b.example/y"]["text_extracted"] == "Zweiter Text hier drin."
    # non-response records are skipped
    raw = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://c.example/\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    assert W.parse_warc_bytes(raw) == []


def test_pr_curve_semantics(spark):
    """PR curve: threshold 0 catches everything (recall 1, precision =
    base rate), counts are monotone non-increasing in the threshold, NULL
    scores never predict, and F1 matches 2TP/(pred+pos)."""
    from data_quality_spark.ops import textops as T

    df = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.8, False), (3, 0.4, True), (4, 0.1, False),
         (5, None, True)],
        "id bigint, score double, label boolean",
    )
    rows = {r["threshold"]: r for r in
            T.pr_curve(df, F.col("label"), F.col("score"),
                       n_thresholds=11).collect()}
    assert len(rows) == 11
    r0 = rows[0.0]
    assert r0["n_pred"] == 4          # NULL score predicts at no threshold
    assert r0["n_tp"] == 2 and r0["n_pos"] == 3
    assert r0["recall"] == round(2 / 3, 6)
    preds = [rows[i / 10]["n_pred"] for i in range(11)]
    assert preds == sorted(preds, reverse=True)
    r05 = rows[0.5]
    assert (r05["n_pred"], r05["n_tp"]) == (2, 1)
    assert r05["precision"] == 0.5 and r05["f1"] == 0.4  # 2*1/(2+3)

    # empty input → empty curve (SQL-twin parity: no groups from the join)
    assert T.pr_curve(df.where("id < 0"), F.col("label"), F.col("score"),
                      n_thresholds=11).count() == 0
    import pytest

    with pytest.raises(ValueError, match="n_thresholds"):
        T.pr_curve(df, F.col("label"), F.col("score"), n_thresholds=1)


def test_dup_group_sizes(spark):
    """Duplication profile: 3 copies of one text + 2 of another + 1 unique
    → histogram {1: 1, 2: 1, 3: 1}; NULL text excluded."""
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"), (4, "bbb"), (5, "bbb"),
         (6, "ccc"), (7, None)],
        "id bigint, text string",
    )
    got = {r["group_size"]: r["n_groups"] for r in
           D.dup_group_sizes(df, "text").collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_badwords_gate(spark):
    """C4 bad-words gate: word-boundary hits (no substring matches),
    case-insensitive, NULL text passes the drop but yields no audit row,
    and non-contract word lists are rejected."""
    import pytest

    from data_quality_spark.ops import textops as T

    df = spark.createDataFrame(
        [
            (1, "visit our casino, best CASINO around"),   # 2 hits, mixed case
            (2, "casinos are a different word entirely"),  # boundary: 0 hits
            (3, "perfectly ordinary document text"),
            (4, None),
            (5, "xxx"),                                    # whole-string hit
        ],
        "doc_id bigint, text string",
    )
    audit = {r["doc_id"]: r for r in
             T.badwords_counts(df, "doc_id", "text").collect()}
    assert audit[1]["n_badwords"] == 2 and audit[1]["has_badwords"]
    assert audit[2]["n_badwords"] == 0 and not audit[2]["has_badwords"]
    assert audit[5]["n_badwords"] == 1
    assert 4 not in audit  # NULL text: no audit row

    kept = {r["doc_id"] for r in T.badwords_drop(df, "text").collect()}
    assert kept == {2, 3, 4}  # NULL passes the gate

    with pytest.raises(ValueError, match="empty"):
        T.badwords_drop(df, "text", words=[])
    with pytest.raises(ValueError, match="ASCII"):
        T.badwords_drop(df, "text", words=["two words"])


def test_read_warc_cdx_ranged(spark, tmp_path):
    """CDX-indexed ranged reads: byte fidelity per record, index-level
    filter pushdown (rejected records' archive bytes never read), and
    multi-segment grouping."""
    from pyspark.sql import functions as F

    from data_quality_spark.sources import warc as W

    recs1 = [(f"https://a.example/{i}", "2024-01-02T03:04:05Z",
              f"<html><main><p>doc a{i} body.</p></main></html>".encode())
             for i in range(5)]
    recs2 = [("https://b.example/big", "2024-02-03T04:05:06Z",
              b"<html><main><p>" + b"big body words. " * 50 + b"</p></main></html>")]
    W.write_warc_cdx(str(tmp_path / "seg1.warc.gz"), recs1,
                     str(tmp_path / "seg1.cdx"))
    W.write_warc_cdx(str(tmp_path / "seg2.warc.gz"), recs2,
                     str(tmp_path / "seg2.cdx"))

    df = W.read_warc_cdx(spark, str(tmp_path), str(tmp_path) + "/*.cdx")
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 6
    assert bytes(rows["https://a.example/3"]["html"]) == recs1[3][2]
    assert bytes(rows["https://b.example/big"]["html"]) == recs2[0][2]
    assert str(rows["https://a.example/0"]["warc_ts"]).startswith(
        "2024-01-02 03:04:05")
    assert rows["https://a.example/0"]["text"] is None

    # index-level pushdown: url-prefix filter reads only seg2's ranges
    only_b = W.read_warc_cdx(
        spark, str(tmp_path), str(tmp_path) + "/*.cdx",
        where=F.col("url").startswith("https://b."),
    )
    assert [r["url"] for r in only_b.collect()] == ["https://b.example/big"]

    # a corrupt/blank index line is dropped, not fatal
    with open(tmp_path / "seg1.cdx", "a") as fh:
        fh.write("garbage line without json\n\n")
    assert W.read_warc_cdx(spark, str(tmp_path),
                           str(tmp_path) + "/*.cdx").count() == 6

    # gzipped index (the Common-Crawl distribution format) reads
    # transparently — one task per index file, documented trade
    import gzip as _gz

    with open(tmp_path / "seg2.cdx", "rb") as fh:
        (tmp_path / "gz").mkdir()
        with open(tmp_path / "gz" / "seg2.cdx.gz", "wb") as out:
            out.write(_gz.compress(fh.read()))
    gz = W.read_warc_cdx(spark, str(tmp_path),
                         str(tmp_path / "gz") + "/*.cdx.gz")
    assert [r["url"] for r in gz.collect()] == ["https://b.example/big"]


def test_read_warc_large_segment_warning(spark, tmp_path):
    """Raw (index-less) WARC reads are file-grain: a segment above the
    threshold must raise a loud RuntimeWarning naming the CDX path; small
    segments must not."""
    import warnings as _w

    from data_quality_spark.sources import warc as W

    body = b"<html><main><p>" + b"word " * 200 + b"</p></main></html>"
    W.write_warc(str(tmp_path / "seg.warc"),
                 [("https://a.example/x", "2024-01-02T03:04:05Z", body)])

    with _w.catch_warnings():
        _w.simplefilter("error")  # no warning expected under the default
        df = W.read_warc(spark, str(tmp_path) + "/*")
    assert df.count() == 1

    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        df = W.read_warc(spark, str(tmp_path) + "/*", warn_segment_bytes=64)
        msgs = [str(x.message) for x in got if x.category is RuntimeWarning]
    assert msgs and "read_warc_cdx" in msgs[0] and "seg.warc" in msgs[0]
    assert df.count() == 1  # warning only — the read still works


def test_read_warc_split_member_grain(spark, tmp_path):
    """Index-less record-grain reads (r4 verdict #9): the boundary scan
    finds every gzip member in a multi-record .warc.gz without holding the
    file (chunked decompress-and-discard), and the fetch stage spreads
    members over >1 task. Byte fidelity per record; whole-file-gzip and
    plain segments degrade to one range each."""
    import gzip as _gz
    import io as _io

    from data_quality_spark.sources import warc as W

    recs = [(f"https://s.example/{i}", "2024-01-02T03:04:05Z",
             f"<html><main><p>split body {i}.</p></main></html>".encode())
            for i in range(8)]
    # per-record-member segment (Common-Crawl framing), NO cdx written
    W.write_warc_cdx(str(tmp_path / "seg.warc.gz"), recs,
                     str(tmp_path / "ignored.cdx"))
    (tmp_path / "ignored.cdx").unlink()

    # boundary scan: 8 members, contiguous, chunk smaller than one member
    with open(tmp_path / "seg.warc.gz", "rb") as fh:
        spans = list(W.iter_gzip_members(fh, chunk_bytes=7))
    assert len(spans) == 8
    assert spans[0][0] == 0
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2
    import os as _os

    assert spans[-1][0] + spans[-1][1] == _os.path.getsize(
        tmp_path / "seg.warc.gz")
    # a torn trailing member is dropped, not a phantom range
    with open(tmp_path / "seg.warc.gz", "rb") as fh:
        torn = fh.read()[: spans[-1][0] + 5]
    assert len(list(W.iter_gzip_members(_io.BytesIO(torn)))) == 7

    df = W.read_warc_split(spark, str(tmp_path / "seg.warc.gz"), num_tasks=4)
    assert df.rdd.getNumPartitions() == 4  # ONE file, >1 task — the point
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 8
    for url, _ts, html in recs:
        assert bytes(rows[url]["html"]) == html

    # whole-file gzip (not per-record members): one member → one range,
    # but every record still parses
    blob = _io.BytesIO()
    for url, ts, html in recs[:3]:
        http = b"HTTP/1.1 200 OK\r\n\r\n" + html
        head = (f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}"
                f"\r\nWARC-Date: {ts}\r\nContent-Length: {len(http)}").encode()
        blob.write(head + b"\r\n\r\n" + http + b"\r\n\r\n")
    whole_dir = tmp_path / "whole"
    whole_dir.mkdir()
    with open(whole_dir / "whole.warc.gz", "wb") as fh:
        fh.write(_gz.compress(blob.getvalue()))
    got = W.read_warc_split(spark, str(whole_dir / "whole.warc.gz")).count()
    assert got == 3


def test_read_warc_cdx_task_sizing(spark, tmp_path):
    """CDX ranged-read tasks are sized to the distinct segment count, not
    spark.sql.shuffle.partitions (r3 advice: 200 mostly-empty tasks on
    small indexes, collision pile-ups on large files)."""
    from data_quality_spark.sources import warc as W

    for s in range(3):
        recs = [(f"https://s{s}.example/{i}", "2024-01-02T03:04:05Z",
                 f"<html><main><p>doc {s}/{i}.</p></main></html>".encode())
                for i in range(4)]
        W.write_warc_cdx(str(tmp_path / f"seg{s}.warc.gz"), recs,
                         str(tmp_path / f"seg{s}.cdx"))
    df = W.read_warc_cdx(spark, str(tmp_path), str(tmp_path) + "/*.cdx")
    assert df.rdd.getNumPartitions() == 3  # one per segment file
    assert df.count() == 12
    # explicit num_tasks skips the sizing job and pins the task count
    df2 = W.read_warc_cdx(spark, str(tmp_path), str(tmp_path) + "/*.cdx",
                          num_tasks=2)
    assert df2.rdd.getNumPartitions() == 2
    assert df2.count() == 12


def test_trainer_null_seed_guards(spark):
    """NULL embeddings among the smallest-id rows must be skipped by the
    deterministic seed scans (not raise an opaque TypeError), and a corpus
    without enough non-NULL vectors fails with a descriptive error."""
    import pytest as _pytest

    rows = [(0, None), (1, None)] + [
        (i, [float(i % 3), float(i % 5), 1.0, 0.5]) for i in range(2, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = S.train_kmeans_cells(emb, "vec_id", "v", k=4, n_iter=1, dim=4)
    assert len(cents) == 4 and all(len(c) == 4 for c in cents)
    books = S.train_pq(emb, "vec_id", "v", m=2, k=4, n_iter=1, dim=4)
    assert len(books) == 2 and all(len(b) == 4 for b in books)

    tiny = spark.createDataFrame(rows[:4], "vec_id long, v array<double>")
    with _pytest.raises(ValueError, match="non-NULL"):
        S.train_kmeans_cells(tiny, "vec_id", "v", k=4, n_iter=1, dim=4)
    with _pytest.raises(ValueError, match="non-NULL"):
        S.train_pq(tiny, "vec_id", "v", m=2, k=4, n_iter=1, dim=4)


def test_codebook_geometry_sidecar(spark, tmp_path):
    """PQ codebook persistence pins (m, k, d_sub, dim) in a sidecar: loads
    round-trip exactly, a geometry mismatch fails loudly naming the
    recorded shape, and a corrupt (sidecar ≠ table) artifact is refused."""
    import json

    import pytest as _pytest

    books = [[[float(s * 10 + c), float(c)] for c in range(4)]
             for s in range(2)]  # m=2, k=4, d_sub=2 → dim=4
    path = str(tmp_path / "books.parquet")
    S.save_codebooks(path, books)
    assert S.load_codebooks(path) == books
    assert S.load_codebooks(path, m=2, k=4, dim=4) == books

    with _pytest.raises(ValueError, match="m=2"):
        S.load_codebooks(path, m=4)
    with _pytest.raises(ValueError, match="dim=4"):
        S.load_codebooks(path, dim=64)

    meta = json.load(open(path + ".meta.json"))
    meta["k"] = 99
    json.dump(meta, open(path + ".meta.json", "w"))
    with _pytest.raises(ValueError, match="inconsistent"):
        S.load_codebooks(path)


def test_nb_weights_geometry_sidecar(spark, tmp_path):
    """NB classifier weights persistence pins the hash bucket count: a
    stale artifact loaded under a different buckets constant fails loudly,
    and the round-tripped model scores identically to the in-memory one."""
    import pytest as _pytest

    from data_quality_spark.ops import textops as T

    docs = spark.createDataFrame(
        [(i, ("good text. " if i % 2 else "bad junk! ") * (3 + i % 4))
         for i in range(20)],
        "doc_id long, text string",
    )
    w = T.train_nb_classifier(
        docs, "doc_id", "text", F.col("doc_id") % 2 == 1, buckets=64
    )
    path = str(tmp_path / "clf.parquet")
    T.save_nb_weights(path, w, buckets=64)

    w2 = T.load_nb_weights(spark, path, buckets=64)
    a = T.classifier_score(docs, "doc_id", "text", w, buckets=64)
    b = T.classifier_score(docs, "doc_id", "text", w2, buckets=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    with _pytest.raises(ValueError, match="buckets=64"):
        T.load_nb_weights(spark, path, buckets=1024)
    with _pytest.raises(ValueError, match="64 bucket rows"):
        T.save_nb_weights(path, w, buckets=32)


def test_host_rank_star_graph(spark):
    """Star graph: every leaf links to the hub — the hub must out-rank
    every leaf, values must match a pure-python rendering of the SAME
    integer micro-unit recurrence exactly (determinism contract). The hub
    is DANGLING (no out-edges): its mass folds back uniformly each
    iteration, so total rank stays RANK_SCALE ± integer-floor rounding."""
    from data_quality_spark.ops import graph as G

    leaves = [f"l{i}.example" for i in range(6)]
    edges = spark.createDataFrame(
        [(leaf, "hub.example") for leaf in leaves], "src string, dst string"
    )
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges).collect()}
    # python twin of the recurrence (with the dangling-mass fold)
    n = 7
    init = G.RANK_SCALE // n
    base = ((100 - G.RANK_DAMP_PCT) * init) // 100
    rank = {h: init for h in leaves + ["hub.example"]}
    for _ in range(G.RANK_ITERS):
        dm = rank["hub.example"]  # the only dangling host
        inflow = {h: dm // n for h in rank}
        for leaf in leaves:
            inflow["hub.example"] += rank[leaf] // 1  # out-degree 1
        rank = {h: base + (G.RANK_DAMP_PCT * inflow[h]) // 100 for h in rank}
    assert got == rank
    assert got["hub.example"] > max(got[leaf] for leaf in leaves)
    # canonical-PageRank mass conservation (each floor div loses < 1 unit)
    assert abs(sum(got.values()) - G.RANK_SCALE) < n * (G.RANK_ITERS + 1) * 3


def test_edges_from_pages_drops_self_loops_and_dups(spark):
    from data_quality_spark.ops import graph as G

    df = spark.createDataFrame(
        [("a.example", "b.example"), ("a.example", "b.example"),
         ("a.example", "a.example"), ("c.example", None)],
        "s string, d string",
    )
    got = {(r["src"], r["dst"])
           for r in G.edges_from_pages(df, "s", "d").collect()}
    assert got == {("a.example", "b.example")}


def test_with_links_and_py_twin(spark):
    from data_quality_spark.pipeline import extract as X

    html = (b'<main><p>x <a href="https://a.example/p">a</a>'
            b" <a href='http://b.example/q?x=1'>b</a>"
            b' <a href="/relative/skipped">r</a>'
            b' <img src="https://c.example/not-href.png"></p></main>')
    df = spark.createDataFrame([(1, html), (2, None)],
                               "id int, html binary")
    out = {r["id"]: r["links"]
           for r in X.with_links(df, "html").collect()}
    expect = ["https://a.example/p", "http://b.example/q?x=1"]
    assert out[1] == expect and out[2] is None
    assert X.py_links(html) == expect and X.py_links(None) is None


def test_host_edges_from_pages_html(spark):
    from data_quality_spark.ops import graph as G

    mk = lambda *links: (  # noqa: E731
        "<main><p>"
        + " ".join(f'<a href="{u}">x</a>' for u in links)
        + "</p></main>"
    ).encode()
    df = spark.createDataFrame(
        [("https://a.example/1", mk("https://b.example/p",
                                    "https://a.example/self",
                                    "http://c.example:8080/q")),
         ("https://b.example/2", mk("https://a.example/z")),
         ("https://d.example/3", None)],
        "url string, html binary",
    )
    got = {(r["src"], r["dst"])
           for r in G.host_edges_from_pages_html(df).collect()}
    # self-link (a->a) dropped; port stripped by host_of; NULL html no-ops
    assert got == {("a.example", "b.example"), ("a.example", "c.example"),
                   ("b.example", "a.example")}
    # the edges feed host_rank directly
    ranks = G.host_rank(
        spark.createDataFrame(sorted(got), "src string, dst string"))
    by = {r["host"]: r["rank_units"] for r in ranks.collect()}
    assert by["a.example"] > by["c.example"]  # a has an in-link from b


def test_latest_snapshot(spark):
    df = spark.createDataFrame(
        [("u1", 202401, "old"), ("u1", 202403, "new"), ("u1", 202402, "mid"),
         ("u2", 202401, "only")],
        "url string, crawl_id bigint, text string",
    )
    got = {r["url"]: (r["crawl_id"], r["text"]) for r in
           T.latest_snapshot(df, "url", "crawl_id", ["text"]).collect()}
    assert got == {"u1": (202403, "new"), "u2": (202401, "only")}


def test_latest_snapshot_tie_breaks_on_payload_struct(spark):
    """Documented tie rule (r4 ADVICE): rows tied on order_col resolve to
    the lexicographic MAX payload struct — deterministic under any
    partitioning, and what the text_crawl_latest_tied oracle pins."""
    df = spark.createDataFrame(
        [("u1", 202401, "alpha"), ("u1", 202401, "beta"),
         ("u1", 202400, "zzz-older-crawl-never-wins"),
         ("u2", 202401, "b"), ("u2", 202401, "a")],
        "url string, crawl_id bigint, text string",
    )
    got = {r["url"]: (r["crawl_id"], r["text"]) for r in
           T.latest_snapshot(df, "url", "crawl_id", ["text"]).collect()}
    assert got == {"u1": (202401, "beta"), "u2": (202401, "b")}


def test_q_dedup_para_minhash(spark):
    """Paragraph-grain near-dup pairs over the exact-dup-augmented corpus:
    cross-doc exact paragraph copies come out at J=1.0 and the in-doc
    ' zz' variants as high-but-imperfect pairs — both above threshold."""
    from data_quality_spark import queries_ops as QO

    out = QO.q_dedup_para_minhash(spark, "/root/testdata/sf0.001").collect()
    assert out
    assert any(r["jaccard"] == 1.0 for r in out)        # exact copies
    assert any(0.5 <= r["jaccard"] < 1.0 for r in out)  # ' zz' near-dups
    # unit ids encode (doc, paragraph): pairs never pair a unit with itself
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_url_blocklist_null_url_kept_both_branches(spark):
    """A NULL url has no host and therefore no blocklist evidence: both
    the literal-list branch (map-only overlap) and the DataFrame branch
    (anti-join) must KEEP the row."""
    df = spark.createDataFrame(
        [(1, "https://bad.example/x"), (2, None), (3, "https://ok.example/y")],
        "doc_id int, url string",
    )
    kept_list = {r["doc_id"] for r in
                 T.url_blocklist_filter(df, "url", ["bad.example"]).collect()}
    bl = spark.createDataFrame([("bad.example",)], "host string")
    kept_df = {r["doc_id"] for r in
               T.url_blocklist_filter(df, "url", bl).collect()}
    assert kept_list == kept_df == {2, 3}


def test_host_rank_empty_and_blank_hosts(spark):
    from data_quality_spark.ops import graph as G

    # '' hosts (host_of of malformed urls) never become graph nodes
    df = spark.createDataFrame(
        [("", "b.example"), ("a.example", ""), ("a.example", "b.example")],
        "s string, d string",
    )
    got = {(r["src"], r["dst"]) for r in G.edges_from_pages(df, "s", "d").collect()}
    assert got == {("a.example", "b.example")}
    # empty edge table -> empty rank frame, not ZeroDivisionError
    empty = spark.createDataFrame([], "src string, dst string")
    assert G.host_rank(empty).collect() == []


def test_host_rank_weighted_star(spark):
    """Weighted star: two leaves point at two hubs with weights 3:1 — the
    heavy-edge hub must out-rank the light one, values matching an exact
    python rendering of the weighted integer recurrence."""
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame(
        [("l0.example", "heavy.example", 3), ("l0.example", "light.example", 1),
         ("l1.example", "heavy.example", 3), ("l1.example", "light.example", 1)],
        "src string, dst string, w long",
    )
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges, weight_col="w").collect()}
    hosts = ["l0.example", "l1.example", "heavy.example", "light.example"]
    n = 4
    init = G.RANK_SCALE // n
    base = ((100 - G.RANK_DAMP_PCT) * init) // 100
    rank = {h: init for h in hosts}
    for _ in range(G.RANK_ITERS):
        dm = rank["heavy.example"] + rank["light.example"]  # dangling hubs
        inflow = {h: dm // n for h in hosts}
        for leaf in ["l0.example", "l1.example"]:
            inflow["heavy.example"] += (rank[leaf] * 3) // 4
            inflow["light.example"] += (rank[leaf] * 1) // 4
        rank = {h: base + (G.RANK_DAMP_PCT * inflow[h]) // 100 for h in hosts}
    assert got == rank
    assert got["heavy.example"] > got["light.example"]


def test_host_rank_teleport_trustrank(spark):
    """TrustRank: rank mass enters only through the seed — a host linked
    from the seed earns rank, a disconnected spam cluster gets ZERO."""
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame(
        [("seed.example", "good.example"),
         ("good.example", "seed.example"),
         ("spam1.example", "spam2.example"),
         ("spam2.example", "spam1.example")],
        "src string, dst string",
    )
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges, teleport=["seed.example"]).collect()}
    assert got["seed.example"] > 0 and got["good.example"] > 0
    assert got["spam1.example"] == 0 and got["spam2.example"] == 0
    # no seed in the graph -> loud error, not an all-zero silent gate
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no seed host"):
        G.host_rank(edges, teleport=["absent.example"])


def test_host_rank_personalized_exact_recurrence(spark):
    """Personalized PageRank (teleport=dict): values must match a pure
    python rendering of the PERS_SCALE integer recurrence exactly,
    including the dangling-mass fold THROUGH the teleport vector and the
    lost-mass semantics for seeds absent from the graph."""
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame(
        [("a.example", "b.example"), ("b.example", "a.example"),
         ("a.example", "dang.example")],
        "src string, dst string",
    )
    weights = {"a.example": 3.0, "b.example": 1.0, "absent.example": 1.0}
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges, teleport=weights).collect()}

    hosts = ["a.example", "b.example", "dang.example"]
    v6 = {h: int(w * G.PERS_SCALE / 5.0) for h, w in weights.items()}
    v6.setdefault("dang.example", 0)
    init = {h: (G.RANK_SCALE * v6.get(h, 0)) // G.PERS_SCALE for h in hosts}
    base = {h: ((100 - G.RANK_DAMP_PCT) * init[h]) // 100 for h in hosts}
    out = {"a.example": ["b.example", "dang.example"],
           "b.example": ["a.example"]}
    rank = dict(init)
    for _ in range(G.RANK_ITERS):
        dm = rank["dang.example"]  # the only dangling host
        inflow = {h: (dm * v6.get(h, 0)) // G.PERS_SCALE for h in hosts}
        for s, dsts in out.items():
            for d in dsts:
                inflow[d] += rank[s] // len(dsts)
        rank = {h: base[h] + (G.RANK_DAMP_PCT * inflow[h]) // 100
                for h in hosts}
    assert got == rank
    # absent.example's 20% teleport share is lost mass by contract
    assert sum(got.values()) < G.RANK_SCALE * 85 // 100

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no seed host"):
        G.host_rank(edges, teleport={"absent.example": 1.0})
    with _pytest.raises(ValueError, match="non-positive"):
        G.host_rank(edges, teleport={"a.example": 0})


def test_host_rank_weight_clamp_and_deep_iters(spark):
    """Out-of-range edge weights raise loudly (bigint-wrap guard); deep
    iteration counts localCheckpoint the rank frame and still produce the
    exact python-recurrence values."""
    from data_quality_spark.ops import graph as G
    import pytest as _pytest

    with _pytest.raises(ValueError, match="summed edge weights"):
        G.host_rank(
            spark.createDataFrame([("a", "b", G.RANK_MAX_WEIGHT + 1)],
                                  "src string, dst string, w long"),
            weight_col="w",
        )
    with _pytest.raises(ValueError, match="summed edge weights"):
        G.host_rank(
            spark.createDataFrame([("a", "b", 0)],
                                  "src string, dst string, w long"),
            weight_col="w",
        )
    # iters > 12 triggers the checkpoint path (lineage hygiene)
    edges = spark.createDataFrame(
        [("a.example", "b.example"), ("b.example", "a.example")],
        "src string, dst string",
    )
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges, iters=13).collect()}
    n, iters = 2, 13
    init = G.RANK_SCALE // n
    base = ((100 - G.RANK_DAMP_PCT) * init) // 100
    rank = {"a.example": init, "b.example": init}
    for _ in range(iters):
        inflow = {"a.example": rank["b.example"],
                  "b.example": rank["a.example"]}
        rank = {h: base + (G.RANK_DAMP_PCT * inflow[h]) // 100 for h in rank}
    assert got == rank


def test_host_edges_weighted(spark):
    from data_quality_spark.ops import graph as G

    mk = lambda *links: (  # noqa: E731
        "<main><p>"
        + " ".join(f'<a href="{u}">x</a>' for u in links)
        + "</p></main>"
    ).encode()
    df = spark.createDataFrame(
        [("https://a.example/1", mk("https://b.example/p",
                                    "https://b.example/q")),
         ("https://a.example/2", mk("https://b.example/r",
                                    "https://c.example/s"))],
        "url string, html binary",
    )
    got = {(r["src"], r["dst"]): r["w"] for r in
           G.host_edges_from_pages_html(df, weighted=True).collect()}
    assert got == {("a.example", "b.example"): 3, ("a.example", "c.example"): 1}


def test_overlap_state_roundtrip_datetype(spark, tmp_path):
    """Persisted-state reuse on DateType interval columns: the state
    codec must round-trip datetime.date AS date (decoding it as
    pd.Timestamp made the patch pass compare Timestamp vs date and raise
    in every task)."""
    import datetime as dt

    from data_quality_spark.ops import intervals as IV

    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 10)),
         (2, dt.date(2024, 1, 5), dt.date(2024, 1, 7)),
         (3, dt.date(2024, 2, 1), dt.date(2024, 2, 2))],
        "id int, s date, e date",
    )
    fresh = {r["id"]: r["__overlap_ko"] for r in
             IV.overlap_flags_global(df, "s", "e").collect()}
    state = IV.compute_overlap_state(df, "s", "e")
    p = str(tmp_path / "ov_state.json")
    IV.save_overlap_state(state, p)
    loaded = IV.load_overlap_state(p)
    reused = {r["id"]: r["__overlap_ko"] for r in
              IV.overlap_flags_global(df, "s", "e", state=loaded).collect()}
    assert reused == fresh
    assert reused[1] and reused[2] and not reused[3]


def test_connected_components_multi_island(spark):
    """Three known components of different shapes — a 5-node path (its
    diameter exceeds the star-alternation round count a naive label-prop
    would need), a triangle, and an isolated pair. Labels must be the
    component-minimum host id; sizes must match."""
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame(
        [("p1", "p0"), ("p1", "p2"), ("p2", "p3"), ("p4", "p3"),  # path
         ("t0", "t1"), ("t1", "t2"), ("t2", "t0"),                # triangle
         ("z9", "z8"),                                            # pair
         ("p0", "p0")],                                           # self loop
        "src string, dst string",
    )
    got = {r["host"]: (r["component"], r["component_size"])
           for r in G.connected_components(edges).collect()}
    assert got == {
        **{f"p{i}": ("p0", 5) for i in range(5)},
        **{f"t{i}": ("t0", 3) for i in range(3)},
        "z8": ("z8", 2), "z9": ("z8", 2),
    }


def test_connected_components_long_path_converges(spark):
    """A 33-node path is the adversarial case for star alternation (deep
    diameter, minimal branching): must converge well inside CC_MAX_ROUNDS
    and label everything with the single minimum."""
    from data_quality_spark.ops import graph as G

    n = 33
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)],
        "src string, dst string",
    )
    rows = G.connected_components(edges).collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {"n00"}
    assert all(r["component_size"] == n for r in rows)


def test_harmonic_exact_known_distances(spark):
    """Directed diamond a→b→c→d plus a→d: incoming-path convention, exact
    integer micro-units, radius bound honored."""
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    u = G.HARM_SCALE
    got = {r["host"]: (r["n_reach"], r["harmonic_units"])
           for r in G.harmonic_exact(edges, radius=3).collect()}
    # d(a→b)=1; d(a→c)=2, d(b→c)=1; d(a→d)=1, d(b→d)=2, d(c→d)=1
    assert got == {"a": (0, 0), "b": (1, u), "c": (2, u + u // 2),
                   "d": (3, 2 * u + u // 2)}
    # radius=1 cuts the 2-hop contributions
    got1 = {r["host"]: (r["n_reach"], r["harmonic_units"])
            for r in G.harmonic_exact(edges, radius=1).collect()}
    assert got1 == {"a": (0, 0), "b": (1, u), "c": (1, u), "d": (2, 2 * u)}


def test_hll_bucket_rho_py_twin(spark):
    """Spark's md5-string-derived (bucket, rho) must equal the python
    twin for a spread of host ids (the portability contract every
    downstream register value rests on)."""
    from data_quality_spark.ops import graph as G

    hosts = [f"h{i}.example" for i in range(200)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    b, r = G._hll_bucket_rho(F.col("host"))
    got = {row["host"]: (row["b"], row["r"])
           for row in df.select("host", b.alias("b"), r.alias("r")).collect()}
    assert got == {h: G.py_hll_bucket_rho(h) for h in hosts}
    # rho distribution sanity: geometric — most mass at 1-2, all >= 1
    rhos = [v[1] for v in got.values()]
    assert min(rhos) >= 1 and max(rhos) <= G.HLL_RHO_CAP
    assert sum(1 for x in rhos if x <= 2) > len(rhos) // 2


def test_harmonic_hll_tracks_exact(spark):
    """On a 600-node expander the raw-HLL ball estimate must track the
    exact ball within generous sketch bounds IN ITS DOCUMENTED REGIME
    (balls ≥ 4m = 256, past the uncorrected linear-counting zone; raw
    m=64 std error ≈ 13%), be deterministic across runs, and stay
    positive everywhere."""
    from data_quality_spark.ops import graph as G

    n = 600
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{(i * 7 + k) % n:03d}")
         for i in range(n) for k in (1, 2, 3)],
        "src string, dst string",
    )
    hll = {r["host"]: r for r in G.harmonic_hll(edges, radius=7).collect()}
    exact = {r["host"]: r for r in G.harmonic_exact(edges, radius=7).collect()}
    assert set(hll) == set(exact) and len(hll) == n
    checked = 0
    for h, e in exact.items():
        assert hll[h]["reach_est"] > 0 and hll[h]["harmonic_est"] > 0
        if e["n_reach"] >= 4 * G.HLL_M:
            est = hll[h]["reach_est"]
            assert 0.6 * e["n_reach"] <= est <= 1.6 * e["n_reach"], (
                h, est, e["n_reach"])
            checked += 1
    assert checked > 50  # the regime must actually be exercised
    # determinism: a second full run returns identical bits
    again = {r["host"]: r for r in G.harmonic_hll(edges, radius=7).collect()}
    assert all(
        again[h]["s_units"] == hll[h]["s_units"]
        and again[h]["harmonic_est"] == hll[h]["harmonic_est"]
        for h in hll
    )


def test_harmonic_hll_radius_validation(spark):
    from data_quality_spark.ops import graph as G

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        G.harmonic_hll(edges, radius=0)


def test_anchor_stats_grammar_and_agg(spark):
    """Anchor grammar edge classes: quote styles, uppercase tags, empty
    bodies, image anchors (body contains markup — SKIPPED), relative
    links (skipped), internal links (dropped as self-host), NULL html.
    Aggregates checked against a hand-computed expectation."""
    from data_quality_spark.ops import graph as G
    from data_quality_spark.pipeline.extract import py_anchors

    pages = [
        # a.example endorses t.example twice (distinct texts), one empty
        ("http://a.example/1",
         '<a href="http://t.example/x">Good Site</a>'
         "<A HREF='http://t.example/y'></A>"
         '<a href="http://t.example/z">good   site</a>'),
        # b.example: image anchor skipped, relative skipped, one kept
        ("http://b.example/1",
         '<a href="http://t.example/i"><img/></a>'
         '<a href="/rel">nope</a>'
         '<a class="k" href="http://t.example/w">  Good Site </a>'),
        # internal link only -> contributes nothing
        ("http://t.example/self", '<a href="http://t.example/s">me</a>'),
        # NULL html -> no rows
        ("http://c.example/1", None),
    ]
    df = spark.createDataFrame(
        [(u, h.encode() if h else None) for u, h in pages],
        "url string, html binary",
    )
    # python-twin sanity on the grammar itself
    assert py_anchors(pages[1][1].encode()) == [
        ("http://t.example/w", "  Good Site ")
    ]
    rows = {r["dst_host"]: r for r in G.anchor_stats(df).collect()}
    assert list(rows) == ["t.example"]
    r = rows["t.example"]
    # kept anchors: a->t (3), b->t (1); texts lower+trim (inner
    # whitespace is PRESERVED): {'good site', 'good   site'}, one empty
    assert r["n_anchors"] == 4
    assert r["n_src_hosts"] == 2
    assert r["n_uniq_texts"] == 2
    assert r["n_empty"] == 1
    # 'good site' appears 3x (2 tokens each) + 1 empty body = 6 tokens
    assert r["n_anchor_toks"] == 6


def test_distinct_hll_accuracy_and_parity(spark):
    """distinct_hll: (a) register state matches a pure-python HLL built
    from py_hll_bucket_rho exactly (bit-portability contract), (b) the
    raw estimate lands within 3 sigma (~40%) of truth at n=2000 for
    m=64, (c) NULL values are skipped."""
    from data_quality_spark.ops import sketches as SK
    from data_quality_spark.ops.graph import (
        HLL_EST_C, HLL_M, HLL_RHO_CAP, py_hll_bucket_rho,
    )

    vals = [f"url-{i}" for i in range(2000)]
    rows = [("g", v) for v in vals] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "k string, v string")
    out = SK.distinct_hll(df, "k", "v").collect()
    assert len(out) == 1
    got = out[0]
    regs = [0] * HLL_M
    for v in vals:
        b, r = py_hll_bucket_rho(v)
        regs[b] = max(regs[b], r)
    s_expect = sum(1 << (HLL_RHO_CAP - r) for r in regs)
    assert got["s_units"] == s_expect
    est = HLL_EST_C / s_expect
    assert got["distinct_est"] == est
    assert abs(est / 2000.0 - 1.0) < 0.4


def test_token_cms_exact_vs_python_twin(spark):
    """CMS table and point estimates must equal a pure-python rendering
    of the same d x w construction exactly, and estimates must never
    underestimate true counts (CMS one-sided error guarantee)."""
    from collections import Counter

    from data_quality_spark.ops import sketches as SK
    from data_quality_spark.ops.hashing import py_hash64

    texts = ["a b a  c", "b b  d", None, "a e f g a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    table = {(r["r"], r["b"]): r["cnt"]
             for r in SK.token_cms(df, "text", d=3, w=32).collect()}
    exact = Counter(t for s in texts if s for t in s.split())
    expect = Counter()
    for tok, n in exact.items():
        for r in range(3):
            expect[(r, py_hash64(tok, salt=f"|cms{r}") % 32)] += n
    assert table == dict(expect)
    sk = SK.token_cms(df, "text", d=3, w=32)
    ests = {r["token"]: r["est"]
            for r in SK.cms_estimate(sk, ["a", "b", "zz"], d=3, w=32).collect()}
    assert ests["zz"] >= 0
    for tok in ("a", "b"):
        assert ests[tok] >= exact[tok]
        assert ests[tok] == min(
            expect[(r, py_hash64(tok, salt=f"|cms{r}") % 32)] for r in range(3)
        )


def test_group_quantiles_exact_rank_selection(spark):
    """group_quantiles == numpy 'lower' method exactly, across groups,
    ties, NULLs, p=0/100 extremes, and a single-row group."""
    import numpy as np

    from data_quality_spark.ops import textops as T

    rng = np.random.RandomState(7)
    data = (
        [("a", int(v)) for v in rng.randint(0, 50, 199)]
        + [("b", int(v)) for v in rng.randint(0, 9, 57)]
        + [("c", 42)]
        + [("a", None), ("d", None)]
    )
    df = spark.createDataFrame(data, "k string, v int")
    pcts = (0, 25, 50, 75, 90, 100)
    got = {(r["k"], r["pct"]): r["value"]
           for r in T.group_quantiles(df, "k", "v", pcts).collect()}
    for k in ("a", "b", "c"):
        vals = sorted(v for kk, v in data if kk == k and v is not None)
        for p in pcts:
            expect = vals[(len(vals) - 1) * p // 100]
            assert got[(k, p)] == expect, (k, p)
    assert not any(kk == "d" for kk, _ in got)  # all-NULL group absent
    assert len(got) == 3 * len(pcts)


def test_registered_domain_psl_semantics(spark):
    """registered_domain: multi-label public suffixes collapse correctly,
    unknown TLDs use the default last-label rule, public-suffix-only and
    single-label hosts yield NULL — engine column vs hand expectations."""
    from data_quality_spark.ops import textops as T

    cases = [
        ("a.b.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("co.uk", None),
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("deep.www.example.com", "example.com"),
        ("localhost", None),
        ("x.co.jp", "x.co.jp"),
        ("media.s1.com.au", "s1.com.au"),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {r["host"]: r["reg"] for r in df.select(
        "host", T.registered_domain(F.col("host")).alias("reg")).collect()}
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_host_rank_deep_iterations_checkpointed(spark):
    """iters=9 crosses two localCheckpoint boundaries (RANK_CHECKPOINT_
    EVERY=4): values must still equal the pure-python recurrence exactly
    — the checkpoint is a plan-tree pin, never a semantic change."""
    from data_quality_spark.ops import graph as G

    leaves = [f"l{i}.example" for i in range(6)]
    edges = spark.createDataFrame(
        [(leaf, "hub.example") for leaf in leaves], "src string, dst string"
    )
    iters = 9
    got = {r["host"]: r["rank_units"]
           for r in G.host_rank(edges, iters=iters).collect()}
    n = 7
    init = G.RANK_SCALE // n
    base = ((100 - G.RANK_DAMP_PCT) * init) // 100
    rank = {h: init for h in leaves + ["hub.example"]}
    for _ in range(iters):
        dm = rank["hub.example"]
        inflow = {h: dm // n for h in rank}
        for leaf in leaves:
            inflow["hub.example"] += rank[leaf]
        rank = {h: base + (G.RANK_DAMP_PCT * inflow[h]) // 100 for h in rank}
    assert got == rank


def _py_hits(edges, iters):
    """Pure-python twin of ops.graph.hits's exact integer recurrence."""
    from data_quality_spark.ops import graph as G

    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {h: G.HITS_SCALE for h in nodes}
    auth = {h: 0 for h in nodes}
    for _ in range(iters):
        a_raw = {h: 0 for h in nodes}
        for s, d in e:
            a_raw[d] += hub[s]
        am = max(a_raw.values())
        auth = {h: (a_raw[h] * G.HITS_SCALE) // am for h in nodes}
        h_raw = {h: 0 for h in nodes}
        for s, d in e:
            h_raw[s] += auth[d]
        hm = max(h_raw.values())
        hub = {h: (h_raw[h] * G.HITS_SCALE) // hm for h in nodes}
    return auth, hub


def test_hits_bipartite_python_twin(spark):
    """Directory/content two-tier graph: 3 'directory' hosts each link to
    4 'content' hosts (overlapping). Directories must come out pure hubs
    (auth = 0: no inlinks), content pure authorities (hub = 0: no
    outlinks), the most-linked content host takes auth = HITS_SCALE, and
    every unit value must equal the pure-python rendering of the SAME
    integer L∞-normalized recurrence exactly."""
    from data_quality_spark.ops import graph as G

    edges = [(f"dir{i}.example", f"c{(i + j) % 5}.example")
             for i in range(3) for j in range(4)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: (r["auth_units"], r["hub_units"])
           for r in G.hits(df, iters=5).collect()}
    auth, hub = _py_hits(edges, 5)
    assert got == {h: (auth[h], hub[h]) for h in auth}
    for i in range(3):
        a, hb = got[f"dir{i}.example"]
        assert a == 0 and hb > 0                      # pure hub
    content = {h: got[h] for h in got if h.startswith("c")}
    assert all(hb == 0 for _, hb in content.values())  # pure authority
    assert max(a for a, _ in content.values()) == G.HITS_SCALE
    # c2 is hit by all three directories (j ranges overlap); c0 by one
    assert got["c2.example"][0] > got["c0.example"][0]


def test_hits_checkpoint_parity_and_guards(spark):
    """iters crossing the localCheckpoint cadence must not change values
    (pinning is a plan-shape concern only); empty edge sets return an
    empty frame; a super-node beyond HITS_MAX_DEG raises."""
    from data_quality_spark.ops import graph as G

    edges = [(f"s{i}.example", f"t{(i * 3 + j) % 4}.example")
             for i in range(5) for j in range(2)]
    df = spark.createDataFrame(edges, "src string, dst string")
    iters = G.RANK_CHECKPOINT_EVERY + 2
    got = {r["host"]: (r["auth_units"], r["hub_units"])
           for r in G.hits(df, iters=iters).collect()}
    auth, hub = _py_hits(edges, iters)
    assert got == {h: (auth[h], hub[h]) for h in auth}

    empty = spark.createDataFrame([], "src string, dst string")
    assert G.hits(empty).count() == 0

    orig = G.HITS_MAX_DEG
    G.HITS_MAX_DEG = 3
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="HITS_MAX_DEG"):
            G.hits(spark.createDataFrame(
                [("s.example", f"t{i}.example") for i in range(4)],
                "src string, dst string"))
    finally:
        G.HITS_MAX_DEG = orig


def test_degree_stats(spark):
    """Distinct-edge contract (duplicate edges count once), zero-fill for
    one-sided hosts, and the dangling host shows out_deg = 0."""
    from data_quality_spark.ops import graph as G

    df = spark.createDataFrame(
        [("a.example", "b.example"), ("a.example", "b.example"),
         ("a.example", "c.example"), ("b.example", "c.example")],
        "src string, dst string",
    )
    got = {r["host"]: (r["out_deg"], r["in_deg"])
           for r in G.degree_stats(df).collect()}
    assert got == {"a.example": (2, 0), "b.example": (1, 1),
                   "c.example": (0, 2)}


def test_readability_python_twin_and_bands(spark):
    """Milli-unit Flesch values equal the pure-python twin exactly; band
    labels follow the thresholds; empty / vowel-free / unpunctuated texts
    exercise the greatest(…,1) clamps instead of dividing by zero."""
    texts = [
        "The cat sat. It was flat. A hat!",         # short easy prose
        "Considerable institutional responsibilities "
        "necessitate comprehensive organizational restructuring.",
        "xyzzy 12345",                                # no vowels, no sents
        "",                                           # empty
        "word " * 50,                                 # no sentence marks
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           T.readability(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        assert got[i]["flesch_milli"] == T.py_readability_milli(t), t
    assert got[0]["read_band"] == "very_easy"
    assert got[1]["read_band"] == "very_difficult"
    assert got[3]["n_words"] == 0 and got[3]["flesch_milli"] == 206835


def test_weighted_sample_determinism_and_bias(spark):
    """Same input → identical sample under any partitioning; zero weights
    raise; heavier rows are sampled proportionally more often (the
    priority-sampling contract) — with 10× weight on even ids, evens must
    dominate the sample."""
    import pytest as _pytest

    rows = [(i, 10 if i % 2 == 0 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w long")
    a = [r["id"] for r in T.weighted_sample(df, "id", "w", k=50).collect()]
    b = [r["id"] for r in
         T.weighted_sample(df.repartition(7), "id", "w", k=50).collect()]
    assert sorted(a) == sorted(b) and len(a) == 50
    evens = sum(1 for i in a if i % 2 == 0)
    assert evens >= 35  # E[evens] ≈ 45 of 50 at 10:1 weights
    # independent salts give different samples
    c = [r["id"] for r in
         T.weighted_sample(df, "id", "w", k=50, salt="other").collect()]
    assert sorted(c) != sorted(a)
    with _pytest.raises(ValueError, match="weights must be"):
        T.weighted_sample(
            spark.createDataFrame([(1, 0)], "id long, w long"),
            "id", "w", k=1)


def test_embedding_decontaminate(spark):
    """Exact copies flag contaminated with the right source; orthogonal
    eval vectors don't; the (cos, train_id) tie rule picks the larger
    train id among exact duplicates; results are partition-invariant."""
    from data_quality_spark.ops import similarity as S

    train_rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (7, [1.0, 0.0, 0.0, 0.0]),   # duplicate of 1 → tie at cos 1.0
        (9, [0.5, 0.5, 0.5, 0.5]),
    ]
    train = spark.createDataFrame(
        train_rows, "vec_id long, embedding array<double>"
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]),    # leaked copy of 1/7
         (200, [0.0, 0.0, 0.0, 1.0])],   # orthogonal to 1,2,7; 0.5 vs 9
        "vec_id long, embedding array<double>",
    )
    got = {r["eval_id"]: r for r in
           S.embedding_decontaminate(train, ev, threshold=0.99).collect()}
    assert got[100]["contaminated"] and got[100]["max_cos"] == 1.0
    assert got[100]["best_train_id"] == 7      # tie → larger train id
    assert not got[200]["contaminated"] and got[200]["max_cos"] == 0.5
    assert got[200]["best_train_id"] == 9
    # partition-invariant (running max across batches/partitions)
    got2 = {r["eval_id"]: (r["best_train_id"], r["max_cos"])
            for r in S.embedding_decontaminate(
                train.repartition(3), ev, threshold=0.99).collect()}
    assert got2 == {k: (v["best_train_id"], v["max_cos"])
                    for k, v in got.items()}


def test_embedding_decontaminate_guards(spark):
    from data_quality_spark.ops import similarity as S
    import pytest as _pytest

    train = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty eval set"):
        S.embedding_decontaminate(train, empty)
    orig = S.DECON_EVAL_MAX
    S.DECON_EVAL_MAX = 1
    try:
        big = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        with _pytest.raises(ValueError, match="DECON_EVAL_MAX"):
            S.embedding_decontaminate(train, big)
    finally:
        S.DECON_EVAL_MAX = orig


def test_ngram_novelty(spark):
    """Doc 1 owns all its grams (first by min id); doc 2 repeats doc 1
    verbatim → novelty 0; doc 3 is half-copied → 2 of 4 distinct grams
    novel; a short doc yields 0 grams and NULL novelty."""
    df = spark.createDataFrame(
        [(1, "a b c d"),            # grams: abc, bcd (both novel)
         (2, "a b c d"),            # same grams, owned by 1 → novelty 0
         (3, "a b c x y z"),        # abc(old) bcx cxy xyz → 3/4 novel
         (4, "one two")],           # < n tokens
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           T.ngram_novelty(df, "doc_id", "text").collect()}
    assert got[1]["n_grams"] == 2 and got[1]["novelty"] == 1.0
    assert got[2]["n_grams"] == 2 and got[2]["novelty"] == 0.0
    assert got[3]["n_grams"] == 4 and got[3]["n_novel"] == 3
    assert got[4]["n_grams"] == 0 and got[4]["novelty"] is None


def test_vocab_growth_heaps(spark):
    """Range bucketing is exact integer arithmetic; vocab_cum counts each
    type once at its FIRST bucket; tokens_cum is the running total; empty
    input returns an empty frame."""
    rows = [(i, f"w{i} w{i} shared") for i in range(8)]  # 1 new type/doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["bucket"]: r for r in
           T.vocab_growth(df, "doc_id", "text", buckets=4).collect()}
    assert sorted(got) == [0, 1, 2, 3]          # 2 docs per bucket
    assert all(got[b]["n_docs"] == 2 and got[b]["n_tokens"] == 6
               for b in got)
    # bucket 0 mints w0, w1 and 'shared' = 3 types; later buckets 2 each
    assert [got[b]["vocab_new"] for b in range(4)] == [3, 2, 2, 2]
    assert [got[b]["vocab_cum"] for b in range(4)] == [3, 5, 7, 9]
    assert [got[b]["tokens_cum"] for b in range(4)] == [6, 12, 18, 24]
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert T.vocab_growth(empty, "doc_id", "text").count() == 0


def test_host_keep_stats(spark):
    """Keep-rate arithmetic, the evidence floor (low-volume hosts never
    block), and the boundary (rate exactly at max_keep_rate blocks)."""
    rows = (
        [("bad.example", False)] * 9 + [("bad.example", True)]       # 0.1
        + [("good.example", True)] * 9 + [("good.example", False)]   # 0.9
        + [("edge.example", True), ("edge.example", False)] * 5      # 0.5
        + [("tiny.example", False)] * 3                              # n<10
    )
    df = spark.createDataFrame(rows, "host string, keep boolean")
    got = {r["host"]: r for r in
           T.host_keep_stats(df, "host", "keep").collect()}
    assert got["bad.example"]["blocked"]
    assert got["bad.example"]["keep_rate"] == 0.1
    assert not got["good.example"]["blocked"]
    assert got["edge.example"]["blocked"]          # ≤ is inclusive
    assert not got["tiny.example"]["blocked"]      # evidence floor
    assert got["tiny.example"]["n_docs"] == 3
