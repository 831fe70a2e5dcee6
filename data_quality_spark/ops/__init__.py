"""Training-data pipeline operators beyond the reference's check set:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings (brute-force cosine top-k, LSH-bucketed ANN),
text analysis (heuristic language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

Design rule shared by every operator here: the computation is expressed with
portable primitives (md5-derived integer hashes, explicit arithmetic) so a
ANSI-SQL oracle (DuckDB) can reproduce it bit-for-bit — the same
dual-implementation invariant the reference enforces between its pandas and
SQL backends (/root/reference/data_quality/src/check.py:128-164).
"""
