"""Single-process pandas ORACLE for the quality-filter pipeline.

This is the reference's pandas backend reborn (SURVEY.md §2.3 "dual backend
agreement"): the same semantics as quality_filter.annotate_pages, implemented
with the SAME shared scoring functions (py_* features, langid.predict_batch,
perplexity.ppl_batch, scrub.py_scrub) in plain pandas. The Spark engine must
match it at F1 ≥ 0.99 on keep/drop and byte-identical scrubbed text per url
(BASELINE.md) — mirroring how the reference pins its pandas and SQL backends
to one golden corpus (test/test_check_dataframe.py vs test_check_bigquery.py).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from data_quality_spark.functions import langid, perplexity, scrub, textstats
from data_quality_spark.ops.textops import py_host_of
from data_quality_spark.pipeline import extract
from data_quality_spark.pipeline.quality_filter import DEFAULT_CONFIG, QFConfig


def _is_empty(v) -> bool:
    return v is None or (isinstance(v, float) and pd.isna(v)) or str(v) == ""


def annotate_pandas(pdf: pd.DataFrame, cfg: QFConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    out = pdf.copy()
    extracted = [
        ext if ext is not None else txt
        for ext, txt in zip(out["html"].map(extract.py_extract), out["text"])
    ]
    out["text_extracted"] = extracted

    feats = pd.DataFrame(
        [textstats.py_features(t if isinstance(t, str) else "") for t in extracted],
        index=out.index,
    )
    out = pd.concat([out, feats], axis=1)

    lid = langid.predict_batch(pd.Series(extracted, index=out.index, dtype=object))
    out["lang_pred"] = lid["lang_pred"].values
    out["lang_margin"] = lid["lang_margin"].values
    out["ppl"] = perplexity.ppl_batch(
        pd.Series(extracted, index=out.index, dtype=object)
    ).values
    out["ppl_bucket"] = [
        "head" if p <= cfg.ppl_head else "middle" if p <= cfg.ppl_tail else "tail"
        for p in out["ppl"]
    ]

    url_counts = Counter(str(u) for u in out["url"] if not _is_empty(u))
    blocked_set = {b.lower() for b in (cfg.blocked_hosts or ())}
    host_ranks: dict = {}
    if cfg.host_rank_path:
        rk = pd.read_parquet(cfg.host_rank_path)
        host_ranks = dict(zip(rk["host"], rk["rank"]))
    bad_re = None
    if cfg.badwords:
        import re

        from data_quality_spark.ops.textops import _badwords_pattern

        # re.ASCII pins \b and (?i) to the ASCII word/case semantics that
        # Java regex (engine rlike) and RE2 use by default
        bad_re = re.compile(_badwords_pattern(cfg.badwords), re.ASCII)

    if cfg.clf_weights_path:
        import math

        from data_quality_spark.ops.textops import (
            CLF_BUCKETS,
            py_clf_logits,
            stage_clf_weight_pairs,
        )
        from data_quality_spark.pipeline.expected import round_half_up

        wpdf = pd.read_parquet(cfg.clf_weights_path)
        wlist, bias6 = stage_clf_weight_pairs(
            zip(wpdf["b"], wpdf["w"]), CLF_BUCKETS
        )
        ns, logits = py_clf_logits(
            (t if isinstance(t, str) else None for t in extracted),
            wlist, bias6, CLF_BUCKETS, {},
        )
        out["clf_n_toks"] = ns
        out["clf_logit"] = logits
        out["clf_score"] = [
            None if lg is None
            else round_half_up(1.0 / (1.0 + math.exp(-lg)), 6)
            for lg in logits
        ]

    fired_col, keep_col = [], []
    for _, row in out.iterrows():
        empty = _is_empty(row["text_extracted"])
        fired: list[str] = []
        if empty:
            fired.append("text_not_empty")
        else:
            if not (cfg.min_words <= row["f_n_words"] <= cfg.max_words):
                fired.append("word_count")
            if not (cfg.min_mean_word_len <= row["f_mean_word_len"]
                    <= cfg.max_mean_word_len):
                fired.append("mean_word_len")
            if row["f_symbol_ratio"] > cfg.max_symbol_ratio:
                fired.append("symbol_ratio")
            if row["f_repeated_line_fraction"] > cfg.max_repeated_line_fraction:
                fired.append("repeated_lines")
            if row["f_stopword_density"] < cfg.min_stopword_density:
                fired.append("stopword_density")
            if row["ppl"] > cfg.max_perplexity:
                fired.append("perplexity")
            if row["lang_pred"] != row["lang"]:
                fired.append("lang_mismatch")
        if not empty and scrub.py_pii_found(row["text_extracted"]):
            fired.append("pii_found")
        # mirrors the engine's rule ORDER: the optional confidence rule sits
        # between pii_found and duplicate_url (quality_rules appends there)
        if (cfg.min_lang_margin is not None and not empty
                and row["lang_margin"] < cfg.min_lang_margin):
            fired.append("lang_low_confidence")
        if not _is_empty(row["url"]) and url_counts[str(row["url"])] > 1:
            fired.append("duplicate_url")
        # mirrors quality_rules order: host_blocklisted, then the optional
        # classifier gate, are appended last
        if cfg.blocked_hosts and not _is_empty(row["url"]):
            h = py_host_of(str(row["url"]))
            if h and any(h == b or h.endswith("." + b) for b in blocked_set):
                fired.append("host_blocklisted")
        if cfg.spam_fragments and not _is_empty(row["url"]):
            from data_quality_spark.ops.textops import py_url_spam_score

            if (py_url_spam_score(str(row["url"]), dict(cfg.spam_fragments))
                    >= cfg.spam_threshold):
                fired.append("url_spam")
        if cfg.host_rank_path and not _is_empty(row["url"]):
            hr = host_ranks.get(py_host_of(str(row["url"])))
            if hr is not None and hr < cfg.min_host_rank:
                fired.append("host_low_rank")
        if (bad_re is not None and not empty
                and bad_re.search(row["text_extracted"])):
            fired.append("badwords_found")
        if cfg.clf_weights_path and not empty:
            sc = row["clf_score"]
            if sc is not None and sc < cfg.clf_threshold:
                fired.append("clf_low_quality")
        if cfg.drop_noindex and extract.py_noindex(row["html"]):
            fired.append("meta_noindex")
        warn_only = {"pii_found", "lang_low_confidence"} | (
            {"lang_mismatch"} if not cfg.drop_lang_mismatch else set()
        )
        fails = [f for f in fired if f not in warn_only]
        fired_col.append(fired)
        keep_col.append(len(fails) == 0)

    out["fired_rules"] = fired_col
    out["keep"] = keep_col
    out["text_scrubbed"] = [
        scrub.py_scrub(t) if isinstance(t, str) else t for t in extracted
    ]
    return out
