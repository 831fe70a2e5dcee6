"""Deterministic Common-Crawl-style pages generator (input_hint schema:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Every row is a pure function of (seed, i): fault classes are assigned by
``i % 100`` at the FIXTURES.md fractions, so the expected keep/drop and fired
rules are known at generation time — the reference's marked-golden-corpus
style (test_df.xlsx `check_description` column) at scale. A ``fault_class``
column carries the mark; the pipeline never reads it.

Zipf-skewed hosts: two hosts dominate (~45% of rows) to exercise salting /
AQE skew handling at scale.
"""

from __future__ import annotations

import html as html_mod
import os
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from data_quality_spark.functions.langid import LANGS, SEED_WORDS

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

HOSTS = (
    ["big-portal.example", "mega-news.example"]  # skew: dominate together
    + [f"site-{i:02d}.example" for i in range(48)]
)

GIBBERISH_CHARS = "bcdfghjklmnpqrstvwxz"
SYMBOLS = "#@%^*~|<>+="

PII_SNIPPETS = [
    "x9q.w2e@mail-example.example",
    "4111-1111-1111-1111",
    "192.168.12.34",
    "+39 333 123 4567",
    "RSSMRA85T10A562S",
    "62.01.00",  # ATECO activity code (reference utils.py:5)
]


def escape_text(t: str, quotes: bool = False) -> str:
    t = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if quotes:
        t = t.replace('"', "&quot;").replace("'", "&#39;")
    return t


def make_html(text: str, variant: str = "main") -> bytes:
    """variant='main': normal page, paragraphs inside <main>.
    'no_main': no <main> element at all (extraction yields NULL → pipeline
    falls back to the raw text column). 'empty_main': a present-but-empty
    <main></main> (extraction yields "" → empty-text rule fires).
    Real-HTML classes (round 3): 'attr_main' — <main>/<p> carry attributes;
    'upper_tags' — uppercase <MAIN>/<P>; 'entities' — quotes/apostrophes in
    the text escaped as &quot;/&#39; (extraction must restore them)."""
    quotes = variant == "entities"
    p_open = '<P CLASS="t">' if variant == "upper_tags" else (
        '<p class="para">' if variant == "attr_main" else "<p>"
    )
    p_close = "</P>" if variant == "upper_tags" else "</p>"
    body = "".join(
        f"{p_open}{escape_text(line, quotes)}{p_close}" for line in text.split("\n")
    )
    if variant == "no_main":
        middle = body
    elif variant == "empty_main":
        middle = f"<main></main><aside>{body}</aside>"
    elif variant == "attr_main":
        middle = f'<main class="content" id="m" data-x="1">{body}</main>'
    elif variant == "upper_tags":
        middle = f"<MAIN>{body}</MAIN>"
    else:
        middle = f"<main>{body}</main>"
    page = (
        "<html><head><title>page</title><style>.x{color:red}</style>"
        "<script>var a=1;</script></head><body>"
        '<nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        f"{middle}"
        "<footer>&copy; example inc</footer></body></html>"
    )
    return page.encode("utf-8")


def _host(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.25:
        return HOSTS[0]
    if r < 0.45:
        return HOSTS[1]
    return HOSTS[2 + rng.randrange(48)]


def _clean_words(rng: random.Random, lang: str, n: int) -> list[str]:
    vocab = SEED_WORDS[lang]
    return [vocab[rng.randrange(len(vocab))] for _ in range(n)]


def _lines(words: list[str], per_line: int = 10) -> str:
    return "\n".join(
        " ".join(words[i : i + per_line]) for i in range(0, len(words), per_line)
    )


def gen_row(i: int, seed: int = 42) -> dict:
    rng = random.Random((seed << 32) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))
    lang = LANGS[i % len(LANGS)]
    cls = i % 100
    host = _host(rng)
    url = f"https://{host}/docs/{seed}-{i}"
    warc_ts = EPOCH + timedelta(seconds=i * 7 % (86400 * 365), microseconds=i % 1000)

    def clean_text(n_lo=30, n_hi=80, language=lang):
        return _lines(_clean_words(rng, language, rng.randint(n_lo, n_hi)))

    fault = "clean"
    text: str | None = clean_text()
    if cls == 43:
        fault = "attr_main"  # <main class=...>/<p class=...>: must extract
    elif cls == 44:
        fault = "upper_tags"  # <MAIN>/<P> uppercase: must extract
    elif cls == 45:
        # quotes in the text, &quot;/&#39;-escaped in the html: extraction
        # must restore them byte-identically
        fault = "entities"
        words = _clean_words(rng, lang, rng.randint(30, 60))
        words.insert(rng.randrange(len(words)), '"quoted"')
        words.insert(rng.randrange(len(words)), "it's")
        text = _lines(words)
    elif cls == 46:
        fault = "no_main"  # html exists but has no <main>: text fallback
    elif cls == 47:
        fault = "empty_main"  # <main></main> present but empty: "" extract
    elif 50 <= cls < 60:
        fault = "length"
        if cls % 2 == 0:
            text = _lines(_clean_words(rng, lang, 3))  # too short
        else:
            text = _lines(_clean_words(rng, lang, 2400))  # too long
    elif 60 <= cls < 68:
        fault = "symbol_spam"
        words = _clean_words(rng, lang, 40)
        spam = ["".join(rng.choice(SYMBOLS) for _ in range(rng.randint(2, 5)))
                for _ in range(60)]
        mixed = words + spam
        rng.shuffle(mixed)
        text = _lines(mixed)
    elif 68 <= cls < 76:
        fault = "repeated_lines"
        line = " ".join(_clean_words(rng, lang, 10))
        text = "\n".join([line] * 12 + [" ".join(_clean_words(rng, lang, 10))])
    elif 76 <= cls < 84:
        fault = "gibberish"
        words = [
            "".join(rng.choice(GIBBERISH_CHARS) for _ in range(rng.randint(4, 12)))
            for _ in range(rng.randint(30, 80))
        ]
        text = _lines(words)
    elif 84 <= cls < 92:
        fault = "wrong_lang"
        other = LANGS[(i + 2) % len(LANGS)]
        text = clean_text(language=other)
    elif 92 <= cls < 98:
        fault = "pii"
        words = _clean_words(rng, lang, rng.randint(30, 60))
        for _ in range(rng.randint(1, 3)):
            words.insert(rng.randrange(len(words)), rng.choice(PII_SNIPPETS))
        text = _lines(words)
    elif cls == 98:
        fault = "empty"
        text = None if i % 2 == 0 else ""
    elif cls == 99:
        fault = "duplicate_url"
        # exact copy of row i-1's url: replay its rng's first draw (the host)
        prev_rng = random.Random(
            (seed << 32) ^ ((i - 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF)
        )
        url = f"https://{_host(prev_rng)}/docs/{seed}-{i - 1}"

    variant = (
        fault
        if fault in ("no_main", "empty_main", "attr_main", "upper_tags", "entities")
        else "main"
    )
    html = (
        None
        if (fault == "empty" and i % 4 == 0)
        else make_html(text or "", variant)
    )
    return {
        "url": url,
        "warc_ts": warc_ts.replace(tzinfo=None),
        "html": html,
        "text": text,
        "lang": lang,
        "fault_class": fault,
    }


def generate_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    return pd.DataFrame([gen_row(i, seed) for i in range(n_rows)])


def write_parquet(
    path: str, n_rows: int, seed: int = 42, n_files: int | None = None
) -> str:
    """Write the fixture with an explicit arrow schema (html as binary).

    Splits into multiple part files (like any real lake table) so Spark gets
    parallel input splits — a single-file single-row-group parquet is
    unsplittable and serializes the whole read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if n_files is None:
        n_files = max(1, min(32, n_rows // 4000))
    pdf = generate_pandas(n_rows, seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("fault_class", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    if n_files == 1:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(table, path)
        return path
    os.makedirs(path, exist_ok=True)
    step = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))
    return path


def main():  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(write_parquet(a.out, a.rows, a.seed))


if __name__ == "__main__":  # pragma: no cover
    main()
