"""Deterministic synthetic `pages` corpus with planted duplicate clusters.

Implements FIXTURES.md §1-2 — the webtext analog of the reference's
synthetic-feature fixture (5 planted groups of sizes 8/6/5/4/3 with
controlled noise, ``/root/reference/tests/performance/test_comprehensive.py:30-114``).

Schema is exactly the BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)
plus a ground-truth table (url, expected_cluster_id, expected_is_dup).

Everything is seeded (seed=42 by default); no wall clock anywhere.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

import numpy as np

EPOCH = datetime.datetime(2025, 1, 1, 0, 0, 0)

_VOCAB_SYLLABLES = [
    "ka", "ro", "mi", "ta", "lu", "ne", "si", "va", "do", "pe",
    "gar", "len", "tos", "mur", "bel", "rin", "sol", "dak", "fen", "vor",
]


def _make_vocab(rng: np.random.RandomState, size: int = 5000) -> list[str]:
    vocab = []
    seen = set()
    while len(vocab) < size:
        n = rng.randint(2, 5)
        w = "".join(_VOCAB_SYLLABLES[rng.randint(0, len(_VOCAB_SYLLABLES))] for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


@dataclass
class PagesFixture:
    rows: list[dict]          # pages rows
    truth: list[dict]         # url -> expected cluster

    @property
    def n_rows(self) -> int:
        return len(self.rows)


def _body(rng: np.random.RandomState, vocab: list[str], n_tokens: int) -> list[str]:
    idx = rng.randint(0, len(vocab), size=n_tokens)
    return [vocab[i] for i in idx]


def _mutate(rng: np.random.RandomState, vocab: list[str], toks: list[str], frac: float) -> list[str]:
    out = list(toks)
    n_mut = max(1, int(len(toks) * frac))
    pos = rng.choice(len(toks), size=n_mut, replace=False)
    for p in pos:
        out[p] = vocab[rng.randint(0, len(vocab))]
    return out


def render_html(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")


def expected_text(title: str, body: str) -> str:
    """The oracle extraction: title + newline + paragraph text (must equal
    functions.text.extract_text byte-for-byte)."""
    return f"{title}\n{body}"


def generate_pages(
    n_rows: int = 300,
    seed: int = 42,
    skew_cluster_size: int | None = None,
) -> PagesFixture:
    """Planted structure (scaled to n_rows, FIXTURES.md §2):

    - exact duplicates:       5 clusters x 4 members (identical body)
    - near-dup light edit:    clusters of sizes 8/6/5/4/3 (1-3% token edits)
    - boilerplate wrap:       3 clusters x 3 (same core, different wrap)
    - containment pairs:      5 clusters x 2 (B = A + 50% appended)
    - hard negatives:         10 x 2 docs sharing ~30% tokens (must NOT merge)
    - skew bomb:              one near-identical tiny-page cluster
                              (default size: max(50, n_rows//10)) — hot band key
    - unique filler:          remainder
    """
    rng = np.random.RandomState(seed)
    vocab = _make_vocab(rng)
    rows: list[dict] = []
    truth: list[dict] = []
    doc_id = 0

    def add_row(cluster: str, is_dup: bool, title: str, body_toks: list[str], lang: str = "en"):
        nonlocal doc_id
        site = rng.randint(0, 50)
        url = f"https://site{site:04d}.example/p/{doc_id:06d}"
        body = " ".join(body_toks)
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + datetime.timedelta(seconds=int(doc_id)),
                "html": render_html(title, body),
                "text": expected_text(title, body),
                "lang": lang,
            }
        )
        truth.append(
            {"url": url, "expected_cluster_id": cluster, "expected_is_dup": is_dup}
        )
        doc_id += 1

    # 1. exact duplicates: 5 x 4
    for c in range(5):
        base = _body(rng, vocab, 120)
        title = f"exact cluster {c}"
        for _ in range(4):
            add_row(f"exact_{c}", True, title, base)

    # 2. near-duplicates with light edits: sizes 8/6/5/4/3
    for c, size in enumerate([8, 6, 5, 4, 3]):
        base = _body(rng, vocab, 400)
        title = f"near cluster {c}"
        add_row(f"near_{c}", True, title, base)
        for _ in range(size - 1):
            frac = rng.uniform(0.01, 0.02)
            add_row(f"near_{c}", True, title, _mutate(rng, vocab, base, frac))

    # 3. boilerplate wrap: 3 x 3 (same 300-token core, distinct 30-token wraps)
    for c in range(3):
        core = _body(rng, vocab, 300)
        for m in range(3):
            head = _body(rng, vocab, 15)
            tail = _body(rng, vocab, 15)
            add_row(f"wrap_{c}", True, f"wrapped {c}", head + core + tail)

    # 4. containment pairs: 5 x 2
    for c in range(5):
        base = _body(rng, vocab, 200)
        extra = _body(rng, vocab, 100)
        title = f"contain {c}"
        add_row(f"contain_{c}", True, title, base)
        add_row(f"contain_{c}", True, title, base + extra)

    # 5. hard negatives: 10 x 2 sharing ~30% tokens (each its own singleton cluster)
    for c in range(10):
        shared = _body(rng, vocab, 60)
        for m in range(2):
            own = _body(rng, vocab, 140)
            mixed = []
            si = iter(shared)
            for i, tok in enumerate(own):
                mixed.append(tok)
                if i % 3 == 2:
                    try:
                        mixed.append(next(si))
                    except StopIteration:
                        pass
            add_row(f"hardneg_{c}_{m}", False, f"hardneg {c} {m}", mixed)

    # 6. skew bomb: one giant near-identical tiny-page cluster (hot band key)
    skew_n = skew_cluster_size if skew_cluster_size is not None else max(50, n_rows // 10)
    err_body = ["page", "not", "found", "error", "404", "return", "home"]
    for m in range(skew_n):
        toks = list(err_body)
        if m % 7 == 1:
            toks.append(vocab[rng.randint(0, 100)])
        add_row("skew_404", True, "404 not found", toks)

    # 7. unique filler to n_rows (a few non-en rows exercise lang filtering)
    while doc_id < n_rows:
        lang = "en" if rng.uniform() < 0.95 else ("de" if rng.uniform() < 0.5 else "fr")
        add_row(f"uniq_{doc_id}", False, f"unique {doc_id}", _body(rng, vocab, rng.randint(50, 300)), lang)

    return PagesFixture(rows=rows, truth=truth)


PAGES_DDL_COLS = ["url", "warc_ts", "html", "text", "lang"]


def pages_dataframe(spark, fixture: PagesFixture):
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
        ]
    )
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in fixture.rows],
        schema,
    )


def truth_dataframe(spark, fixture: PagesFixture):
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("expected_cluster_id", StringType(), False),
            StructField("expected_is_dup", BooleanType(), False),
        ]
    )
    return spark.createDataFrame(
        [
            (t["url"], t["expected_cluster_id"], t["expected_is_dup"])
            for t in fixture.truth
        ],
        schema,
    )
