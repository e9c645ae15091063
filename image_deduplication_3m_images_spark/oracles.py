"""DuckDB oracle SQL for every query in ``plans/queries.py``.

The SQL re-derives the signature math from first principles (md5-based
shingle hashes, affine MinHash permutations as a VALUES table, SimHash bit
majorities, LSH band keys, recursive-CTE connected components) so the driver
can verify the Spark pipeline's results bit-for-bit without running any of
our Python.  All constants are emitted from the same pinned DedupConfig the
Spark side uses.
"""

from __future__ import annotations

import math

from image_deduplication_3m_images_spark.config import MINHASH_PRIME, DedupConfig
from image_deduplication_3m_images_spark.functions.signature_core import HORNER_C

CFG = DedupConfig()


def _perm_values(cfg: DedupConfig) -> str:
    return ", ".join(
        f"({j}, {a}::BIGINT, {b}::BIGINT)"
        for j, (a, b) in enumerate(zip(cfg.perm_a, cfg.perm_b))
    )


def signature_ctes(cfg: DedupConfig = CFG, docs: str = "documents") -> str:
    """Shared WITH-body (no leading WITH): toks/sh/hashed/perms/mh/nsh/sim."""
    k = cfg.shingle_k
    horner = (
        "(acc, x) -> CAST((acc::HUGEINT * "
        f"{HORNER_C} + x::HUGEINT) % 18446744073709551616 AS UBIGINT)"
    )
    return f"""
toks AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM {docs}
),
tokhash AS (
  SELECT doc_id,
         list_transform(toks, t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS th,
         len(toks) AS n
  FROM toks
),
sh AS (
  SELECT doc_id,
    CASE WHEN n = 0 THEN [0::UBIGINT]
         WHEN n < {k} THEN [list_reduce(th, {horner})]
         ELSE list_transform(range(1, n - {k - 2}),
                             i -> list_reduce(th[i:i+{k - 1}], {horner}))
         END AS shingles
  FROM tokhash
),
hashed AS (
  SELECT doc_id, (h64 >> 32)::BIGINT AS h32, h64
  FROM (SELECT doc_id, unnest(shingles) AS h64 FROM sh)
),
perms AS (SELECT * FROM (VALUES {_perm_values(cfg)}) AS t(j, a, b)),
mh AS (
  SELECT doc_id, j, min((a * h32 + b) % {MINHASH_PRIME}) AS v
  FROM hashed CROSS JOIN perms GROUP BY doc_id, j
),
nsh AS (
  SELECT doc_id,
         (CASE WHEN len(toks) >= {k} THEN len(toks) - {k - 1} ELSE 1 END)::INT AS n_shingles
  FROM toks
),
simbits AS (
  SELECT doc_id, b, sum(((h64 >> b) & 1)::BIGINT) AS ones, count(*) AS n
  FROM hashed CROSS JOIN (SELECT unnest(range(0, {cfg.simhash_bits})) AS b)
  GROUP BY doc_id, b
),
sim_u AS (
  SELECT doc_id,
    sum(CASE WHEN 2 * ones > n THEN (1::UBIGINT << b::INT)::HUGEINT ELSE 0::HUGEINT END) AS u
  FROM simbits GROUP BY doc_id
),
sim AS (
  SELECT doc_id,
    (CASE WHEN u >= 9223372036854775808::HUGEINT
          THEN u - 18446744073709551616::HUGEINT ELSE u END)::BIGINT AS simhash
  FROM sim_u
)"""


def band_ctes(cfg: DedupConfig = CFG) -> str:
    """bands + candidate pairs (appended after signature_ctes)."""
    return f""",
bands AS (
  SELECT doc_id, (j // {cfg.rows_per_band})::INT AS band_id,
         ('0x' || substr(md5(array_to_string(list(v ORDER BY j), '_')), 1, 15))::BIGINT AS band_key
  FROM mh GROUP BY doc_id, j // {cfg.rows_per_band}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(DISTINCT a.band_id) AS n_bands
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)"""


def verify_ctes(cfg: DedupConfig = CFG, docs: str = "documents") -> str:
    min_matches = math.ceil(cfg.jaccard_threshold * cfg.num_perm)
    return f""",
matches AS (
  SELECT p.id_a, p.id_b, sum((ma.v = mb.v)::INT)::INT AS sig_matches
  FROM cand p
  JOIN mh ma ON ma.doc_id = p.id_a
  JOIN mh mb ON mb.doc_id = p.id_b AND mb.j = ma.j
  GROUP BY p.id_a, p.id_b
),
vpairs AS (
  SELECT m.id_a, m.id_b, m.sig_matches,
         bit_count(xor(sa.simhash, sb.simhash))::INT AS hamming,
         (contains(da.text, db.text) OR contains(db.text, da.text)) AS containment
  FROM matches m
  JOIN sim sa ON sa.doc_id = m.id_a
  JOIN sim sb ON sb.doc_id = m.id_b
  JOIN {docs} da ON da.doc_id = m.id_a
  JOIN {docs} db ON db.doc_id = m.id_b
),
verified AS (
  SELECT *, (sig_matches >= {min_matches} OR hamming <= {cfg.hamming_max} OR containment) AS verified
  FROM vpairs
)"""


def cluster_ctes(docs: str = "documents") -> str:
    """Connected components over verified edges via recursive transitive
    closure (small graphs only — it IS the oracle, not the engine)."""
    return f""",
edges AS (SELECT id_a, id_b FROM verified WHERE verified),
sym AS (SELECT id_a AS a, id_b AS b FROM edges UNION SELECT id_b, id_a FROM edges),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
clusters AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM {docs} d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)"""


_QUALITY_SQL = """
(least(50.0, length(text)::DOUBLE / 10.0)
 + (CASE WHEN length(text) > 0
         THEN length(regexp_replace(text, '[^a-z0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE
         ELSE 0.0 END) * 25.0
 + (CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
         THEN len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))::DOUBLE
              / len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE
         ELSE 0.0 END) * 25.0)
"""


def _signlsh_bucket_sql(vec: str, planes) -> str:
    """Sign-LSH bucket id as a DuckDB expression over the SAME literal
    hyperplanes the Spark side uses (operators/similarity.py:signlsh_bucket_expr):
    bit i = (vec . plane_i >= 0), dot evaluated as list_sum of pairwise
    double products — the accumulation order Spark's aggregate() fold uses.
    """
    bits = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        dot = (
            f"list_sum(list_transform(list_zip({vec}, {lit}::DOUBLE[]), "
            "p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::BIGINT"


def _signlsh_topk_sql(
    n_planes: int = 5, n_tables: int = 8, dim: int = 64, k: int = 5, seed: int = 7
) -> str:
    """Oracle for the bucketed ANN query: identical per-table hyperplane
    literals, Hamming-1 multiprobe (query bucket plus each one-bit flip per
    table), DISTINCT over cross-table candidate dups, exact cosine + top-k —
    mirrors signlsh_topk(n_planes=5, n_tables=8, multiprobe=True) exactly."""
    from image_deduplication_3m_images_spark.operators.similarity import hyperplanes

    tables = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    c_parts = []
    q_parts = []
    for t, planes in enumerate(tables):
        c_parts.append(
            f"SELECT neighbor_id, cv, {t} AS tab, "
            f"{_signlsh_bucket_sql('cv', planes)} AS bucket "
            "FROM (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings)"
        )
        probe_list = "[b" + "".join(
            f", xor(b, {1 << i})" for i in range(n_planes)
        ) + "]"
        q_parts.append(
            f"SELECT query_id, qv, {t} AS tab, unnest({probe_list}) AS bucket "
            f"FROM (SELECT query_id, qv, {_signlsh_bucket_sql('qv', planes)} AS b "
            "FROM (SELECT vec_id AS query_id, embedding AS qv "
            "FROM embeddings WHERE vec_id < 10))"
        )
    c_union = " UNION ALL ".join(c_parts)
    q_union = " UNION ALL ".join(q_parts)
    return f"""
        WITH c AS ({c_union}),
        q AS ({q_union}),
        scored AS (
          SELECT DISTINCT query_id, neighbor_id,
            list_sum(list_transform(list_zip(qv, cv), p -> p[1]::DOUBLE * p[2]::DOUBLE))
              / NULLIF(sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))
               * sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))), 0) AS cosine
          FROM c JOIN q USING (tab, bucket) WHERE neighbor_id <> query_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, rank::INT AS rank, cosine FROM ranked WHERE rank <= {k}
    """


def _signlsh_neardup_sql(
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 7,
    threshold: float = 0.4,
) -> str:
    """Oracle for the LSH near-dup pair query: identical per-table
    hyperplane literals, self-join USING (tab, bucket) with id_a < id_b,
    exact cosine filter, DISTINCT over cross-table collision dups —
    mirrors signlsh_neardup_pairs(n_planes=4, n_tables=8) exactly."""
    from image_deduplication_3m_images_spark.operators.similarity import hyperplanes

    tables = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    parts = [
        f"SELECT id, vec, {t} AS tab, {_signlsh_bucket_sql('vec', planes)} AS bucket "
        "FROM (SELECT vec_id AS id, embedding AS vec FROM embeddings)"
        for t, planes in enumerate(tables)
    ]
    c_union = " UNION ALL ".join(parts)
    return f"""
        WITH c AS ({c_union}),
        scored AS (
          SELECT a.id AS id_a, b.id AS id_b,
            list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1]::DOUBLE * p[2]::DOUBLE))
              / NULLIF(sqrt(list_sum(list_transform(a.vec, x -> x::DOUBLE * x::DOUBLE)))
               * sqrt(list_sum(list_transform(b.vec, x -> x::DOUBLE * x::DOUBLE))), 0) AS cosine
          FROM c a JOIN c b USING (tab, bucket) WHERE a.id < b.id
        )
        SELECT DISTINCT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
    """


# Media fixture derivation (mirrors functions/multimodal.py): payload =
# UTF-8 bytes of documents.text with planted duplicates (id % 10 == 9 copies
# id - 9), kind = doc_id % 3 (0=image,1=video,2=audio), fake decode = pure
# function of md5(payload):
#   width  = 64 + bytes[0:2] % 1984,  height = 64 + bytes[2:4] % 1984,
#   phash64 = bytes[4:12] big-endian SIGNED.
_MEDIA_CTE = """
media AS (
  SELECT d.doc_id AS media_id, d.doc_id % 3 AS kind3,
         coalesce(s.text, d.text) AS payload_text
  FROM documents d LEFT JOIN documents s
    ON s.doc_id = CASE WHEN d.doc_id % 10 = 9 AND d.doc_id >= 9
                       THEN d.doc_id - 9 ELSE d.doc_id END
)
"""

_MEDIA_FEATURES_CTE = _MEDIA_CTE + """,
feats AS (
  SELECT media_id, n_bytes,
         64 + ('0x' || substr(h, 1, 4))::INT % 1984 AS width,
         64 + ('0x' || substr(h, 5, 4))::INT % 1984 AS height,
         CASE WHEN ('0x' || substr(h, 9, 16))::UBIGINT >= 9223372036854775808::UBIGINT
              THEN (('0x' || substr(h, 9, 16))::UBIGINT::HUGEINT
                    - 18446744073709551616::HUGEINT)::BIGINT
              ELSE ('0x' || substr(h, 9, 16))::UBIGINT::BIGINT END AS phash64
  FROM (
    -- md5(VARCHAR) hashes the string's UTF-8 bytes == md5 of the payload
    SELECT media_id, md5(payload_text) AS h,
           octet_length(encode(payload_text))::INT AS n_bytes
    FROM media WHERE kind3 = 0
  )
)
"""


def _media_dedup_sql(radius: int = 3) -> str:
    """Oracle for Hamming-radius phash blocking: brute-force all-pairs with
    bit_count filter — O(n^2) is fine at oracle scale and is deliberately a
    DIFFERENT algorithm than the engine's pigeonhole blocking (stronger
    check: blocking must find exactly the pairs brute force finds)."""
    return f"""
        WITH {_MEDIA_FEATURES_CTE.strip()}
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               bit_count(xor(a.phash64, b.phash64))::INT AS hamming
        FROM feats a JOIN feats b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.phash64, b.phash64)) <= {radius}
    """


# Registered-domain CTE for the synthetic-URL queries.  Deliberately NOT a
# re-run of the Spark side's regex pipeline: `plans/queries.py:_synth_urls`
# builds a raw url (scheme + optional blog./www. subdomain + siteN.tld +
# path) and `url_domain_expr` regex-extracts the last two host labels; this
# oracle derives the same registered domain straight from the doc_id rule,
# so the extraction regexes are independently checked, not mirrored.
# Shared CTE chain for the span-level substring-dedup oracles: brute-force
# all-grams (positions 1-based), positions shared with any LOWER-id doc,
# then gaps-and-islands interval merge.  The Spark side
# (`operators/substring.py:duplicated_spans`) uses 0-based positions; every
# oracle built on this compares only base-invariant quantities (lengths,
# counts, reconstructed strings).
_SPAN_ISLAND_CTES = """
            g AS (
              SELECT doc_id, i::BIGINT AS pos, substr(text, i::INT, 40) AS gram
              FROM (SELECT doc_id, text,
                           unnest(range(1, greatest(length(text) - 38, 1))) AS i
                    FROM documents)
            ), shared AS (
              SELECT DISTINCT gb.doc_id, gb.pos
              FROM g gb JOIN g ga ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
            ), m AS (
              SELECT doc_id, pos,
                     max(pos + 40) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_end
              FROM shared
            ), isl AS (
              SELECT doc_id, pos,
                     sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                              THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos
                     ) AS island
              FROM m
            )
"""

_SYNTH_URL_CTE = """
    SELECT doc_id, lang, n_chars,
           'site' || (doc_id % 6)::VARCHAR ||
           CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
                           WHEN 2 THEN '.net' ELSE '.io' END AS domain
    FROM documents
"""


def oracle_sql_map(cfg: DedupConfig = CFG) -> dict[str, str]:
    sig = "WITH RECURSIVE " + signature_ctes(cfg).lstrip()
    sig_bands = sig + band_ctes(cfg)
    sig_verified = sig_bands + verify_ctes(cfg)
    sig_clusters = sig_verified + cluster_ctes()

    lang_scores = {
        "en": ("the", "and", "of", "to", "a", "in", "is"),
        "de": ("der", "die", "das", "und", "ist", "nicht"),
        "fr": ("le", "la", "les", "et", "est", "une"),
        "es": ("el", "los", "las", "es", "una", "y"),
    }

    def score_expr(langwords):
        inlist = ", ".join(f"'{w}'" for w in langwords)
        return (
            "len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),"
            f" t -> list_contains([{inlist}], t)))::INT"
        )

    s_en, s_de, s_fr, s_es = (score_expr(lang_scores[x]) for x in ("en", "de", "fr", "es"))

    return {
        "event_windows": """
            SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   sum(round(value * 100, 0)::BIGINT)::BIGINT AS total_cents
            FROM events GROUP BY 1, 2
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus, count(*) AS count_order,
                   sum(round(l_quantity * 100, 0)::BIGINT)::BIGINT AS sum_qty_cents,
                   sum(round(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_price_cents,
                   sum(round(l_discount * 100, 0)::BIGINT)::BIGINT AS sum_disc_cents
            FROM lineitem GROUP BY 1, 2
        """,
        "top_nations": """
            SELECT n_name, count(*) AS n_orders,
                   sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY revenue_cents DESC, n_name ASC LIMIT 10
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
                   min(doc_id) AS min_doc
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "signature_digest": sig
        + """
            SELECT n.doc_id, n.n_shingles,
                   m.sig_min, m.sig_sum, m.sig_first, m.sig_last, s.simhash
            FROM nsh n
            JOIN (SELECT doc_id, min(v) AS sig_min, sum(v)::BIGINT AS sig_sum,
                         min(CASE WHEN j = 0 THEN v END) AS sig_first,
                         min(CASE WHEN j = 127 THEN v END) AS sig_last
                  FROM mh GROUP BY doc_id) m USING (doc_id)
            JOIN sim s USING (doc_id)
        """,
        "token_stats": """
            SELECT doc_id, length(text)::INT AS n_chars,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))::INT AS n_tokens_ws,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::INT AS n_tokens_bpe
            FROM documents
        """,
        "quality": f"SELECT doc_id, round({_QUALITY_SQL}, 6) AS quality FROM documents",
        "repetition_stats": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents
            ), base AS (
              SELECT doc_id, len(toks)::INT AS n_tokens,
                     len(list_distinct(toks))::INT AS n_distinct, toks
              FROM toks
            ), bg AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i+1])) AS bigram
              FROM toks WHERE len(toks) >= 2
            ), bgc AS (
              SELECT doc_id, max(c)::INT AS top_bigram_count, sum(c)::INT AS n_bigrams
              FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
              GROUP BY 1
            )
            SELECT b.doc_id, b.n_tokens, b.n_distinct,
                   coalesce(bgc.n_bigrams, 0) AS n_bigrams,
                   coalesce(bgc.top_bigram_count, 0) AS top_bigram_count,
                   CASE WHEN b.n_tokens = 0 THEN 0.0
                        ELSE 1.0 - b.n_distinct / CAST(b.n_tokens AS DOUBLE)
                   END AS dup_token_frac,
                   CASE WHEN bgc.n_bigrams IS NULL THEN 0.0
                        ELSE bgc.top_bigram_count / CAST(bgc.n_bigrams AS DOUBLE)
                   END AS top_bigram_frac
            FROM base b LEFT JOIN bgc ON b.doc_id = bgc.doc_id
        """,
        "boilerplate_ngrams": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            || ' ' || toks[i+3] || ' ' || toks[i+4])) AS ngram
              FROM toks WHERE len(toks) >= 5
            ), per_doc AS (
              SELECT ngram, doc_id, count(*) AS c FROM grams GROUP BY 1, 2
            )
            SELECT ngram, count(*)::BIGINT AS n_docs, sum(c)::BIGINT AS n_occurrences
            FROM per_doc GROUP BY ngram HAVING count(*) >= 3
        """,
        "langid": f"""
            WITH scored AS (
              SELECT doc_id, {s_en} AS score_en, {s_de} AS score_de,
                     {s_fr} AS score_fr, {s_es} AS score_es
              FROM documents
            )
            SELECT doc_id,
              CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
                   WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                   WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                   WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                   ELSE 'es' END AS lang_pred,
              score_en, score_de, score_fr, score_es
            FROM scored
        """,
        "fingerprint": """
            SELECT doc_id, sha256(text) AS text_sha256,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp64
            FROM documents
        """,
        "exact_dedup": """
            SELECT doc_id, sha256(text) AS text_sha256,
                   min(doc_id) OVER (PARTITION BY sha256(text)) AS cluster_id,
                   count(*) OVER (PARTITION BY sha256(text)) AS cluster_size,
                   (doc_id = min(doc_id) OVER (PARTITION BY sha256(text))) AS is_best
            FROM documents
        """,
        "lsh_bands": sig_bands + "SELECT doc_id, band_id, band_key FROM bands",
        "candidate_pairs": sig_bands + "SELECT id_a, id_b, n_bands FROM cand",
        "verified_pairs": sig_verified
        + "SELECT id_a, id_b, sig_matches, hamming, containment, verified FROM verified",
        "containment_pairs": sig_verified
        + "SELECT id_a, id_b, containment FROM vpairs",
        "dup_clusters": sig_clusters + "SELECT doc_id, cluster_id FROM clusters",
        "best_pick": sig_clusters
        + f""",
            quality AS (SELECT doc_id, round({_QUALITY_SQL}, 6) AS quality FROM documents),
            sized AS (
              SELECT c.doc_id, c.cluster_id, q.quality,
                     count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY q.quality DESC, c.doc_id ASC) AS rn
              FROM clusters c JOIN quality q USING (doc_id)
            )
            SELECT doc_id, cluster_id, quality, cluster_size, (rn = 1) AS is_best FROM sized
        """,
        "group_stats": sig_clusters
        + """,
            sizes AS (SELECT cluster_id, count(*) AS size FROM clusters GROUP BY cluster_id)
            SELECT count(*) AS n_clusters, sum(size)::BIGINT AS n_docs,
                   sum((size > 1)::INT)::BIGINT AS n_dup_clusters,
                   sum(CASE WHEN size > 1 THEN size - 1 ELSE 0 END)::BIGINT AS n_redundant_docs,
                   max(size) AS max_cluster_size
            FROM sizes
        """,
        "simhash_pairs": sig
        + """,
            chunks AS (
              SELECT doc_id, simhash, c AS chunk_id,
                     (simhash >> (16 * c)) & 65535 AS chunk
              FROM sim CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.simhash, b.simhash))::INT AS hamming
            FROM chunks a JOIN chunks b
              ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "ngram_jaccard": sig_bands
        + """,
            grams AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                        i -> array_to_string(toks[i:i+2], ' ')))
                     ELSE [array_to_string(toks, ' ')] END AS g
              FROM toks
            )
            SELECT c.id_a, c.id_b,
                   len(list_intersect(ga.g, gb.g))::INT AS n_intersect,
                   (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)))::INT AS n_union,
                   round(len(list_intersect(ga.g, gb.g))::DOUBLE
                         / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)))::DOUBLE, 6) AS jaccard
            FROM cand c JOIN grams ga ON ga.doc_id = c.id_a JOIN grams gb ON gb.doc_id = c.id_b
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            scored AS (
              SELECT query_id, neighbor_id,
                list_sum(list_transform(list_zip(qv, cv), p -> p[1]::DOUBLE * p[2]::DOUBLE))
                  / NULLIF(sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))
                   * sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))), 0) AS cosine
              FROM c CROSS JOIN q WHERE neighbor_id <> query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank::INT AS rank, cosine FROM ranked WHERE rank <= 5
        """,
        "embedding_topk_lsh": _signlsh_topk_sql(),
        "embedding_neardup": _signlsh_neardup_sql(),
        "quality_funnel": f"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents
            ), b AS (
              SELECT
                (len(toks) >= 10) AS r0,
                (CASE WHEN len(toks) > 0
                      THEN round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                                 / len(toks), 6)
                      ELSE 0.0 END) BETWEEN 2.0 AND 12.0 AS r1,
                (CASE WHEN length(text) > 0
                      THEN round(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))::DOUBLE
                                 / length(text), 6)
                      ELSE 0.0 END) >= 0.5 AS r2,
                (CASE WHEN len(toks) > 0
                      THEN round(len(list_distinct(toks))::DOUBLE / len(toks), 6)
                      ELSE 0.0 END) >= 0.3 AS r3,
                (round({_QUALITY_SQL}, 6) >= 40.0) AS r4
              FROM t
            ), a AS (
              SELECT
                sum((NOT r0)::INT)::BIGINT AS f0, sum(r0::INT)::BIGINT AS c0,
                sum((NOT r1)::INT)::BIGINT AS f1, sum((r0 AND r1)::INT)::BIGINT AS c1,
                sum((NOT r2)::INT)::BIGINT AS f2, sum((r0 AND r1 AND r2)::INT)::BIGINT AS c2,
                sum((NOT r3)::INT)::BIGINT AS f3, sum((r0 AND r1 AND r2 AND r3)::INT)::BIGINT AS c3,
                sum((NOT r4)::INT)::BIGINT AS f4, sum((r0 AND r1 AND r2 AND r3 AND r4)::INT)::BIGINT AS c4
              FROM b
            )
            SELECT 'min_tokens' AS rule, f0 AS n_fail, c0 AS n_pass_cum FROM a
            UNION ALL SELECT 'mean_word_len', f1, c1 FROM a
            UNION ALL SELECT 'alpha_ratio', f2, c2 FROM a
            UNION ALL SELECT 'lexical_diversity', f3, c3 FROM a
            UNION ALL SELECT 'quality_score', f4, c4 FROM a
        """,
        "semantic_clusters": f"""
            WITH RECURSIVE pairs AS ({_signlsh_neardup_sql()}),
            sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT e.vec_id,
                   least(e.vec_id, coalesce(min(r.b), e.vec_id))::BIGINT AS cluster_id
            FROM embeddings e LEFT JOIN reach r ON r.a = e.vec_id
            GROUP BY e.vec_id
        """,
        "brand_revenue": """
            SELECT r_name, n_name, p_brand,
                   count(*)::BIGINT AS n_items,
                   sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
                   sum(l_quantity) AS sum_qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey AND p_size < 15
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            GROUP BY r_name, n_name, p_brand
        """,
        "no_f_customers": """
            SELECT c_custkey, c_name, c_mktsegment, c_acctbal
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
            )
        """,
        "user_sessions": """
            WITH x AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            y AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS s
              FROM x
            )
            SELECT user_id, s::INT AS session_idx,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*)::INT AS n_events,
                   sum(round(value * 100, 0)::BIGINT)::BIGINT AS value_cents
            FROM y GROUP BY user_id, s
        """,
        "group_avg_sim": sig_clusters
        + f"""
            SELECT ca.cluster_id,
                   count(*)::BIGINT AS n_scored_pairs,
                   round(avg(v.sig_matches::DOUBLE / {cfg.num_perm}.0), 6) AS avg_similarity
            FROM verified v
            JOIN clusters ca ON ca.doc_id = v.id_a
            JOIN clusters cb ON cb.doc_id = v.id_b
            WHERE v.verified AND ca.cluster_id = cb.cluster_id
            GROUP BY ca.cluster_id
        """,
        "test_path_flags": """
            WITH paths AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN '/tmp/doc_' || doc_id
                     WHEN doc_id % 7 = 3 THEN 'TEMP_' || doc_id
                     ELSE source || '/doc_' || doc_id END AS path
              FROM documents
            )
            SELECT doc_id, path,
              (contains(lower(path), 'test_image_') OR contains(lower(path), 'fake_image_')
               OR contains(lower(path), 'dummy_image_') OR contains(lower(path), '/tmp/')
               OR contains(lower(path), '\\tmp\\') OR contains(lower(path), 'temp_')
               OR contains(lower(path), '.tmp')) AS is_test
            FROM paths
        """,
        "url_dedup": r"""
            WITH raw AS (
              SELECT doc_id, n_chars,
                (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
                || (CASE WHEN doc_id % 6 = 0 THEN 'WWW.Example.COM'
                         WHEN doc_id % 6 = 3 THEN 'www.example.com'
                         ELSE 'example.com' END)
                || '/articles/' || (doc_id % 41)
                || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=' || doc_id
                         WHEN doc_id % 5 = 0 THEN '/'
                         ELSE '' END) AS raw_url
              FROM documents
            ), canon AS (
              SELECT doc_id, n_chars, raw_url,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  lower(raw_url), '^(https?://)+', ''), '^(www\.)+', ''),
                  '[?#].*$', ''), '/+$', '') AS canon_url
              FROM raw
            )
            SELECT doc_id, raw_url, canon_url,
              (row_number() OVER (
                 PARTITION BY canon_url ORDER BY n_chars DESC, doc_id ASC
               ) = 1) AS is_kept
            FROM canon
        """,
        "pii_stats": r"""
            WITH planted AS (
              SELECT doc_id,
                text
                || (CASE WHEN doc_id % 11 = 0
                     THEN ' Contact: user' || doc_id || '@Example.COM for details.'
                     ELSE '' END)
                || (CASE WHEN doc_id % 13 = 0
                     THEN ' Call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now.'
                     ELSE '' END)
                || (CASE WHEN doc_id % 17 = 0
                     THEN ' Logged from 10.0.' || (doc_id % 256) || '.7.'
                     ELSE '' END) AS t
              FROM documents
            )
            SELECT doc_id,
              len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_emails,
              len(regexp_extract_all(t, '\+1-[0-9]{3}-[0-9]{4}'))::INT AS n_phones,
              len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::INT AS n_ips,
              sha256(
                regexp_replace(regexp_replace(regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                  '\+1-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g')
              ) AS redacted_sha256
            FROM planted
        """,
        "doc_packing": """
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(string_split(text, ' '), x -> x <> ''))::INT AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT AS offset,
                   (coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // 512)::BIGINT AS pack_id
            FROM t
        """,
        "stratified_sample": """
            WITH b AS (
              SELECT doc_id, lang,
                     (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000)::INT
                       AS sample_bucket,
                     CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500
                               WHEN 'fr' THEN 500 WHEN 'es' THEN 500
                               WHEN 'zh' THEN 250 ELSE 0 END AS rate
              FROM documents
            )
            SELECT doc_id, lang, sample_bucket FROM b WHERE sample_bucket < rate
        """,
        "contamination": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(toks) - 3),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            || ' ' || toks[i+3] || ' ' || toks[i+4])) AS grams
              FROM toks
            ), eval_grams AS (
              -- coalesce: with an EMPTY eval set, list(DISTINCT g) over zero
              -- rows is NULL and every intersect would be NULL — the Spark
              -- side correctly reports 0/false, so mirror that
              SELECT coalesce(list(DISTINCT g), []) AS eg
              FROM (SELECT unnest(grams) AS g FROM grams WHERE doc_id % 50 = 0)
            )
            SELECT doc_id,
                   len(list_intersect(grams, eg))::INT AS n_hits,
                   (len(list_intersect(grams, eg)) >= 1) AS is_contaminated
            FROM grams, eval_grams
            WHERE doc_id % 50 <> 0
        """,
        "incremental_new_docs": """
            WITH seen AS (
              SELECT sha256(text) AS k FROM documents WHERE doc_id % 7 <> 0
            ), newb AS (
              SELECT doc_id, sha256(text) AS text_sha256
              FROM documents WHERE doc_id % 3 = 0
            )
            SELECT doc_id, text_sha256
            FROM newb ANTI JOIN seen ON newb.text_sha256 = seen.k
        """,
        "domain_stats": f"""
            WITH u AS ({_SYNTH_URL_CTE})
            SELECT domain, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
                   round(avg(n_chars), 6) AS avg_chars
            FROM u GROUP BY domain
        """,
        "domain_capped": f"""
            WITH u AS ({_SYNTH_URL_CTE})
            SELECT doc_id, domain,
                   row_number() OVER (
                     PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC
                   )::INT AS domain_rank,
                   (row_number() OVER (
                     PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC
                   ) <= 5) AS is_kept
            FROM u
        """,
        "domain_topk": f"""
            WITH u AS ({_SYNTH_URL_CTE})
            SELECT doc_id, domain,
                   row_number() OVER (
                     PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC
                   )::INT AS domain_rank
            FROM u
            QUALIFY domain_rank <= 5
        """,
        "substring_pairs": """
            WITH g AS (
              SELECT doc_id, substr(text, i::INT, 40) AS gram
              FROM (SELECT doc_id, text,
                           unnest(range(1, greatest(length(text) - 38, 1))) AS i
                    FROM documents)
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        """,
        "dup_span_stats": f"""
            WITH {_SPAN_ISLAND_CTES}, spans AS (
              SELECT doc_id, island,
                     max(pos) + 40 - min(pos) AS span_len
              FROM isl GROUP BY doc_id, island
            )
            SELECT doc_id, count(*)::BIGINT AS n_spans,
                   sum(span_len)::BIGINT AS dup_chars
            FROM spans GROUP BY doc_id
        """,
        "span_cleaned_digest": f"""
            WITH {_SPAN_ISLAND_CTES}, spans AS (
              SELECT doc_id, min(pos) AS s, max(pos) + 40 AS e
              FROM isl GROUP BY doc_id, island
            ), seg AS (
              -- kept segments, 1-based: [prev span end (or 1), next span
              -- start) plus the tail [last span end, len+1)
              SELECT doc_id,
                     coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s),
                              1) AS ks,
                     s AS ke
              FROM spans
              UNION ALL
              SELECT doc_id, max(e) AS ks, NULL AS ke FROM spans GROUP BY doc_id
            ), cleaned AS (
              SELECT seg.doc_id,
                     string_agg(
                       substr(d.text, ks::INT,
                              (coalesce(ke, length(d.text) + 1) - ks)::INT),
                       '' ORDER BY ks
                     ) AS ct
              FROM seg JOIN documents d USING (doc_id) GROUP BY seg.doc_id
            )
            SELECT d.doc_id,
                   sha256(coalesce(c.ct, d.text)) AS clean_sha256,
                   length(coalesce(c.ct, d.text))::BIGINT AS n_chars_clean
            FROM documents d LEFT JOIN cleaned c USING (doc_id)
        """,
        "substring_clusters": """
            WITH RECURSIVE g AS (
              SELECT doc_id, substr(text, i::INT, 40) AS gram
              FROM (SELECT doc_id, text,
                           unnest(range(1, greatest(length(text) - 38, 1))) AS i
                    FROM documents)
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            ), sym AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ), reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
            GROUP BY d.doc_id
        """,
        "length_quantiles": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99_chars
            FROM documents GROUP BY lang
        """,
        "image_features": f"""
            WITH {_MEDIA_FEATURES_CTE.strip()}
            SELECT media_id, width, height, n_bytes, phash64 FROM feats
        """,
        "media_dedup": _media_dedup_sql(radius=3),
        "frame_samples": f"""
            WITH {_MEDIA_CTE.strip()}
            SELECT media_id, n_frames,
                   len(sampled)::INT AS n_sampled,
                   array_to_string(sampled, ',') AS sampled_csv
            FROM (
              SELECT media_id, n_frames,
                     range(0, n_frames, 10)[1:32] AS sampled
              FROM (
                SELECT media_id,
                       greatest(1, octet_length(encode(payload_text)) // 1024)::INT AS n_frames
                FROM media WHERE kind3 = 1
              )
            )
        """,
    }
