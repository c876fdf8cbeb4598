"""DuckDB oracle SQL builders.

Every non-trivial operator in this engine has an ANSI-SQL twin runnable by
DuckDB on the same parquet tables (the driver's correctness gate — see
``__spark_entry__.py``). The SQL here is *generated from the same constants*
(`functions.dedup`, `functions.text`) as the Spark expressions, so the two
sides cannot drift: change SHINGLE_K or a stopword list once, both the Spark
plan and the oracle move together.

Portability rules observed throughout (both Java-regex/Spark and RE2/DuckDB,
both HALF_UP-ish double rounding):

- hashes are ``md5`` hex strings (identical in every engine);
- hex→int decoding uses position-in-digit-string (``locate``/``strpos``),
  never ``conv`` (Spark-only) or ``::INT`` hex casts (DuckDB-only);
- word counting uses the space-padded ``replace`` length trick, not regex
  counts (regex dialects drift);
- floating aggregates are rounded in-query on BOTH sides.
"""

from __future__ import annotations

from qvarn_mr_spark.functions.dedup import (
    HEX_DIGITS,
    MINHASH_BANDS,
    MINHASH_N,
    MINHASH_ROWS,
    SHINGLE_K,
    SIMHASH_BITS,
    TOKEN_RE,
)
from qvarn_mr_spark.functions.text import EN_STOPWORDS, LANG_MARKERS

# ---------------------------------------------------------------------------
# text.py twins
# ---------------------------------------------------------------------------

#: punctuation class of text.PUNCT_CLASS with the quote SQL-escaped
_PUNCT_SQL = "[.,!?;:''\"()\\[\\]{}-]"


def norm_sql(c: str) -> str:
    """text._normalized_for_words"""
    return ("(' ' || trim(regexp_replace(lower(" + c +
            "), '[^a-z0-9]+', ' ', 'g')) || ' ')")


def count_occ_sql(norm: str, word: str) -> str:
    """text._count_occurrences — length-difference trick."""
    needle = f" {word} "
    return (f"CAST((length({norm}) - length(replace({norm}, '{needle}', '')))"
            f" / {len(needle)} AS BIGINT)")


def marker_hits_sql(norm: str, words) -> str:
    return "(" + " + ".join(count_occ_sql(norm, w) for w in words) + ")"


def subword_count_sql(c: str) -> str:
    from qvarn_mr_spark.functions.text import BPE_SPLIT_RE
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"CAST(len(regexp_extract_all({c}, '{pat}')) AS BIGINT)"


def token_count_sql(c: str) -> str:
    return (f"CASE WHEN trim({c}) = '' THEN 0 ELSE "
            f"len(string_split_regex(trim({c}), '\\s+')) END")


def lang_guess_sql(norm: str) -> str:
    scores = {lang: marker_hits_sql(norm, words)
              for lang, words in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(f"WHEN {s} = {best} THEN '{lang}'"
                     for lang, s in scores.items())
    return f"CASE WHEN {best} <= 0 THEN 'und' {whens} ELSE 'und' END"


def punct_ratio_sql(c: str) -> str:
    stripped = f"regexp_replace({c}, '{_PUNCT_SQL}', '', 'g')"
    return (f"CASE WHEN length({c}) = 0 THEN 0.0 ELSE "
            f"CAST(length({c}) - length({stripped}) AS DOUBLE) / length({c}) END")


def stopword_ratio_sql(c: str, norm: str) -> str:
    toks = token_count_sql(c)
    hits = marker_hits_sql(norm, EN_STOPWORDS)
    return (f"CASE WHEN {toks} = 0 THEN 0.0 ELSE "
            f"least(CAST({hits} AS DOUBLE) / {toks}, 1.0) END")


def quality_score_sql(c: str, norm: str) -> str:
    toks = token_count_sql(c)
    sw = stopword_ratio_sql(c, norm)
    p = punct_ratio_sql(c)
    len_score = f"least(CAST({toks} AS DOUBLE) / 100.0, 1.0)"
    sw_score = f"least(({sw}) * 4, 1.0)"
    p_score = f"CASE WHEN ({p}) > 0.2 THEN 0.0 ELSE 1.0 - ({p}) * 5 END"
    return f"round((({len_score}) + ({sw_score}) + ({p_score})) / 3, 6)"


def fingerprint_sql(c: str) -> str:
    return f"md5(trim({norm_sql(c)}))"


def text_profile_sql(table: str = "documents") -> str:
    n = norm_sql("text")
    return f"""
SELECT doc_id,
       {token_count_sql('text')} AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       {lang_guess_sql(n)} AS lang_guess,
       round({punct_ratio_sql('text')}, 6) AS punct_ratio,
       round({stopword_ratio_sql('text', n)}, 6) AS stopword_ratio,
       {quality_score_sql('text', n)} AS quality,
       {fingerprint_sql('text')} AS fp
FROM {table}
"""


# ---------------------------------------------------------------------------
# dedup.py twins
# ---------------------------------------------------------------------------

def _shingle_cte(table: str = "documents", k: int = SHINGLE_K) -> str:
    """Distinct (doc_id, shingle) — dedup.shingle_table."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                     x -> x != '') AS t
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {k - 2}), i -> {gram})) AS shingle
  FROM toks
  WHERE len(t) >= {k}
)"""


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
SELECT {fingerprint_sql('text')} AS fp,
       count(*) AS n_dups,
       min(doc_id) AS keeper_id
FROM {table}
GROUP BY 1
"""


def ngram_jaccard_sql(table: str = "documents", min_common: int = 2,
                      max_df: int | None = None) -> str:
    if max_df is not None:
        cutoff = f""",
keep AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {max_df}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle))"""
        src = "shf"
    else:
        cutoff, src = "", "sh"
    return f"""
WITH {_shingle_cte(table)}{cutoff},
counts AS (SELECT doc_id, count(*) AS n_sh FROM {src} GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {min_common}
)
SELECT a_id, b_id, n_common,
       round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6)
         AS jaccard
FROM pairs
JOIN counts ca ON ca.doc_id = a_id
JOIN counts cb ON cb.doc_id = b_id
"""


def _minhash_sig_cte(table: str = "documents",
                     n_hashes: int = MINHASH_N,
                     n_bands: int = MINHASH_BANDS,
                     hash_family: str = "md5slice") -> str:
    # md5slice: hash i = 8-hex slice i%4 of md5(seed_{i//4} || shingle) —
    # in lockstep with dedup._minhash_cols (same _minhash_seed scheme).
    # linear: ONE md5 per shingle decoded strpos-per-nibble to a 32-bit
    # int reduced mod 2^31−1, then (aᵢ·v + bᵢ) mod 2^31−1 with the
    # constants taken from the SAME dedup._linear_hash_params helper.
    from qvarn_mr_spark.functions.dedup import (MINHASH_P31,
                                                _linear_hash_params,
                                                _minhash_seed)
    rows = n_hashes // n_bands
    if hash_family == "linear":
        v = " + ".join(
            f"(strpos('0123456789abcdef', substring("
            f"md5('mhbase|' || shingle), {j + 1}, 1)) - 1) "
            f"* {16 ** (7 - j)}"
            for j in range(8))
        hashes = ", ".join(
            f"min(({a} * v + {b}) % {MINHASH_P31}) AS h{i}"
            for i, (a, b) in (
                (i, _linear_hash_params(i)) for i in range(n_hashes)))
        sig = (f"sig AS (SELECT doc_id, {hashes} FROM "
               f"(SELECT doc_id, ({v}) % {MINHASH_P31} AS v FROM sh) "
               f"GROUP BY 1)")
    else:
        hashes = ", ".join(
            f"min(substring(md5('{_minhash_seed(i // 4)}|' || shingle), "
            f"{1 + 8 * (i % 4)}, 8)) AS h{i}"
            for i in range(n_hashes))
        sig = f"sig AS (SELECT doc_id, {hashes} FROM sh GROUP BY 1)"
    bands = ", ".join(
        "concat_ws('|', " + ", ".join(
            f"h{b * rows + r}" for r in range(rows)
        ) + f") AS band_{b}"
        for b in range(n_bands))
    return f"""{_shingle_cte(table)},
{sig},
bands AS (SELECT doc_id, {bands} FROM sig)"""


def minhash_signatures_sql(table: str = "documents") -> str:
    cols = ", ".join(f"band_{b}" for b in range(MINHASH_BANDS))
    return f"WITH {_minhash_sig_cte(table)} SELECT doc_id, {cols} FROM bands"


def minhash_candidates_sql(table: str = "documents",
                           n_hashes: int = MINHASH_N,
                           n_bands: int = MINHASH_BANDS,
                           hash_family: str = "md5slice") -> str:
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, band_{b} AS sig FROM bands"
        for b in range(n_bands))
    return f"""
WITH {_minhash_sig_cte(table, n_hashes, n_bands, hash_family)},
melted AS ({unions})
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_bands
FROM melted a
JOIN melted b ON a.band_pos = b.band_pos AND a.sig = b.sig
             AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def tune_lsh_bands_sql(table: str = "documents", n_hashes: int = 128,
                       bands_grid=(8, 16, 32), threshold: float = 0.4,
                       min_common: int = 2,
                       hash_family: str = "linear",
                       digits: int = 6) -> str:
    """dedup.tune_lsh_bands — the whole bands-grid trajectory: ground
    truth from the exact n-gram-Jaccard pair set, one banded candidate
    chain per grid point (each embedded as a SIBLING subquery, so their
    identical internal CTE names don't collide — DuckDB scoping rule,
    same trick as topk_recall_sql), intersections and ratios mirroring
    the Spark arithmetic (integer counts, round-6 divisions, NULL prec
    on empty candidate sets / NULL recall on an empty truth set)."""
    grid = sorted({int(b) for b in bands_grid})
    truth_inner = ngram_jaccard_sql(table, min_common=min_common)
    parts = [
        f"truth AS MATERIALIZED (SELECT a_id, b_id FROM ({truth_inner})"
        f" WHERE jaccard >= {float(threshold)!r})",
        "tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM truth)",
    ]
    selects = []
    for b in grid:
        cand = minhash_candidates_sql(table, n_hashes, b, hash_family)
        parts.append(f"c{b} AS MATERIALIZED (SELECT a_id, b_id"
                     f" FROM ({cand}))")
        selects.append(
            f"SELECT {b} AS n_bands, {n_hashes // b} AS band_width, "
            f"(SELECT count(*) FROM c{b}) AS n_candidates, "
            f"(SELECT count(*) FROM c{b} JOIN truth USING (a_id, b_id))"
            f" AS n_true")
    return ("WITH " + ",\n".join(parts) + "\nSELECT n_bands, band_width,"
            " n_candidates, n_true,\n"
            f"round(n_true / nullif(CAST(n_candidates AS DOUBLE), 0),"
            f" {digits}) AS prec,\n"
            f"round(n_true / nullif((SELECT n FROM tn), 0), {digits})"
            f" AS recall\n"
            "FROM (" + "\nUNION ALL\n".join(selects) + ")")


def lsh_probe_sql(probe_pred: str, table: str = "documents") -> str:
    """dedup.probe_lsh_index over a batch-bootstrapped index — probe docs
    matching ``probe_pred`` against every bucket, count shared bands."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, band_{b} AS sig FROM bands"
        for b in range(MINHASH_BANDS))
    return f"""
WITH {_minhash_sig_cte(table)},
melted AS ({unions})
SELECT p.doc_id AS probe_id, m.doc_id AS member_id, count(*) AS n_bands
FROM melted p
JOIN melted m ON p.band_pos = m.band_pos AND p.sig = m.sig
             AND p.doc_id != m.doc_id
WHERE p.doc_id IN (SELECT doc_id FROM {table} WHERE {probe_pred})
GROUP BY 1, 2
"""


def simhash_sql(table: str = "documents",
                bits: int = SIMHASH_BITS) -> str:
    n_nib = bits // 4
    nibs = ", ".join(
        f"strpos('{HEX_DIGITS}', substring(h4, {j + 1}, 1)) - 1 AS nib{j}"
        for j in range(n_nib))
    votes = ", ".join(
        f"sum((floor(nib{n_nib - 1 - b // 4} / {2 ** (b % 4)})::BIGINT % 2)"
        f" * 2 - 1) AS v{b}"
        for b in range(bits))
    # two's complement: bit 63 contributes -2^63 (the Spark side assembles
    # with shiftleft/or on a signed long, so bit 63 set => negative value)
    sig = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN "
        f"{2 ** b if b < 63 else -(2 ** 63)} ELSE 0 END"
        for b in range(bits))
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(
    list_filter(string_split_regex(lower(text), '{TOKEN_RE}'), x -> x != '')
  ) AS tok
  FROM {table}
),
hashed AS (SELECT doc_id, substring(md5(tok), 1, {n_nib}) AS h4 FROM toks),
nibbles AS (SELECT doc_id, {nibs} FROM hashed),
votes AS (SELECT doc_id, {votes} FROM nibbles GROUP BY 1)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
"""


def simhash_candidates_sql(max_hamming: int = 3,
                           table: str = "documents",
                           bits: int | None = None,
                           n_bands: int | None = None) -> str:
    """dedup.simhash_candidates — banded candidates + bit_count(xor) verify.

    The SQL self-joins band rows (the oracle needn't be bucketed, only
    set-identical: agreeing on ≥1 band ⇔ appearing in a common bucket).
    Band extraction goes through the UNSIGNED 64-bit value (HUGEINT +
    2^64 when negative) — the twin of Spark's shiftrightunsigned, exact
    even when bits=64 sets the sign bit."""
    from qvarn_mr_spark.functions.dedup import SIMHASH_BANDS, SIMHASH_BITS
    bits = bits if bits is not None else SIMHASH_BITS
    n_bands = n_bands if n_bands is not None else SIMHASH_BANDS
    bw = bits // n_bands
    usig = ("(CAST(simhash AS HUGEINT) + CASE WHEN simhash < 0 "
            "THEN 18446744073709551616 ELSE 0 END)")
    bands = ", ".join(
        f"CAST(({usig} // {2 ** (bw * b)}) % {2 ** bw} AS BIGINT)"
        for b in range(n_bands))
    return f"""
WITH sig AS ({simhash_sql(table, bits)}),
bands AS (
  SELECT doc_id, simhash, generate_subscripts(bv, 1) - 1 AS band_pos,
         unnest(bv) AS bv
  FROM (SELECT doc_id, simhash, [{bands}] AS bv FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, hamming FROM cand WHERE hamming <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# similarity.py twins
# ---------------------------------------------------------------------------

_COS = ("list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))")


def hybrid_search_sql(query_terms, query_vec, k: int = 10,
                      rrf_k: int = 60, pool: int = 50,
                      docs_table: str = "documents",
                      emb_table: str = "embeddings") -> str:
    """similarity.hybrid_search — lexical tf·idf leg (tfidf_top_terms's
    tokenizer/idf), brute-force cosine leg over the literal query
    vector, pool-limited ranks, RRF fusion; round-before-rank at every
    stage so the two engines order identically."""
    terms = sorted({str(t).lower() for t in query_terms})
    qv = [round(float(x), 6) for x in query_vec]
    tlist = ", ".join(f"'{t}'" for t in terms)
    vlist = "[" + ", ".join(repr(x) for x in qv) + "]::DOUBLE[]"
    cos = _COS.format(a="e.e", b="q.q")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '')) AS term
  FROM {docs_table}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({tlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM {docs_table}),
lex AS (SELECT doc_id,
               round(sum(tf * (ln((n_docs + 1.0) / (df_t + 1.0)) + 1.0)),
                     6) AS lex_score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n GROUP BY doc_id),
lexr AS (SELECT doc_id, row_number() OVER (
           ORDER BY lex_score DESC, doc_id ASC) AS lex_rank
         FROM (SELECT * FROM lex
               ORDER BY lex_score DESC, doc_id ASC LIMIT {pool})),
q AS (SELECT {vlist} AS q),
e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e
      FROM {emb_table}),
vec AS (SELECT e.doc_id, round({cos}, 6) AS cos_sim
        FROM e CROSS JOIN q),
vecr AS (SELECT doc_id, row_number() OVER (
           ORDER BY cos_sim DESC, doc_id ASC) AS vec_rank
         FROM (SELECT * FROM vec
               ORDER BY cos_sim DESC, doc_id ASC LIMIT {pool})),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         round(COALESCE(1.0 / ({rrf_k} + l.lex_rank), 0)
               + COALESCE(1.0 / ({rrf_k} + v.vec_rank), 0), 6)
           AS rrf_score
  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
SELECT doc_id, lex_rank, vec_rank, rrf_score, rn
FROM (SELECT *, row_number() OVER (
        ORDER BY rrf_score DESC, doc_id ASC) AS rn FROM fused)
WHERE rn <= {k}
"""


def hybrid_search_ivf_sql(query_terms, query_vec, centroid_pred: str,
                          nprobe: int = 1, k: int = 10,
                          rrf_k: int = 60, pool: int = 50,
                          docs_table: str = "documents",
                          emb_table: str = "embeddings") -> str:
    """similarity.hybrid_search_ivf — hybrid_search_sql with the vector
    leg probed: the literal query vector routes to its nprobe nearest
    centroids (rounded cosine, ties ascending cluster id — the shared
    IVF tiebreak), vectors assign rn=1 to their nearest centroid, and
    only probed-cluster members are scored. Lexical leg and RRF fusion
    are textually the hybrid_search_sql stages — the oracle-side twin
    of the Spark refactor's shared legs."""
    terms = sorted({str(t).lower() for t in query_terms})
    qv = [round(float(x), 6) for x in query_vec]
    tlist = ", ".join(f"'{t}'" for t in terms)
    vlist = "[" + ", ".join(repr(x) for x in qv) + "]::DOUBLE[]"
    cos = _COS.format(a="e.e", b="q.q")
    acos = _COS.format(a="v.e", b="c.e")
    qcos = _COS.format(a="c.e", b="q.q")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '')) AS term
  FROM {docs_table}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({tlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM {docs_table}),
lex AS (SELECT doc_id,
               round(sum(tf * (ln((n_docs + 1.0) / (df_t + 1.0)) + 1.0)),
                     6) AS lex_score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n GROUP BY doc_id),
lexr AS (SELECT doc_id, row_number() OVER (
           ORDER BY lex_score DESC, doc_id ASC) AS lex_rank
         FROM (SELECT * FROM lex
               ORDER BY lex_score DESC, doc_id ASC LIMIT {pool})),
q AS (SELECT {vlist} AS q),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {emb_table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
qroute AS (
  SELECT cluster_id FROM (
    SELECT c.cluster_id, row_number() OVER (
      ORDER BY round({qcos}, 6) DESC, c.cluster_id ASC) AS rn
    FROM cent c CROSS JOIN q) WHERE rn <= {int(nprobe)}),
assign AS (
  SELECT vec_id, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, cluster_id ASC) AS rn
    FROM (SELECT v.vec_id, c.cluster_id,
                 round({acos}, 6) AS cos_sim
          FROM e v, cent c)) WHERE rn = 1),
vec AS (SELECT e.vec_id AS doc_id, round({cos}, 6) AS cos_sim
        FROM e CROSS JOIN q
        JOIN assign ON assign.vec_id = e.vec_id
        WHERE assign.cluster_id IN (SELECT cluster_id FROM qroute)),
vecr AS (SELECT doc_id, row_number() OVER (
           ORDER BY cos_sim DESC, doc_id ASC) AS vec_rank
         FROM (SELECT * FROM vec
               ORDER BY cos_sim DESC, doc_id ASC LIMIT {pool})),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         round(COALESCE(1.0 / ({rrf_k} + l.lex_rank), 0)
               + COALESCE(1.0 / ({rrf_k} + v.vec_rank), 0), 6)
           AS rrf_score
  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
SELECT doc_id, lex_rank, vec_rank, rrf_score, rn
FROM (SELECT *, row_number() OVER (
        ORDER BY rrf_score DESC, doc_id ASC) AS rn FROM fused)
WHERE rn <= {k}
"""


def knn_bruteforce_sql(query_pred: str, k: int = 3,
                       table: str = "embeddings") -> str:
    cos = _COS.format(a="q.e", b="c.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
q AS (SELECT vec_id AS q_id, e FROM e WHERE {query_pred}),
scored AS (
  SELECT q.q_id, c.vec_id AS n_id, round({cos}, 6) AS cos_sim
  FROM q, e c WHERE q.q_id != c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id ASC) AS rn
  FROM scored
)
SELECT q_id, n_id, cos_sim, rn FROM ranked WHERE rn <= {k}
"""


def topk_recall_sql(exact_sql: str, approx_sql: str, k: int,
                    digits: int = 6) -> str:
    """similarity.topk_recall — per-query |approx ∩ exact| / min(k,
    n_exact) over two embedded neighbor-table queries (both yield
    (q_id, n_id, ...)); composes the existing knn/probe oracle
    builders. DuckDB allows duplicate CTE names across SIBLING
    subqueries (unlike outer-vs-inner), so the two search CTE chains
    embed verbatim."""
    return f"""
WITH ex AS MATERIALIZED (SELECT DISTINCT q_id, n_id FROM ({exact_sql})),
ap AS MATERIALIZED (SELECT DISTINCT q_id, n_id FROM ({approx_sql})),
ec AS (SELECT q_id, count(*) AS n_exact FROM ex GROUP BY 1),
ac AS (SELECT q_id, count(*) AS n_approx FROM ap GROUP BY 1),
h AS (SELECT ex.q_id, count(*) AS n_hit
      FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id
      GROUP BY 1)
SELECT ec.q_id, ec.n_exact,
       coalesce(ac.n_approx, 0) AS n_approx,
       coalesce(h.n_hit, 0) AS n_hit,
       round(coalesce(h.n_hit, 0)
             / CAST(least({int(k)}, ec.n_exact) AS DOUBLE), {digits})
         AS recall
FROM ec LEFT JOIN ac ON ec.q_id = ac.q_id
        LEFT JOIN h ON ec.q_id = h.q_id
"""


def pq_search_dispatch_sql(entries: list, query_pred: str, k: int = 3,
                           table: str = "embeddings") -> str:
    """similarity.pq_search over COMMITTED codebooks — the full value
    oracle for PQ/ADC search (VERDICT r10 item 5), same
    committed-model dispatch discipline as
    :func:`pca_project_dispatch_sql`: ``entries`` is ``[((n_rows,
    sum_vec_id, content), books), ...]`` with ``books`` the rounded
    (9-digit) ``(m, K, dsub)`` codebook lists the Spark query also
    uses; the live table's fingerprint picks the entry, a scale with
    no committed books yields an empty result (honest mismatch).

    Pipeline mirrors pq_encode + pq_search under the shared
    rounded-literal contract: L2-normalize and round components to 9;
    per (vector, subspace) the nearest codebook entry by squared L2
    rounded to 9, ties to the lower code; ADC distance = Σ_j
    lut[j, code_j] (each LUT entry rounded 9) rounded to 6; per-query
    top-k excluding self, ties (adc ASC, n_id ASC)."""
    if not entries:
        return None
    m = len(entries[0][1])
    dsub = len(entries[0][1][0][0])
    rows = []
    for fp, books in entries:
        n, s, c = (list(fp) + [None, None, None])[:3]
        for j, book in enumerate(books):
            for ci, b in enumerate(book):
                rows.append(
                    f"({int(n)}, {int(s)}, {int(c)}, {j}, {ci}, "
                    f"{_dlist([float(x) for x in b])})")
    vals = ",\n  ".join(rows)
    dist = ("round(list_sum(list_transform("
            "list_zip(list_slice(v, j*{d}+1, (j+1)*{d}), b), "
            "x -> (x[1] - x[2]) * (x[1] - x[2]))), 9)").format(d=dsub)
    return f"""
WITH rt AS (SELECT count(*) AS n,
                   CAST(coalesce(sum(vec_id), 0) AS BIGINT) AS s,
                   {PCA_RTFP_CONTENT} AS c
            FROM {table}),
allbooks(fn, fs, fc, j, ci, b) AS (VALUES
  {vals}),
books AS (SELECT j, ci AS c, b FROM allbooks JOIN rt
          ON fn = rt.n AND fs = rt.s AND fc = rt.c),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM {table}),
nrm AS (SELECT vec_id, raw,
               greatest(sqrt(list_dot_product(raw, raw)), 1e-12) AS nm
        FROM e),
nv AS (SELECT vec_id, list_transform(raw, x -> round(x / nm, 9)) AS v
       FROM nrm),
dists AS (SELECT vec_id, j, c, {dist} AS d
          FROM nv CROSS JOIN books),
codes AS (SELECT vec_id, j, c FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, j
                      ORDER BY d ASC, c ASC) AS rn
            FROM dists) WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v FROM nv
      WHERE vec_id IN (SELECT vec_id FROM {table} WHERE {query_pred})),
lut AS (SELECT q_id, j, c, {dist} AS d
        FROM q CROSS JOIN books),
adc AS (SELECT l.q_id, co.vec_id AS n_id, round(sum(l.d), 6) AS adc_dist
        FROM codes co JOIN lut l ON l.j = co.j AND l.c = co.c
        WHERE co.vec_id != l.q_id
        GROUP BY l.q_id, co.vec_id)
SELECT q_id, n_id, adc_dist, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY adc_dist ASC, n_id ASC) AS rn
  FROM adc) WHERE rn <= {int(k)}
"""


def ivf_assign_sql(centroid_pred: str, table: str = "embeddings") -> str:
    cos = _COS.format(a="v.e", b="c.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
scored AS (
  SELECT v.vec_id, c.cluster_id, round({cos}, 6) AS cos_sim
  FROM e v, cent c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, cluster_id ASC) AS rn
  FROM scored
)
SELECT vec_id, cluster_id, cos_sim FROM ranked WHERE rn = 1
"""


def semantic_dedup_sql(centroid_pred: str, threshold: float = 0.9,
                       table: str = "embeddings") -> str:
    """similarity.semantic_dedup — IVF assign + in-cluster lower-id
    cosine domination, survivors only."""
    cos = _COS.format(a="x.e", b="y.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, cluster_id ASC) AS rn
  FROM (SELECT v.vec_id, c.cluster_id,
               round({_COS.format(a="v.e", b="c.e")}, 6) AS cos_sim
        FROM e v, cent c)
),
m AS (
  SELECT r.vec_id, r.cluster_id, e.e
  FROM ranked r JOIN e USING (vec_id) WHERE r.rn = 1
),
dom AS (
  SELECT DISTINCT x.vec_id
  FROM m x JOIN m y ON x.cluster_id = y.cluster_id
                   AND x.vec_id > y.vec_id
  WHERE round({cos}, 6) >= {threshold}
)
SELECT vec_id, cluster_id FROM m
WHERE vec_id NOT IN (SELECT vec_id FROM dom)
"""


def nearest_neighbor_sql(table: str = "embeddings") -> str:
    return knn_bruteforce_sql("TRUE", k=1, table=table)


def nearest_neighbor_ivf_sql(centroid_pred: str, nprobe: int = 2,
                             table: str = "embeddings") -> str:
    """similarity.nearest_neighbor_ivf — same probed candidate set, exact."""
    acos = _COS.format(a="v.e", b="c.e")
    cos = _COS.format(a="q.e", b="n.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
aranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, cluster_id ASC) AS rn
  FROM (SELECT v.vec_id, c.cluster_id, round({acos}, 6) AS cos_sim
        FROM e v, cent c)
),
probes AS (SELECT vec_id AS q_id, cluster_id FROM aranked WHERE rn <= {nprobe}),
members AS (SELECT vec_id AS n_id, cluster_id FROM aranked WHERE rn = 1),
cand AS (SELECT q_id, n_id FROM probes JOIN members USING (cluster_id)
         WHERE q_id != n_id),
scored AS (
  SELECT cand.q_id, cand.n_id, round({cos}, 6) AS cos_sim
  FROM cand JOIN e q ON q.vec_id = cand.q_id
            JOIN e n ON n.vec_id = cand.n_id
)
SELECT q_id, n_id, cos_sim, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id ASC) AS rn
  FROM scored) WHERE rn = 1
"""


def ivf_probe_search_sql(centroid_pred: str, query_pred: str, k: int = 3,
                         table: str = "embeddings") -> str:
    cos = _COS.format(a="qv.e", b="nv.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
ascored AS (
  SELECT v.vec_id, c.cluster_id,
         round({_COS.format(a="v.e", b="c.e")}, 6) AS cos_sim
  FROM e v, cent c
),
assign AS (
  SELECT vec_id, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, cluster_id ASC) AS rn
    FROM ascored) WHERE rn = 1
),
q AS (SELECT a.vec_id AS q_id, a.cluster_id AS q_cluster
      FROM assign a WHERE a.vec_id IN (SELECT vec_id FROM e WHERE {query_pred})),
scored AS (
  SELECT q.q_id, m.vec_id AS n_id, round({cos}, 6) AS cos_sim
  FROM q
  JOIN e qv ON qv.vec_id = q.q_id
  JOIN assign m ON m.cluster_id = q.q_cluster
  JOIN e nv ON nv.vec_id = m.vec_id
  WHERE q.q_id != m.vec_id
)
SELECT q_id, n_id, cos_sim, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id ASC) AS rn
  FROM scored) WHERE rn <= {k}
"""


def tune_nprobe_sql(centroid_pred: str, query_pred: str, k: int = 3,
                    nprobes=(1, 2, 4), digits: int = 6,
                    table: str = "embeddings") -> str:
    """similarity.tune_nprobe — the whole recall-vs-nprobe trajectory:
    candidates scored once at max(nprobe) with the probe rank kept,
    each grid point sliced by ``q_rn <= p``, per-query recall against
    the brute-force exact answer, averaged per grid point. Mirrors the
    Spark side's one-pass candidate table arithmetic exactly (rounded
    sims, (cos_sim DESC, n_id ASC) tie-break)."""
    probes = sorted({int(p) for p in nprobes})
    maxp = probes[-1]
    grid = ", ".join(f"({p})" for p in probes)
    acos = _COS.format(a="v.e", b="c.e")
    cos = _COS.format(a="qv.e", b="nv.e")
    ecos = _COS.format(a="q.e", b="c.e")
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                        FROM {table}),
cent AS (SELECT vec_id AS cluster_id, e FROM e WHERE {centroid_pred}),
aranked AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, cluster_id ASC) AS rn
  FROM (SELECT v.vec_id, c.cluster_id, round({acos}, 6) AS cos_sim
        FROM e v, cent c)
),
q AS (SELECT vec_id AS q_id FROM e WHERE {query_pred}),
exact AS MATERIALIZED (
  SELECT q_id, n_id FROM (
    SELECT q.q_id, c.vec_id AS n_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({ecos}, 6) DESC, c.vec_id ASC) AS rn
    FROM (SELECT q_id, e FROM e JOIN q ON vec_id = q_id) q, e c
    WHERE q.q_id != c.vec_id) WHERE rn <= {k}
),
routes AS (SELECT vec_id AS q_id, cluster_id AS q_cluster, rn AS q_rn
           FROM aranked WHERE rn <= {maxp}
             AND vec_id IN (SELECT q_id FROM q)),
members AS (SELECT vec_id AS n_id, cluster_id FROM aranked WHERE rn = 1),
cand AS MATERIALIZED (
  SELECT r.q_id, m.n_id, r.q_rn, round({cos}, 6) AS cos_sim
  FROM routes r
  JOIN members m ON m.cluster_id = r.q_cluster
  JOIN e qv ON qv.vec_id = r.q_id
  JOIN e nv ON nv.vec_id = m.n_id
  WHERE r.q_id != m.n_id
),
grid(nprobe) AS (VALUES {grid}),
gc AS MATERIALIZED (
  SELECT g.nprobe, c.* FROM cand c JOIN grid g ON c.q_rn <= g.nprobe),
topk AS (
  SELECT nprobe, q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY nprobe, q_id
               ORDER BY cos_sim DESC, n_id ASC) AS rn FROM gc)
  WHERE rn <= {k}
),
hits AS (SELECT t.nprobe, t.q_id, count(*) AS n_hit
         FROM topk t JOIN exact x ON t.q_id = x.q_id AND t.n_id = x.n_id
         GROUP BY 1, 2),
ec AS (SELECT q_id, count(*) AS n_exact FROM exact GROUP BY 1),
per_q AS (
  SELECT g.nprobe,
         coalesce(h.n_hit, 0)
           / CAST(least({int(k)}, ec.n_exact) AS DOUBLE) AS rec
  FROM ec CROSS JOIN grid g
  LEFT JOIN hits h ON h.q_id = ec.q_id AND h.nprobe = g.nprobe),
nc AS (SELECT nprobe, count(*) AS n_candidates FROM gc GROUP BY 1)
SELECT p.nprobe, count(*) AS n_queries,
       round(avg(p.rec), {digits}) AS mean_recall,
       coalesce(any_value(nc.n_candidates), 0) AS n_candidates
FROM per_q p LEFT JOIN nc ON p.nprobe = nc.nprobe
GROUP BY p.nprobe
"""


def centroid_by_label_sql(table: str = "embeddings") -> str:
    return f"""
SELECT label,
       generate_subscripts(embedding, 1) - 1 AS pos,
       unnest(CAST(embedding AS DOUBLE[])) AS val
FROM {table}
"""


def centroid_by_label_agg_sql(table: str = "embeddings") -> str:
    return f"""
SELECT label, pos, round(avg(val), 6) AS avg_val
FROM ({centroid_by_label_sql(table)})
GROUP BY 1, 2
"""


def _hyperplane_sig_expr(vec: str, planes: int, dim: int, seed: str) -> str:
    """Signature expression twin of similarity.hyperplane_signatures —
    the weight constants come from the SAME helper, so the engines cannot
    drift."""
    from qvarn_mr_spark.functions.similarity import hyperplane_weights
    weights = hyperplane_weights(planes, dim, seed)
    bits = []
    for p, row in enumerate(weights):
        arr = "[" + ", ".join(repr(c) for c in row) + "]"
        bits.append(f"CASE WHEN round(list_dot_product({vec}, {arr}), 6) > 0 "
                    f"THEN {2 ** p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def hyperplane_near_dup_sql(threshold: float = 0.9, planes: int = 32,
                            bands: int = 4, dim: int = 64, seed: str = "hp",
                            table: str = "embeddings") -> str:
    from qvarn_mr_spark.functions.similarity import hyperplane_weights  # noqa: F401
    band_width = planes // bands
    sig = _hyperplane_sig_expr("e", planes, dim, seed)
    band_exprs = ", ".join(
        f"(CAST(floor(hp_sig / {2 ** (band_width * b)}) AS BIGINT) "
        f"% {2 ** band_width})"
        for b in range(bands))
    cos = _COS.format(a="av.e", b="bv.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
sigs AS (SELECT vec_id, {sig} AS hp_sig FROM e),
bands AS (
  SELECT vec_id, band_pos, bv
  FROM (SELECT vec_id, unnest([{band_exprs}]) AS bv,
               generate_subscripts([{band_exprs}], 1) AS band_pos
        FROM sigs)
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.bv = b.bv AND a.vec_id < b.vec_id
)
SELECT a_id, b_id, round({cos}, 6) AS cos_sim
FROM cand JOIN e av ON av.vec_id = a_id JOIN e bv ON bv.vec_id = b_id
WHERE round({cos}, 6) >= {threshold}
"""


def embedding_lsh_probe_sql(probe_pred: str, threshold: float = 0.9,
                            planes: int = 32, bands: int = 4,
                            dim: int = 64, seed: str = "hp",
                            table: str = "embeddings") -> str:
    """similarity.probe_embedding_lsh_index over a batch-bootstrapped
    index — probes matching ``probe_pred`` against every bucket, exact
    cosine verify, self-pairs dropped."""
    band_width = planes // bands
    sig = _hyperplane_sig_expr("e", planes, dim, seed)
    band_exprs = ", ".join(
        f"(CAST(floor(hp_sig / {2 ** (band_width * b)}) AS BIGINT) "
        f"% {2 ** band_width})"
        for b in range(bands))
    cos = _COS.format(a="pv.e", b="mv.e")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
sigs AS (SELECT vec_id, {sig} AS hp_sig FROM e),
bands AS (
  SELECT vec_id, band_pos, bv
  FROM (SELECT vec_id, unnest([{band_exprs}]) AS bv,
               generate_subscripts([{band_exprs}], 1) AS band_pos
        FROM sigs)
),
cand AS (
  SELECT DISTINCT p.vec_id AS probe_id, m.vec_id AS member_id
  FROM bands p JOIN bands m
    ON p.band_pos = m.band_pos AND p.bv = m.bv AND p.vec_id != m.vec_id
  WHERE p.vec_id IN (SELECT vec_id FROM {table} WHERE {probe_pred})
)
SELECT probe_id, member_id, round({cos}, 6) AS cos_sim
FROM cand JOIN e pv ON pv.vec_id = probe_id
          JOIN e mv ON mv.vec_id = member_id
WHERE round({cos}, 6) >= {threshold}
"""


def _gram_list(t: str, k: int) -> str:
    """Non-distinct word k-gram list — twin of dedup.shingles_col."""
    if k == 1:
        return t
    gram = " || ' ' || ".join(f"{t}[i+{j}]" for j in range(k))
    return f"list_transform(range(1, len({t}) - {k - 2}), i -> {gram})"


def _dup_frac_sql(g: str) -> str:
    """quality._dup_frac — 1 - distinct/total, 0.0 for empty docs."""
    return (f"CASE WHEN len({g}) <= 0 THEN 0.0 ELSE "
            f"round(1.0 - CAST(len(list_distinct({g})) AS DOUBLE) "
            f"/ len({g}), 6) END")


def repetition_profile_sql(table: str = "documents") -> str:
    """quality.repetition_profile — same tokenizer, same gram builder."""
    top = ("list_max(list_transform(list_distinct(t), "
           "w -> len(list_filter(t, x -> x = w))))")
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                     x -> x != '') AS t
  FROM {table}
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       {_dup_frac_sql('t')} AS dup_word_frac,
       {_dup_frac_sql(_gram_list('t', 2))} AS dup_2gram_frac,
       {_dup_frac_sql(_gram_list('t', 3))} AS dup_3gram_frac,
       CASE WHEN len(t) <= 0 THEN 0.0 ELSE
         round(CAST({top} AS DOUBLE) / len(t), 6) END AS top_word_frac
FROM toks
"""


def contamination_sql(eval_pred: str, k: int = 4,
                      table: str = "documents") -> str:
    """quality.contamination — distinct-shared-k-gram counts for every
    non-eval document that overlaps the eval split."""
    return f"""
WITH {_shingle_cte(table, k)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE {eval_pred})
SELECT sh.doc_id, count(*) AS n_shared
FROM sh JOIN ev USING (shingle)
WHERE NOT ({eval_pred})
GROUP BY 1
"""


def decontaminate_sql(eval_pred: str, k: int = 4,
                      table: str = "documents") -> str:
    """quality.decontaminate / quality.bloom_decontaminate — the surviving
    (non-eval, non-contaminated) documents. One SQL serves both Spark
    operators: the Bloom prefilter is output-transparent (no false
    negatives + exact verify), which is exactly what this twin checks."""
    return f"""
WITH {_shingle_cte(table, k)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE {eval_pred}),
hits AS (
  SELECT DISTINCT sh.doc_id
  FROM sh JOIN ev USING (shingle)
  WHERE NOT ({eval_pred})
)
SELECT doc_id, n_chars
FROM {table}
WHERE NOT ({eval_pred})
  AND doc_id NOT IN (SELECT doc_id FROM hits)
"""


def line_dedup_sql(min_chars: int = 1, delimiter: str = "\\n",
                   joiner: str | None = None,
                   min_doc_frac: float = 0.5,
                   table: str = "documents") -> str:
    """quality.line_dedup — fraction-threshold form. ``delimiter`` is a
    regex (mirrors Spark ``split``); ``joiner`` the literal rejoin
    separator."""
    j = joiner if joiner is not None else delimiter
    split = f"string_split_regex(text, '{delimiter}')"
    split_d = f"string_split_regex(d.text, '{delimiter}')"
    keys = (f"list_distinct(list_filter(list_transform({split}, "
            f"l -> lower(trim(l))), k -> length(k) >= {min_chars}))")
    kept = (f"list_filter({split_d}, l -> NOT list_contains("
            f"coalesce(b.bad_keys, CAST([] AS VARCHAR[])), "
            f"lower(trim(l))))")
    return f"""
WITH lk AS (
  SELECT doc_id, unnest({keys}) AS line_key FROM {table}
),
total AS (SELECT count(*) AS n FROM {table}),
dup AS (
  SELECT line_key FROM lk CROSS JOIN total
  GROUP BY line_key, total.n
  HAVING count(*) >= ceiling({min_doc_frac} * total.n)
),
bad AS (
  SELECT doc_id, list_sort(list(line_key)) AS bad_keys
  FROM lk JOIN dup USING (line_key)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(array_to_string({kept}, '{j}'), '') AS text,
       CAST(len({split_d}) AS BIGINT) AS n_lines,
       CAST(len({split_d}) - len({kept}) AS BIGINT) AS n_removed
FROM {table} d LEFT JOIN bad b USING (doc_id)
"""


def top_ngrams_sql(k: int = SHINGLE_K, top_n: int = 20,
                   table: str = "documents") -> str:
    """quality.top_ngrams — corpus-wide gram frequency + doc frequency."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                     x -> x != '') AS t
  FROM {table}
),
grams AS (SELECT doc_id, unnest({_gram_list('t', k)}) AS shingle FROM toks)
SELECT shingle, count(*) AS tf, count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY 1
ORDER BY tf DESC, shingle ASC
LIMIT {top_n}
"""


def pack_sequences_sql(window: int = 512, table: str = "documents") -> str:
    """packing.pack_sequences — the oracle states the semantics as the
    naive single global cumsum window; the Spark side computes the same
    thing with the scalable two-phase (range partition + local window +
    metadata prefix join) form."""
    w = float(window)
    return f"""
WITH t AS (
  SELECT doc_id, CAST(doc_id AS BIGINT) AS oid,
         CAST({token_count_sql('text')} AS BIGINT) AS n
  FROM {table}
),
c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY oid) AS cum FROM t)
SELECT doc_id, n AS n_tokens,
       CAST(cum - n AS BIGINT) AS start_offset,
       CAST(floor((cum - n) / {w}) AS BIGINT) AS pack_first,
       CAST(greatest(floor((cum - n) / {w}),
                     floor((cum - 1) / {w})) AS BIGINT) AS pack_last
FROM c
"""


def chunk_documents_sql(window: int = 32, overlap: int = 8,
                        table: str = "documents") -> str:
    """packing.chunk_documents — same start lattice (0, stride, … while a
    chunk adds ≥1 token past the shared overlap), same 1-based clamped
    slice. DuckDB ``range(a, b, s)`` is half-open so the bound gets +1.
    NULL text coalesces to '' on both sides (one empty chunk), keeping
    the NULL semantic defined and identical."""
    step = window - overlap
    return f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks,
         len(string_split(coalesce(text, ''), ' ')) AS n
  FROM {table}
),
s AS (
  SELECT doc_id, toks, n,
         unnest(range(0, greatest(n - {overlap + 1}, 0) + 1, {step}))
           AS start
  FROM t
)
SELECT doc_id,
       CAST(start // {step} AS BIGINT) AS chunk_id,
       CAST(least({window}, n - start) AS BIGINT) AS n_tokens,
       array_to_string(toks[start + 1 : start + {window}], ' ')
         AS chunk_text
FROM s
"""


def budget_cap_sql(budget: int, key_col: str = "source",
                   weight_col: str = "n_chars", id_col: str = "doc_id",
                   table: str = "documents") -> str:
    """sampling.budget_cap — RANGE-frame running sum is identical on both
    engines and the (weight DESC, id ASC) order is total, so frame
    semantics cannot diverge. HUGEINT sum cast back to BIGINT. The
    ``{weight_col} <= budget`` pre-filter mirrors the Spark side's
    oversized-row drop."""
    return f"""
SELECT {id_col}, {key_col}, {weight_col}, cum_weight
FROM (
  SELECT {id_col}, {key_col}, {weight_col},
         CAST(sum({weight_col}) OVER (
              PARTITION BY {key_col}
              ORDER BY {weight_col} DESC, {id_col} ASC) AS BIGINT)
           AS cum_weight
  FROM {table}
  WHERE {weight_col} <= {budget}
)
WHERE cum_weight <= {budget}
"""


def hard_negatives_sql(query_pred: str, k: int = 1,
                       table: str = "embeddings") -> str:
    """similarity.hard_negatives — knn_bruteforce with the self-exclusion
    replaced by a label-inequality predicate."""
    cos = _COS.format(a="q.e", b="c.e")
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM {table}),
q AS (SELECT vec_id AS q_id, label AS q_label, e FROM e
      WHERE {query_pred}),
scored AS (
  SELECT q.q_id, c.vec_id AS n_id, round({cos}, 6) AS cos_sim
  FROM q, e c WHERE q.q_label != c.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id ASC) AS rn
  FROM scored
)
SELECT q_id, n_id, cos_sim, rn FROM ranked WHERE rn <= {k}
"""


def inverted_index_sql(min_df: int = 1, max_df: int | None = None,
                       table: str = "documents") -> str:
    """text.inverted_index — sorted comma-joined posting lists."""
    cap = f" AND count(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                            x -> x != '')) AS term
  FROM {table}
)
SELECT term, count(*) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM toks GROUP BY 1
HAVING count(*) >= {min_df}{cap}
"""


def tfidf_top_terms_sql(k: int = 3, table: str = "documents") -> str:
    """Twin of text.tfidf_top_terms — same tokenizer (TOKEN_RE), same
    smoothed idf, same round-before-rank."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '')) AS term
  FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n_docs + 1.0) / (df_t + 1.0)) + 1), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, score, rn
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rn
      FROM scored)
WHERE rn <= {k}
"""


def skew_profile_sql(key_expr: str = "user_id", top_n: int = 5,
                     table: str = "events") -> str:
    """operators.skew.skew_profile — hottest keys + count quantiles.
    Truncating casts mirror Spark's double->long cast (floor for the
    positive values here); quantile_cont matches Spark's interpolated
    ``percentile`` exactly on integer counts."""
    return f"""
WITH counts AS (
  SELECT CAST({key_expr} AS VARCHAR) AS key, count(*) AS n_rows
  FROM {table} GROUP BY 1
),
top AS (
  SELECT 'top#' || CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC)
                        AS VARCHAR) AS stat,
         key, n_rows
  FROM (SELECT * FROM counts ORDER BY n_rows DESC, key ASC LIMIT {top_n})
),
stats AS (
  SELECT quantile_cont(n_rows, 0.5) AS p50,
         quantile_cont(n_rows, 0.9) AS p90,
         quantile_cont(n_rows, 0.99) AS p99,
         CAST(max(n_rows) AS DOUBLE) AS mx,
         CAST(count(*) AS DOUBLE) AS n_keys,
         round(100.0 * max(n_rows) / avg(n_rows), 0) AS skew_ratio
  FROM counts
)
SELECT stat, key, n_rows FROM top
UNION ALL
SELECT s.stat, NULL AS key, CAST(floor(s.value) AS BIGINT) AS n_rows
FROM (
  SELECT 'p50' AS stat, p50 AS value FROM stats UNION ALL
  SELECT 'p90', p90 FROM stats UNION ALL
  SELECT 'p99', p99 FROM stats UNION ALL
  SELECT 'max', mx FROM stats UNION ALL
  SELECT 'n_keys', n_keys FROM stats UNION ALL
  SELECT 'skew_ratio', skew_ratio FROM stats
) s
"""


def table_profile_sql(cols: list, table: str = "documents") -> str:
    """catalog.table_profile — ``cols`` is ``[(name, is_numeric), ...]``."""
    aggs, rows = ["count(*) AS _n"], []
    for name, num in cols:
        aggs.append(f"count(CASE WHEN {name} IS NULL THEN 1 END) "
                    f"AS _null_{name}")
        aggs.append(f"count(DISTINCT {name}) AS _nd_{name}")
        if num:
            aggs.append(f"CAST(min({name}) AS DOUBLE) AS _min_{name}")
            aggs.append(f"CAST(max({name}) AS DOUBLE) AS _max_{name}")
        mn = (f"s._min_{name}" if num else "CAST(NULL AS DOUBLE)")
        mx = (f"s._max_{name}" if num else "CAST(NULL AS DOUBLE)")
        rows.append(f"SELECT '{name}' AS \"column\", s._n AS n_rows, "
                    f"s._null_{name} AS n_null, s._nd_{name} AS n_distinct, "
                    f"{mn} AS min_val, {mx} AS max_val FROM s")
    return ("WITH s AS (SELECT " + ", ".join(aggs) + f" FROM {table})\n"
            + "\nUNION ALL\n".join(rows))


def unigram_surprisal_sql(smoothing: float = 0.5,
                          table: str = "documents") -> str:
    """text.unigram_surprisal — add-k unigram LM fitted on the corpus."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '')) AS w
  FROM {table}
),
lm AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM lm)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln((c + {smoothing}) / (n + {smoothing} * v))), 6)
         AS mean_nll
FROM toks JOIN lm USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def bigram_surprisal_sql(lam: float = 0.7, smoothing: float = 0.5,
                         table: str = "documents") -> str:
    """text.bigram_surprisal — interpolated bigram LM fitted on the
    corpus; transitions via zipped shifted list slices (DuckDB list_zip
    mirrors Spark's zip_with of shifted slices)."""
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '') AS t
  FROM {table}
),
pairs AS (
  SELECT doc_id, z[1] AS u, z[2] AS w
  FROM (SELECT doc_id,
               unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS z
        FROM tl WHERE len(t) >= 2)
),
toks AS (SELECT doc_id, unnest(t) AS w FROM tl),
lm_bi AS (SELECT u, w, count(*) AS c_uw FROM pairs GROUP BY 1, 2),
lm_ctx AS (SELECT u, sum(c_uw) AS c_u FROM lm_bi GROUP BY 1),
uni AS (SELECT w, count(*) AS c_w FROM toks GROUP BY 1),
tot AS (SELECT sum(c_w) AS n, count(*) AS v FROM uni)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(-ln({lam} * c_uw / c_u
                     + {1.0 - lam} * (c_w + {smoothing})
                       / (n + {smoothing} * v))), 6) AS mean_nll
FROM pairs JOIN lm_bi USING (u, w) JOIN lm_ctx USING (u)
     JOIN uni USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def trigram_surprisal_sql(lam3: float = 0.5, lam2: float = 0.3,
                          smoothing: float = 0.5,
                          table: str = "documents") -> str:
    """text.trigram_surprisal — interpolated trigram→bigram→unigram LM
    fitted on the corpus; triples via a three-way list_zip of shifted
    slices (DuckDB's list_zip mirrors Spark's nested zip_with). The
    n-gram CTEs are MATERIALIZED: DuckDB inlines plain CTEs per
    reference, and with six derived references the re-inlined
    tokenize+unnest pipelines blow past 3 minutes at sf0.01 —
    materialized, the whole query runs in ~1 s (mirrors the Spark
    side's .persist() of the LM tables)."""
    lam1 = 1.0 - lam3 - lam2
    return f"""
WITH tl AS MATERIALIZED (
  SELECT doc_id, list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '') AS t
  FROM {table}
),
tris AS MATERIALIZED (
  SELECT doc_id, z[1] AS u, z[2] AS v, z[3] AS w
  FROM (SELECT doc_id,
               unnest(list_zip(t[1:len(t) - 2], t[2:len(t) - 1],
                               t[3:len(t)])) AS z
        FROM tl WHERE len(t) >= 3)
),
bis AS MATERIALIZED (
  SELECT z[1] AS v, z[2] AS w
  FROM (SELECT unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS z
        FROM tl WHERE len(t) >= 2)
),
toks AS (SELECT unnest(t) AS w FROM tl),
lm_tri AS MATERIALIZED (SELECT u, v, w, count(*) AS c_uvw FROM tris GROUP BY 1, 2, 3),
lm_ctx3 AS (SELECT u, v, sum(c_uvw) AS c_uv FROM lm_tri GROUP BY 1, 2),
lm_bi AS MATERIALIZED (SELECT v, w, count(*) AS c_vw FROM bis GROUP BY 1, 2),
lm_ctx2 AS (SELECT v, sum(c_vw) AS c_v FROM lm_bi GROUP BY 1),
uni AS MATERIALIZED (SELECT w, count(*) AS c_w FROM toks GROUP BY 1),
tot AS (SELECT sum(c_w) AS n, count(*) AS v_sz FROM uni)
SELECT doc_id, count(*) AS n_trigrams,
       round(avg(-ln({lam3} * c_uvw / c_uv
                     + {lam2} * c_vw / c_v
                     + {lam1} * (c_w + {smoothing})
                       / (n + {smoothing} * v_sz))), 6) AS mean_nll
FROM tris JOIN lm_tri USING (u, v, w) JOIN lm_ctx3 USING (u, v)
     JOIN lm_bi USING (v, w) JOIN lm_ctx2 USING (v)
     JOIN uni USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def perplexity_buckets_sql(n_buckets: int = 3, by: str = "lang",
                           smoothing: float = 0.5,
                           table: str = "documents") -> str:
    """quality.perplexity_buckets (method='ntile') — CCNet head/middle/
    tail split: the unigram-surprisal twin as a nested CTE, then an
    equal-frequency ntile per ``by`` group ordered by
    ``(mean_nll, doc_id)`` (total order, so the split is deterministic
    in both engines; SQL-standard ntile gives the first ``n mod k``
    buckets the extra row in DuckDB and Spark alike)."""
    if n_buckets == 3:
        label = ("CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
                 "ELSE 'tail' END")
    else:
        label = "'b' || CAST(b AS VARCHAR)"
    return f"""
WITH sur AS ({unigram_surprisal_sql(smoothing, table)}),
j AS (
  SELECT s.doc_id, d.{by}, s.n_tokens, s.mean_nll
  FROM sur s JOIN {table} d USING (doc_id)
)
SELECT doc_id, {by}, n_tokens, mean_nll, CAST(b AS INT) AS bucket,
       {label} AS bucket_label
FROM (SELECT *, ntile({n_buckets}) OVER (PARTITION BY {by}
        ORDER BY mean_nll, doc_id) AS b FROM j)
"""


def minhash_contamination_sql(eval_pred: str,
                              table: str = "documents") -> str:
    """quality.minhash_contamination — band-collision counts of every
    non-eval document against the eval split's band set. Joins on
    (band_pos, sig), semantically identical to the Spark side's
    '{{band_pos}}|{{sig}}' string keys."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, band_{b} AS sig FROM bands"
        for b in range(MINHASH_BANDS))
    return f"""
WITH {_minhash_sig_cte(table)},
melted AS ({unions}),
evk AS (SELECT DISTINCT band_pos, sig FROM melted
        WHERE doc_id IN (SELECT doc_id FROM {table} WHERE {eval_pred}))
SELECT m.doc_id, count(*) AS n_shared_bands
FROM melted m JOIN evk USING (band_pos, sig)
WHERE m.doc_id NOT IN (SELECT doc_id FROM {table} WHERE {eval_pred})
GROUP BY 1
"""


def lsh_gate_sql(incoming_pred: str, table: str = "documents") -> str:
    """dedup.lsh_gate_batch(mode='flag') — every INCOMING document
    (``incoming_pred``) flagged true iff any of its band keys lands in
    a band bucket of the indexed rest of the corpus. The maintained
    index's ``'{band_pos}|{sig}'`` string keys join here as the
    equivalent (band_pos, sig) pairs; docs too short to shingle have no
    band rows and flag false (the pass-ungated rule). Incoming and
    indexed sets are disjoint by construction, so the gate's
    self-exclusion (member != probe) is vacuous — its non-vacuous form
    is pytest-pinned in tests/test_lsh_index.py."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, band_{b} AS sig FROM bands"
        for b in range(MINHASH_BANDS))
    return f"""
WITH {_minhash_sig_cte(table)},
melted AS ({unions}),
idx AS (SELECT DISTINCT band_pos, sig FROM melted
        WHERE doc_id IN (SELECT doc_id FROM {table}
                         WHERE NOT ({incoming_pred}))),
hits AS (SELECT DISTINCT m.doc_id FROM melted m JOIN idx
         USING (band_pos, sig)
         WHERE m.doc_id IN (SELECT doc_id FROM {table}
                            WHERE {incoming_pred}))
SELECT d.doc_id, (d.doc_id IN (SELECT doc_id FROM hits))
         AS lsh_collided
FROM {table} d WHERE {incoming_pred}
"""


def cluster_keepers_sql(table: str = "documents") -> str:
    """dedup.cluster_keepers over exact-dup fingerprint clusters with
    quality_score — the max-over-(score, id)-tuple construct is the same
    total order on both engines."""
    n = norm_sql("text")
    return f"""
WITH m AS (
  SELECT doc_id, {fingerprint_sql('text')} AS cluster_id,
         CAST({quality_score_sql('text', n)} AS DOUBLE) AS s
  FROM {table}
),
a AS (SELECT cluster_id, max((s, doc_id)) AS b,
             count(*) AS n_members
      FROM m GROUP BY 1)
SELECT cluster_id, b[2] AS keeper_id, round(b[1], 6) AS best_score,
       n_members
FROM a
"""


def stratified_fixed_k_sql(k: int, strata_col: str = "lang",
                           salt: str = "fixk",
                           table: str = "documents") -> str:
    """sampling.stratified_fixed_k — exactly k per stratum by hash order."""
    from qvarn_mr_spark.functions.sampling import sample_unit_sql
    unit = sample_unit_sql("doc_id", salt)
    return f"""
SELECT doc_id, {strata_col}
FROM (SELECT doc_id, {strata_col},
             row_number() OVER (PARTITION BY {strata_col}
                                ORDER BY {unit} ASC, doc_id ASC) AS rk
      FROM {table})
WHERE rk <= {k}
"""


def substring_dedup_sql(k: int = 8, min_count: int = 2,
                        table: str = "documents") -> str:
    """dedup.substring_dedup — k-gram-seeded exact substring removal.
    DuckDB list lambdas are 1-indexed; positions stay 1-based on this
    side throughout, matching Spark's 0-based side internally."""
    gram = (f"substring(md5(array_to_string("
            f"list_slice(t, i, i + {k - 1}), ' ')), 1, 16)")
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                     x -> x != '') AS t
  FROM {table}
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {k} + 2),
                               i -> struct_pack(i := i, g := {gram}))) AS s
  FROM toks WHERE len(t) >= {k}
),
flat AS (SELECT doc_id, s.i AS start, s.g AS g FROM grams),
dup AS (SELECT g FROM flat GROUP BY g HAVING count(*) >= {min_count}),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(start, start + {k})) AS pos
  FROM flat JOIN dup USING (g)
),
bad AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS bad_pos
        FROM covered GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(array_to_string(
         list_filter(d.t, (x, i) -> NOT list_contains(
           coalesce(b.bad_pos, CAST([] AS BIGINT[])), i)), ' '), '')
         AS text,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(len(d.t) - len(list_filter(d.t, (x, i) -> NOT list_contains(
         coalesce(b.bad_pos, CAST([] AS BIGINT[])), i))) AS BIGINT)
         AS n_removed
FROM toks d LEFT JOIN bad b USING (doc_id)
"""


def quantize_embeddings_sql(table: str = "embeddings") -> str:
    """similarity.quantize_embeddings — symmetric int8 quantization.
    round() is half-away-from-zero in both engines."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e)
SELECT vec_id, round(scale, 6) AS scale,
       array_to_string(
         CASE WHEN scale > 0
              THEN list_transform(v, x -> CAST(round(x / scale * 127, 0)
                                               AS INTEGER))
              ELSE list_transform(v, x -> 0) END, ',') AS qvec_csv
FROM s
"""


# ---------------------------------------------------------------------------
# connected-components / composed-pipeline twins (round 6): value oracles for
# the iterative dedup/corpus queries via DuckDB recursive CTEs
# ---------------------------------------------------------------------------

def _melted_cte() -> str:
    """The band-melt union over ``bands`` (one row per (doc, band))."""
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, band_{b} AS sig FROM bands"
        for b in range(MINHASH_BANDS))


#: Connected components over a symmetric edge list as a transitive-closure
#: recursive CTE: ``walk`` accumulates every (node, reachable-label) pair
#: (UNION dedups, so it terminates), then min(label) per node = the smallest
#: id in the component — exactly dedup.dup_clusters' fixpoint semantics.
#: O(component_size^2) label rows per component: fine at oracle scale; the
#: Spark side is the O(log n)-round pointer-doubling form for cluster scale.
_WALK_CC = """
edges AS (SELECT a_id AS u, b_id AS v FROM {pairs}
          UNION SELECT b_id AS u, a_id AS v FROM {pairs}),
walk(node, label) AS (
  SELECT u AS node, u AS label FROM edges
  UNION
  SELECT e.v AS node, w.label AS label FROM walk w JOIN edges e ON e.u = w.node
),
clusters AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY 1)"""


def dup_clusters_sql(table: str = "documents") -> str:
    """dedup.dup_clusters over dedup.minhash_candidates edges — the full
    candidate-pairs → connected-components pipeline of
    ``__spark_entry__.q_dedup_clusters``."""
    return f"""
WITH RECURSIVE {_minhash_sig_cte(table)},
melted AS ({_melted_cte()}),
cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM melted a
  JOIN melted b ON a.band_pos = b.band_pos AND a.sig = b.sig
               AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
{_WALK_CC.format(pairs="cand")}
SELECT node, cluster_id FROM clusters
"""


def _dedup_corpus_ctes(table: str, jaccard_threshold: float) -> str:
    """The CTE chain of dedup.dedup_corpus over ``table`` (needs doc_id,
    text): exact fingerprint collapse -> MinHash-LSH candidates over exact
    keepers -> shingle-Jaccard verify -> connected components. Leaves
    ``d2k`` (doc_id, keeper_id) and ``clusters`` (node, cluster_id)
    defined; the caller selects the canonical mapping."""
    return f"""fpt AS (SELECT doc_id, {fingerprint_sql('text')} AS fp
       FROM {table}),
exact AS (SELECT fp, min(doc_id) AS keeper_id FROM fpt GROUP BY 1),
d2k AS (SELECT f.doc_id, e.keeper_id FROM fpt f JOIN exact e USING (fp)),
keepers AS (SELECT t.* FROM {table} t
            WHERE t.doc_id IN (SELECT keeper_id FROM exact)),
{_minhash_sig_cte("keepers")},
melted AS ({_melted_cte()}),
cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM melted a
  JOIN melted b ON a.band_pos = b.band_pos AND a.sig = b.sig
               AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
edges0 AS (
  SELECT i.a_id, i.b_id
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.a_id
  JOIN counts cb ON cb.doc_id = i.b_id
  WHERE CAST(i.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_common)
        >= {jaccard_threshold}),
{_WALK_CC.format(pairs="edges0")}"""


def dedup_corpus_sql(table: str = "documents",
                     jaccard_threshold: float = 0.5) -> str:
    """dedup.dedup_corpus — (doc_id, canonical_id, is_canonical)."""
    return f"""
WITH RECURSIVE {_dedup_corpus_ctes(table, jaccard_threshold)}
SELECT d2k.doc_id,
       COALESCE(c.cluster_id, d2k.keeper_id) AS canonical_id,
       d2k.doc_id = COALESCE(c.cluster_id, d2k.keeper_id) AS is_canonical
FROM d2k LEFT JOIN clusters c ON d2k.keeper_id = c.node
"""


def _dsir_select_ctes(src: str, target_pred: str, k: int, salt: str,
                      n_buckets: int, smoothing: float,
                      table: str) -> str:
    """The DSIR-gate CTE chain of pipeline._gate_flow: fit weights with
    raw = the ``src`` CTE's survivors, target = ``target_pred`` over the
    base ``table``, then Gumbel-top-``k`` exactly as dsir_resample_sql
    (same salt framing ``{salt}-dsir`` / ``{salt}-dsir:g``, same
    half-step nudge). Leaves ``dsel`` = surviving rows of ``src``."""
    from qvarn_mr_spark.functions.sampling import (UNIT_DENOM,
                                                   sample_unit_sql)
    salt_d = f"{salt}-dsir"
    a = float(smoothing)
    b = float(smoothing) * n_buckets
    cte = _dsir_grams_cte(f"doc_id IN (SELECT doc_id FROM {src})",
                          target_pred, n_buckets, salt_d, table) \
        .format(a=repr(a), b=repr(b))
    u = sample_unit_sql("doc_id", f"{salt_d}:g")
    return f"""{cte},
dsel_ids AS MATERIALIZED (
  SELECT doc_id
  FROM dsir_w
  ORDER BY round(log_w + (-ln(-ln({u} + {0.5 / UNIT_DENOM!r}))), 6)
             DESC, doc_id ASC
  LIMIT {int(k)}),
dsel AS MATERIALIZED (
  SELECT * FROM {src}
  WHERE doc_id IN (SELECT doc_id FROM dsel_ids))"""


def _perplexity_gate_ctes(src: str, keep: int, n_buckets: int,
                          smoothing: float = 0.5) -> str:
    """The CCNet perplexity-gate CTE chain of pipeline._gate_flow
    (``perplexity_keep_buckets``): unigram-LM surprisal fitted on the
    ``src`` survivors themselves, ntile per PROFILED lang ordered by
    ``(mean_nll, doc_id)``, keep buckets ``1..keep``. Leaves ``pk`` =
    surviving rows of ``src`` (tokenless docs drop out via the inner
    join, same as the Spark side)."""
    return f"""ptoks AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_RE}'),
           x -> x != '')) AS w
  FROM {src}),
plm AS (SELECT w, count(*) AS c FROM ptoks GROUP BY 1),
ptot AS (SELECT sum(c) AS n, count(*) AS v FROM plm),
psur AS MATERIALIZED (
  SELECT doc_id,
         round(avg(-ln((c + {smoothing}) / (n + {smoothing} * v))), 6)
           AS _pnll
  FROM ptoks JOIN plm USING (w) CROSS JOIN ptot
  GROUP BY doc_id),
pkeep AS (
  SELECT doc_id FROM (
    SELECT s.doc_id, ntile({n_buckets}) OVER (PARTITION BY k2.lang
             ORDER BY s._pnll, s.doc_id) AS b
    FROM psur s JOIN {src} k2 USING (doc_id))
  WHERE b <= {keep}),
pk AS MATERIALIZED (
  SELECT k.* FROM {src} k JOIN pkeep USING (doc_id))"""


def _c4_gate_ctes(survivors: str, min_words: int,
                  min_terminal_frac: float = 0.0,
                  max_words: int = 10 ** 9) -> str:
    """CTE block for the C4 gate inside the composed pipeline oracles:
    filters ``survivors`` with the same predicate quality.c4_filter
    applies (word-count band, lorem/brace/policy/blocklist markers,
    terminal-punctuation floor); exposes ``c4k``. The word ceiling
    default is disengaged, mirroring _gate_flow / corpus_gate_stream
    (the pipelines' token band is the size cap)."""
    from qvarn_mr_spark.functions.quality import (C4_BLOCKLIST,
                                                  C4_POLICY_PHRASES)
    policy = " + ".join(
        f"CASE WHEN contains(lower(k.text), '{p}') THEN 1 ELSE 0 END"
        for p in C4_POLICY_PHRASES)
    bad = "|".join(C4_BLOCKLIST)
    nw = ("len(list_filter(regexp_split_to_array(k.text, '\\s+'), "
          "x -> length(x) > 0))")
    lines = ("list_filter(string_split(k.text, chr(10)), "
             "l -> length(trim(l)) > 0)")
    term_frac = (f"CASE WHEN len({lines}) > 0 THEN "
                 f"CAST(len(list_filter({lines}, "
                 f"l -> regexp_matches(trim(l), '[.!?\"]$'))) AS DOUBLE)"
                 f" / len({lines}) ELSE 0.0 END")
    return f"""c4k AS MATERIALIZED (
  SELECT k.* FROM {survivors} k
  WHERE {nw} >= {min_words} AND {nw} <= {max_words}
    AND NOT contains(lower(k.text), 'lorem ipsum')
    AND NOT contains(k.text, '{{')
    AND ({policy}) = 0
    AND NOT regexp_matches(lower(k.text), '\\b({bad})\\b')
    AND {term_frac} >= {min_terminal_frac})"""



def _gopher_gate_ctes(survivors: str, min_words: int,
                      max_words: int = 10 ** 9,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_ratio: float = 0.1,
                      max_bullet_frac: float = 0.9,
                      max_ellipsis_frac: float = 0.3,
                      min_alpha_frac: float = 0.8,
                      min_stopwords: int = 2) -> str:
    """CTE block for the Gopher gate inside the composed pipeline
    oracles: filters ``survivors`` with the same predicate
    quality.gopher_filter applies; exposes ``gok``."""
    from qvarn_mr_spark.functions.quality import (GOPHER_BULLETS,
                                                  GOPHER_STOPWORDS)
    words = ("list_filter(regexp_split_to_array(k.text, '\\s+'), "
             "x -> length(x) > 0)")
    lines = ("list_filter(string_split(k.text, chr(10)), "
             "l -> length(trim(l)) > 0)")
    bullets = " OR ".join(
        f"starts_with(ltrim(l), '{b}')" for b in GOPHER_BULLETS)
    stops = " + ".join(
        f"CASE WHEN list_contains(list_transform({words}, "
        f"x -> lower(x)), '{s}') THEN 1 ELSE 0 END"
        for s in GOPHER_STOPWORDS)
    nw = f"len({words})"
    mwl = (f"CASE WHEN {nw} > 0 THEN "
           f"CAST(list_sum(list_transform({words}, x -> length(x)))"
           f" AS DOUBLE) / {nw} ELSE 0.0 END")
    sym = (f"CASE WHEN {nw} > 0 THEN "
           f"((length(k.text) - length(replace(k.text, '#', '')))"
           f" + (length(k.text) - length(replace(k.text, '...', '')))/3"
           f" + (length(k.text) - length(replace(k.text, '…', ''))))"
           f" / CAST({nw} AS DOUBLE) ELSE 0.0 END")
    bullet_frac = (f"CASE WHEN len({lines}) > 0 THEN "
                   f"CAST(len(list_filter({lines}, l -> {bullets}))"
                   f" AS DOUBLE) / len({lines}) ELSE 0.0 END")
    ell_frac = (f"CASE WHEN len({lines}) > 0 THEN "
                f"CAST(len(list_filter({lines}, "
                f"l -> ends_with(rtrim(l), '...')"
                f" OR ends_with(rtrim(l), '…'))) AS DOUBLE)"
                f" / len({lines}) ELSE 0.0 END")
    alpha = (f"CASE WHEN {nw} > 0 THEN "
             f"CAST(len(list_filter({words}, "
             f"x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)"
             f" / {nw} ELSE 0.0 END")
    return f"""gok AS MATERIALIZED (
  SELECT k.* FROM {survivors} k
  WHERE {nw} >= {min_words} AND {nw} <= {max_words}
    AND {mwl} >= {min_mean_word_len} AND {mwl} <= {max_mean_word_len}
    AND {sym} <= {max_symbol_ratio}
    AND {bullet_frac} <= {max_bullet_frac}
    AND {ell_frac} <= {max_ellipsis_frac}
    AND {alpha} >= {min_alpha_frac}
    AND ({stops}) >= {min_stopwords})"""


def corpus_prepare_sql(min_quality: float = 0.3, min_tokens: int = 5,
                       max_tokens: int = 100_000,
                       jaccard_threshold: float = 0.5,
                       split_weights: dict[str, float] | None = None,
                       c4_min_words: int | None = None,
                       c4_min_terminal_frac: float = 0.0,
                       gopher_min_words: int | None = None,
                       gopher_min_stopwords: int = 2,
                       perplexity_keep_buckets: int | None = None,
                       perplexity_n_buckets: int = 3,
                       dsir_target_pred: str | None = None,
                       dsir_k: int | None = None,
                       dsir_buckets: int | None = None,
                       salt: str = "corpus",
                       table: str = "documents") -> str:
    """pipeline.corpus_prepare (default gates, optional perplexity gate
    and/or DSIR select): profile -> quality / token filters ->
    [perplexity head/middle keep] -> [DSIR top-k toward
    ``dsir_target_pred``] -> dedup_corpus onto canonicals -> consistent
    split. One row per surviving canonical doc:
    (doc_id, lang, n_tokens, quality, n_duplicates, split)."""
    from qvarn_mr_spark.functions.sampling import (DSIR_BUCKETS,
                                                   assign_split_sql)
    if split_weights is None:
        split_weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    n = norm_sql("text")
    survivors = "kept"
    dsir_ctes = ""
    if c4_min_words is not None:
        dsir_ctes += _c4_gate_ctes(survivors, c4_min_words,
                                   c4_min_terminal_frac) + ",\n"
        survivors = "c4k"
    if gopher_min_words is not None:
        dsir_ctes += _gopher_gate_ctes(
            survivors, gopher_min_words,
            min_stopwords=gopher_min_stopwords) + ",\n"
        survivors = "gok"
    if perplexity_keep_buckets is not None:
        dsir_ctes += _perplexity_gate_ctes(
            survivors, perplexity_keep_buckets,
            perplexity_n_buckets) + ",\n"
        survivors = "pk"
    if dsir_target_pred is not None:
        dsir_ctes += _dsir_select_ctes(
            survivors, dsir_target_pred, dsir_k, salt,
            dsir_buckets or DSIR_BUCKETS, 1.0, table) + ",\n"
        survivors = "dsel"
    return f"""
WITH RECURSIVE prof AS (
  SELECT doc_id, text,
         {lang_guess_sql(n)} AS lang,
         {token_count_sql('text')} AS n_tokens,
         {quality_score_sql('text', n)} AS quality
  FROM {table}),
kept AS MATERIALIZED (
  SELECT * FROM prof
  WHERE quality >= {min_quality}
    AND n_tokens >= {min_tokens} AND n_tokens <= {max_tokens}),
{dsir_ctes}{_dedup_corpus_ctes(survivors, jaccard_threshold)},
mapping AS (
  SELECT d2k.doc_id,
         COALESCE(c.cluster_id, d2k.keeper_id) AS canonical_id
  FROM d2k LEFT JOIN clusters c ON d2k.keeper_id = c.node),
sizes AS (SELECT canonical_id, count(*) - 1 AS n_duplicates
          FROM mapping GROUP BY 1)
SELECT k.doc_id, k.lang, k.n_tokens, k.quality, s.n_duplicates,
       {assign_split_sql('k.doc_id', split_weights, salt)} AS split
FROM {survivors} k
JOIN mapping m ON m.doc_id = k.doc_id AND m.doc_id = m.canonical_id
JOIN sizes s ON s.canonical_id = k.doc_id
"""


def corpus_funnel_sql(min_quality: float = 0.3, min_tokens: int = 5,
                      max_tokens: int = 100_000,
                      jaccard_threshold: float = 0.5,
                      c4_min_words: int | None = None,
                      c4_min_terminal_frac: float = 0.0,
                      gopher_min_words: int | None = None,
                      gopher_min_stopwords: int = 2,
                      perplexity_keep_buckets: int | None = None,
                      perplexity_n_buckets: int = 3,
                      dsir_target_pred: str | None = None,
                      dsir_k: int | None = None,
                      dsir_buckets: int | None = None,
                      salt: str = "corpus",
                      table: str = "documents") -> str:
    """pipeline.corpus_funnel (default gates, optional perplexity /
    DSIR stages): per-stage surviving counts (stage_idx, stage, n_docs)
    for input -> gates [-> perplexity] [-> dsir] -> canonical."""
    from qvarn_mr_spark.functions.sampling import DSIR_BUCKETS
    n = norm_sql("text")
    survivors = "kept"
    dsir_ctes = ""
    if c4_min_words is not None:
        dsir_ctes += _c4_gate_ctes(survivors, c4_min_words,
                                   c4_min_terminal_frac) + ",\n"
        survivors = "c4k"
    if gopher_min_words is not None:
        dsir_ctes += _gopher_gate_ctes(
            survivors, gopher_min_words,
            min_stopwords=gopher_min_stopwords) + ",\n"
        survivors = "gok"
    if perplexity_keep_buckets is not None:
        dsir_ctes += _perplexity_gate_ctes(
            survivors, perplexity_keep_buckets,
            perplexity_n_buckets) + ",\n"
        survivors = "pk"
    if dsir_target_pred is not None:
        dsir_ctes += _dsir_select_ctes(
            survivors, dsir_target_pred, dsir_k, salt,
            dsir_buckets or DSIR_BUCKETS, 1.0, table) + ",\n"
        survivors = "dsel"
    stages = [("input", table), ("gates", "kept")]
    if c4_min_words is not None:
        stages.append(("c4", "c4k"))
    if gopher_min_words is not None:
        stages.append(("gopher", "gok"))
    if perplexity_keep_buckets is not None:
        stages.append(("perplexity", "pk"))
    if dsir_target_pred is not None:
        stages.append(("dsir", "dsel"))
    stages.append(("canonical", "canon"))
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" count(*) AS n_docs FROM {src}"
        for i, (name, src) in enumerate(stages))
    return f"""
WITH RECURSIVE prof AS (
  SELECT doc_id, text,
         {lang_guess_sql(n)} AS lang,
         {token_count_sql('text')} AS n_tokens,
         {quality_score_sql('text', n)} AS quality
  FROM {table}),
kept AS MATERIALIZED (
  SELECT * FROM prof
  WHERE quality >= {min_quality}
    AND n_tokens >= {min_tokens} AND n_tokens <= {max_tokens}),
{dsir_ctes}{_dedup_corpus_ctes(survivors, jaccard_threshold)},
mapping AS (
  SELECT d2k.doc_id,
         COALESCE(c.cluster_id, d2k.keeper_id) AS canonical_id
  FROM d2k LEFT JOIN clusters c ON d2k.keeper_id = c.node),
canon AS (SELECT doc_id FROM mapping WHERE doc_id = canonical_id)
{unions}
"""


def _clf_feature_scaffold(table: str) -> tuple:
    """Shared CTE scaffold of the classifier oracles: the staged feature
    expressions (classifier._feature_frame's SQL twin) ending in a view
    ``f(doc_id, <sorted feature names>)``. Returns ``(names, ctes)``."""
    names = sorted(["len_score", "punct", "stopword"]
                   + [f"hits_{lang}" for lang in LANG_MARKERS])
    hit_cols = ",\n             ".join(
        f"{marker_hits_sql('norm', words)} AS h_{lang}"
        for lang, words in LANG_MARKERS.items())
    feats = {
        "len_score": "least(CAST(toks AS DOUBLE) / 100.0, 1.0)",
        "punct": "punct",
        "stopword": ("CASE WHEN toks = 0 THEN 0.0 ELSE "
                     "least(CAST(h_stop AS DOUBLE) / toks, 1.0) END"),
    }
    for lang in LANG_MARKERS:
        feats[f"hits_{lang}"] = (
            f"least(CAST(h_{lang} AS DOUBLE) / "
            f"CAST(greatest(toks, 1) AS DOUBLE), 1.0)")
    fcols = ",\n             ".join(
        f"COALESCE({feats[nm]}, 0.0) AS {nm}" for nm in names)
    ctes = f"""st AS (SELECT doc_id, text, {norm_sql('text')} AS norm FROM {table}),
h AS (SELECT doc_id,
             {hit_cols},
             {marker_hits_sql('norm', EN_STOPWORDS)} AS h_stop,
             {token_count_sql('text')} AS toks,
             {punct_ratio_sql('text')} AS punct
      FROM st),
f AS (SELECT doc_id,
             {fcols}
      FROM h)"""
    return names, ctes


def _clf_z_sql(weights: dict, names: list) -> str:
    """The logit expression for one fitted weight set — accumulated in
    the same sorted-name, left-associated order as classifier.score_frame
    so the float sums agree bit-for-bit."""
    z = repr(float(weights.get("_bias", 0.0)))
    for nm in names:
        if nm in weights:
            z = f"({z} + {float(weights[nm])!r} * {nm})"
    return z


def classifier_score_sql(weights: dict, digits: int = 4,
                         threshold: float | None = 0.5,
                         table: str = "documents") -> str:
    """classifier.score_frame with FITTED WEIGHTS INLINED AS LITERALS —
    the scoring path is a deterministic sigmoid over the same staged
    feature expressions (classifier._feature_frame), so once the weights
    are pinned (the committed ``.clf_weights.json`` sidecar) the whole
    query is value-oracle-able."""
    names, ctes = _clf_feature_scaffold(table)
    z = _clf_z_sql(weights, names)
    sel = [f"round(1.0 / (1.0 + exp(-{z})), {digits}) AS score"]
    if threshold is not None:
        sel.append(f"(1.0 / (1.0 + exp(-{z})) >= {threshold}) AS kept")
    cols = ",\n       ".join(sel)
    return f"""
WITH {ctes}
SELECT doc_id,
       {cols}
FROM f
"""


def classifier_score_dispatch_sql(entries: list, digits: int = 4,
                                  threshold: float | None = 0.5,
                                  table: str = "documents") -> str:
    """classifier.score_frame dispatching AT SQL RUNTIME over several
    committed weight sets: ``entries`` is ``[((n_docs, sum_text_len),
    weights), ...]``; the query computes the live table's (count,
    total text length) fingerprint and scores with the weight set whose
    committed fingerprint matches. This keeps the oracle correct no
    matter which sf_dir the driver evaluates it against — a scale with
    no committed entry yields NULL scores (an honest mismatch) instead
    of silently scoring with another scale's weights."""
    names, ctes = _clf_feature_scaffold(table)

    def case(term_of) -> str:
        whens = "\n            ".join(
            f"WHEN _rt_n = {int(n)} AND _rt_slen = {int(s)} "
            f"THEN {term_of(w)}"
            for (n, s), w in entries)
        return f"CASE {whens} END"

    sig = lambda w: (f"round(1.0 / (1.0 + exp(-{_clf_z_sql(w, names)})), "
                     f"{digits})")
    sel = [f"{case(sig)} AS score"]
    if threshold is not None:
        kept = lambda w: (f"(1.0 / (1.0 + exp(-{_clf_z_sql(w, names)})) "
                          f">= {threshold})")
        sel.append(f"{case(kept)} AS kept")
    cols = ",\n       ".join(sel)
    return f"""
WITH {ctes},
rt AS (SELECT count(*) AS _rt_n,
              CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS _rt_slen
       FROM {table})
SELECT doc_id,
       {cols}
FROM f CROSS JOIN rt
"""


# ---------------------------------------------------------------------------
# sampling.dsir_* twins
# ---------------------------------------------------------------------------


def dsir_bucket_sql(gram: str, n_buckets: int, salt: str) -> str:
    """sampling._gram_bucket — ascii-decode of the first 6 md5 nibbles,
    mod the bucket width (same nibble count, same salt framing)."""
    from qvarn_mr_spark.functions.sampling import _DSIR_NIBBLES
    terms = " + ".join(
        f"(CASE WHEN ascii(substring(md5('{salt}|' || {gram}), {j + 1}, 1))"
        f" <= 57 THEN ascii(substring(md5('{salt}|' || {gram}), {j + 1}, 1))"
        f" - 48 ELSE ascii(substring(md5('{salt}|' || {gram}), {j + 1}, 1))"
        f" - 87 END) * {16 ** (_DSIR_NIBBLES - 1 - j)}"
        for j in range(_DSIR_NIBBLES))
    return f"(({terms}) % {n_buckets})"


def _dsir_grams_cte(raw_pred: str, target_pred: str, n_buckets: int,
                    salt: str, table: str = "documents") -> str:
    """(doc_id, bucket) with multiplicity for the raw and target corpora:
    unigrams + word bigrams (list_concat of tokens and adjacent joins),
    in lockstep with sampling._dsir_grams."""
    return f"""
dsir_t AS (
  SELECT doc_id, ({raw_pred}) AS is_raw, ({target_pred}) AS is_tgt,
         list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                     x -> x != '') AS t
  FROM {table}
  WHERE ({raw_pred}) OR ({target_pred})
),
dsir_g AS (
  SELECT doc_id, is_raw, is_tgt,
         {dsir_bucket_sql('g', n_buckets, salt)} AS bucket
  FROM (
    SELECT doc_id, is_raw, is_tgt,
           unnest(list_concat(
               t, list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1]))) AS g
    FROM dsir_t
  )
),
dsir_rawb AS (SELECT bucket, count(*) AS rc FROM dsir_g
              WHERE is_raw GROUP BY 1),
dsir_tgtb AS (SELECT bucket, count(*) AS tc FROM dsir_g
              WHERE is_tgt GROUP BY 1),
dsir_tot AS (SELECT (SELECT sum(rc) FROM dsir_rawb) AS R,
                    (SELECT sum(tc) FROM dsir_tgtb) AS T),
dsir_lr AS (
  SELECT r.bucket,
         ln((COALESCE(t.tc, 0) + {{a}}) / (tot.T + {{b}}))
         - ln((r.rc + {{a}}) / (tot.R + {{b}})) AS lr
  FROM dsir_rawb r LEFT JOIN dsir_tgtb t USING (bucket)
  CROSS JOIN dsir_tot tot
),
dsir_w AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         round(sum(lr.lr), 6) AS log_w
  FROM dsir_g g JOIN dsir_lr lr USING (bucket)
  WHERE g.is_raw
  GROUP BY 1
)"""


def dsir_weights_sql(target_pred: str, raw_pred: str = "TRUE",
                     n_buckets: int = 256, smoothing: float = 1.0,
                     salt: str = "dsir", table: str = "documents") -> str:
    """sampling.dsir_weights — add-k hashed-ngram likelihood-ratio
    weights of the raw corpus against the ``target_pred`` subset."""
    a = float(smoothing)
    b = float(smoothing) * n_buckets
    cte = _dsir_grams_cte(raw_pred, target_pred, n_buckets, salt, table) \
        .format(a=repr(a), b=repr(b))
    return f"WITH {cte} SELECT doc_id, n_grams, log_w FROM dsir_w"


def dsir_resample_sql(target_pred: str, k: int, raw_pred: str = "TRUE",
                      n_buckets: int = 256, smoothing: float = 1.0,
                      salt: str = "dsir", table: str = "documents") -> str:
    """sampling.dsir_resample — Gumbel-top-k over the weights, the Gumbel
    drawn from the same consistent hash (same salt suffix, same
    half-step-off-zero nudge) so both engines cut the identical set."""
    from qvarn_mr_spark.functions.sampling import (UNIT_DENOM,
                                                   sample_unit_sql)
    a = float(smoothing)
    b = float(smoothing) * n_buckets
    cte = _dsir_grams_cte(raw_pred, target_pred, n_buckets, salt, table) \
        .format(a=repr(a), b=repr(b))
    u = sample_unit_sql("doc_id", f"{salt}:g")
    return f"""
WITH {cte}
SELECT doc_id, log_w,
       round(log_w + (-ln(-ln({u} + {0.5 / UNIT_DENOM!r}))), 6) AS key
FROM dsir_w
ORDER BY key DESC, doc_id ASC
LIMIT {int(k)}
"""


def _kmeans_ctes(init_pred: str | None, iters: int,
                 table: str = "embeddings", prefix: str = "",
                 init_sql: str | None = None,
                 corpus_pred: str = "TRUE") -> str:
    """Unrolled-Lloyd CTE chain shared by the k-means oracles — one
    (assignment, mean-update, carry-forward, re-list) block per
    iteration, mirroring similarity.kmeans_fit round for round: cosine
    rounds to 6 before the argmax (cluster_id ascending on ties), means
    round to 6, empty clusters keep the previous centroid.

    ``init_sql``: warm start — a query yielding ``(cluster_id, pos,
    val)`` (kmeans_centroids_sql's output shape) used as the c0
    centroids instead of ``init_pred``'s seed rows, mirroring
    kmeans_fit(init_centroids=...). ``corpus_pred`` restricts the
    corpus (the pre-delta fit of a composed warm oracle). ``prefix``
    disambiguates CTE names when one chain embeds another — same
    discipline as pagerank_sql."""
    P = prefix
    cos = _COS.format(a="v.e", b="c.c")
    parts = [
        f"{P}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
        f" FROM {table} WHERE {corpus_pred})",
        (f"{P}x AS (SELECT vec_id, generate_subscripts(e, 1) - 1 AS pos, "
         f"unnest(e) AS val FROM {P}e)"),
    ]
    if init_sql is not None:
        parts.append(
            f"{P}c0 AS (SELECT cluster_id, "
            f"list(round(val, 6) ORDER BY pos) AS c "
            f"FROM ({init_sql}) GROUP BY cluster_id)")
    else:
        parts.append(
            f"{P}c0 AS (SELECT vec_id AS cluster_id, "
            f"list_transform(e, z -> round(z, 6)) AS c "
            f"FROM {P}e WHERE {init_pred})")
    for i in range(iters):
        parts.append(f"""{P}a{i} AS (
  SELECT vec_id, cluster_id, cos_sim FROM (
    SELECT v.vec_id, c.cluster_id, round({cos}, 6) AS cos_sim,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round({cos}, 6) DESC,
                                       c.cluster_id ASC) AS rn
    FROM {P}e v, {P}c{i} c) WHERE rn = 1)""")
        parts.append(f"""{P}m{i + 1} AS (
  SELECT a.cluster_id, x.pos, round(avg(x.val), 6) AS val
  FROM {P}a{i} a JOIN {P}x x ON a.vec_id = x.vec_id GROUP BY 1, 2)""")
        parts.append(f"""{P}ce{i + 1} AS (
  SELECT p.cluster_id, p.pos, coalesce(m.val, p.val) AS val
  FROM (SELECT cluster_id, generate_subscripts(c, 1) - 1 AS pos,
               unnest(c) AS val FROM {P}c{i}) p
  LEFT JOIN {P}m{i + 1} m ON m.cluster_id = p.cluster_id
                          AND m.pos = p.pos)""")
        parts.append(
            f"{P}c{i + 1} AS (SELECT cluster_id,"
            f" list(val ORDER BY pos) AS c "
            f"FROM {P}ce{i + 1} GROUP BY 1)")
    return ",\n".join(parts)


def kmeans_centroids_sql(init_pred: str | None, iters: int = 2,
                         table: str = "embeddings", prefix: str = "",
                         init_sql: str | None = None,
                         corpus_pred: str = "TRUE") -> str:
    """similarity.kmeans_centroids — centroids after ``iters`` Lloyd
    rounds, exploded (cluster_id, pos, val). Compose a warm-start
    oracle by passing a full kmeans_centroids_sql(..., prefix="w_",
    corpus_pred=<pre-delta>) as ``init_sql``."""
    P = prefix
    if iters <= 0:
        return f"""
WITH {_kmeans_ctes(init_pred, 0, table, prefix, init_sql, corpus_pred)}
SELECT cluster_id, generate_subscripts(c, 1) - 1 AS pos, unnest(c) AS val
FROM {P}c0
"""
    return f"""
WITH {_kmeans_ctes(init_pred, iters, table, prefix, init_sql, corpus_pred)}
SELECT cluster_id, pos, val FROM {P}ce{iters}
"""


def kmeans_assign_sql(init_pred: str, iters: int = 2,
                      table: str = "embeddings") -> str:
    """similarity.kmeans_assign — corpus assignment under the fully
    fitted centroids (one extra assignment block past the last update)."""
    return f"""
WITH {_kmeans_ctes(init_pred, iters + 1, table)}
SELECT vec_id, cluster_id, cos_sim FROM a{iters}
"""


def cluster_density_sample_sql(init_pred: str, cap: int, iters: int = 2,
                               salt: str = "density",
                               table: str = "embeddings") -> str:
    """similarity.cluster_density_sample — keep-probability
    min(1, cap/|cluster|) by the shared consistent hash; the filter
    compares the UNROUNDED double fraction on both engines (identical
    IEEE division), keep_frac in the output rounds to 6."""
    from qvarn_mr_spark.functions.sampling import sample_unit_sql
    unit = sample_unit_sql("a.vec_id", salt)
    frac = f"least(1.0, {float(cap)!r} / CAST(s.cluster_n AS DOUBLE))"
    return f"""
WITH {_kmeans_ctes(init_pred, iters + 1, table)},
sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_n
          FROM a{iters} GROUP BY 1)
SELECT a.vec_id, a.cluster_id, s.cluster_n, round({frac}, 6) AS keep_frac
FROM a{iters} a JOIN sizes s ON a.cluster_id = s.cluster_id
WHERE {unit} < {frac}
"""


def kmeans_probe_search_sql(init_pred: str, query_pred: str, k: int = 3,
                            iters: int = 2,
                            table: str = "embeddings") -> str:
    """similarity.kmeans_probe_search — the ivf_probe_search probe block
    over the unrolled-Lloyd assignment (a{iters}) instead of the
    seed-row assignment."""
    cos = _COS.format(a="qv.e", b="nv.e")
    return f"""
WITH {_kmeans_ctes(init_pred, iters + 1, table)},
q AS (SELECT a.vec_id AS q_id, a.cluster_id AS q_cluster
      FROM a{iters} a
      WHERE a.vec_id IN (SELECT vec_id FROM e WHERE {query_pred})),
scored AS (
  SELECT q.q_id, m.vec_id AS n_id, round({cos}, 6) AS cos_sim
  FROM q
  JOIN e qv ON qv.vec_id = q.q_id
  JOIN a{iters} m ON m.cluster_id = q.q_cluster
  JOIN e nv ON nv.vec_id = m.vec_id
  WHERE q.q_id != m.vec_id
)
SELECT q_id, n_id, cos_sim, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id ASC) AS rn
  FROM scored) WHERE rn <= {k}
"""


def _dedup_fp_entries(entries: list, what: str) -> list:
    """Collapse committed-artifact entries to ONE per fingerprint.

    Exact duplicate (fingerprint, payload) rows are merged; the same
    fingerprint mapping to CONFLICTING payloads raises — two committed
    sidecar entries whose weak fingerprints collide across md5-distinct
    datasets would otherwise BOTH match at runtime, land two branches in
    the dispatch, and duplicate/mix the output rows. Deduping on the
    (fingerprint, payload) pair alone would not catch that."""
    by_fp: dict = {}
    out = []
    for fp, payload in entries:
        key = tuple(int(x) for x in fp) if not isinstance(fp, int) else fp
        canon = (tuple(tuple(p) for p in payload)
                 if isinstance(payload, list) else payload)
        if key in by_fp:
            if by_fp[key] != canon:
                raise ValueError(
                    f"{what}: fingerprint {key} maps to conflicting "
                    f"committed payloads — the weak fingerprint collides "
                    f"across distinct datasets; strengthen the "
                    f"fingerprint (add a content stat) or regenerate the "
                    f"sidecar")
            continue
        by_fp[key] = canon
        out.append((fp, payload))
    return out


def bpe_tokenize_dispatch_sql(entries: list,
                              table: str = "documents") -> str:
    """text.bpe_encode_arrow over COMMITTED merge tables — the full
    value oracle for BPE tokenization (VERDICT r11 #4c), the
    committed-artifact dispatch discipline (pq_search_dispatch_sql)
    applied to an iteratively-trained merge list: ``entries`` is
    ``[((n_docs, sum_text_len), [(left, right), ...]), ...]`` with the
    pairs in rank order; the live table's fingerprint picks the entry,
    a scale with no committed merges yields an empty result (honest
    mismatch).

    The greedy left-to-right merge fold (text.bpe_fold_reference)
    replays EXACTLY in SQL: symbols ride in a '|'-joined accumulator
    string ('|' cannot occur in [a-z0-9]+ tokens), and per merge rank a
    ``list_reduce`` appends each symbol unless the accumulator ends
    with the rank's left symbol and the incoming one IS the right —
    then the tail is rewritten to the merged symbol, the same
    ``acc[-1]`` rule the Python/Arrow fold applies (prototype-verified
    against bpe_fold_reference on run/overlap edge cases)."""
    if not entries:
        return None
    entries = _dedup_fp_entries(entries, "bpe_tokenize_dispatch_sql")
    selects = []
    for fp, pairs in entries:
        n, slen = int(fp[0]), int(fp[1])
        fold = "regexp_split_to_array(w, '')"
        for left, right in pairs:
            fold = _bpe_fold_expr(fold, left, right)
        selects.append(f"""
SELECT d.doc_id,
       CAST(coalesce(t.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(t.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(t.n_subwords, 0) AS BIGINT) AS n_subwords
FROM {table} d LEFT JOIN (
  SELECT doc_id, count(*) AS n_words, sum(length(w)) AS n_chars,
         sum(len({fold})) AS n_subwords
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                                                     '{TOKEN_RE}'),
                      x -> x != '')) AS w
        FROM {table})
  GROUP BY doc_id) t USING (doc_id)
WHERE (SELECT n FROM rt) = {n} AND (SELECT s FROM rt) = {slen}""")
    body = "\nUNION ALL\n".join(selects)
    return (f"WITH rt AS (SELECT count(*) AS n, "
            f"CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS s "
            f"FROM {table})\n" + body)


def _bpe_fold_expr(base: str, left: str, right: str) -> str:
    """One merge rank's greedy left-to-right fold over a symbol list —
    the SQL twin of text.bpe_fold_reference's inner loop: symbols ride
    a '|'-joined accumulator ('|' cannot occur in [a-z0-9]+ tokens);
    each incoming symbol either appends or, when the accumulator ends
    with ``left`` and the symbol IS ``right``, rewrites the tail to the
    merged symbol (the acc[-1] rule)."""
    if not (left.isalnum() and right.isalnum()):
        raise ValueError(f"non-alnum merge pair {(left, right)!r}")
    merged = left + right
    lam = (f"(acc, x) -> CASE WHEN (acc = '{left}' OR acc LIKE "
           f"'%|{left}') AND x = '{right}' THEN substr(acc, 1, "
           f"length(acc) - {len(left)}) || '{merged}' "
           f"ELSE acc || '|' || x END")
    return f"str_split(list_reduce({base}, {lam}), '|')"


def bpe_merges_dispatch_sql(entries: list,
                            table: str = "documents") -> str:
    """text.bpe_merges — the TRAINING loop itself, value-oracled
    (VERDICT r11 #4c extended): per committed entry the oracle rebuilds
    the vocabulary, then for each rank k INDEPENDENTLY recomputes the
    corpus-wide most-frequent adjacent pair (weighted count + argmax
    with the (c DESC, l, r) tiebreak) over the vocab folded by the
    committed pairs 1..k-1. The committed literals only steer the fold
    path — if any committed pair were NOT the true argmax at its rank,
    the recomputed rank-k row would differ from the Spark output and
    the hash goes red; so the per-iteration argmax chain is genuinely
    re-derived, not echoed."""
    # an entry with ZERO committed merges (no pair reached
    # min_pair_count) has no rank rows to emit — and an empty UNION
    # branch would be malformed SQL; its honest oracle is the empty
    # result, which the fingerprint dispatch yields by omission
    entries = [(fp, pairs) for fp, pairs in entries if pairs]
    if not entries:
        return None
    entries = _dedup_fp_entries(entries, "bpe_merges_dispatch_sql")
    parts = [f"rt AS (SELECT count(*) AS n, "
             f"CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS s "
             f"FROM {table})"]
    selects = []
    for i, (fp, pairs) in enumerate(entries):
        n, slen = int(fp[0]), int(fp[1])
        P = f"e{i}_"
        parts.append(
            f"{P}w0 AS (SELECT regexp_split_to_array(w, '') AS sym, "
            f"count(*) AS n FROM (SELECT unnest(list_filter("
            f"string_split_regex(lower(text), '{TOKEN_RE}'), "
            f"x -> x != '')) AS w FROM {table}) GROUP BY w)")
        branches = []
        for k, (left, right) in enumerate(pairs, start=1):
            prev = f"{P}w{k - 1}"
            parts.append(
                f"{P}p{k} AS (SELECT p[1] AS l, p[2] AS r, "
                f"CAST(sum(n) AS BIGINT) AS c FROM ("
                f"SELECT unnest(list_zip("
                f"list_slice(sym, 1, len(sym) - 1), "
                f"list_slice(sym, 2, len(sym)))) AS p, n "
                f"FROM {prev} WHERE len(sym) > 1) GROUP BY 1, 2)")
            parts.append(
                f"{P}b{k} AS (SELECT {k} AS rank, l, r, l || r AS m, c "
                f"FROM {P}p{k} ORDER BY c DESC, l, r LIMIT 1)")
            parts.append(
                f"{P}w{k} AS MATERIALIZED (SELECT "
                f"{_bpe_fold_expr('sym', left, right)} AS sym, n "
                f"FROM {prev})")
            branches.append(f"SELECT * FROM {P}b{k}")
        selects.append(
            f"SELECT rank, l AS \"left\", r AS \"right\", m AS merged, "
            f"c AS pair_count FROM ({' UNION ALL '.join(branches)}) "
            f"WHERE (SELECT n FROM rt) = {n} "
            f"AND (SELECT s FROM rt) = {slen}")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(selects))


def media_features_values_sql(rows: list) -> str:
    """functions/multimodal.py feature queries — committed-rows value
    oracle (VERDICT r12 #1): the media tables are driver-generated
    deterministic bytes (synthetic_media / synthetic_media_real) that do
    NOT exist as DuckDB views, so no runtime dispatch is possible; the
    committed artifact IS the full (media_id, kind, feature_sum) result,
    replayed as a literal VALUES table. Falsifiability split: the
    decode/feature MATH is pinned byte-exactly against independent numpy
    references in tests/test_functions.py; this oracle pins the
    end-to-end Spark path (generator → mapInPandas decode → featurize →
    sum) against drift — any change to generator bytes, decode, or
    feature layout goes hash-red until the sidecar is regenerated.
    ``rows``: [[media_id, kind, feature_sum], ...]."""
    if not rows:
        return None
    vals = ", ".join(
        f"({int(m)}, '{k}', {float(s)!r})" for m, k, s in rows)
    # explicit casts: a bare 2.864 literal is DECIMAL in DuckDB and
    # hash-mismatches Spark's double
    return (f"SELECT CAST(media_id AS BIGINT) AS media_id, kind, "
            f"CAST(feature_sum AS DOUBLE) AS feature_sum "
            f"FROM (VALUES {vals}) AS t(media_id, kind, feature_sum)")


def compression_ratio_dispatch_sql(entries: list,
                                   table: str = "documents") -> str:
    """quality.compression_ratio — FULL value oracle via the
    committed-artifact dispatch discipline (VERDICT r12 #2): zlib output
    lengths are deterministic but not SQL-computable, so ``entries``
    commits ``((n_docs, sum_text_len), [[doc_id, n_comp], ...])`` per
    scale; at SQL runtime the live table's fingerprint picks the entry,
    the raw byte length is RECOMPUTED from the live text
    (``octet_length(encode(...))`` = Python's ``len(t.encode('utf-8'))``)
    and the ratio re-derived from it — only the compressed length is
    echoed, so a wrong doc_id set, byte count, rounding, or empty-doc
    rule goes hash-red, and an inner join drops any doc missing from the
    sidecar (honest row-count mismatch). A scale with no committed entry
    yields an empty result (honest mismatch)."""
    if not entries:
        return None
    entries = _dedup_fp_entries(entries, "compression_ratio_dispatch_sql")
    selects = []
    for fp, lens in entries:
        n, slen = int(fp[0]), int(fp[1])
        vals = ", ".join(f"({int(d)}, {int(c)})" for d, c in lens)
        selects.append(f"""
SELECT d.doc_id,
       CAST(octet_length(encode(coalesce(d.text, ''))) AS BIGINT)
         AS n_bytes,
       CASE WHEN octet_length(encode(coalesce(d.text, ''))) = 0
            THEN CAST(1.0 AS DOUBLE)
            ELSE round(CAST(c.n_comp AS DOUBLE)
                       / octet_length(encode(coalesce(d.text, ''))), 6)
       END AS ratio
FROM {table} d JOIN (VALUES {vals}) AS c(doc_id, n_comp)
  ON d.doc_id = c.doc_id
WHERE (SELECT n FROM rt) = {n} AND (SELECT s FROM rt) = {slen}""")
    body = "\nUNION ALL\n".join(selects)
    return (f"WITH rt AS (SELECT count(*) AS n, "
            f"CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS s "
            f"FROM {table})\n" + body)


def perplexity_buckets_dispatch_sql(entries: list, n_buckets: int = 3,
                                    by: str = "lang",
                                    smoothing: float = 0.5,
                                    table: str = "documents") -> str:
    """quality.perplexity_buckets(method='thresholds') — FULL value
    oracle via committed cut points (VERDICT r12 #3): the
    percentile_approx cuts are sketch-derived (not SQL-computable), but
    they are deterministic values drawn from the data, so ``entries``
    commits ``((n_docs, sum_text_len), {lang: [cut, ...]})`` per scale;
    at SQL runtime the live table's fingerprint picks the entry, the
    surprisal scores are RECOMPUTED live (the value-oracled unigram-LM
    twin), and the bucket re-derived as ``1 + #cuts below the score`` —
    only the ``n_buckets - 1`` doubles per language are echoed, so a
    wrong score, assignment rule, label, or language set goes hash-red,
    and the inner join on ``lang`` drops rows for any language missing
    from the sidecar (honest row-count mismatch). A scale with no
    committed entry yields an empty result (honest mismatch). Cut
    literals replay via ``repr`` (shortest round-tripping decimal), so
    the strict ``>`` against Spark's 6-dp-rounded scores lands on
    bit-identical doubles in both engines."""
    if not entries:
        return None
    entries = _dedup_fp_entries(entries, "perplexity_buckets_dispatch_sql")
    if n_buckets == 3:
        label = ("CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
                 "ELSE 'tail' END")
    else:
        label = "'b' || CAST(b AS VARCHAR)"
    selects = []
    for fp, cuts_by_group in entries:
        n, slen = int(fp[0]), int(fp[1])
        vals = ", ".join(
            "('" + str(g).replace("'", "''") + "', "
            + ", ".join(f"CAST({float(c)!r} AS DOUBLE)" for c in cs) + ")"
            for g, cs in sorted(cuts_by_group.items()))
        cut_cols = ", ".join(f"c{i}" for i in range(1, n_buckets))
        bucket = " + ".join(
            f"(CASE WHEN j.mean_nll > cu.c{i} THEN 1 ELSE 0 END)"
            for i in range(1, n_buckets))
        selects.append(f"""
SELECT j.doc_id, j.{by}, j.n_tokens, j.mean_nll,
       CAST(1 + {bucket} AS INT) AS b
FROM j JOIN (VALUES {vals}) AS cu({by}, {cut_cols})
  ON j.{by} = cu.{by}
WHERE (SELECT n FROM rt) = {n} AND (SELECT s FROM rt) = {slen}""")
    body = "\nUNION ALL\n".join(selects)
    return (f"WITH rt AS (SELECT count(*) AS n, "
            f"CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS s "
            f"FROM {table}),\n"
            f"sur AS ({unigram_surprisal_sql(smoothing, table)}),\n"
            f"j AS (SELECT s.doc_id, d.{by}, s.n_tokens, s.mean_nll "
            f"FROM sur s JOIN {table} d USING (doc_id))\n"
            f"SELECT doc_id, {by}, n_tokens, mean_nll, b AS bucket, "
            f"{label} AS bucket_label FROM ({body})")


# --- link-graph centrality (operators/graph.py) ------------------------

#: Deterministic bipartite test graph from the TPC-H-ish tables: customer
#: <-> supplier edges wherever an order's lineitem connects them, both
#: directions (so the driver-query graph has no sinks; sink handling is
#: pytest-pinned separately on a synthetic graph).
CS_EDGES_SQL = """
SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                's' || CAST(l_suppkey AS VARCHAR) AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
UNION
SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                'c' || CAST(o_custkey AS VARCHAR) AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""

#: Pre-delta snapshot of CS_EDGES_SQL for the warm-start driver query:
#: the graph BEFORE the urgent orders arrive. The delta (urgent orders'
#: edges) is what the warm restart absorbs in few supersteps.
CS_EDGES_PRE_SQL = """
SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                's' || CAST(l_suppkey AS VARCHAR) AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderpriority <> '1-URGENT'
UNION
SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                'c' || CAST(o_custkey AS VARCHAR) AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderpriority <> '1-URGENT'
"""


def pagerank_sql(edges_sql: str, iters: int = 6, damping: float = 0.85,
                 digits: int = 6, weighted: bool = False,
                 seeds_sql: str | None = None,
                 init_sql: str | None = None,
                 prefix: str = "") -> str:
    parts = _pagerank_parts(edges_sql, iters, damping, weighted,
                            seeds_sql, init_sql, prefix)
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node, round(rank, {digits}) AS rank"
            f" FROM {prefix}pr{iters}")


def _pagerank_parts(edges_sql: str, iters: int, damping: float = 0.85,
                    weighted: bool = False,
                    seeds_sql: str | None = None,
                    init_sql: str | None = None,
                    prefix: str = "") -> list:
    """graph.pagerank — the power iteration unrolled into one CTE chain
    per superstep (dm{i} = dangling mass, c{i} = inbound contributions,
    pr{i} = the damped update). Fixed iteration count keeps the unroll
    finite and the arithmetic identical to the Spark loop. Reused CTEs
    are MATERIALIZED (DuckDB otherwise re-executes the subtree per
    reference — the SQL mirror of the Spark loop's localCheckpoint).

    ``weighted``: ``edges_sql`` carries a ``w`` column; duplicate
    (src, dst) rows sum and shares split by out-strength.
    ``seeds_sql``: personalized form — a query yielding the seed
    ``node`` set; teleport + dangling mass go to the seeds and ranks
    start at the teleport vector, mirroring graph.pagerank(seeds=...).
    ``init_sql``: warm start — a query yielding ``(node, rank)``; pr0
    becomes coalesce(init, 1/n) renormalized to sum 1, mirroring
    graph.pagerank(init_ranks=...). Compose by passing a full
    pagerank_sql(..., prefix="w_") over the PRE-delta edge set as
    ``init_sql`` — DuckDB forbids redefining a CTE name even in a
    nested scope, so the inner unroll must carry its own ``prefix``."""
    P = prefix
    if weighted:
        edge_cte = (f"{P}edges AS MATERIALIZED (SELECT src, dst,"
                    f" sum(CAST(w AS DOUBLE)) AS w"
                    f" FROM ({edges_sql}) GROUP BY src, dst)")
    else:
        edge_cte = (f"{P}edges AS MATERIALIZED (SELECT DISTINCT src, dst,"
                    f" 1.0 AS w FROM ({edges_sql}))")
    parts = [
        edge_cte,
        f"{P}nodes AS MATERIALIZED (SELECT src AS node FROM {P}edges"
        f" UNION SELECT dst FROM {P}edges)",
        f"{P}deg AS MATERIALIZED (SELECT src, sum(w) AS outdeg"
        f" FROM {P}edges GROUP BY src)",
        f"{P}nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {P}nodes)",
    ]
    if seeds_sql is not None:
        parts.append(f"{P}seeds AS MATERIALIZED (SELECT DISTINCT node"
                     f" FROM ({seeds_sql}))")
        # ns over seeds ∩ nodes, mirroring graph.pagerank: off-graph
        # seeds hold no teleport mass, so counting them would make
        # sum(t) < 1 and decay total rank per iteration
        parts.append(f"{P}sn AS (SELECT CAST(count(*) AS DOUBLE) AS ns"
                     f" FROM {P}seeds JOIN {P}nodes USING (node))")
        parts.append(
            f"{P}tp AS MATERIALIZED (SELECT n.node, "
            f"CASE WHEN s.node IS NOT NULL THEN 1.0 ELSE 0.0 END"
            f" / (SELECT ns FROM {P}sn) AS t "
            f"FROM {P}nodes n LEFT JOIN {P}seeds s ON n.node = s.node)")
    if init_sql is not None:
        parts.append(f"{P}init AS MATERIALIZED (SELECT node, "
                     f"CAST(rank AS DOUBLE) AS rank FROM ({init_sql}))")
        parts.append(f"{P}ij AS (SELECT n.node, coalesce(i.rank, "
                     f"1.0 / (SELECT n FROM {P}nn)) AS r0 "
                     f"FROM {P}nodes n LEFT JOIN {P}init i"
                     f" ON n.node = i.node)")
        parts.append(f"{P}itot AS (SELECT sum(r0) AS t0 FROM {P}ij)")
        parts.append(f"{P}pr0 AS MATERIALIZED (SELECT node, "
                     f"r0 / (SELECT t0 FROM {P}itot) AS rank FROM {P}ij)")
    elif seeds_sql is not None:
        parts.append(f"{P}pr0 AS (SELECT node, t AS rank FROM {P}tp)")
    else:
        parts.append(f"{P}pr0 AS (SELECT node, "
                     f"1.0 / (SELECT n FROM {P}nn) AS rank FROM {P}nodes)")
    for i in range(1, iters + 1):
        p = f"{P}pr{i - 1}"
        parts.append(
            f"{P}dm{i} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {p} "
            f"LEFT JOIN {P}deg ON {p}.node = {P}deg.src"
            f" WHERE {P}deg.src IS NULL)")
        parts.append(
            f"{P}c{i} AS (SELECT e.dst AS node,"
            f" sum(p.rank * e.w / g.outdeg) AS c "
            f"FROM {P}edges e JOIN {p} p ON e.src = p.node "
            f"JOIN {P}deg g ON e.src = g.src GROUP BY e.dst)")
        if seeds_sql is not None:
            parts.append(
                f"{P}pr{i} AS MATERIALIZED (SELECT n.node, "
                f"{(1.0 - damping)!r} * tp.t + {damping!r} * "
                f"(coalesce(c.c, 0.0) + (SELECT dm FROM {P}dm{i}) * tp.t)"
                f" AS rank "
                f"FROM {P}nodes n JOIN {P}tp tp ON n.node = tp.node "
                f"LEFT JOIN {P}c{i} c ON n.node = c.node)")
        else:
            parts.append(
                f"{P}pr{i} AS MATERIALIZED (SELECT n.node, "
                f"{(1.0 - damping)!r} / (SELECT n FROM {P}nn)"
                f" + {damping!r} * "
                f"(coalesce(c.c, 0.0) + (SELECT dm FROM {P}dm{i}) / "
                f"(SELECT n FROM {P}nn)) AS rank "
                f"FROM {P}nodes n LEFT JOIN {P}c{i} c ON n.node = c.node)")
    return parts


def pagerank_converged_dispatch_sql(entries: list, edges_sql: str,
                                    damping: float = 0.85,
                                    digits: int = 6,
                                    rt_table: str = "orders") -> str:
    """graph.pagerank(tol=...) — the convergence-tested form, FULLY
    value-oracled via the committed-artifact dispatch discipline
    (pq_search_dispatch_sql): the data-dependent piece of the
    computation is only the NUMBER of supersteps run, and
    pagerank(tol=t, iters=cap) equals pagerank(iters=N) where N is the
    observed count — so ``entries`` commits ``((n_rows, sum_okey), N)``
    per scale, the unroll goes to max(N), and one fingerprint-dispatch
    row picks which depth's rank vector the query returns. A scale
    with no committed N yields an empty result (honest mismatch)."""
    if not entries:
        return None
    # one entry per FINGERPRINT (not per (fingerprint, N) pair): a weak
    # (fn, fs, fl) triple colliding across md5-distinct sidecar datasets
    # with different N would land two rows in `chosen` and double/mix
    # the output — conflicting payloads raise instead
    entries = sorted(_dedup_fp_entries(
        [(tuple(int(x) for x in fp), int(n)) for fp, n in entries],
        "pagerank_converged_dispatch_sql"))
    depths = sorted({n for _, n in entries})
    parts = _pagerank_parts(edges_sql, depths[-1], damping)
    # fingerprint BOTH graph inputs: the purchase graph derives from
    # orders AND lineitem, so orders-only stats could collide across
    # datasets whose lineitem differs
    parts.append(
        f"rt AS (SELECT (SELECT count(*) FROM {rt_table}) AS n, "
        f"(SELECT CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) "
        f"FROM {rt_table}) AS s, "
        f"(SELECT count(*) FROM lineitem) AS ln)")
    vals = ", ".join(f"({fp[0]}, {fp[1]}, {fp[2]}, {n})"
                     for fp, n in entries)
    parts.append(f"sel(fn, fs, fl, it) AS (VALUES {vals})")
    parts.append("chosen AS (SELECT it FROM sel JOIN rt"
                 " ON fn = rt.n AND fs = rt.s AND fl = rt.ln)")
    branches = " UNION ALL ".join(
        f"SELECT node, rank, {d} AS it FROM pr{d}" for d in depths)
    parts.append(f"alldepths AS ({branches})")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node, round(rank, {digits}) AS rank"
            f" FROM alldepths JOIN chosen USING (it)")


def degree_profile_sql(edges_sql: str) -> str:
    """graph.degree_profile — per-node in/out degree over distinct edges.

    The exploded-credit GROUP BY mirrors the engine's r13 single-pass
    shape exactly, INCLUDING the pinned NULL-endpoint semantics (a NULL
    src and a NULL dst merge into ONE output row — tests/test_graph.py
    pins it; ADVICE r13: the old ``FULL JOIN ON o.node = i.node`` form
    emitted two separate NULL rows, silently diverging on any future
    edge source that admits NULLs)."""
    return f"""
WITH edges AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
credits AS (
  SELECT src AS node, 1 AS o, 0 AS i FROM edges
  UNION ALL
  SELECT dst AS node, 0 AS o, 1 AS i FROM edges)
SELECT node, CAST(sum(o) AS BIGINT) AS out_degree,
       CAST(sum(i) AS BIGINT) AS in_degree
FROM credits GROUP BY node
"""


# --- embedding dimensionality reduction (functions/reduction.py) --------

def _dlist(xs) -> str:
    return "[" + ", ".join(repr(float(x)) for x in xs) + "]"


#: SQL-recomputable CONTENT component of the PCA runtime fingerprint.
#: (count, sum(vec_id)) alone collides across scales that reuse ids with
#: the same row count (sf0.001 and sf0.01 both ship 500 vectors with ids
#: 0..499) — caught by the cross-scale mirror; the rounded first-element
#: sum separates datasets by value while staying flip-proof against
#: summation-order noise (round to 1e-3 on an O(10) sum).
PCA_RTFP_CONTENT = ("CAST(floor(round(coalesce(sum(embedding[1]), 0), 3)"
                    " * 1000) AS BIGINT)")


def pca_project_dispatch_sql(entries: list, digits: int = 6,
                             prefix: str = "pc",
                             table: str = "embeddings",
                             whiten: bool = False) -> str:
    """reduction.pca_project dispatching at SQL runtime over committed
    PCA models, same discipline as classifier_score_dispatch_sql:
    ``entries`` is ``[((n_rows, sum_vec_id), model), ...]``; the live
    table's fingerprint picks the model whose fit data this is, and a
    scale with no committed model yields NULL projections (honest
    mismatch). Projection math mirrors the Spark expression exactly:
    ``dot(vec, c) - dot(mean, c)`` with the mean-side dot folded into a
    literal."""
    if not entries:
        return None
    k = len(entries[0][1]["components"])
    cols = []
    for i in range(k):
        whens = []
        for fp, model in entries:
            n, s, c = (list(fp) + [None, None, None])[:3]

            comp = model["components"][i]
            c0 = sum(float(x) * float(y)
                     for x, y in zip(model["mean"], comp))
            term = (f"(list_dot_product(CAST(embedding AS DOUBLE[]), "
                    f"{_dlist(comp)}) - {c0!r})")
            if whiten:
                import math as _math
                term = f"({term} / {_math.sqrt(model['explained_var'][i])!r})"
            cond = f"_rt_n = {int(n)} AND _rt_s = {int(s)}"
            if c is not None:
                cond += f" AND _rt_c = {int(c)}"
            whens.append(f"WHEN {cond} THEN round({term}, {digits})")
        cols.append("CASE " + " ".join(whens) + f" END AS {prefix}{i}")
    sel = ",\n       ".join(cols)
    return f"""
WITH rt AS (SELECT count(*) AS _rt_n,
                   CAST(coalesce(sum(vec_id), 0) AS BIGINT) AS _rt_s,
                   {PCA_RTFP_CONTENT} AS _rt_c
            FROM {table})
SELECT vec_id,
       {sel}
FROM {table} CROSS JOIN rt
"""


def random_project_sql(d: int, k: int = 8, salt: str = "rp",
                       digits: int = 6, prefix: str = "rp",
                       table: str = "embeddings") -> str:
    """reduction.random_project — the hash-derived JL matrix is a pure
    function of (d, k, salt), so both engines inline the SAME literal
    rows; no fitted artifact, no dispatch."""
    from qvarn_mr_spark.functions.reduction import random_projection_matrix
    M = random_projection_matrix(d, k, salt)
    cols = ",\n       ".join(
        f"round(list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"{_dlist(row)}), {digits}) AS {prefix}{i}"
        for i, row in enumerate(M))
    return f"SELECT vec_id,\n       {cols}\nFROM {table}"


def hits_sql(edges_sql: str, iters: int = 4, digits: int = 6,
             init_sql: str | None = None, prefix: str = "") -> str:
    """graph.hits — alternating hub/authority updates unrolled per
    half-step, L1-normalized exactly as the Spark loop.

    ``init_sql``: warm start — a query yielding ``(node, hub)``; st0's
    hub becomes coalesce(init, 1/n) renormalized to sum 1 (auth is dead
    state — the first half-step derives it from hub), mirroring
    graph.hits(init_hubs=...). Compose by passing a full
    hits_sql(..., prefix="w_") over the PRE-delta edge set as
    ``init_sql`` — prefixed, same CTE-name discipline as
    pagerank_sql."""
    # every CTE that is referenced more than once is MATERIALIZED —
    # DuckDB otherwise re-executes the subtree per reference, which
    # re-opens the base parquet for every superstep reference and blows
    # the process fd limit on deep unrolls (the SQL mirror of the Spark
    # loop's localCheckpoint)
    P = prefix
    parts = [
        f"{P}edges AS MATERIALIZED (SELECT DISTINCT src, dst"
        f" FROM ({edges_sql}))",
        f"{P}nodes AS MATERIALIZED (SELECT src AS node FROM {P}edges"
        f" UNION SELECT dst FROM {P}edges)",
    ]
    if init_sql is not None:
        parts.append(f"{P}nn AS (SELECT CAST(count(*) AS DOUBLE) AS n"
                     f" FROM {P}nodes)")
        parts.append(f"{P}init AS MATERIALIZED (SELECT node, "
                     f"CAST(hub AS DOUBLE) AS hub FROM ({init_sql}))")
        parts.append(f"{P}ij AS (SELECT n.node, coalesce(i.hub, "
                     f"1.0 / (SELECT n FROM {P}nn)) AS h0 "
                     f"FROM {P}nodes n LEFT JOIN {P}init i"
                     f" ON n.node = i.node)")
        parts.append(f"{P}itot AS (SELECT sum(h0) AS t0 FROM {P}ij)")
        parts.append(f"{P}st0 AS (SELECT node, "
                     f"h0 / (SELECT t0 FROM {P}itot) AS hub, "
                     f"1.0 AS auth FROM {P}ij)")
    else:
        parts.append(f"{P}st0 AS (SELECT node, 1.0 AS hub, 1.0 AS auth"
                     f" FROM {P}nodes)")
    # r13 fold (mirrors graph.hits): the half-step L1 normalization is
    # a scalar division and the hub update is linear, so the hub
    # half-step consumes the RAW auth sums — the a_tot factor cancels
    # (hub = hr/sum(hr) either way) — and both normalizations happen
    # once, in st{i}. Drops the per-superstep normalized-auth CTE
    # (an{i}: a node-sized left join + scalar subquery). Same fixpoint,
    # same normalized state per superstep, value-for-value with the
    # identically folded Spark loop.
    for i in range(1, iters + 1):
        p = f"{P}st{i - 1}"
        parts.append(
            f"{P}ar{i} AS MATERIALIZED (SELECT e.dst AS node,"
            f" sum(s.hub) AS a "
            f"FROM {P}edges e JOIN {p} s ON e.src = s.node"
            f" GROUP BY e.dst)")
        parts.append(
            f"{P}hr{i} AS MATERIALIZED (SELECT e.src AS node,"
            f" sum(ar.a) AS h "
            f"FROM {P}edges e JOIN {P}ar{i} ar ON e.dst = ar.node"
            f" GROUP BY e.src)")
        parts.append(
            f"{P}st{i} AS MATERIALIZED (SELECT n.node,"
            f" coalesce(hr.h, 0.0) / "
            f"(SELECT sum(h) FROM {P}hr{i}) AS hub, "
            f"coalesce(ar.a, 0.0) / "
            f"(SELECT sum(a) FROM {P}ar{i}) AS auth "
            f"FROM {P}nodes n LEFT JOIN {P}hr{i} hr ON n.node = hr.node "
            f"LEFT JOIN {P}ar{i} ar ON n.node = ar.node)")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node, round(hub, {digits}) AS hub, "
            f"round(auth, {digits}) AS auth FROM {P}st{iters}")


# --- C4 rule filters (functions/quality.py c4_*) -------------------------

def c4_rules_sql(min_words: int = 25, max_words: int = 100000,
                 min_terminal_frac: float = 0.0, digits: int = 4,
                 table: str = "documents") -> str:
    """quality.c4_rule_profile — every signal recomputed with DuckDB list
    lambdas over the same splits."""
    from qvarn_mr_spark.functions.quality import (C4_BLOCKLIST,
                                                  C4_POLICY_PHRASES)
    policy = " + ".join(
        f"CASE WHEN contains(lower(text), '{p}') THEN 1 ELSE 0 END"
        for p in C4_POLICY_PHRASES)
    bad = "|".join(C4_BLOCKLIST)
    return f"""
WITH w AS (
  SELECT *,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> length(x) > 0) AS words,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) > 0) AS lines
  FROM {table}
),
s AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CASE WHEN len(words) > 0 THEN
           CAST(list_sum(list_transform(words, x -> length(x)))
                AS DOUBLE) / len(words) ELSE 0.0 END AS mean_word_len,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace,
         CAST({policy} AS BIGINT) AS policy_hits,
         regexp_matches(lower(text), '\\b({bad})\\b') AS has_blockword,
         CASE WHEN len(lines) > 0 THEN
           CAST(len(list_filter(lines,
                l -> regexp_matches(trim(l), '[.!?"]$')))
                AS DOUBLE) / len(lines) ELSE 0.0 END
           AS frac_lines_terminal,
         CASE WHEN len(lines) > 0 THEN
           CAST(len(list_filter(lines,
                l -> len(list_filter(regexp_split_to_array(trim(l),
                     '\\s+'), x -> length(x) > 0)) >= 5))
                AS DOUBLE) / len(lines) ELSE 0.0 END
           AS frac_lines_ge5_words
  FROM w
)
SELECT doc_id, n_words, round(mean_word_len, {digits}) AS mean_word_len,
       has_lorem, has_brace, policy_hits, has_blockword,
       round(frac_lines_terminal, {digits}) AS frac_lines_terminal,
       round(frac_lines_ge5_words, {digits}) AS frac_lines_ge5_words,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND NOT has_lorem AND NOT has_brace AND policy_hits = 0
        AND NOT has_blockword
        AND frac_lines_terminal >= {min_terminal_frac}) AS kept
FROM s
"""


def gopher_rules_sql(min_words: int = 50, max_words: int = 100000,
                     min_mean_word_len: float = 3.0,
                     max_mean_word_len: float = 10.0,
                     max_symbol_ratio: float = 0.1,
                     max_bullet_frac: float = 0.9,
                     max_ellipsis_frac: float = 0.3,
                     min_alpha_frac: float = 0.8,
                     min_stopwords: int = 2,
                     digits: int = 4,
                     table: str = "documents") -> str:
    """quality.gopher_rule_profile — every Gopher signal recomputed with
    DuckDB list lambdas over the same splits; occurrence counts via the
    same non-overlapping replace trick."""
    from qvarn_mr_spark.functions.quality import (GOPHER_BULLETS,
                                                  GOPHER_STOPWORDS)
    bullets = " OR ".join(
        f"starts_with(ltrim(l), '{b}')" for b in GOPHER_BULLETS)
    stops = " + ".join(
        f"CASE WHEN list_contains(low_words, '{s}') THEN 1 ELSE 0 END"
        for s in GOPHER_STOPWORDS)
    return f"""
WITH w AS (
  SELECT *,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> length(x) > 0) AS words,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) > 0) AS lines
  FROM {table}
),
w2 AS (
  SELECT *, list_transform(words, x -> lower(x)) AS low_words
  FROM w
),
s AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CASE WHEN len(words) > 0 THEN
           CAST(list_sum(list_transform(words, x -> length(x)))
                AS DOUBLE) / len(words) ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(words) > 0 THEN
           ((length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', ''))) / 3
            + (length(text) - length(replace(text, '…', ''))))
           / CAST(len(words) AS DOUBLE) ELSE 0.0 END
           AS symbol_word_ratio,
         CASE WHEN len(lines) > 0 THEN
           CAST(len(list_filter(lines, l -> {bullets})) AS DOUBLE)
           / len(lines) ELSE 0.0 END AS frac_bullet_lines,
         CASE WHEN len(lines) > 0 THEN
           CAST(len(list_filter(lines,
                l -> ends_with(rtrim(l), '...')
                     OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           / len(lines) ELSE 0.0 END AS frac_ellipsis_lines,
         CASE WHEN len(words) > 0 THEN
           CAST(len(list_filter(words,
                x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           / len(words) ELSE 0.0 END AS frac_alpha_words,
         CAST({stops} AS BIGINT) AS n_stopwords
  FROM w2
)
SELECT doc_id, n_words,
       round(mean_word_len, {digits}) AS mean_word_len,
       round(symbol_word_ratio, {digits}) AS symbol_word_ratio,
       round(frac_bullet_lines, {digits}) AS frac_bullet_lines,
       round(frac_ellipsis_lines, {digits}) AS frac_ellipsis_lines,
       round(frac_alpha_words, {digits}) AS frac_alpha_words,
       n_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mean_word_len}
        AND mean_word_len <= {max_mean_word_len}
        AND symbol_word_ratio <= {max_symbol_ratio}
        AND frac_bullet_lines <= {max_bullet_frac}
        AND frac_ellipsis_lines <= {max_ellipsis_frac}
        AND frac_alpha_words >= {min_alpha_frac}
        AND n_stopwords >= {min_stopwords}) AS kept
FROM s
"""


#: Weighted twin of CS_EDGES_SQL: w = lineitem count connecting the pair.
CS_EDGES_W_SQL = """
SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       's' || CAST(l_suppkey AS VARCHAR) AS dst,
       count(*) AS w
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
UNION ALL
SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
       'c' || CAST(o_custkey AS VARCHAR) AS dst,
       count(*) AS w
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""

#: Seed set for the personalized-PageRank driver query.
BUILDING_SEEDS_SQL = """
SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
FROM customer WHERE lower(c_mktsegment) = 'building'
"""


#: Part co-purchase graph: parts are linked when some order contains both
#: (market-basket edges — unlike the bipartite purchase graph, this one
#: has triangles).
PART_CO_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

PART_CO_EDGES_PRE_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN orders o ON o.o_orderkey = a.l_orderkey
WHERE o.o_orderpriority != '1-URGENT'
"""


def triangle_count_sql(edges_sql: str) -> str:
    """graph.triangle_count — same degree-ordered orientation: each
    triangle closes exactly once through the oriented tip edge, then
    credits its three members."""
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ({edges_sql}) WHERE src != dst),
deg AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
  GROUP BY node),
oriented AS MATERIALIZED (
  SELECT CASE WHEN du.deg < dv.deg
              OR (du.deg = dv.deg AND und.u < und.v)
         THEN und.u ELSE und.v END AS x,
         CASE WHEN du.deg < dv.deg
              OR (du.deg = dv.deg AND und.u < und.v)
         THEN und.v ELSE und.u END AS y
  FROM und JOIN deg du ON und.u = du.node
           JOIN deg dv ON und.v = dv.node),
tri AS MATERIALIZED (
  SELECT w.x, w.b, w.c
  FROM (SELECT p.x, p.y AS b, q.y AS c
        FROM oriented p JOIN oriented q ON p.x = q.x
        WHERE p.y != q.y) w
  JOIN oriented o ON o.x = w.b AND o.y = w.c),
members AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT d.node, CAST(coalesce(m.triangles, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN (
  SELECT node, count(*) AS triangles FROM members GROUP BY node) m
ON d.node = m.node
"""


def label_propagation_sql(edges_sql: str, iters: int = 5,
                          init_sql: str | None = None,
                          prefix: str = "") -> str:
    """graph.label_propagation — the synchronous self-vote update
    unrolled one CTE pair per round (v{i} = votes, l{i} = per-node
    argmax by (count DESC, label ASC)), mirroring the Spark loop's
    deterministic tie-break exactly.

    ``init_sql``: warm start — a query yielding ``(node, label)``; l0
    becomes coalesce(init, node), mirroring
    graph.label_propagation(init_labels=...). Compose by passing a full
    label_propagation_sql(..., prefix="w_") over the PRE-delta edge set
    as ``init_sql`` (prefixed, since DuckDB forbids redefining a CTE
    name even in a nested scope — same discipline as pagerank_sql)."""
    P = prefix
    parts = [
        f"""{P}und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ({edges_sql}) WHERE src != dst)""",
        f"""{P}sym AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM {P}und
  UNION ALL SELECT v, u FROM {P}und)""",
    ]
    if init_sql is not None:
        parts.append(f"{P}init AS MATERIALIZED (SELECT node, label"
                     f" FROM ({init_sql}))")
        parts.append(
            f"{P}l0 AS (SELECT n.node, coalesce(i.label, n.node)"
            f" AS label"
            f" FROM (SELECT DISTINCT node FROM {P}sym) n"
            f" LEFT JOIN {P}init i ON n.node = i.node)")
    else:
        parts.append(f"{P}l0 AS (SELECT DISTINCT node, node AS label"
                     f" FROM {P}sym)")
    for i in range(1, iters + 1):
        p = f"{P}l{i - 1}"
        parts.append(
            f"{P}v{i} AS (SELECT s.node, l.label "
            f"FROM {P}sym s JOIN {p} l ON s.nbr = l.node "
            f"UNION ALL SELECT node, label FROM {p})")
        parts.append(
            f"{P}l{i} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY count(*) DESC, label ASC) AS rn"
            f" FROM {P}v{i} GROUP BY node, label) WHERE rn = 1)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, label FROM {P}l{iters}")


def triangle_count_approx_sql(edges_sql: str, p: float = 0.25,
                              salt: str = "doulion",
                              digits: int = 6) -> str:
    """graph.triangle_count_approx — the DOULION sparsify-then-count
    estimator, value-reproducible because the edge coin is the shared
    md5 hash (``sampling.sample_unit_sql``, generated from the same
    constants as the Spark side's ``hash_unit``), not an RNG. The exact
    triangle CTE chain runs over the kept edges; counts scale by 1/p³
    over the FULL node set."""
    from qvarn_mr_spark.functions.sampling import sample_unit_sql

    keep = sample_unit_sql("concat(u, '#', v)", salt)
    inner = triangle_count_sql(
        "SELECT u AS src, v AS dst FROM kept").strip()
    return f"""
WITH und0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ({edges_sql}) WHERE src != dst),
kept AS MATERIALIZED (
  SELECT u, v FROM und0 WHERE {keep} < {float(p)!r}),
tri AS MATERIALIZED ({inner}),
allnodes AS (SELECT u AS node FROM und0 UNION SELECT v FROM und0)
SELECT n.node,
       round(coalesce(t.triangles, 0) / {float(p) ** 3!r}, {digits})
         AS triangles_est
FROM allnodes n LEFT JOIN tri t ON n.node = t.node
"""


def clustering_coefficient_sql(edges_sql: str, digits: int = 6) -> str:
    """graph.clustering_coefficient — the triangle CTE chain joined back
    to the undirected degree: 2*T / (d*(d-1)), 0.0 below degree 2."""
    inner = triangle_count_sql(edges_sql).strip()
    return f"""
WITH t AS MATERIALIZED ({inner}),
und2 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ({edges_sql}) WHERE src != dst),
deg2 AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM und2 UNION ALL SELECT v FROM und2)
  GROUP BY node)
SELECT t.node, t.triangles, deg2.deg AS degree,
       round(CASE WHEN deg2.deg >= 2 THEN
         2.0 * t.triangles / (deg2.deg * (deg2.deg - 1))
       ELSE 0.0 END, {digits}) AS clustering_coef
FROM t JOIN deg2 ON t.node = deg2.node
"""


def paragraph_dedup_sql(delimiter: str = "\n\n", min_chars: int = 2,
                        table: str = "documents") -> str:
    """quality.paragraph_dedup — unnest with positions, keep rank-1 per
    (doc, normalized paragraph) or short/structural segments, string_agg
    back in position order. ``delimiter`` is the PYTHON string (e.g.
    a real newline); it is emitted as a DuckDB E-string so control
    characters survive ('\n' in a plain SQL literal is backslash-n)."""
    d = "E'" + delimiter.encode("unicode_escape").decode("ascii") + "'"
    return f"""
WITH p AS (
  SELECT doc_id,
         unnest(string_split(text, {d})) AS para,
         generate_subscripts(string_split(text, {d}), 1) AS pos
  FROM {table}),
f AS (
  SELECT doc_id, para, pos,
         (length(trim(para)) < {min_chars}
          OR row_number() OVER (
               PARTITION BY doc_id, lower(trim(para))
               ORDER BY pos) = 1) AS keep
  FROM p)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN keep THEN para END, {d}
                           ORDER BY pos), '') AS text,
       count(*) AS n_paras,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM f GROUP BY doc_id
"""


def connected_components_sql(edges_sql: str) -> str:
    """graph.connected_components — transitive closure over the
    symmetric edge set via a recursive CTE; component = min reachable
    id (same oracle shape as dup_clusters_sql, over an arbitrary edge
    query instead of document fingerprints). Nodes are derived BEFORE
    the self-loop filter so a node connected only by a self-loop is
    still its own component — matching the Spark side (pinned by
    test_graph.py's ('z','z') case)."""
    return f"""
WITH RECURSIVE raw AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ({edges_sql})),
base AS MATERIALIZED (SELECT src, dst FROM raw WHERE src != dst),
sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM base
  UNION
  SELECT dst, src FROM base),
nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON r.node = s.u)
SELECT node, min(label) AS component FROM reach GROUP BY node
"""


#: Sparse deterministic CC test graph: suppliers linked when they share a
#: nation — one clique component per nation.
SUPP_NATION_EDGES_SQL = """
SELECT a.s_suppkey AS src, b.s_suppkey AS dst
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
"""
