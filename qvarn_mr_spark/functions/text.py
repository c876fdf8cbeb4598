"""Text-analysis functions for large-scale training-data pipelines.

The reference has no scalar-function library (SURVEY.md §2.6) — handlers run
arbitrary Python. Here the text operators a 100 TB document pipeline needs are
expressed as *pure Column expressions* (``pyspark.sql.functions`` only), so
they run inside WholeStageCodegen on the JVM — no Python boundary, no UDF tax,
fully pushdown/prune-friendly. Each helper returns a Column; `profile()`
assembles the standard document-quality projection.

All of these are deliberately expressible in ANSI SQL too, so every one has a
DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from qvarn_mr_spark.session import pin

# Tiny stopword inventories for the language-ID heuristic. Word-boundary
# counting of high-frequency function words is the classic cheap lang-ID
# signal (n-gram/profile methods, cf. Cavnar & Trenkle 1994); three languages
# suffice for the synthetic corpus, the word lists extend trivially.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "les", "et", "est", "une", "que", "pour", "dans"),
    "es": ("el", "los", "de", "y", "en", "un", "por", "para"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "for", "on", "with", "as", "was")

#: Punctuation class shared with the DuckDB oracle (explicit chars — regex
#: POSIX classes differ subtly between engines).
PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count. Empty/blank text counts 0."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))).cast("long")


#: GPT-2-style pretokenizer split: contraction suffixes, letter runs, digit
#: runs, punctuation runs (each optionally space-prefixed). Unicode classes
#: (\p{L}/\p{N}) parse identically in Java regex and RE2, so the DuckDB
#: oracle counts the same matches.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def subword_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2 pretokenizer split — the
    cheap upper-bound estimate of LLM token usage (real BPE merges only
    reduce the count within each pretoken)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def _count_occurrences(lowered: Column, word: str) -> Column:
    """Occurrences of `` word `` (space-delimited) in a lowered, space-padded
    string, via the length-difference trick — pure string ops, identical
    semantics in every SQL engine (no regex dialect drift)."""
    needle = f" {word} "
    return (
        (F.length(lowered) - F.length(F.replace(lowered, F.lit(needle))))
        / len(needle)
    ).cast("long")


def _normalized_for_words(col: Column) -> Column:
    """lowercase, strip punctuation to spaces, collapse+pad spaces so every
    word is `` word ``-matchable."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.concat(F.lit(" "), F.trim(c), F.lit(" "))


def marker_hits(col: Column | str, words) -> Column:
    """Total occurrences of any marker word. NOTE: overlapping-needle
    undercount (`` a a a `` counts 1 for ``a``) is accepted and mirrored in
    the oracle (both use non-overlapping replace semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = _normalized_for_words(c)
    total = None
    for w in words:
        h = _count_occurrences(norm, w)
        total = h if total is None else total + h
    return total


def lang_guess(col: Column | str) -> Column:
    """Cheap language ID: argmax of per-language stopword hit counts;
    ``und`` (undetermined) when no marker appears.

    At scale this is one codegen'd projection over the scan — no shuffle,
    no UDF. Ties break by language-code order (en < de < fr by score
    comparison order below, i.e. first language with the max score wins).
    """
    c = F.col(col) if isinstance(col, str) else col
    scores = {lang: marker_hits(c, words) for lang, words in LANG_MARKERS.items()}
    best_score = None
    for s in scores.values():
        best_score = s if best_score is None else F.greatest(best_score, s)
    out = F.lit("und")
    # reversed so earlier languages win ties (last when() wins in a chain
    # built inside-out)
    for lang in reversed(list(scores)):
        out = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(out)
    return F.when(best_score <= 0, F.lit("und")).otherwise(out)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(col: Column | str) -> Column:
    """English stopword tokens / total tokens (0 when no tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = token_count(c)
    hits = marker_hits(c, EN_STOPWORDS)
    return F.when(toks == 0, F.lit(0.0)).otherwise(
        F.least(hits.cast("double") / toks, F.lit(1.0)))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0, 1]: rewards reasonable length,
    some stopword mass (prose-ness), and moderate punctuation. The exact
    blend is a heuristic; what matters is that it is deterministic, cheap,
    and monotone in the underlying signals."""
    c = F.col(col) if isinstance(col, str) else col
    toks = token_count(c).cast("double")
    len_score = F.least(toks / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 4, F.lit(1.0))
    p = punct_ratio(c)
    p_score = F.when(p > 0.2, F.lit(0.0)).otherwise(1.0 - p * 5)
    return F.round((len_score + sw_score + p_score) / 3, 6)


def profile_frame(df, text_col: str = "text", id_cols=("doc_id",),
                  keep_text: bool = False):
    """Full document profile (tokens/chars/lang/punct/stopword/quality/fp) as
    a *staged* projection pipeline.

    Why not one ``select`` of the per-column helpers above? Each helper inlines
    ``_normalized_for_words`` (lower + regexp_replace + concat) into every
    marker count; ``lang_guess`` (4 langs x 8 markers), ``stopword_ratio``
    (14 markers) and ``quality_score`` multiply that into hundreds of copies
    in a single projection — past Janino's 64 KB method limit, so whole-stage
    codegen fails to compile and the whole projection silently runs
    interpreted (~10x slower and worse with every marker added).

    Staging fixes it structurally:

    * stage 1 materializes the normalized text ONCE (``_norm``),
    * stage 2 computes each per-language marker sum, token count and raw
      punctuation ratio against the ``_norm``/text *column references*,
    * stage 3 reduces those scores to the best-language scalar,
    * stage 4 assembles the output row from cheap column refs only.

    Catalyst's CollapseProject deliberately refuses to merge projections when
    doing so would duplicate non-cheap expressions referenced more than once
    (SPARK-36718), so the stages survive optimization, the generated code
    computes each subexpression exactly once into a local, and every stage
    stays inside one WholeStageCodegen span. Semantics are bit-identical to
    the per-column helpers (same oracle SQL in oracle.py).

    Reference: the ref engine has no text ops at all (SURVEY.md §2.6) — this
    is LLM-pipeline surface; profile shape mirrors qvarnmr handlers' ad-hoc
    per-resource derivations (qvarnmr/handlers.py generic value extraction).
    """
    ids = list(id_cols)
    c = F.col(text_col)

    # stage 1: normalize once
    st1 = df.select(*ids, c.alias("_text"),
                    _normalized_for_words(c).alias("_norm"))

    def _hits_on(norm: Column, words) -> Column:
        total = None
        for w in words:
            h = _count_occurrences(norm, w)
            total = h if total is None else total + h
        return total

    norm, txt = F.col("_norm"), F.col("_text")
    # stage 2: per-language scores + shared scalars (all against column refs)
    st2 = st1.select(
        *ids, "_text", "_norm",
        *[_hits_on(norm, words).alias(f"_h_{lang}")
          for lang, words in LANG_MARKERS.items()],
        _hits_on(norm, EN_STOPWORDS).alias("_h_stop"),
        token_count(txt).alias("_toks"),
        punct_ratio(txt).alias("_punct"),
    )

    # stage 3: best-language score (referenced 5x downstream — keep it a col)
    st3 = st2.withColumn(
        "_best", F.greatest(*[F.col(f"_h_{lang}") for lang in LANG_MARKERS]))

    # stage 4: assemble outputs from cheap refs; mirror the helper semantics
    lang = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):
        lang = F.when(F.col(f"_h_{lg}") == F.col("_best"),
                      F.lit(lg)).otherwise(lang)
    lang = F.when(F.col("_best") <= 0, F.lit("und")).otherwise(lang)

    toks = F.col("_toks")
    sw = F.when(toks == 0, F.lit(0.0)).otherwise(
        F.least(F.col("_h_stop").cast("double") / toks, F.lit(1.0)))
    p = F.col("_punct")
    len_score = F.least(toks.cast("double") / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(sw * 4, F.lit(1.0))
    p_score = F.when(p > 0.2, F.lit(0.0)).otherwise(1.0 - p * 5)

    return st3.select(
        *ids,
        # consumers that keep processing the text (corpus_prepare's dedup
        # stage) carry it through instead of re-reading + re-joining
        *([F.col("_text")] if keep_text else []),
        toks.alias("n_tokens"),
        F.length("_text").cast("long").alias("n_chars_calc"),
        lang.alias("lang_guess"),
        F.round(p, 6).alias("punct_ratio"),
        F.round(sw, 6).alias("stopword_ratio"),
        F.round((len_score + sw_score + p_score) / 3, 6).alias("quality"),
        F.md5(F.trim(F.col("_norm"))).alias("fp"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the word-normalized text (lowercased,
    punctuation stripped, whitespace collapsed). Two documents differing only
    in case/punctuation/spacing collide — the standard cheap canonical hash
    for exact-after-normalization dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(_normalized_for_words(c)))


def tfidf_top_terms(df, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3):
    """Per-document top-``k`` terms by smoothed TF-IDF — the standard
    keyword/fingerprint projection a training-data pipeline runs to tag or
    filter documents.

    tf(t, d) = occurrences of ``t`` in ``d`` (tokens: lowered, split on
    non-alphanumerics — the same tokenizer as the wordcount/shingle ops);
    idf(t) = ln((N + 1) / (df(t) + 1)) + 1 (smoothed so corpus-wide terms
    still score > 0); score rounded to 6 decimals before ranking with a
    term tiebreak, so the top-k is reproducible across engines.

    Scale shape: one explode (narrow) feeding two hash aggregates —
    (doc, term) tf and term df, both shuffled on the term-bearing key with
    map-side partials — a broadcast of the one-row corpus count, an
    equi-join tf ⋈ df on term, and a per-doc top-k window. No collect, no
    UDF, no pair expansion; vocabulary and corpus size only ever appear as
    group-by cardinalities. Returns ``(doc_id, term, score, rn)``.
    """
    from pyspark.sql import Window
    from qvarn_mr_spark.functions.dedup import tokens_col

    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens_col(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df(t) = |{d : tf(t,d) > 0}| — one row per (doc, term) already exists
    # in tf, so document frequency is a count over tf, NOT a second explode
    # + distinct over the raw token stream (halves the exploded volume and
    # drops a whole shuffle)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .join(F.broadcast(n_docs))
              .select("doc_id", "term",
                      F.round(F.col("tf")
                              * (F.log((F.col("n_docs") + 1)
                                       / (F.col("df_t") + 1)) + 1), 6)
                      .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def inverted_index(df, id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 1, max_df: int | None = None):
    """Term → posting-list table ``(term, n_docs, postings)``; postings is
    the comma-joined sorted doc-id list.

    One explode + distinct (term, doc) pairs + one hash aggregate. The
    posting list concentrates a term's whole corpus presence into one row —
    the classic hot-key; ``max_df`` caps it (stopword-frequency terms carry
    no retrieval signal and all the skew). Production variants block
    postings into fixed-size chunks; the tfidf/df machinery above shares
    the same (term, doc) working set.
    """
    from qvarn_mr_spark.functions.dedup import tokens_col

    pairs = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(tokens_col(text_col)).alias("term"))
             .distinct())
    out = (pairs.groupBy("term")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
                .alias("postings"))
           .filter(F.col("n_docs") >= min_df))
    if max_df is not None:
        out = out.filter(F.col("n_docs") <= max_df)
    return out


# ---------------------------------------------------------------------------
# BPE merge induction — subword vocabulary training
# ---------------------------------------------------------------------------

def _merge_pair_expr(sym: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs
    in one array fold — the classic BPE apply step as a JVM expression."""
    def step(acc: Column, x: Column) -> Column:
        n = F.size(acc)
        prev = F.element_at(acc, -1)
        merged = F.concat(F.slice(acc, 1, n - 1),
                          F.array(F.concat(prev, x)))
        return F.when((n > 0) & (prev == left) & (x == right), merged) \
                .otherwise(F.concat(acc, F.array(x)))
    return F.aggregate(sym, F.array().cast("array<string>"), step)


def bpe_merges(df, id_col: str = "doc_id", text_col: str = "text",
               n_merges: int = 8, min_pair_count: int = 2):
    """Byte-pair-encoding vocabulary induction (Sennrich-style, over word
    counts): start from characters, repeatedly merge the corpus-wide most
    frequent adjacent symbol pair. Returns the merge table
    ``(rank, left, right, merged, pair_count)``, rank 1 first.

    Scale shape — the loop never touches the corpus: ONE corpus pass
    builds the distinct-word count table (explode + hash agg, the same
    shuffle as word count), and every iteration then runs on that
    vocabulary-sized table (|distinct words| rows — millions at 100 TB,
    not billions): pair counting is an explode + weighted agg over it,
    the argmax is a 1-row collect, and the merge apply is a narrow array
    fold. The word table is re-localCheckpointed each round so the plan
    stays flat (no O(n_merges)-deep lineage; swap for checkpoint() on a
    cluster, same note as dup_clusters). Iterations are deterministic:
    ties break on (left, right) lexicographically.

    Oracle note: the per-iteration argmax makes this inherently
    iterative (rows-only for SQL); the semantics are pytest-pinned
    against a pure-Python reference implementation."""
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                tokens_col)

    words = (ensure_min_partitions(df)
             .select(F.explode(tokens_col(text_col)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
             .select(F.expr("transform(sequence(1, length(w)), "
                            "i -> substr(w, i, 1))").alias("sym"),
                     "n")
             .localCheckpoint(eager=True))

    merges = []
    for rank in range(1, n_merges + 1):
        pairs = words.select(
            F.explode(F.zip_with(
                F.slice("sym", 1, F.size("sym") - 1),
                F.slice("sym", 2, F.size("sym") - 1),
                lambda x, y: F.struct(x.alias("l"), y.alias("r"))))
            .alias("p"), "n")
        best = (pairs.groupBy("p.l", "p.r")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, c = best[0]["l"], best[0]["r"], best[0]["c"]
        merges.append((rank, left, right, left + right, c))
        words = words.select(
            _merge_pair_expr(F.col("sym"), F.lit(left), F.lit(right))
            .alias("sym"), "n").localCheckpoint(eager=True)

    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
        "pair_count long")


def bpe_vocab(df, id_col: str = "doc_id", text_col: str = "text",
              n_merges: int = 8, min_pair_count: int = 2):
    """The symbol vocabulary after :func:`bpe_merges`: every surviving
    symbol with its total corpus frequency — what a tokenizer ships.
    Same corpus-independent loop; one extra vocabulary-sized aggregate."""
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                tokens_col)

    merges = bpe_merges(df, id_col, text_col, n_merges, min_pair_count)
    words = (ensure_min_partitions(df)
             .select(F.explode(tokens_col(text_col)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
             .select(F.expr("transform(sequence(1, length(w)), "
                            "i -> substr(w, i, 1))").alias("sym"), "n"))
    for row in merges.orderBy("rank").collect():
        words = words.select(
            _merge_pair_expr(F.col("sym"), F.lit(row["left"]),
                             F.lit(row["right"])).alias("sym"), "n")
    return (words.select(F.explode("sym").alias("symbol"), "n")
            .groupBy("symbol").agg(F.sum("n").alias("freq")))


def bpe_encode(df, merges, id_col: str = "doc_id",
               text_col: str = "text"):
    """Tokenize with a LEARNED BPE merge table — the apply half of
    :func:`bpe_merges`: each word splits to characters and every merge
    folds through in rank order (the same greedy left-to-right
    ``_merge_pair_expr`` pass the trainer used). Returns
    ``(doc_id, n_words, n_chars, n_subwords)``.

    ``merges`` is the :func:`bpe_merges` output (DataFrame) or an
    ordered ``[(left, right), …]`` list. Pure Column expressions, but
    plan depth grows with the merge count — right for the small induced
    tables this engine trains (≤ ~100 merges); a tokenizer-scale
    vocabulary (32k merges) uses :func:`bpe_encode_arrow`, which applies
    the identical fold per word in an Arrow batch with a per-word cache.
    """
    from qvarn_mr_spark.functions.dedup import tokens_col

    pairs = _merge_pairs(merges)
    toks = tokens_col(text_col)
    # per-word char arrays, then each merge folds through in rank order
    enc = F.transform(toks, lambda w: _encode_word_col(w, pairs))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(toks, F.lit(0),
                    lambda a, w: a + F.length(w)).cast("long")
        .alias("n_chars"),
        F.aggregate(enc, F.lit(0),
                    lambda a, s: a + F.size(s)).cast("long")
        .alias("n_subwords"))


def _merge_pairs(merges) -> list:
    """Normalize a bpe_merges DataFrame or [(left, right), …] list into
    an ordered pair list (vocab-sized — safe to collect)."""
    if isinstance(merges, list):
        return list(merges)
    return [(r["left"], r["right"])
            for r in merges.orderBy("rank").collect()]


def _encode_word_col(w: Column, pairs: list) -> Column:
    """Char-split one word and fold every merge in rank order — the
    Column twin of the trainer's apply step. The lookahead split keeps a
    trailing empty element (Spark split keeps trailing empties at the
    default limit) — filtered out before the fold."""
    sym = F.filter(F.split(w, "(?!^)"), lambda x: x != "")
    for left, right in pairs:
        sym = _merge_pair_expr(sym, F.lit(left), F.lit(right))
    return sym


def bpe_fold_reference(word: str, pairs: list) -> list:
    """Driver-side twin of the greedy left-to-right merge fold —
    used by bpe_encode_arrow per distinct word and by tests as the
    independent reference."""
    sym = list(word)
    for left, right in pairs:
        acc = []
        for x in sym:
            if acc and acc[-1] == left and x == right:
                acc[-1] = left + right
            else:
                acc.append(x)
        sym = acc
    return sym


def bpe_encode_arrow(df, merges, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Tokenizer-scale BPE apply: the merge table ships in the closure
    (vocab-sized), each Arrow batch encodes its DISTINCT words once
    through the same greedy fold (:func:`bpe_fold_reference`, cached per
    word — natural-language batches repeat most words) and sums subword
    counts per document. Same output as :func:`bpe_encode`
    (differentially tested); cost is one narrow Arrow pass, no shuffle,
    no per-merge plan depth — this is the production path for 32k-merge
    vocabularies over 100 TB."""
    from collections.abc import Iterator

    import pandas as pd

    from qvarn_mr_spark.functions.dedup import TOKEN_RE
    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)

    pairs = _merge_pairs(merges)
    token_re = re.compile(TOKEN_RE)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def n_sub(word: str) -> int:
            got = cache.get(word)
            if got is None:
                got = cache[word] = len(bpe_fold_reference(word, pairs))
            return got

        for pdf in it:
            ids, nw, nc, ns = [], [], [], []
            for i, t in zip(pdf["_id"], pdf["_text"]):
                ws = [w for w in token_re.split((t or "").lower()) if w]
                ids.append(i)
                nw.append(len(ws))
                nc.append(sum(len(w) for w in ws))
                ns.append(sum(n_sub(w) for w in ws))
            yield pd.DataFrame({"doc_id": ids, "n_words": nw,
                                "n_chars": nc, "n_subwords": ns})

    src = df.select(F.col(id_col).alias("_id"),
                    F.col(text_col).alias("_text"))
    return src.mapInPandas(
        batches, "doc_id long, n_words long, n_chars long, n_subwords long")


def bigram_surprisal(df, id_col: str = "doc_id", text_col: str = "text",
                     lam: float = 0.7, smoothing: float = 0.5):
    """Perplexity-style fluency signal from a corpus-fitted BIGRAM LM —
    one step closer to the KenLM filter CCNet runs than
    :func:`unigram_surprisal`: per document, the mean negative
    log-probability of its token transitions under an interpolated
    estimate fitted on the SAME corpus::

        P(w | u) = lam · c(u,w)/c(u·)  +  (1−lam) · (c(w)+s)/(N+s·V)

    (bigram MLE backed off into the add-``s`` unigram). Word-salad text
    scores high even when its vocabulary is common — the signal the
    unigram model cannot see. Documents with fewer than 2 tokens are
    absent (no transitions), mirroring unigram's absent-empty-docs.
    Returns ``(doc_id, n_bigrams, mean_nll)`` (natural log, 6-dp).

    Shape: transitions come from a ``zip_with`` of two shifted token
    slices (narrow — no positional self-join); the bigram LM is one hash
    agg over the transition stream, the context totals derive from the
    vocabulary²-bounded (in practice corpus-bigram-bounded) persisted LM
    table, and scoring equi-joins transitions to their counts (LM sides
    are vocabulary-sized — AQE broadcasts when small). Like the unigram
    twin: two corpus passes, all joins on high-cardinality keys.
    """
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                tokens_col)

    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_t"))
    pair_col = F.zip_with(
        F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("u"), y.alias("w")))
    pairs = (base.select("doc_id", F.explode(pair_col).alias("_p"))
             .select("doc_id", "_p.u", "_p.w"))
    # vocabulary-sized pins (same rationale as unigram_surprisal's lm):
    # each LM table feeds the scoring join AND a derived aggregate
    lm_bi = (pairs.groupBy("u", "w")
             .agg(F.count(F.lit(1)).alias("c_uw")))
    lm_bi = pin(lm_bi)
    lm_ctx = lm_bi.groupBy("u").agg(F.sum("c_uw").alias("c_u"))
    uni = pin(base.select(F.explode("_t").alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
    tot = uni.agg(F.sum("c_w").alias("_N"), F.count(F.lit(1)).alias("_V"))
    p = (F.lit(lam) * F.col("c_uw") / F.col("c_u")
         + F.lit(1.0 - lam) * (F.col("c_w") + F.lit(smoothing))
         / (F.col("_N") + F.lit(smoothing) * F.col("_V")))
    scored = (pairs.join(lm_bi, ["u", "w"]).join(lm_ctx, "u")
              .join(uni, "w").crossJoin(F.broadcast(tot))
              .select("doc_id", (-F.log(p)).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("nll"), 6).alias("mean_nll")))


def trigram_surprisal(df, id_col: str = "doc_id", text_col: str = "text",
                      lam3: float = 0.5, lam2: float = 0.3,
                      smoothing: float = 0.5):
    """Perplexity-style fluency signal from a corpus-fitted TRIGRAM LM —
    the last interpolation rung before an external KenLM: per document,
    the mean negative log-probability of its token triples under::

        P(w | u,v) = lam3 · c(u,v,w)/c(u,v,·)
                   + lam2 · c(v,w)/c(v,·)
                   + (1−lam3−lam2) · (c(w)+s)/(N+s·V)

    (trigram MLE backed off into the bigram MLE backed off into the
    add-``s`` unigram — each component fitted on its own full n-gram
    stream of the SAME corpus). Catches locally-plausible-but-globally-
    scrambled text that the bigram model scores as fluent. Documents
    with fewer than 3 tokens are absent (no triples), mirroring the
    bigram twin's absent-short-docs. Returns
    ``(doc_id, n_trigrams, mean_nll)`` (natural log, 6-dp).

    Shape (same scale profile as :func:`bigram_surprisal`, one rung
    deeper): triples come from a ``zip_with`` of three shifted token
    slices (narrow — no positional self-join); the trigram and bigram
    LMs are hash aggs over their n-gram streams (corpus-ngram-bounded,
    persisted — each feeds the scoring join AND a derived context
    aggregate), and scoring equi-joins the triple stream to its counts
    (LM sides vocabulary-bounded — AQE broadcasts when small). All
    joins on high-cardinality keys; no driver collect.
    """
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                tokens_col)

    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_t"))
    n2 = F.greatest(F.size("_t") - 1, F.lit(0))
    n3 = F.greatest(F.size("_t") - 2, F.lit(0))
    tri_col = F.zip_with(
        F.slice("_t", 1, n3),
        F.zip_with(F.slice("_t", 2, n3), F.slice("_t", 3, n3),
                   lambda y, z: F.struct(y.alias("v"), z.alias("w"))),
        lambda x, p: F.struct(x.alias("u"), p["v"].alias("v"),
                              p["w"].alias("w")))
    pair_col = F.zip_with(
        F.slice("_t", 1, n2), F.slice("_t", 2, n2),
        lambda x, y: F.struct(x.alias("v"), y.alias("w")))
    tris = (base.select("doc_id", F.explode(tri_col).alias("_g"))
            .select("doc_id", "_g.u", "_g.v", "_g.w"))
    bis = (base.select(F.explode(pair_col).alias("_p"))
           .select("_p.v", "_p.w"))
    lm_tri = pin(tris.groupBy("u", "v", "w")
                 .agg(F.count(F.lit(1)).alias("c_uvw")))
    lm_ctx3 = lm_tri.groupBy("u", "v").agg(F.sum("c_uvw").alias("c_uv"))
    lm_bi = pin(bis.groupBy("v", "w")
                .agg(F.count(F.lit(1)).alias("c_vw")))
    lm_ctx2 = lm_bi.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    uni = pin(base.select(F.explode("_t").alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
    tot = uni.agg(F.sum("c_w").alias("_N"), F.count(F.lit(1)).alias("_V"))
    lam1 = 1.0 - lam3 - lam2
    p = (F.lit(lam3) * F.col("c_uvw") / F.col("c_uv")
         + F.lit(lam2) * F.col("c_vw") / F.col("c_v")
         + F.lit(lam1) * (F.col("c_w") + F.lit(smoothing))
         / (F.col("_N") + F.lit(smoothing) * F.col("_V")))
    scored = (tris.join(lm_tri, ["u", "v", "w"]).join(lm_ctx3, ["u", "v"])
              .join(lm_bi, ["v", "w"]).join(lm_ctx2, "v")
              .join(uni, "w").crossJoin(F.broadcast(tot))
              .select("doc_id", (-F.log(p)).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.round(F.avg("nll"), 6).alias("mean_nll")))


def unigram_surprisal(df, id_col: str = "doc_id", text_col: str = "text",
                      smoothing: float = 0.5):
    """Perplexity-style fluency signal from a corpus-fitted unigram LM:
    per document, the mean negative log-probability of its tokens under
    add-``smoothing`` unigram estimates fitted on the SAME corpus.
    High surprisal = rare/garbled vocabulary — the classic cheap stand-in
    for a KenLM perplexity filter. Returns
    ``(doc_id, n_tokens, mean_nll)`` (natural log, 6-dp).

    Shape: one explode + hash agg fits the LM (vocabulary-sized table);
    scoring re-explodes and equi-joins tokens to their logprobs (the LM
    side is vocabulary-sized — AQE broadcasts when small) and averages
    per doc. Two shuffles total, both on high-cardinality keys.
    """
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                tokens_col)

    toks = (ensure_min_partitions(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(text_col)).alias("w")))
    # pin the vocabulary-sized LM: the totals aggregate and the scoring
    # join both read it — without the pin each consumer re-tokenizes
    # the corpus from scratch (kilobyte cache vs an extra corpus pass)
    lm = pin(toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    # totals via a 1-row aggregate joined back (broadcast)
    tot = lm.agg(F.sum("c").alias("_N"),
                 F.count(F.lit(1)).alias("_V"))
    scored = (toks.join(lm, "w")
              .crossJoin(F.broadcast(tot))
              .select("doc_id",
                      (-F.log((F.col("c") + F.lit(smoothing))
                              / (F.col("_N")
                                 + F.lit(smoothing) * F.col("_V"))))
                      .alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg("nll"), 6).alias("mean_nll")))


def export_unigram_lm(df, text_col: str = "text",
                      smoothing: float = 0.5) -> dict:
    """Fit the add-``smoothing`` unigram LM on a (curated) corpus and
    export it as a driver-side artifact
    ``{"counts": {w: c}, "N": Σc, "V": |vocab|, "smoothing": s}`` —
    the model-shipping move a real CCNet deployment makes with its
    KenLM binary: the LM is trained once on the clean reference
    corpus, then the ARTIFACT travels to the scorers. The collect is
    vocabulary-bounded (the same |V|-row table
    :func:`unigram_surprisal` pins and AQE broadcasts), not
    corpus-sized; for vocabularies past executor-broadcast comfort,
    stay with the distributed batch form."""
    from qvarn_mr_spark.functions.dedup import tokens_col

    rows = (df.select(F.explode(tokens_col(text_col)).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect())
    counts = {r["w"]: int(r["c"]) for r in rows}
    if not counts:
        # an empty/token-less corpus has no distribution to export —
        # scoring against it would divide by the zero smoothing mass
        # (N + s·V = 0). Fail at FIT time with a real message, not at
        # first scored batch (ADVICE-r10 tooling-bounds discipline).
        raise ValueError(
            "export_unigram_lm: corpus has no tokens — an LM fitted on "
            "nothing cannot score; fit on a non-empty curated corpus")
    return {"counts": counts, "N": sum(counts.values()),
            "V": len(counts), "smoothing": float(smoothing)}


def unigram_surprisal_stream(stream, lm: dict, id_col: str = "doc_id",
                             text_col: str = "text",
                             keep: tuple = ()):
    """Streaming twin of :func:`unigram_surprisal` under a PINNED
    exported LM (:func:`export_unigram_lm`) — the perplexity filter an
    ingest stream needs: tokenization stays the SAME JVM Column
    (``dedup.tokens_col``, so the two forms cannot drift on token
    boundaries), and scoring is a STATELESS Arrow-batched dict lookup
    against the closure-shipped model — no LM join, no streaming
    aggregation state, no watermark required; works identically on a
    batch frame. Out-of-vocabulary tokens score through the smoothing
    mass (``c = 0``) — the batch form, fitted on the very corpus it
    scores, never meets one; on in-vocabulary documents the two forms
    agree value-for-value (conformance-pinned).

    ``keep`` names input columns to pass through unchanged (so a
    streaming gate can thread its payload). Returns
    ``(doc_id, *keep, n_tokens, mean_nll)``; documents with zero
    tokens are absent, mirroring the batch form's explode."""
    import math

    import pandas as pd

    from qvarn_mr_spark.functions.dedup import tokens_col
    from qvarn_mr_spark.session import ship_package
    ship_package(stream.sparkSession)

    counts = lm["counts"]
    s = float(lm["smoothing"])
    denom = float(lm["N"]) + s * float(lm["V"])
    toks = stream.select(F.col(id_col).alias("doc_id"),
                         *[F.col(c) for c in keep],
                         tokens_col(text_col).alias("_t"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in toks.schema.fields if f.name != "_t")
    out_ddl = f"{ddl}, n_tokens bigint, mean_nll double"

    def score(batches):
        for pdf in batches:
            idx, ns, nlls = [], [], []
            for i, tlist in enumerate(pdf["_t"]):
                if tlist is None or len(tlist) == 0:
                    continue
                tot = 0.0
                for w in tlist:
                    tot += -math.log((counts.get(w, 0) + s) / denom)
                idx.append(i)
                ns.append(len(tlist))
                nlls.append(round(tot / len(tlist), 6))
            if not idx:
                continue
            out = pdf.iloc[idx].drop(columns=["_t"]).reset_index(drop=True)
            out["n_tokens"] = pd.Series(ns, dtype="int64")
            out["mean_nll"] = pd.Series(nlls, dtype="float64")
            yield out

    return toks.mapInPandas(score, schema=out_ddl)
