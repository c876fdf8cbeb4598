"""Property tests: quality repetition signals and sequence packing vs
pure-Python models on random corpora (fixed seeds, one Spark job per case
batch to keep runtime bounded)."""

import random

from qvarn_mr_spark.functions.packing import pack_sequences
from qvarn_mr_spark.functions.quality import repetition_profile

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _random_corpus(seed, n_docs, max_len):
    rng = random.Random(seed)
    return [(str(i), " ".join(rng.choice(VOCAB)
                              for _ in range(rng.randrange(0, max_len))))
            for i in range(n_docs)]


def _model_repetition(text):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return (0, 0.0, 0.0)
    dup_word = round(1.0 - len(set(toks)) / n, 6)
    top = round(max(toks.count(w) for w in set(toks)) / n, 6)
    return (n, dup_word, top)


def test_repetition_matches_model_on_random_docs(spark):
    rows = _random_corpus(20260814, 60, 30)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_word_frac"],
                         r["top_word_frac"])
           for r in repetition_profile(df).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _model_repetition(text), (doc_id, text)


def test_packing_matches_model_on_random_docs(spark):
    for window in (7, 64):
        rows = _random_corpus(99 + window, 50, 25)
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["start_offset"],
                             r["pack_first"], r["pack_last"])
               for r in pack_sequences(df, window=window).collect()}
        cum = 0
        for i in range(50):
            doc_id = str(i)
            n = len(rows[i][1].split())
            start = cum
            cum += n
            pf = start // window
            pl = max(pf, (cum - 1) // window)
            assert got[doc_id] == (n, start, pf, pl), (doc_id, window)
