"""Upsample /root/testdata/sf0.1 to larger scale points for the
scale-curve measurements (tools/scale_curves.py → SCALE.md).

The driver's testdata stops at sf0.1; the 100 TB design claims deserve
at least one measured decade of scaling, so this builds sf0.3 / sf1
lookalikes locally (under .scaledata/, gitignored — derived data):

- ``region nation customer supplier part`` — copied verbatim: the KEY
  SPACE stays fixed, so the fact tables below densify against it. That
  is the adversarial direction for the graph family (the part
  co-purchase graph gains edges over the same 20k parts → degree and
  wedge counts grow superlinearly — the regime the m^1.5 bound and the
  max_wedges valve exist for), and the realistic one for a corpus
  (vocabulary and entity spaces grow much slower than the data).
- ``orders`` / ``lineitem`` — K copies with ``o_orderkey`` /
  ``l_orderkey`` offset by copy. The FKs pick the scaling regime per
  graph family (without SOME remap the per-copy edge sets are
  identical and ``DISTINCT`` collapses every graph back to sf0.1):

  * ``o_custkey`` / ``l_suppkey`` go through a copy-specific affine
    permutation of the FIXED key space (``(a_i*key + b_i) mod N``,
    ``a_i`` coprime to N; copy 0 = identity, so sf0.1 embeds
    verbatim) — the customer<->supplier purchase graph DENSIFIES
    (~8.4x the edges at K=10 over the same 16k nodes), the regime
    that stresses the linear-in-m fixpoint operators (PageRank/HITS)
    hardest per sf. Read their exponents against ``m``, not sf.
  * ``l_partkey`` is offset disjointly by copy (``+ i*20000``) — the
    part co-purchase graph grows at CONSTANT density (m ~linear in
    sf), matching how TPC-H itself grows parts with sf. This is the
    honest regime for the wedge-bounded triangle family: the
    densifying alternative multiplies wedges ~K^2 per K of data
    (6.7G wedges at K=10 — precisely the blow-up the ``max_wedges``
    valve refuses and DOULION escapes, already covered analytically).
- ``documents`` — K-1 batches of NEW synthetic docs sampled from the
  source corpus's empirical word/length/lang/source distributions with
  a seeded RNG (NOT copies: verbatim replicas would turn the corpus
  into 90% exact dups at K=10 and distort every dedup measurement).
- ``embeddings`` — new vectors = a seeded-random source vector plus
  small gaussian jitter, label inherited: cluster structure persists,
  so IVF/k-means probe costs scale honestly.
- ``events`` — TWO regimes, one file each, mirroring the two FK
  regimes above (VERDICT r9 item 3):

  * ``events.parquet`` — CONSTANT PER-USER RATE: copy i's users are
    offset disjointly (``user_id + i*1500``), timelines unchanged, so
    each user keeps the source data's event rate and session
    structure while the user population grows K×. The honest regime
    for sessionize / as-of (per-user state is the unit of work) and
    the natural direction for ``topk_per_key`` (the 5 event_type keys
    densify — exactly the hot-key stress that operator exists for).
  * ``events_dense.parquet`` — DENSIFIED USERS: ``user_id`` kept
    (the same 1500 users get K× the events — the hot-user regime the
    skew twins exist for; keeping ids, not permuting, PRESERVES the
    source skew shape where an affine remap would smooth it), with a
    per-copy +13 ms timestamp jitter so replicas never tie exactly on
    (user, ts). ``tools/scale_curves.py``'s ``*_dense`` twins read
    this file, falling back to ``events.parquet`` at sf0.1 where
    K=1 makes the regimes identical.

Deterministic end to end (seed per copy). Usage:

    python tools/make_scaledata.py K DST [SRC]

e.g. ``python tools/make_scaledata.py 3 .scaledata/sf0.3``.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 1_000_000  # > max o_orderkey at sf0.1 (149,999)

#: Affine multipliers per copy — odd, not divisible by 3 or 5, hence
#: coprime to every dimension size here (15000, 20000, 1000). Copy 0
#: is the identity so the sf0.1 relation embeds verbatim.
AFFINE_A = (1, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 49, 53, 59)


def _perm(key: str, n: int) -> str:
    """Copy-i affine permutation of a dense 1..n key space (SQL).

    TPC-H keys are 1-based, so the permutation maps through 0..n-1 and
    shifts back: ``((a_i*(key-1) + b_i) mod n) + 1`` — a plain
    ``a*key mod n`` would land one key per copy on 0, which has no
    dimension row (silently orphaning those orders/lineitems), and
    would break the copy-0-is-identity contract for key = n."""
    a = "[" + ", ".join(str(x) for x in AFFINE_A) + "]"
    return (f"((({a}[g.i + 1] * ({key} - 1) + 997 * g.i) % {n}) + 1)")


def copy_verbatim(con, src, dst, table):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
        f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def replicate_orders(con, src, dst, k):
    con.execute(
        f"COPY (SELECT o.* REPLACE "
        f"(o.o_orderkey + g.i * {KEY_OFF} AS o_orderkey, "
        f" {_perm('o.o_custkey', 15000)} AS o_custkey) "
        f"FROM read_parquet('{src}/orders.parquet') o, "
        f"range({k}) g(i)) "
        f"TO '{dst}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT l.* REPLACE "
        f"(l.l_orderkey + g.i * {KEY_OFF} AS l_orderkey, "
        f" (l.l_partkey + g.i * 20000) AS l_partkey, "
        f" {_perm('l.l_suppkey', 1000)} AS l_suppkey) "
        f"FROM read_parquet('{src}/lineitem.parquet') l, "
        f"range({k}) g(i)) "
        f"TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")


def replicate_events(con, src, dst, k):
    # constant-rate regime: disjoint user offset, timelines verbatim
    con.execute(
        f"COPY (SELECT e.* REPLACE "
        f"(e.event_id + g.i * {KEY_OFF} AS event_id, "
        f" e.user_id + g.i * 1500 AS user_id) "
        f"FROM read_parquet('{src}/events.parquet') e, "
        f"range({k}) g(i)) "
        f"TO '{dst}/events.parquet' (FORMAT PARQUET)")
    # densified regime: same 1500 users, K× the events, +13 ms/copy
    # jitter so replicas never tie exactly on (user, ts)
    con.execute(
        f"COPY (SELECT e.* REPLACE "
        f"(e.event_id + g.i * {KEY_OFF} AS event_id, "
        f" e.ts + g.i * INTERVAL 13 MILLISECOND AS ts) "
        f"FROM read_parquet('{src}/events.parquet') e, "
        f"range({k}) g(i)) "
        f"TO '{dst}/events_dense.parquet' (FORMAT PARQUET)")


def synth_documents(con, src, dst, k):
    base = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{src}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    vocab = con.execute(
        f"SELECT w, count(*) c FROM (SELECT unnest(string_split(text, ' ')) w "
        f"FROM read_parquet('{src}/documents.parquet')) "
        f"WHERE w != '' GROUP BY 1 ORDER BY 1").fetchall()
    words = [w for w, _ in vocab]
    weights = [c for _, c in vocab]
    lengths = [len(t.split()) for _, t, _, _, _ in base]
    langs = [r[2] for r in base]
    sources = [r[3] for r in base]
    next_id = max(r[0] for r in base) + 1
    rows = list(base)
    for copy in range(1, k):
        rng = random.Random(961_000 + copy)
        for _ in range(len(base)):
            n = rng.choice(lengths)
            text = " ".join(rng.choices(words, weights=weights, k=n))
            rows.append((next_id, text, rng.choice(langs),
                         rng.choice(sources), len(text)))
            next_id += 1
    schema = pq.read_schema(f"{src}/documents.parquet")
    cols = list(zip(*rows))
    pq.write_table(pa.table(
        {n: pa.array(c, type=schema.field(n).type)
         for n, c in zip(("doc_id", "text", "lang", "source", "n_chars"),
                         cols)}, schema=schema), f"{dst}/documents.parquet")


def synth_embeddings(con, src, dst, k):
    base = con.execute(
        f"SELECT vec_id, embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    next_id = max(r[0] for r in base) + 1
    rows = list(base)
    for copy in range(1, k):
        rng = random.Random(962_000 + copy)
        for _ in range(len(base)):
            _, vec, label = base[rng.randrange(len(base))]
            rows.append((next_id,
                         [v + rng.gauss(0.0, 0.05) for v in vec], label))
            next_id += 1
    schema = pq.read_schema(f"{src}/embeddings.parquet")
    cols = list(zip(*rows))
    pq.write_table(pa.table(
        {n: pa.array(c, type=schema.field(n).type)
         for n, c in zip(("vec_id", "embedding", "label"), cols)},
        schema=schema), f"{dst}/embeddings.parquet")


def main():
    k = int(sys.argv[1])
    assert k <= len(AFFINE_A), (
        f"K={k} exceeds the {len(AFFINE_A)} affine multipliers; extend "
        f"AFFINE_A (odd, coprime to 15000/20000/1000) before upsampling "
        f"further — out-of-range list indexing would yield NULL keys")
    dst = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part"):
        copy_verbatim(con, src, dst, t)
    replicate_orders(con, src, dst, k)
    replicate_events(con, src, dst, k)
    synth_documents(con, src, dst, k)
    synth_embeddings(con, src, dst, k)
    for t in ("orders", "lineitem", "events", "events_dense",
              "documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
