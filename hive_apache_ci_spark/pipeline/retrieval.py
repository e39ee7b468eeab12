"""Corpus retrieval operators over ``documents`` (SURVEY.md §2.11):
inverted index, TF-IDF term weighting, BM25 keyword search.

A training-data pipeline needs keyword retrieval both for quality curation
(pull docs relevant to a probe query) and for benchmark-decontamination
lookups; these are the scan→explode→term-keyed-shuffle shapes that serve
that at 100 TB:

- tokenization is JVM-side (``split``/``explode``) — whole-stage codegen,
  no Python in the hot path;
- everything downstream of the explode is keyed by ``term`` (or ``doc_id``),
  so each op is ONE logical shuffle; window functions and final aggregates
  reuse the same exchange;
- posting lists are truncated with a *windowed* row_number BEFORE the
  collect, so per-term state is bounded even for stop-word-frequency terms
  (a bare ``collect_list`` would buffer every posting for hot terms);
- corpus-level scalars (N, avgdl) are single-row aggregates joined in by
  broadcast; the per-term df table is vocabulary-sized (≪ corpus, zipfian)
  and broadcast-joined where used.

Float determinism: scores involve ``ln`` (1-ulp cross-engine risk), so they
are epsilon-shift rounded to 6 dp on both sides and ranked on the ROUNDED
value with a doc_id tie-break (rank flips impossible whenever the rounded
scores agree). BM25 sums its per-term contributions in a FIXED textual
order via conditional pivot — never a shuffle-order double ``sum()``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..helpers import T
from ..registry import query

_TOKENS_SQL = """
      SELECT doc_id, t AS term
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS t
            FROM documents)
      WHERE t <> ''
"""


def _term_rows(spark, sf_dir):
    """(doc_id, term) — one row per token occurrence, codegen-resident."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")


@query(
    "search_inverted_postings",
    oracle=f"""
    WITH tf AS (
      SELECT term, doc_id, count(*) AS tf
      FROM ({_TOKENS_SQL}) GROUP BY term, doc_id
    ),
    x AS (
      SELECT term, doc_id,
             count(*) OVER (PARTITION BY term)                AS df,
             CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM tf
    )
    SELECT term, CAST(max(df) AS BIGINT) AS df, max(total_tf) AS total_tf,
           string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS postings
    FROM x WHERE df >= 10 AND rn <= 20
    GROUP BY term
    """,
)
def search_inverted_postings(spark, sf_dir):
    """Inverted index: term -> (df, total_tf, first-20 posting list).

    The truncation is a windowed ``row_number <= 20`` BEFORE the collect —
    bounded memory per term no matter how hot the term — and df/total_tf
    come from window aggregates over the SAME term-keyed exchange, so the
    whole index build is one shuffle after the per-(term,doc) tf agg."""
    tf = (
        _term_rows(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term")
    wo = w.orderBy("doc_id")
    x = (
        tf.withColumn("df", F.count(F.lit(1)).over(w))
        .withColumn("total_tf", F.sum("tf").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter((F.col("df") >= 10) & (F.col("rn") <= 20))
    )
    return x.groupBy("term").agg(
        F.max("df").alias("df"),
        F.max("total_tf").alias("total_tf"),
        F.concat_ws(
            "|",
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda c: c.cast("string")
            ),
        ).alias("postings"),
    )


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM ({_TOKENS_SQL}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) + 1e-9, 6)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, rk, term, tfidf
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rk
          FROM scored)
    WHERE rk <= 3
    """,
)
def text_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smooth idf = ln((1+N)/(1+df)) + 1).

    df is a vocabulary-sized aggregate broadcast back onto the term-keyed
    tf rows; N is a single-row broadcast. Ranking is per-doc (window on the
    doc-keyed exchange) on the ROUNDED score with a term tie-break."""
    tf = (
        _term_rows(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = T(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * (F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + 1.0)
                + F.lit(1e-9),
                6,
            ).alias("tfidf"),
        )
    )
    wo = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(wo))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", "tfidf")
    )


_BM25_TERMS = ("hash", "join", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH toks AS ({_TOKENS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl)) AS s
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    piv AS (
      SELECT doc_id,
             round(coalesce(max(CASE WHEN term = 'hash' THEN s END), 0.0)
                   + coalesce(max(CASE WHEN term = 'join' THEN s END), 0.0)
                   + coalesce(max(CASE WHEN term = 'scan' THEN s END), 0.0)
                   + 1e-9, 6) AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT rk, doc_id, score
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rk
          FROM piv)
    WHERE rk <= 20
    """,
)
def search_bm25_topk(spark, sf_dir):
    """BM25 keyword search (query = 'hash join scan', k1=1.2, b=0.75):
    top-20 documents by summed per-term BM25 contribution.

    Scale shape: the tf explode filters to query terms IMMEDIATELY (only
    matching tokens survive to the shuffle); df is a |query|-row broadcast;
    dl/avgdl come from one doc-keyed count. The three per-term scores are
    summed in FIXED textual order via a conditional pivot — never an
    order-nondeterministic double ``sum()`` — so the score is bitwise
    reproducible and the final global top-20 (TakeOrderedAndProject over a
    20-row-per-partition pre-cut) is rank-stable."""
    toks = _term_rows(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    contrib = (
        tf.join(F.broadcast(df_tab), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                * (k1 + 1.0)
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    piv = contrib.groupBy("doc_id").agg(
        F.round(
            sum(
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
                )
                for t in _BM25_TERMS
            )
            + F.lit(1e-9),
            6,
        ).alias("score")
    )
    wo = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        piv.withColumn("rk", F.row_number().over(wo))
        .filter(F.col("rk") <= 20)
        .select("rk", "doc_id", "score")
    )


_QL_MU = 200.0
_QL_TERMS = ("hash", "join", "scan")


def _ql_term_sql(t: str) -> str:
    return (
        f"ln((coalesce(max(CASE WHEN term = '{t}' THEN tf END), 0)"
        f" + {_QL_MU} * max(CASE WHEN term = '{t}' THEN pc END))"
        f" / (max(dl) + {_QL_MU}))"
    )


@query(
    "search_query_likelihood",
    oracle=f"""
    WITH toks AS ({_TOKENS_SQL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    cstat AS (SELECT count(*) AS c FROM toks),
    cf AS (
      SELECT term, count(*) * 1.0 / (SELECT c FROM cstat) AS pc
      FROM toks WHERE term IN {str(_QL_TERMS)} GROUP BY term
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN {str(_QL_TERMS)} GROUP BY doc_id, term
    ),
    cells AS (
      SELECT d.doc_id, c.term, d.dl, c.pc, t.tf
      FROM dl d CROSS JOIN cf c
      LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.term = c.term
    ),
    scored AS (
      SELECT doc_id,
             round({' + '.join(_ql_term_sql(t) for t in _QL_TERMS)}
                   + 1e-9, 6) AS score
      FROM cells GROUP BY doc_id
    )
    SELECT rk, doc_id, score
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= 20
    """,
)
def search_query_likelihood(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty):
    score(q,d) = Σ_t ln((tf_td + μ·p(t|C)) / (|d| + μ)), μ={MU} — the
    language-modeling ranking family next to BM25's probabilistic one.
    Smoothing means every document scores against every query term (tf=0
    falls back to the collection model), so the dataflow densifies: doc
    lengths × the |q|-row term-stat table (broadcast cross), left-joined
    with the sparse tf cells — at 100 TB that is one doc-keyed shuffle
    plus broadcasts, with the per-term sum evaluated in FIXED textual
    order (conditional pivot) and 6-dp-rounded before ranking, the repo's
    ln()-determinism discipline."""
    toks = _term_rows(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    cstat = toks.agg(F.count(F.lit(1)).cast("double").alias("c"))
    qt = toks.filter(F.col("term").isin(*_QL_TERMS))
    cf = (
        qt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(cstat))
        .select("term", (F.col("cnt") / F.col("c")).alias("pc"))
    )
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cells = (
        dl.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
    )
    def term_score(t):
        tfv = F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
        )
        pcv = F.max(F.when(F.col("term") == t, F.col("pc")))
        return F.log((tfv + _QL_MU * pcv) / (F.max("dl") + _QL_MU))

    total = term_score(_QL_TERMS[0])
    for t in _QL_TERMS[1:]:
        total = total + term_score(t)
    scored = cells.groupBy("doc_id").agg(
        F.round(total + F.lit(1e-9), 6).alias("score")
    )
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("rk", "doc_id", "score")
    )


search_query_likelihood.__doc__ = search_query_likelihood.__doc__.replace(
    "{MU}", str(_QL_MU)
)
