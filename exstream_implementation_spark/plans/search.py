"""Ranked text retrieval — inverted index + BM25 top-k over ``documents``.

Not in the reference (it processes numeric metric streams only;
reference core scripts script_1.py / exstream_lib.py have no text search) —
this is the classic training-data/RAG retrieval family the extension
surface lacked: given a small set of text queries, return the top-k
documents per query under BM25 (Robertson/Sparck-Jones; the idf form is
Lucene's non-negative variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

Scale design (the part that matters at 100 TB):

* The inverted index is ONE map-side-combinable aggregation:
  ``explode(tokens) -> groupBy(term, doc_id).count()`` — tf rows
  pre-combine inside each map task, and the document length rides along
  (``dl`` is denormalized into the postings so scoring never joins back
  to a per-doc table).  At deployment the postings table is written
  bucketed by ``term`` (``write_postings`` below) so repeated query
  batches never re-shuffle the corpus.
* The query side is SMALL by construction (a query batch is human-scale);
  every corpus-sized frame is joined via ``F.broadcast(<query terms>)`` —
  the postings NEVER shuffle to meet the queries (BroadcastHashJoin,
  plan-asserted in tests/test_search.py).
* Stop-term pruning: query terms whose document frequency exceeds
  ``max_df_ratio * N`` are dropped before the postings join (the WAND-ish
  guard) — a stopword-laden query would otherwise drag a constant
  fraction of the corpus into scoring.  Dropped terms are a documented
  semantic: BM25 with a df-pruned query vocabulary.
* Per-query top-k is two-phase: a per-shuffle-partition fold keeps only
  ``k`` candidates per (query, partition) — bounded by partition size —
  so the final exact row_number window ranks at most ``partitions * k``
  rows per query, never the full candidate set.

Corpus constants (N, avgdl) are fetched with one bounded 1-row collect
(same contract as the k-row centroid fetch in operators/kmeans.py:71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exstream_implementation_spark.sources import load_documents_parallel

BM25_K1 = 1.2
BM25_B = 0.75


def _terms(text_col: str):
    """Lowercased whitespace tokens, empties dropped (leading-space split
    artifacts must not become index terms)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def build_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Inverted index: one row per (term, doc_id) with term frequency and
    the document's token length.

    Single shuffle on (term, doc_id) with map-side partial count; ``dl``
    is carried as a group-constant (``first``) rather than re-joined.
    """
    toks = docs.select(
        F.col("doc_id"), _terms(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))
    return (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def write_postings(postings: DataFrame, table: str, buckets: int = 64) -> None:
    """Persist the index bucketed by term: repeated query batches probe
    co-located buckets with no corpus shuffle (same rationale as the
    ingest corpus tables, streaming/ingest_dedup.py)."""
    (
        postings.write.mode("overwrite")
        .bucketBy(buckets, "term")
        .sortBy("term")
        .saveAsTable(table)
    )


def corpus_stats(postings: DataFrame) -> tuple[int, float]:
    """(N docs, average document length) — one aggregate, 1-row fetch."""
    row = (
        postings.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .first()
    )
    return int(row["n"] or 0), float(row["avgdl"] or 0.0)


def query_term_weights(
    postings: DataFrame,
    queries: DataFrame,
    n_docs: int,
    max_df_ratio: float = 0.5,
    query_text_col: str = "query_text",
) -> DataFrame:
    """Per (query_id, term): BM25 idf, with stop-term pruning.

    df(term) comes from one aggregate over the postings restricted (semi-
    joined, broadcast) to the queries' vocabulary — the full term-df table
    is never materialized for a query batch.
    """
    qterms = queries.select(
        "query_id", F.explode(F.array_distinct(_terms(query_text_col))).alias("term")
    )
    vocab = qterms.select("term").distinct()
    dfreq = (
        postings.join(F.broadcast(vocab), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        qterms.join(F.broadcast(dfreq), "term")
        .filter(F.col("df") <= F.lit(max_df_ratio * n_docs))
        .select("query_id", "term", idf.alias("idf"))
    )


def bm25_topk(
    spark: SparkSession,
    docs_or_postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df_ratio: float = 0.5,
    text_col: str = "text",
    prebuilt: bool = False,
    score_round: int | None = None,
) -> DataFrame:
    """Top-k documents per query under BM25.

    ``queries``: (query_id int, query_text string) — small by contract.
    Returns (query_id, doc_id, score double, rank int), rank 1..k, ties
    broken by doc_id ascending (deterministic).

    ``score_round``: round the score to N decimals BEFORE ranking.  This is
    the cross-engine determinism knob (the oracle-gated catalog branch uses
    6): raw float sums can differ between engines in the last ulp when the
    per-term addends associate differently, and a rank built on raw floats
    would then tie-break differently.  Rounding first collapses sub-1e-N
    differences into exact ties that the doc_id tie-break resolves
    identically everywhere.
    """
    postings = (
        docs_or_postings
        if prebuilt
        else build_postings(docs_or_postings, text_col)
    )
    n_docs, avgdl = corpus_stats(postings)
    if n_docs == 0 or queries.isEmpty():
        return spark.createDataFrame(
            [], "query_id int, doc_id bigint, score double, rank int"
        )
    weights = query_term_weights(
        postings, queries, n_docs, max_df_ratio=max_df_ratio
    )
    # postings x broadcast(query terms): BroadcastHashJoin — the corpus side
    # never shuffles to meet the query batch.
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        postings.join(F.broadcast(weights), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("idf") * tf_norm).alias("score"))
    )
    if score_round is not None:
        # applied before the fold AND the final window so both rank the
        # same value (see docstring)
        scored = scored.withColumn("score", F.round("score", score_round))
    # two-phase top-k: fold each shuffle partition down to k candidates per
    # query (collect_list bounded by partition rows), then exact-rank the
    # <= partitions*k survivors per query.  The fold's struct sort must
    # agree with the final window's tie-break (score DESC, doc_id ASC), so
    # doc_id enters the struct negated: sort_array(desc) then orders ties
    # by -doc_id descending == doc_id ascending.
    part_topk = (
        scored.groupBy("query_id", F.spark_partition_id().alias("_p"))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("score"), (-F.col("doc_id")).alias("negid")
                        )
                    ),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("c"))
        .select(
            "query_id",
            (-F.col("c.negid")).alias("doc_id"),
            F.col("c.score").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        part_topk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk_documents(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    k: int = 10,
    **kw,
) -> DataFrame:
    """Convenience: BM25 over the testdata ``documents`` table."""
    return bm25_topk(
        spark, load_documents_parallel(spark, sf_dir), queries, k=k, **kw
    )
