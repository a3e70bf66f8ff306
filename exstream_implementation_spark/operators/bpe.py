"""BPE tokenizer induction (Sennrich et al. 2016, arXiv:1508.07909) —
distributed merge training + segmentation.

Not in the reference (numeric traces only) — this is the tokenizer-training
step of an LLM data pipeline, built Spark-first around the one observation
that makes it scale: BPE statistics live on the WORD-FREQUENCY table, not
the corpus.  One shuffle (groupBy word, map-side combined) reduces 100 TB
of text to a vocabulary-sized (word, count) table, and every merge
iteration after that touches only that small table.  The corpus is read
exactly once for training, and once for segmentation.

Training loop (inherently sequential — merge i+1's statistics depend on
merge i, so the driver loop IS the algorithm, not a shortcut):
  * pair counts: explode adjacent symbol pairs weighted by word count,
    one map-side-combined aggregation;
  * winner: 1-row bounded collect with a DETERMINISTIC tie-break
    (count desc, pair lexicographic asc) — the reference implementation's
    ``max(stats, key=stats.get)`` is dict-order nondeterministic;
  * apply: per-word greedy left-to-right merge via a higher-order
    ``aggregate`` fold (pure JVM expression, no Python);
  * lineage control: persist each round, unpersist the previous, and
    localCheckpoint every ``checkpoint_every`` rounds so the plan does not
    grow linearly in merges.

Segmentation (``apply_bpe``) dedupes to DISTINCT words, encodes each once
with an Arrow-batched pandas UDF (the merge-rank loop is per-word Python by
nature; doing it once per distinct word instead of once per occurrence is
the distributed win), then broadcast-ish joins the segmentations back.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over lowercased whitespace tokens — the only
    corpus-sized pass in training."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> its character symbols plus the end-of-word marker."""
    return words.withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # one element per character
            F.array(F.lit(END)),
        ),
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) inside ``syms`` —
    a pure-JVM fold.  For runs like a,a,a with merge (a,a) this yields
    (aa, a): once the pair merges, its product does not immediately
    re-merge with the next symbol, matching the reference regex replace."""
    merged = a + b
    # try_element_at: NULL (never a match) on the empty accumulator — ANSI
    # mode forbids out-of-range element_at (see repo ANSI trap notes)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-pair frequencies weighted by word count —
    overlapping occurrences count naively (a,a,a -> two (a,a)), like the
    reference's zip(symbols, symbols[1:])."""
    pairs = symbols.select(
        "count",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1),"
                " (s, i) -> struct(s as a, syms[i + 1] as b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("count").alias("n"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges; stops early when no pair is left.
    Returns the ordered merge list — order IS the merge priority."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive: {n_merges}")
    return _greedy_merges(
        _initial_symbols(word_counts(docs, text_col)),
        n_merges,
        checkpoint_every,
    )


def _greedy_merges(
    symbols: DataFrame,
    n_merges: int,
    checkpoint_every: int,
) -> list[tuple[str, str]]:
    """The Sennrich loop over a prepared ``(count, syms)`` table."""
    # localCheckpoint pins an RDD that DataFrame.unpersist does NOT release
    # (only the async ContextCleaner frees it, after GC) — so this job
    # releases its own checkpoint RDDs explicitly on exit instead of
    # leaking pinned storage (tests/test_cache_hygiene.py is the gate).
    # The ownership diff is taken around EACH eager checkpoint call, never
    # entry-to-exit: a whole-function diff would also sweep caches other
    # threads pinned on the shared context while training ran.
    jsc = symbols.sparkSession.sparkContext._jsc
    own_checkpoint_ids: set = set()
    symbols = symbols.persist()
    merges: list[tuple[str, str]] = []
    try:
        for i in range(n_merges):
            top = (
                _pair_counts(symbols)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = symbols.withColumn("syms", _merge_expr(a, b))
            if (i + 1) % checkpoint_every == 0:
                # cut the fold-upon-fold lineage before it compounds
                pre = set(jsc.getPersistentRDDs().keySet().toArray())
                nxt = nxt.localCheckpoint(eager=True)  # pins NOW (eager)
                post = set(jsc.getPersistentRDDs().keySet().toArray())
                own_checkpoint_ids |= post - pre
            else:
                nxt = nxt.persist()
                nxt.count()
            symbols.unpersist()
            symbols = nxt
    finally:
        symbols.unpersist()
        leftover = jsc.getPersistentRDDs()
        for rid in list(leftover.keySet().toArray()):
            if rid in own_checkpoint_ids:
                leftover.get(rid).unpersist(False)
    return merges


def extend_merges(
    docs: DataFrame,
    merges: list,
    n_new_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Warm-start continuation of a FROZEN merge list on new text — the
    cheap remedy when ``incremental.prep_state_is_stale`` trips on a
    drifted batch, between "keep segmenting toward characters" and a
    cold full retrain.

    The new corpus's (word, count) table is segmented under the frozen
    ranks first (the identical ``_encode_word`` the deployed ``apply_bpe``
    runs — the continuation optimizes the segmentation the encoder
    actually produces), then the greedy loop appends up to
    ``n_new_merges`` merges.  The frozen prefix is preserved verbatim, so
    every previously-learned token keeps its identity and rank; only NEW
    vocabulary appears.  Extending still changes how drifted words
    segment, so the caller must publish the result as a NEW state root /
    tokenizer version and re-tokenize downstream consumers — see
    ``incremental.extend_prep_tokenizer`` for that boundary.
    """
    if n_new_merges <= 0:
        raise ValueError(f"n_new_merges must be positive: {n_new_merges}")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, ranks))

    symbols = word_counts(docs, text_col).select(
        "count", seg("word").alias("syms")
    )
    new = _greedy_merges(symbols, n_new_merges, checkpoint_every)
    return [tuple(p) for p in merges] + new


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE segmentation: repeatedly merge the lowest-rank pair
    present, all its occurrences left-to-right."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        a, b = best[1]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment every document: adds ``bpe_tokens`` (array<string>, in
    word order with per-word subwords concatenated) and ``n_bpe``.

    Encodes each DISTINCT word once (Arrow-batched pandas UDF — the
    merge-rank loop is inherently per-word Python), then joins the
    segmentations back onto the exploded corpus and re-assembles per doc.
    The join key is the word itself; the distinct-word side is vocabulary-
    sized, so AQE broadcasts it for any real corpus.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, ranks))

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    exploded = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "word")
    )
    vocab = exploded.select("word").distinct().withColumn(
        "pieces", encode("word")
    )
    per_doc = (
        exploded.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda s: s["pieces"],
                )
            ).alias("bpe_tokens")
        )
    )
    return docs.join(per_doc, "doc_id", "left").withColumn(
        "bpe_tokens",
        F.coalesce("bpe_tokens", F.array().cast("array<string>")),
    ).withColumn("n_bpe", F.size("bpe_tokens"))


def save_merges(merges: list, path: str) -> None:
    """Persist a learned merge list as JSON — the tokenizer artifact a
    cold session (or the serving side of a pipeline) loads to encode
    without retraining.  Merge ORDER is the model (ranks = positions),
    so the format is an ordered list of [left, right] pairs.  The write
    is atomic (tmp + rename): a crashed save never leaves a torn
    tokenizer for a concurrent loader."""
    import json
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump([[a, b] for a, b in merges], fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def load_merges(path: str) -> list:
    """Load a merge list saved by save_merges; returns the same
    list[tuple[str, str]] shape bpe_train produces."""
    import json

    with open(path) as fh:
        raw = json.load(fh)
    out = []
    for item in raw:
        if not (isinstance(item, list) and len(item) == 2):
            raise ValueError(f"malformed merge entry: {item!r}")
        out.append((item[0], item[1]))
    return out
