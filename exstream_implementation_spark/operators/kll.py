"""Mergeable KLL quantile sketches — persisted quantile state tables so a
100 TB corpus answers "what is p50/p99 of X per Y" incrementally, without
ever rescanning history.

Companion to operators/approx.py (HLL distinct sketches): Spark exposes
``percentile_approx`` for one-shot scans, but its internal summary is not
a first-class value — you cannot persist it, merge yesterday's state with
today's batch, or roll a fine-grained sketch table up a grouping lattice.
This module makes the quantile STATE first-class, with the same contract
HLL established:

  * yesterday's sketches + today's batch sketch  →  running quantiles
    (``kll_merge`` over the union — no rescan of yesterday's data);
  * fine-grain sketches (per source × day) roll up to any coarser grain
    by merging — one sketch table serves every grouping in its lattice.

The sketch is KLL (Karnin, Lang, Liberty 2016, "Optimal quantile
approximation in streams"): a ladder of compactors where level ``h``
holds items of weight ``2**h``; compacting a level sorts it and promotes
every other item one level up, so total weight is conserved EXACTLY
(``n_rows`` equals the summed item weights — pinned by tests) while the
item count stays O(k).  One deliberate deviation from the paper: the
promotion offset alternates deterministically per level instead of using
random bits, so the same input always yields the same sketch — task
retries and re-runs are reproducible, at the cost of the paper's
randomized worst-case constant (the alternation is unbiased over pairs
of compactions; the tests pin the observed rank error well inside the
published envelope ~2.3/k).

Execution shape: ``kll_build`` sketches PER PARTITION in one
``mapInPandas`` pass (numpy bulk inserts — the Python loop touches
levels, not rows), so only O(partitions × groups) sketch rows of O(k)
doubles shuffle to the per-group merge; the raw column never exchanges.
Merges and estimates operate on sketch rows only.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS_COL = "kll_levels"
K_COL = "kll_k"

# level capacity decay ratio from the paper (c = 2/3); deeper (older,
# heavier) levels keep up to k items, the base level shrinks as the
# ladder grows
_C = 2.0 / 3.0


def _cap(k: int, level: int, num_levels: int) -> int:
    """Capacity of ``level`` in a ladder of ``num_levels`` (top level
    holds k items; each level below holds a factor c fewer, floor 2)."""
    depth = num_levels - 1 - level
    return max(2, int(math.ceil(k * (_C**depth))))


class KLLSketch:
    """Driver/executor-side sketch value.  ``levels[h]`` holds float64
    items of weight ``2**h``; total item weight always equals ``n``."""

    __slots__ = ("k", "levels", "n", "_flips")

    def __init__(self, k: int):
        if k < 8:
            raise ValueError(f"k must be >= 8: {k}")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._flips: list[bool] = [False]

    # -- core ------------------------------------------------------------
    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _budget(self) -> int:
        h = len(self.levels)
        return sum(_cap(self.k, i, h) for i in range(h))

    def extend(self, values) -> None:
        """Bulk insert (NaN/None dropped — nulls don't enter the sketch,
        matching hll_build's contract)."""
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        if other.k != self.k:
            raise ValueError(
                f"cannot merge sketches with different k: {self.k} vs {other.k}"
            )
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self._flips.append(False)
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._budget():
            h_count = len(self.levels)
            for h in range(h_count):
                if len(self.levels[h]) >= _cap(self.k, h, h_count):
                    self._compact(h)
                    break
            else:  # pragma: no cover — budget >= sum of caps prevents this
                break

    def _compact(self, h: int) -> None:
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self._flips.append(False)
        lv = np.sort(self.levels[h])
        if len(lv) % 2 == 1:
            # hold the max back at this level (weight unchanged — holding
            # out is unbiased; only the promotion offset needs balancing)
            keep, lv = lv[-1:], lv[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        off = 1 if self._flips[h] else 0
        self._flips[h] = not self._flips[h]
        self.levels[h] = keep
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], lv[off::2]])

    # -- queries ----------------------------------------------------------
    def weight(self) -> int:
        return int(
            sum((1 << h) * len(lv) for h, lv in enumerate(self.levels))
        )

    def quantiles(self, qs: list[float]) -> list:
        if self.n == 0:
            return [None] * len(qs)
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(len(lv), 1 << h, dtype=np.int64)
                for h, lv in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cum = np.cumsum(wts[order])
        total = cum[-1]
        out = []
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile must be in [0, 1]: {q}")
            i = int(np.searchsorted(cum, q * total, side="left"))
            out.append(float(vals[min(i, len(vals) - 1)]))
        return out

    # -- (de)serialization to plain nested lists (array<array<double>>) --
    def to_rows(self) -> list:
        return [lv.tolist() for lv in self.levels]

    @classmethod
    def from_rows(cls, k: int, rows) -> "KLLSketch":
        s = cls(k)
        s.levels = [
            np.asarray(list(lv), dtype=np.float64) for lv in rows
        ] or [np.empty(0, dtype=np.float64)]
        s._flips = [False] * len(s.levels)
        s.n = s.weight()
        return s


# --- Spark wiring ------------------------------------------------------------
# one key-validation helper for both sketch-table families
from exstream_implementation_spark.operators.approx import (  # noqa: E402
    _check_keys,
)


def _clean_key(x):
    """pandas surfaces missing group keys as float NaN even for integer
    columns (groupby(dropna=False) on the build side, applyInPandas
    group frames on the merge side); Arrow needs a real None there."""
    if isinstance(x, float) and math.isnan(x):
        return None
    return x


def _key_ddl(df: DataFrame, keys: list) -> str:
    parts = [
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    ]
    parts += [
        f"{LEVELS_COL} array<array<double>>",
        f"{K_COL} int",
        "n_rows long",
    ]
    return ", ".join(parts)


def kll_build(
    df: DataFrame, keys: list, col: str, k: int = 200
) -> DataFrame:
    """One sketch row per ``keys`` group:
    (*keys, kll_levels, kll_k, n_rows).

    ``n_rows`` counts NON-NULL values absorbed (exactly additive under
    merge — the companion exact metric, same contract as hll_build).
    Larger ``k`` → lower rank error (≈ 2.3/k) and more state (O(k)
    doubles per sketch)."""
    if k < 8:
        raise ValueError(f"k must be >= 8: {k}")
    keys = _check_keys(keys)
    schema = _key_ddl(df, keys)
    narrow = df.select(
        *keys, F.col(col).cast("double").alias("__v")
    )

    def sketch_partition(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        sketches: dict = {}
        for pdf in it:
            if pdf.empty:
                continue
            if keys:
                grouped = pdf.groupby(keys, dropna=False, sort=False)
                for gk, sub in grouped:
                    gk = gk if isinstance(gk, tuple) else (gk,)
                    s = sketches.get(gk)
                    if s is None:
                        s = sketches[gk] = KLLSketch(k)
                    s.extend(sub["__v"].to_numpy(dtype=np.float64))
            else:
                s = sketches.get(())
                if s is None:
                    s = sketches[()] = KLLSketch(k)
                s.extend(pdf["__v"].to_numpy(dtype=np.float64))
        if sketches:
            rows = {
                name: [_clean_key(gk[i]) for gk in sketches]
                for i, name in enumerate(keys)
            }
            rows[LEVELS_COL] = [s.to_rows() for s in sketches.values()]
            rows[K_COL] = k
            rows["n_rows"] = [s.n for s in sketches.values()]
            yield pd.DataFrame(rows)

    partials = narrow.mapInPandas(sketch_partition, schema=schema)
    return kll_merge(partials, keys)


def kll_merge(sketches: DataFrame, keys: list) -> DataFrame:
    """Merge a sketch table to the ``keys`` grain (a subset — possibly
    empty — of the grain it was built at), or combine several
    ``kll_build`` outputs after a ``unionByName``.  Output schema matches
    ``kll_build`` so merges chain/roll up arbitrarily."""
    keys = _check_keys(keys)
    schema = _key_ddl(sketches, keys)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf[K_COL].iloc[0])
        if (pdf[K_COL] != k).any():
            raise ValueError("cannot merge sketches with different k")
        acc = KLLSketch(k)
        # deterministic merge order regardless of task scheduling; the
        # full-content key is cheap — sketches are O(k) doubles
        for rows in sorted(
            pdf[LEVELS_COL],
            key=lambda r: tuple(tuple(float(v) for v in lv) for lv in r),
        ):
            acc.merge(KLLSketch.from_rows(k, rows))
        out = {name: [_clean_key(pdf[name].iloc[0])] for name in keys}
        out[LEVELS_COL] = [acc.to_rows()]
        out[K_COL] = k
        out["n_rows"] = int(pdf["n_rows"].sum())
        return pd.DataFrame(out)

    if keys:
        return sketches.groupBy(*keys).applyInPandas(
            merge_group, schema=schema
        )
    # global merge: group on a constant (one group, O(partitions x groups)
    # tiny sketch rows — never corpus-sized) and drop it inside the merge
    return (
        sketches.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: merge_group(pdf.drop(columns=["__g"])),
            schema=schema,
        )
    )


def kll_quantiles(sketches: DataFrame, qs: list) -> DataFrame:
    """Append ``quantiles`` (array<double>, one entry per ``qs``) to a
    sketch table.  The sketch column is kept — estimates are cheap
    projections; the state is the valuable part."""
    qs = [float(q) for q in qs]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1]: {q}")

    @F.pandas_udf("array<double>")
    def est(levels: pd.Series, ks: pd.Series) -> pd.Series:
        return pd.Series(
            [
                KLLSketch.from_rows(int(k), rows).quantiles(qs)
                for rows, k in zip(levels, ks)
            ]
        )

    return sketches.withColumn(
        "quantiles", est(F.col(LEVELS_COL), F.col(K_COL))
    )


def quantile_rollup(
    df: DataFrame,
    detail_keys: list,
    col: str,
    rollup_keys: list,
    qs: list,
    k: int = 200,
) -> DataFrame:
    """Convenience: build at ``detail_keys`` grain, merge to
    ``rollup_keys``, estimate — the one-call form of the
    build-once/merge-anywhere pattern (callers that persist the detail
    sketch table should call the three steps themselves)."""
    detail = kll_build(df, detail_keys, col, k=k)
    return kll_quantiles(kll_merge(detail, rollup_keys), qs)
