"""Catalog registry guards.

The driver's correctness harness checks registered queries IN ORDER under a
bounded budget that has always resolved to the first 50 entries.  Round 10
accidentally pushed two SURVEY-mapped suites (agg_stats_suite,
temporal_join_suite) to slots 51-52, dropping four SURVEY §2 rows out of the
driver's hard correctness signal for a round.  These guards make that
regression impossible to reintroduce silently: adding a 51st catalog entry
(or reordering a mapped suite past slot 50) fails the suite with an
instruction to consolidate first (the round-2/6/11 pattern — fold the new
query into an existing suite as a branch under one oracle).
"""

from __future__ import annotations

from exstream_implementation_spark.plans import ORACLES, QUERIES

DRIVER_WINDOW = 50

# Every catalog query docs/COVERAGE.md maps a SURVEY §2.1/§2.3 row to.
# Keep in sync with the COVERAGE.md matrix (that file names the suite for
# each operator row).
SURVEY_MAPPED = {
    "scan_project",
    "filter_union_suite",
    "join_broadcast_dims",
    "positional_join",
    "groupby_salted_skew",
    "conditional_counts",
    "join_semi_anti",
    "sort_rank_topk",
    "window_fn_suite",
    "agg_stats_suite",
    "topk_until_leap",
    "scalar_expr_suite",
    "string_json_suite",
    "pivot_wide",
    "text_metrics_suite",
    "array_higher_order",
    "udtf_token_chunks",
    "temporal_join_suite",
    "exstream_rewards",
    "exstream_entropy_profile",
    "exstream_leap_cut",
    "exstream_explain_det",
    "exstream_explain",
    "exstream_fp_profile",
    "exstream_slice_counts",
    "corr_cluster_reps",
    "mass_profile_chunked",
}


def test_catalog_fits_driver_window():
    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"catalog has {len(QUERIES)} entries but the driver's correctness "
        f"harness checks only the first {DRIVER_WINDOW} — consolidate "
        "(fold the new query into an existing suite as a branch under one "
        "oracle) instead of appending"
    )


def test_survey_mapped_suites_inside_driver_window():
    order = list(QUERIES)
    missing = SURVEY_MAPPED - set(order)
    assert not missing, f"SURVEY-mapped suites missing from catalog: {missing}"
    late = {n: order.index(n) + 1 for n in SURVEY_MAPPED
            if order.index(n) >= DRIVER_WINDOW}
    assert not late, (
        f"SURVEY-mapped suites registered past the driver's "
        f"{DRIVER_WINDOW}-entry correctness window: {late}"
    )


def test_every_entry_is_oracle_gated_or_flagship():
    # the rows-only exemption list is deliberate and tiny: the production
    # flagship keeps the xxhash64 sampler (its md5-portable twin
    # exstream_explain carries the hash gate)
    allowed_rows_only: set[str] = set()
    ungated = set(QUERIES) - set(ORACLES) - allowed_rows_only
    assert not ungated, f"catalog entries without a DuckDB oracle: {ungated}"
