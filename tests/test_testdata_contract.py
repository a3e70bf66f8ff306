"""Testdata contract — fail LOUDLY at round start if the driver regenerated
the parquet tables with a different shape.

Rounds 4-5 were lost to a silent encoding change (`events.ts`
TIMESTAMP(NANOS) → timestamp[us]) that surfaced as 16 cryptic
AnalysisExceptions deep inside query plans.  This test pins the column
contract every plan assumes, with explicit alternatives where the engine is
deliberately encoding-agnostic — so drift shows up as ONE readable diff in
the first pytest run, not as a round of broken queries.
"""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"

# column -> allowed pyarrow type names (prefix match for parameterized types)
CONTRACT = {
    "region": {"r_regionkey": ["int32", "int64"], "r_name": ["string"]},
    "nation": {
        "n_nationkey": ["int32", "int64"],
        "n_name": ["string"],
        "n_regionkey": ["int32", "int64"],
    },
    "customer": {
        "c_custkey": ["int64"],
        "c_name": ["string"],
        "c_nationkey": ["int32", "int64"],
        "c_acctbal": ["double"],
        "c_mktsegment": ["string"],
    },
    "supplier": {
        "s_suppkey": ["int64"],
        "s_name": ["string"],
        "s_nationkey": ["int32", "int64"],
        "s_acctbal": ["double"],
    },
    "part": {
        "p_partkey": ["int64"],
        "p_name": ["string"],
        "p_brand": ["string"],
        "p_type": ["string"],
        "p_size": ["int32", "int64"],
        "p_retailprice": ["double"],
    },
    "orders": {
        "o_orderkey": ["int64"],
        "o_custkey": ["int64"],
        "o_orderstatus": ["string"],
        "o_totalprice": ["double"],
        "o_orderdate": ["timestamp", "date"],
        "o_orderpriority": ["string"],
    },
    "lineitem": {
        "l_orderkey": ["int64"],
        "l_partkey": ["int64"],
        "l_suppkey": ["int64"],
        "l_linenumber": ["int32", "int64"],
        "l_quantity": ["double"],
        "l_extendedprice": ["double"],
        "l_discount": ["double"],
        "l_tax": ["double"],
        "l_returnflag": ["string"],
        "l_linestatus": ["string"],
        "l_shipdate": ["timestamp", "date"],
    },
    "events": {
        "event_id": ["int64"],
        # both historical encodings are supported by sources.tables.ts_seconds
        "ts": ["timestamp", "int64"],
        "user_id": ["int64"],
        "event_type": ["string"],
        "value": ["double"],
        "props": ["string"],
    },
    "documents": {
        "doc_id": ["int64"],
        "text": ["string"],
        "lang": ["string"],
        "source": ["string"],
        "n_chars": ["int64", "int32"],
    },
    "embeddings": {
        "vec_id": ["int64"],
        "embedding": ["list"],
        "label": ["int32", "int64"],
    },
}


@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_table_schema_contract(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    problems = []
    for col, allowed in CONTRACT[table].items():
        if col not in got:
            problems.append(f"missing column {col!r} (have: {sorted(got)})")
        elif not any(got[col].startswith(a) for a in allowed):
            problems.append(
                f"column {col!r} is {got[col]!r}, engine expects one of "
                f"{allowed} — if the driver regenerated testdata, adapt the "
                f"loaders (see sources/tables.py ts_seconds for the pattern)"
            )
    assert not problems, f"{table}: " + "; ".join(problems)
