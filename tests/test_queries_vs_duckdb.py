"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values
(SURVEY.md §5.2.5).

DTYPE-SENSITIVE ON PURPOSE: the driver canonicalizes pandas-side
(Spark toPandas vs DuckDB .df()) and its value hash distinguishes int
from float (round-1: DuckDB SUM(BIGINT)→HUGEINT→float64 hashed `2279.0`
against Spark's int64 `2279`) while being integer-width-insensitive
(int32 row_number vs BIGINT passed). The canon below replicates that:
ints of any width canonicalize equal, int-vs-float and
Decimal-vs-float do NOT — so local green predicts driver green.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon_cell(v):
    """Type-class-preserving repr: int (any width) == int, float != int,
    Decimal keeps its trailing zeros (so a Decimal-vs-float mismatch is
    VISIBLE here, exactly as it is in the driver hash)."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return "NULL" if pd.isna(v) else v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, str):
        return f"s:{v}"
    return repr(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    return sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )


def _all_pairs():
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


def _assert_matches(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = _duck().execute(sql).df()

    assert sorted(sdf.columns) == sorted(ddf.columns), f"{name}: column names differ"
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    sn, dn = _canon_frame(sdf), _canon_frame(ddf)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={mismatches[0][0]} duckdb={mismatches[0][1]}"
    )


@pytest.mark.parametrize("name,fn,sql", _all_pairs(), ids=lambda p: p if isinstance(p, str) else "")
def test_query_matches_duckdb(spark, name, fn, sql):
    _assert_matches(spark, name, fn, sql)


def test_retired_winnow_pairs_portable(spark):
    """Pin for the entry RETIRED from the driver registry in round 6
    (slot freed for repetition_stats): the whole pair pipeline —
    bucket cap, shared-count join, Broder containment — stays exactly
    DuckDB-checked here, same compare the driver runs."""
    import __spark_entry__ as se
    from docling_pdf_spark.operators.winnow import winnow_pairs_oracle_sql

    _assert_matches(
        spark, "winnow_pairs_portable", se._winnow_pairs_portable,
        winnow_pairs_oracle_sql(min_shared=3, min_containment=0.5),
    )


def test_retired_ivf_ann_topk(spark):
    """Pin for the approximate-IVF entry RETIRED from the driver
    registry in round 6 (slot freed for pii_redact): the entry still
    writes its assignment/probe artifacts at the oracle sf and the
    materialized SQL replays pruned scan + exact cosine + top-k —
    exactly as the driver checked it in rounds 4-5."""
    import __spark_entry__ as se

    _assert_matches(
        spark, "ivf_ann_topk", se._ivf_ann_topk, se._ivf_ann_topk_oracle_sql()
    )


def test_retired_simhash_portable(spark):
    """Pin for the portable-simhash entry RETIRED in round 6 2nd wave
    (slot freed for spans_audit): the end-to-end portable hash +
    pigeonhole chunk + hamming filter stays exactly DuckDB-checked
    here; the family's fast path stays ON the scoreboard via the
    materialized simhash_near_dups entry."""
    import __spark_entry__ as se
    from docling_pdf_spark.operators.dedup import simhash_portable_oracle_sql

    _assert_matches(
        spark, "simhash_portable", se._simhash_portable,
        simhash_portable_oracle_sql(max_hamming=8),
    )


def test_retired_top_orders(spark):
    """Pin for the TPC-H-ish join entry RETIRED in round 6 2nd wave
    (slot freed for per_source_cap): joins stay scoreboard-proven by
    resume_anti_join / regional_revenue / asof_last_purchase."""
    from docling_pdf_spark.queries import CATALOG

    fn, sql = CATALOG["top_orders"]
    _assert_matches(spark, "top_orders", fn, sql)


def test_retired_minhash_lsh_dedup(spark):
    """Pin for the xxhash64 fast MinHash-LSH entry RETIRED in round 6
    3rd wave (slot freed for strip_boilerplate): the entry still writes
    its banded-signature artifacts and the materialized SQL replays cap
    + bucket join + pair dedupe + Jaccard threshold — the identical
    compare the driver ran in rounds 4-6. The family stays ON the
    scoreboard via minhash_lsh_portable."""
    import os

    import __spark_entry__ as se
    from docling_pdf_spark.operators.dedup import lsh_materialized_oracle_sql

    mat = os.path.dirname(se._mat_path(se._ORACLE_SF, "x"))
    _assert_matches(
        spark, "minhash_lsh_dedup", se._minhash_lsh,
        lsh_materialized_oracle_sql(
            f"{mat}/minhash_melted/*.parquet", threshold=0.3
        ),
    )


def test_retired_embedding_near_dups(spark):
    """Pin for the exact all-pairs cosine baseline RETIRED in round 6
    3rd wave (slot freed for token_budget_mix): O(n^2) by contract, so
    it was excluded from the scale sweep anyway; the bucketed scale
    path stays driver-oracled and exhaustive==exact stays pinned in
    test_operators."""
    from docling_pdf_spark.queries import (
        SQL_EMBEDDING_NEAR_DUPS,
        q_embedding_near_dups,
    )

    _assert_matches(
        spark, "embedding_near_dups", q_embedding_near_dups,
        SQL_EMBEDDING_NEAR_DUPS,
    )


def test_retired_multimodal_thumbnails(spark):
    """Pin for the thumbnail entry RETIRED in round 6 4th wave (slot
    freed for dsir_weights): the mapInPandas resize kernel stays
    exactly DuckDB-checked here; the family keeps byte_histogram +
    frame_index on the scoreboard."""
    import __spark_entry__ as se

    _assert_matches(
        spark, "multimodal_thumbnails", se._multimodal_thumbnails,
        se.SQL_MULTIMODAL_THUMBNAILS,
    )


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert "spans" in df.columns


def test_registry_fits_driver_cap():
    """CORRECTNESS_r04 recorded exactly the first 50 of 51 registered
    entries — the driver harness caps at 50 and silently evicts the
    tail. Pin the registry at ≤50 with every entry exactly oracled so
    nothing green can fall off (r4 VERDICT next-round #1)."""
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    assert len(q) <= 50, f"registry has {len(q)} entries; driver caps at 50"
    assert set(o) == set(q), (
        f"oracle/query key mismatch: only-q={sorted(set(q) - set(o))} "
        f"only-o={sorted(set(o) - set(q))}"
    )
    # the r4 casualty must be registered well clear of the tail
    assert "multimodal_frame_index" in q
    # round-6 promotions must be ON the scoreboard, their retired
    # donors off it (pytest-pinned above instead)
    assert "repetition_stats" in o and "pii_redact" in o
    assert "ivf_ann_topk" not in q and "winnow_pairs_portable" not in q
    # 2nd wave
    assert "per_source_cap" in o and "spans_audit" in o
    assert "simhash_portable" not in q and "top_orders" not in q


def test_rows_only_queries_run(spark):
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    for name in set(q) - set(o):
        n = q[name](spark, SF_DIR).count()
        assert n >= 0, name
