"""Regression tests for the round-5 core-spine review fixes:
degenerate-group moments under ANSI mode, and as-of join tie/NULL/row
semantics."""

from __future__ import annotations

from pyspark.sql import Row


def test_stats_moments_degenerate_groups_match_oracle(spark, tmp_path):
    """A singleton group (n*(n-1)=0) and a constant-quantity group
    (num_q=0) must yield NULL moments in BOTH engines — Spark 4's
    default ANSI mode would otherwise throw DIVIDE_BY_ZERO where
    DuckDB quietly NULLs, so the same fixture would crash one engine
    and pass the other."""
    import duckdb

    import __spark_entry__ as e
    from go_http_data_pipeline_spark.operators.aggregates import (
        stats_moments_profile,
    )

    rows = [
        # singleton group: every n-1 denominator is zero
        Row(l_returnflag="S", l_quantity=7.0, l_discount=0.05),
        # constant-quantity group: num_q = 0 (corr/slope denominator)
        Row(l_returnflag="C", l_quantity=4.0, l_discount=0.01),
        Row(l_returnflag="C", l_quantity=4.0, l_discount=0.07),
        Row(l_returnflag="C", l_quantity=4.0, l_discount=0.03),
        # healthy group
        Row(l_returnflag="N", l_quantity=1.0, l_discount=0.01),
        Row(l_returnflag="N", l_quantity=5.0, l_discount=0.04),
        Row(l_returnflag="N", l_quantity=9.0, l_discount=0.10),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{d}/lineitem.parquet")

    got = {r.l_returnflag: r for r in stats_moments_profile(spark, d).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS FROM '{d}/lineitem.parquet/*.parquet'"
    )
    want = {
        r[0]: r
        for r in con.execute(
            e.oracle_sql()["stats_moments_profile"]
        ).fetchall()
    }
    assert set(got) == set(want) == {"S", "C", "N"}
    cols = (
        "n_items avg_qty var_qty std_qty var_disc_pct covar_qty_disc"
        " corr_qty_disc slope_disc_per_qty"
    ).split()
    for flag, w in want.items():
        assert tuple(got[flag][c] for c in cols) == tuple(w[1:]), flag
    # The degenerate denominators are NULL, not a crash:
    assert got["S"].var_qty is None and got["S"].corr_qty_disc is None
    assert got["C"].corr_qty_disc is None and got["C"].slope_disc_per_qty is None
    assert got["C"].var_qty == 0.0
    assert got["N"].corr_qty_disc is not None


def test_asof_join_tie_null_and_row_semantics(spark):
    """Three contracts the fixture never exercises: (1) right rows
    with NULL key/timestamp match nothing (SQL join semantics) and a
    NULL-key left row gets NULL asof columns; (2) right rows tied on
    (key, ts) attach deterministically (greatest value tuple); (3)
    the attached values always come from ONE right row — never a
    per-column forward-fill stitched across tied rows."""
    from go_http_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [Row(k=1, lts=100), Row(k=2, lts=100), Row(k=None, lts=100)]
    )
    right = spark.createDataFrame(
        [
            # k=1: two rows tied on ts=50 — struct order picks (2, None)
            Row(k=1, rts=50, a=1, b=9),
            Row(k=1, rts=50, a=2, b=None),
            # NULL key / NULL ts rows must match nothing
            Row(k=None, rts=40, a=99, b=99),
            Row(k=2, rts=None, a=88, b=88),
            # k=2: one valid earlier row
            Row(k=2, rts=30, a=5, b=6),
        ]
    )
    out = {
        r.k: r
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["a", "b"],
        ).collect()
    }
    # (2)+(3): tied rows -> the greatest struct, as one consistent row
    assert (out[1].asof_a, out[1].asof_b) == (2, None)
    assert out[1].asof_rts == 50
    # (1): NULL-ts right row dropped; k=2 attaches the rts=30 row
    assert (out[2].asof_rts, out[2].asof_a, out[2].asof_b) == (30, 5, 6)
    # (1): NULL-key left row inherits nothing from NULL-key right rows
    assert (out[None].asof_rts, out[None].asof_a, out[None].asof_b) == (
        None,
        None,
        None,
    )


def test_asof_join_carries_unorderable_map_values(spark):
    """A map-typed right value column must ride the transport struct
    without joining the tie-break ORDER BY (maps aren't orderable —
    ordering by the full value struct used to raise AnalysisException).
    Orderable columns still break (key, ts) ties deterministically."""
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([Row(k=1, lts=100)])
    right = (
        spark.createDataFrame(
            [Row(k=1, rts=50, a=1), Row(k=1, rts=50, a=2)]
        ).withColumn(
            "meta", F.create_map(F.lit("src"), F.col("a").cast("string"))
        )
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["a", "meta"],
    ).collect()[0]
    # Ties break on the orderable column a -> the a=2 row wins, and
    # its map arrives from the SAME row (no cross-row stitching).
    assert out.asof_a == 2
    assert out.asof_meta == {"src": "2"}
    assert out.asof_rts == 50


def test_asof_join_empty_value_cols_attaches_only_ts(spark):
    """value_cols=[] must mean 'timestamp only' even when the right
    table HAS extra columns (an explicit [] used to fall back to all
    columns via truthiness)."""
    from go_http_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([Row(k=1, lts=100)])
    right = spark.createDataFrame([Row(k=1, rts=50, extra="x")])
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", value_cols=[]
    )
    assert out.columns == ["k", "lts", "asof_rts"]
    assert out.collect()[0].asof_rts == 50
