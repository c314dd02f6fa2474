"""Semantic validation of stats_moments_profile: the exact-integer
derivation must agree with numpy's reference moments (the cross-engine
hash check in tools/check.py only proves Spark == DuckDB; this proves
both equal the textbook definition)."""

from __future__ import annotations

import math

import numpy as np

from go_http_data_pipeline_spark.operators.aggregates import stats_moments_profile


def test_moments_match_numpy(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in stats_moments_profile(spark, sf_dir).collect()}

    import duckdb

    con = duckdb.connect()
    ref = con.sql(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, "
        f"CAST(ROUND(l_discount * 100) AS BIGINT) AS d "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).df()

    assert set(rows) == set(ref["l_returnflag"].unique())
    for flag, grp in ref.groupby("l_returnflag"):
        q = grp["q"].to_numpy(dtype=np.float64)
        d = grp["d"].to_numpy(dtype=np.float64)
        got = rows[flag]
        assert got["n_items"] == len(q)
        assert math.isclose(got["avg_qty"], q.mean(), rel_tol=1e-12)
        assert math.isclose(got["var_qty"], q.var(ddof=1), rel_tol=1e-9)
        assert math.isclose(got["std_qty"], q.std(ddof=1), rel_tol=1e-9)
        assert math.isclose(got["var_disc_pct"], d.var(ddof=1), rel_tol=1e-9)
        cov = np.cov(q, d, ddof=1)[0, 1]
        assert math.isclose(got["covar_qty_disc"], cov, rel_tol=1e-9, abs_tol=1e-9)
        corr = np.corrcoef(q, d)[0, 1]
        assert math.isclose(got["corr_qty_disc"], corr, rel_tol=1e-9, abs_tol=1e-9)
        slope = cov / q.var(ddof=1)
        assert math.isclose(got["slope_disc_per_qty"], slope, rel_tol=1e-9, abs_tol=1e-9)
