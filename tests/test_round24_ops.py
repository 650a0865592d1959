"""Semantic tests for the §2.34 round-7 (cycle 5) operators:
set-replay of shingle ownership, conservation identities for the
lateness/seasonal/share tables, Neyman-allocation proportionality,
and a pandas replay of the fulfillment-latency stats."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_shingle_novelty_first_doc_and_conservation(spark):
    out = Q.shingle_novelty(spark, SF_SMOKE).collect()
    by_id = {r["doc_id"]: r for r in out}
    first = min(by_id)  # min doc_id owns every one of its shingles
    assert by_id[first]["novelty_frac"] == 1.0
    for r in out:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert math.isclose(r["novelty_frac"],
                            r["n_novel"] / r["n_shingles"])
    # every distinct corpus shingle is novel in exactly one doc
    d = Catalog(spark, SF_SMOKE).table("documents")
    toks = F.split("text", " ")
    tri = F.expr(
        "transform(sequence(1, greatest(size(_t) - 2, 0)), "
        "i -> concat_ws(' ', element_at(_t, i), element_at(_t, i + 1),"
        " element_at(_t, i + 2)))")
    n_distinct = (d.select(toks.alias("_t"))
                  .select(F.explode(tri).alias("sh"))
                  .distinct().count())
    assert sum(r["n_novel"] for r in out) == n_distinct


def test_lateness_profile_mass_and_buckets(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    out = Q.lateness_profile(spark, SF_SMOKE).collect()
    assert sum(r["n_events"] for r in out) == ev.count()
    for r in out:
        lo = r["bucket_lo_sec"]
        assert lo == -1 or (lo >= 1 and (lo & (lo - 1)) == 0)
        if lo == -1:
            assert r["max_lateness_sec"] == 0
        else:
            assert lo <= r["max_lateness_sec"] < 2 * lo


def test_neyman_alloc_proportional_to_n_sd(spark):
    out = Q.neyman_alloc(spark, SF_SMOKE).collect()
    total = sum(r["alloc_rows"] for r in out)
    assert abs(total - 10000) <= len(out)  # per-stratum rounding
    units = {r["c_mktsegment"]: r["n_rows"] * r["sd_price"]
             for r in out}
    tot_u = sum(units.values())
    for r in out:
        want = 10000 * units[r["c_mktsegment"]] / tot_u
        assert abs(r["alloc_rows"] - want) <= 1.0


def test_seasonal_index_weighted_mean_is_one(spark):
    out = Q.seasonal_index(spark, SF_SMOKE).collect()
    assert {r["month"] for r in out} == set(range(1, 13))
    gd = sum(r["n_days"] for r in out)
    # day-weighted mean of the index is exactly 1 by construction
    wmean = sum(r["seasonal_index"] * r["n_days"] for r in out) / gd
    assert math.isclose(wmean, 1.0, rel_tol=1e-9)


def test_share_of_parent_sums_to_one_per_region(spark):
    out = Q.share_of_parent(spark, SF_SMOKE).collect()
    assert len(out) == 25
    regions: dict[str, float] = {}
    for r in out:
        regions[r["region"]] = regions.get(r["region"], 0.0) \
            + r["share_of_region"]
    assert len(regions) == 5
    for share in regions.values():
        assert math.isclose(share, 1.0, rel_tol=1e-9)


def test_fulfillment_latency_pandas_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    pdf = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
           .select("o_orderpriority",
                   F.datediff("l_shipdate", "o_orderdate")
                   .alias("lat")).toPandas())
    out = {r["priority"]: r
           for r in Q.fulfillment_latency(spark, SF_SMOKE).collect()}
    for pri, grp in pdf.groupby("o_orderpriority"):
        lat = grp["lat"].to_numpy().astype(float)
        got = out[pri]
        assert got["n_lines"] == len(lat)
        assert math.isclose(got["avg_days"], lat.mean())
        assert math.isclose(got["p50_days"],
                            float(np.quantile(lat, 0.5)))
        assert math.isclose(got["p90_days"],
                            float(np.quantile(lat, 0.9)))
        assert got["max_days"] == lat.max()
        assert got["avg_days"] >= 0
