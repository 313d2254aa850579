"""Relational operator suite over the driver's TPC-H-ish tables.

Each query here is the Spark-first realization of one row of the
SURVEY.md §2 operator inventory (fold/agg, joins incl. broadcast /
semi / anti / as-of, window top-k, set ops, deterministic sampling,
sessionization). Every function takes (spark, sf_dir) and returns a
DataFrame whose column names match the paired oracle SQL in ``ORACLE``.

Scale notes (100 TB discipline):
* fact-side scans carry their filters declaratively so Catalyst pushes
  them into the parquet scan (PushedFilters) and prunes columns;
* every dimension join is an explicit ``F.broadcast`` — at 10^12 rows
  the fact table must never shuffle for a kilobyte-sized dim;
* money aggregates run in DECIMAL(18,2) so partial/final aggregation is
  exact and order-insensitive (rank-identity across parallelism —
  the same property SURVEY §7.3 demands of the index build);
* every *output* decimal aggregate is cast to DOUBLE and every int-sum
  to BIGINT, identically on the Spark and DuckDB sides — pandas renders
  Spark DECIMAL as ``decimal.Decimal`` objects and DuckDB DECIMAL/HUGEINT
  as ``float64``, so a stringified value-hash diverges on numerically
  identical results unless both sides agree on the output type.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import _tables

DEC = "decimal(18,2)"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _tables.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01: groupBy fold-aggregation (reference foldByKey sum/max —
# spark/Worker.java:119-140 — done right: partial+final combine).
# --------------------------------------------------------------------------

def q01_fold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).cast("double").alias("sum_disc_price"),
            F.max(F.col("l_quantity").cast(DEC)).cast("double").alias("max_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q02: multi-way join with broadcast dims (reference join =
# index-nested-loop HTTP lookups, spark/Worker.java:257-277).
# --------------------------------------------------------------------------

def q02_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# q03: window top-k per group (frontend sort+paginate,
# Mainpage.java:117-132, generalized; total tie-break order).
# --------------------------------------------------------------------------

def q03_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            "rk",
            "o_orderkey",
            F.col("o_totalprice").cast(DEC).cast("double").alias("totalprice"),
        )
        .orderBy("o_orderpriority", "rk")
    )


# --------------------------------------------------------------------------
# q04: set operations (intersection — spark/Worker.java:164-189;
# union/except absent in the reference, built-in here).
# --------------------------------------------------------------------------

def q04_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust_nations.intersect(supp_nations)
    cust_only = cust_nations.distinct().subtract(supp_nations.distinct())
    return (
        both.withColumn("side", F.lit("both"))
        .unionAll(cust_only.withColumn("side", F.lit("cust_only")))
        .orderBy("side", "nationkey")
    )


# --------------------------------------------------------------------------
# q05: semi/anti joins (absent in the reference — SURVEY §2.3 last row).
# --------------------------------------------------------------------------

def q05_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("with_orders"))
    )
    without_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("without_orders"))
    )
    return with_orders.unionAll(without_orders).orderBy("kind", "c_nationkey")


# --------------------------------------------------------------------------
# q06: selective filter + projection (predicate pushdown / column pruning
# — the reference ships full rows always, kvs/Worker.java:280-344).
# --------------------------------------------------------------------------

def q06_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01"))
            & (F.col("l_shipdate") < F.lit("2001-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# q07: sessionization over the events stream table (lag window + gap
# cut; the closest reference analog is the crawl frontier iteration,
# jobs/Crawler.java:72-150, rebuilt as a declarative window).
# --------------------------------------------------------------------------

SESSION_GAP_S = 1800


def q07_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = ts_us - F.lag(ts_us).over(w)
    gaps = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > SESSION_GAP_S * 1_000_000, 1)
        .otherwise(0),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q08: tumbling-window aggregation over events (time-series groupBy).
# --------------------------------------------------------------------------

def q08_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


# --------------------------------------------------------------------------
# q09: as-of join — for each 'purchase' event, the most recent prior
# 'click' by the same user. Spark lacks ASOF JOIN; the scalable
# realization is the union-tag + last_value window trick (one shuffle
# by user_id, no range cross-product).
# --------------------------------------------------------------------------

def q09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(0).alias("is_q"),
        F.lit(None).cast("long").alias("q_event_id"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(1).alias("is_q"),
        F.col("event_id").alias("q_event_id"),
    )
    # at identical ts, purchases sort BEFORE clicks so the preceding-rows
    # frame sees only strictly-earlier clicks (ASOF "p.ts > c.ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", F.desc("is_q"), "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = clicks.unionAll(purch).withColumn(
        "last_click_id",
        F.last(F.when(F.col("is_q") == 0, F.col("eid")), ignorenulls=True).over(w),
    )
    return (
        tagged.filter((F.col("is_q") == 1) & F.col("last_click_id").isNotNull())
        .select(
            F.col("q_event_id").alias("purchase_id"),
            "user_id",
            F.col("last_click_id").alias("click_id"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# q51: range (band) join — for each purchase, clicks by the same user in
# the preceding hour. A naive realization is a theta join (cross-product
# per user, BroadcastNestedLoopJoin — the 100 TB killer). The scalable
# rewrite: bucket both sides by hour (band width = range width), probe
# buckets {b, b-1} from the purchase side (2-way explode), equi-join on
# (user_id, bucket) — one hash shuffle — then apply the exact interval
# predicate to candidates only. A click lands in exactly one bucket and
# the probe buckets are distinct, so no dedup step is needed. The DuckDB
# oracle is the plain inequality join, so any bucket-coverage bug
# (band math off by one) loses pairs and hash-fails.
# --------------------------------------------------------------------------

BAND_SECONDS = 3600


def q51_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # integer floor-div bucketing (a double division could round an
    # exact hour boundary across the bucket edge)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.expr(f"unix_timestamp(ts) div {BAND_SECONDS}").alias("b"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.expr(f"unix_timestamp(ts) div {BAND_SECONDS}").alias("b0"),
    )
    probe = purch.select(
        "event_id",
        "user_id",
        "pts",
        F.explode(F.array(F.col("b0"), F.col("b0") - 1)).alias("b"),
    )
    matched = probe.join(clicks, ["user_id", "b"]).filter(
        (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") < F.col("pts"))
    )
    counts = matched.groupBy("event_id").agg(
        F.count("*").cast("long").alias("n_clicks_1h")
    )
    return (
        purch.join(counts, "event_id", "left")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce(F.col("n_clicks_1h"), F.lit(0)).cast("long").alias(
                "n_clicks_1h"
            ),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# q10: deterministic sampling + take (reference sample uses
# Math.random(), spark/Worker.java:191-205 — rebuilt seeded/deterministic
# per SURVEY §2.6 so results are reproducible across runs).
# --------------------------------------------------------------------------

def q10_sample_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.pmod(F.col("o_orderkey") * 2654435761, F.lit(1000)) < 50)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast(DEC).cast("double").alias("totalprice"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q30: grouping sets / cube (absent in the reference — SURVEY §2.4 last
# row); grouping_id disambiguates aggregate rows from data NULLs.
# --------------------------------------------------------------------------

def q30_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q34: cogroup (unimplemented in the reference — spark/SparkPairRDD.java
# declares no cogroup; SURVEY §2.3). Spark's literal cogroup operator:
# two grouped frames meet per key in one Arrow-batched kernel. Output is
# scalar aggregates (never raw arrays: list renderings differ between
# pandas/duckdb and would break the stringified value hash).
# --------------------------------------------------------------------------

def q34_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    cust = load(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_nationkey", "s_suppkey")

    def merge(key: tuple, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nationkey": pd.Series([key[0]], dtype="int64"),
                "n_cust": pd.Series([len(l)], dtype="int64"),
                "n_supp": pd.Series([len(r)], dtype="int64"),
                "sum_custkeys": pd.Series(
                    [int(l["c_custkey"].sum())], dtype="int64"
                ),
                "sum_suppkeys": pd.Series(
                    [int(r["s_suppkey"].sum())], dtype="int64"
                ),
            }
        )

    return (
        cust.groupby("c_nationkey")
        .cogroup(supp.groupby("s_nationkey"))
        .applyInPandas(
            merge,
            "nationkey long, n_cust long, n_supp long, "
            "sum_custkeys long, sum_suppkeys long",
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# q31: approximate distinct (HLL sketch) next to the exact count — the
# kind of cardinality probe a 100 TB profiling pass runs. The raw
# sketch value is engine-specific (Spark HLL++ vs DuckDB's), so the
# hash-gated columns are the exact count plus ``approx_ok`` — whether
# the engine sketch landed within ±5% of the exact count. The oracle
# asserts TRUE: if the sketch ever drifts past 5%, the value hash goes
# red. The raw sketch value itself is additionally bounds-checked in
# pytest (tests/test_pipelines.py) at ±2× the configured 1% rsd.
# --------------------------------------------------------------------------

APPROX_RSD = 0.01
APPROX_OK_TOL = 0.05


def q31_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", APPROX_RSD).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n"),
    )
    approx_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.lit(APPROX_OK_TOL) * F.col("exact_users")
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n",
        approx_ok.alias("approx_ok"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q44: portable HyperLogLog from scratch — the custom-sketch sibling of
# q31. q31's built-in approx_count_distinct is engine-specific (rows-only
# gate); this one is built from plain expressions over the portable md5
# hash, so DuckDB computes the bit-identical estimate. Flajolet HLL,
# p=10 (m=1024 registers), 50-bit register stream, with the small-range
# linear-counting correction. Distributed shape: one shuffle to
# (group, bucket) with map-side partial max — registers merge by MAX, so
# the sketch is trivially mergeable across partitions/segments (the
# property that makes HLL the 100 TB cardinality tool). The float sum
# over registers is made order-insensitive by summing 2^(51-M_j) as
# EXACT int64 (<= 2^60 total) and dividing once at the end.
# --------------------------------------------------------------------------

_HLL_P = 10
_HLL_M = 1 << _HLL_P  # 1024 registers
_HLL_W = 60 - _HLL_P  # 50-bit register stream (portable hash is 60-bit)


def hll_registers(df: DataFrame, key: str, value: str) -> DataFrame:
    """HLL register table for distinct-``value`` per ``key``:
    (key, bucket, mrho). Registers merge by MAX — commutative,
    associative, idempotent — so partial register tables from any
    partitioning, micro-batch split, or replayed delivery union+MAX to
    the exact same table (streaming/sketch.py builds on this)."""
    h = F.conv(
        F.substring(F.md5(F.col(value).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit((1 << _HLL_W) - 1))
    rho = F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.instr(F.lpad(F.bin(w), _HLL_W, "0"), "1")
    )
    return (
        df.select(
            F.col(key).alias("key"),
            F.shiftright(h, _HLL_W).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Cardinality estimate per key from a register table — exact-int64
    register sum, then the Flajolet formula with the small-range
    linear-counting branch. Returns (key, hll_estimate)."""
    term = F.pow(F.lit(2.0), F.lit(_HLL_W + 1) - F.col("mrho")).cast("long")
    s = regs.groupBy("key").agg(
        F.sum(term).cast("long").alias("s_present"),
        F.count("*").cast("long").alias("n_present"),
    )
    s_all = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(
        1 << (_HLL_W + 1)
    )
    v = F.lit(_HLL_M) - F.col("n_present")
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    raw = (
        F.lit(alpha)
        * F.lit(float(_HLL_M))
        * F.lit(float(_HLL_M))
        * F.pow(F.lit(2.0), F.lit(_HLL_W + 1))
        / s_all
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
    ).otherwise(raw)
    return s.select("key", F.round(est, 9).alias("hll_estimate"))


def q44_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, "event_type", "user_id")
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        hll_estimate(regs)
        .select(F.col("key").alias("event_type"), F.col("hll_estimate").alias("hll_users"))
        .join(exact, "event_type")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q56: time-series gap-fill + linear interpolation (hypertable-style
# resample). Buckets are integer floor-divs of epoch seconds (q51's
# idiom — a double division could round an exact boundary across the
# bucket edge). The missing-bucket grid is generated PER USER from that
# user's own [min, max] span — a sequence explode on the already
# user-partitioned span table, never a global calendar cross join — and
# the interpolation windows are partitioned by user, so the whole op is
# one (user, bucket) shuffle plus user-local windows: no stage touches
# more than one user's span at once, at any corpus size.
# Bucket averages fold as exact DECIMAL(18,2) partials (order-
# insensitive), one double division at the end; interpolated values use
# the identical expression shape in both engines.
# --------------------------------------------------------------------------

GAPFILL_BUCKET_S = 21_600  # 6-hour buckets


def q56_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill(load(spark, sf_dir, "events"))


def gapfill(ev: DataFrame) -> DataFrame:
    obs = (
        ev.select(
            "user_id",
            F.expr(f"unix_timestamp(ts) div {GAPFILL_BUCKET_S}").alias("b"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("user_id", "b")
        .agg((F.sum("v").cast("double") / F.count("*")).alias("avg_v"))
    )
    spans = obs.groupBy("user_id").agg(
        F.min("b").alias("mn"), F.max("b").alias("mx")
    )
    grid = spans.select("user_id", F.explode(F.sequence("mn", "mx")).alias("b"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ob = F.when(F.col("avg_v").isNotNull(), F.col("b"))
    j = (
        grid.join(obs, ["user_id", "b"], "left")
        .withColumn("pv", F.last("avg_v", ignorenulls=True).over(wp))
        .withColumn("pb", F.last(ob, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("avg_v", ignorenulls=True).over(wn))
        .withColumn("nb", F.first(ob, ignorenulls=True).over(wn))
    )
    val = F.when(F.col("avg_v").isNotNull(), F.col("avg_v")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            (F.col("b") - F.col("pb")).cast("double")
            / (F.col("nb") - F.col("pb")).cast("double")
        )
    )
    return j.select(
        "user_id",
        (F.col("b") * GAPFILL_BUCKET_S).alias("bucket_start_s"),
        F.round(val, 9).alias("value"),
        F.col("avg_v").isNull().cast("int").alias("filled"),
    ).orderBy("user_id", "bucket_start_s")


# --------------------------------------------------------------------------
# q63: funnel sequence match — users progressing view → click →
# purchase with STRICTLY increasing timestamps. The scalable shape is a
# cascade of per-user conditional-min aggregations (t1 = first view;
# t2 = first click AFTER t1; t3 = first purchase AFTER t2): three
# user-keyed aggregations + two user-keyed joins — Catalyst reuses the
# hash partitioning across the cascade, so it's ONE logical shuffle by
# user, never a per-user event-array collect (a hot user's history
# can't blow a task). Counts are exact; conversion = n_step/n_first.
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q63_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1, s2, s3 = FUNNEL_STEPS
    v1 = (
        ev.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    v2 = (
        ev.filter(F.col("event_type") == s2)
        .join(v1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    v3 = (
        ev.filter(F.col("event_type") == s3)
        .join(v2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c = (
        v1.agg(F.count("*").alias("n1"))
        .crossJoin(v2.agg(F.count("*").alias("n2")))
        .crossJoin(v3.agg(F.count("*").alias("n3")))
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"n{i + 1}").cast("long").alias("n_users"),
                F.round(
                    F.col(f"n{i + 1}").cast("double") / F.col("n1"), 9
                ).alias("conv"),
            )
            for i, name in enumerate(FUNNEL_STEPS)
        ]
    )
    return (
        c.select(F.explode(rows).alias("s")).select("s.*").orderBy("step")
    )


# --------------------------------------------------------------------------
# q64: semi-structured JSON column extraction — parse the events
# ``props`` JSON payload in place (get_json_object stays JVM-side; at
# 100 TB the parse happens inside the scan stage, no Python, no extra
# pass) and aggregate the extracted field per event_type. Money-style
# doubles sum as DECIMAL(18,2) partials; the int field sums exactly.
# --------------------------------------------------------------------------

def q64_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.col("value").cast(DEC).alias("val"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(
                F.sum("k").cast("double") / F.count("*"), 9
            ).alias("avg_k"),
            F.sum("val").cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q65: pivot (wide conditional aggregation). The pivot values are pinned
# explicitly so Spark skips the extra distinct-values job — at 10^12 rows
# an unpinned pivot scans the fact table twice.
# --------------------------------------------------------------------------

PIVOT_STATUSES = ("F", "O", "P")


def q65_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    wide = (
        orders.withColumn(
            "month",
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"),
        )
        .groupBy("month")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)))
    )
    return wide.select(
        "month",
        *[
            F.coalesce(F.col(s).cast("double"), F.lit(0.0)).alias(
                f"rev_{s.lower()}"
            )
            for s in PIVOT_STATUSES
        ],
    ).orderBy("month")


# --------------------------------------------------------------------------
# q66: unpivot / melt (wide -> long). One narrow aggregate first, then
# DataFrame.unpivot — the melt runs on the already-reduced frame, never
# on the fact table.
# --------------------------------------------------------------------------

def q66_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    wide = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("double").alias("n_cust"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("sum_bal"),
        F.max(F.col("c_acctbal").cast(DEC)).cast("double").alias("max_bal"),
    )
    return wide.unpivot(
        ["c_nationkey"], ["n_cust", "sum_bal", "max_bal"], "metric", "val"
    ).orderBy("c_nationkey", "metric")


# --------------------------------------------------------------------------
# q67: statistical aggregates (avg / stddev / covar / corr) from exact
# decimal moments. Built-in corr/stddev fold doubles in partition order
# and are NOT rank-identical across parallelism; instead the five power
# sums run in DECIMAL (exact, order-insensitive) and the closed-form
# combines them once, in one fixed double-expression shape shared with
# the oracle.
# --------------------------------------------------------------------------

MOM_DEC_IN = "decimal(18,6)"  # per-row cast; products -> decimal(37,12)


def q67_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(MOM_DEC_IN)
    y = F.col("l_extendedprice").cast(MOM_DEC_IN)
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    cxy = sxy - sx * sy / n
    # no 9dp round here: the closed form runs the SAME IEEE double ops
    # on the SAME exact decimal sums in both engines, so the unrounded
    # doubles are bit-identical — while round(x, 9) itself differs
    # between engines exactly at a half-ulp boundary (covar hit one).
    return sums.select(
        "l_returnflag",
        "n",
        (sx / n).alias("avg_qty"),
        F.sqrt(vx / (n - F.lit(1.0))).alias("stddev_qty"),
        F.sqrt(vy / (n - F.lit(1.0))).alias("stddev_price"),
        (cxy / (n - F.lit(1.0))).alias("covar_qty_price"),
        (cxy / F.sqrt(vx * vy)).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# q68: incremental aggregate merge (MERGE INTO / upsert semantics over
# immutable parquet): a frozen base snapshot plus a delta window combine
# via full-outer join — the 100 TB pattern for maintaining a materialized
# aggregate without rescanning history.
# --------------------------------------------------------------------------

INC_CUTOFF = "2000-01-01"
INC_EPOCH = "1900-01-01 00:00:00"


def q68_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def snap(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias(f"rev_{tag}"),
            F.max("o_orderdate").alias(f"last_{tag}"),
        )

    base = snap(orders.filter(F.col("o_orderdate") < F.lit(INC_CUTOFF)), "b")
    delta = snap(orders.filter(F.col("o_orderdate") >= F.lit(INC_CUTOFF)), "d")
    zero = F.lit(0).cast(DEC)
    epoch = F.lit(INC_EPOCH).cast("timestamp")
    return (
        base.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("n_b"), F.lit(0))
                + F.coalesce(F.col("n_d"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("rev_b"), zero)
                + F.coalesce(F.col("rev_d"), zero)
            ).cast("double").alias("revenue"),
            F.greatest(
                F.coalesce(F.col("last_b"), epoch),
                F.coalesce(F.col("last_d"), epoch),
            ).alias("last_order"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# q69: rolling event-time window (RANGE frame over epoch micros) — the
# per-row trailing-24h aggregate q08's tumbling buckets can't express.
# Partitioned by user, so no global-window shuffle-to-one-task.
# --------------------------------------------------------------------------

ROLL_24H_US = 24 * 3600 * 1_000_000


def q69_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-ROLL_24H_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_24h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_24h"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# q76: retention cohort analysis — users grouped by first-activity day
# (cohort), counted per day-offset of later activity. Two hash aggs and
# one user-keyed equi-join, all on the same user_id partitioning; day
# arithmetic is integer floor-div on epoch days, identical in DuckDB.
# --------------------------------------------------------------------------

COHORT_DAY_S = 86_400


def q76_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp"))
            / F.lit(COHORT_DAY_S * 1_000_000)
        ).alias("day"),
    )
    active = ev.distinct()
    first = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# q86: event-rate burst detection — per event_type, hourly counts vs a
# trailing 24-bucket baseline (RANGE frame over the integer hour
# bucket, so gaps in the series shrink the window rather than shifting
# it). Burst = count >= BURST_FACTOR x the trailing per-bucket average,
# compared in integers (cnt * BURST_TRAIL >= factor * trailing_sum) so
# no float threshold can drift between engines; the reported ratio is
# an integer-input IEEE division, NULL (both engines, explicitly) when
# there is no baseline yet. Scale shape: one hash agg to hourly counts
# (bounded by types x hours, tiny vs the event stream), then windows
# over that reduced frame partitioned by event_type.
# --------------------------------------------------------------------------

BURST_BUCKET_S = 3600
BURST_TRAIL = 24  # trailing buckets forming the baseline
BURST_FACTOR = 3  # burst at >= 3x trailing average


def hourly_counts(events: DataFrame) -> DataFrame:
    """(event_type, b, cnt) hourly buckets — the reduced series the
    burst analytic runs over. Shared with the streaming twin
    (``streaming/burst.py``), which maintains exactly this table
    incrementally and derives :func:`burst_flags` per micro-batch."""
    return (
        events.select(
            "event_type",
            F.expr(f"unix_timestamp(ts) div {BURST_BUCKET_S}").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count("*").alias("cnt"))
    )


def burst_flags(cnt: DataFrame) -> DataFrame:
    """q86's trailing-baseline analytic over an (event_type, b, cnt)
    series — tiny (types × hours), so recomputing it per streaming
    micro-batch is O(series), not O(events)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rangeBetween(-BURST_TRAIL, -1)
    )
    trail = F.coalesce(F.sum("cnt").over(w), F.lit(0).cast("long"))
    out = cnt.withColumn("trailing_sum", trail)
    ratio = (F.col("cnt") * BURST_TRAIL).cast("double") / F.col(
        "trailing_sum"
    )
    return out.select(
        "event_type",
        "b",
        "cnt",
        "trailing_sum",
        F.when(F.col("trailing_sum") > 0, ratio).alias("ratio"),
        (
            (F.col("trailing_sum") > 0)
            & (
                F.col("cnt") * BURST_TRAIL
                >= F.lit(BURST_FACTOR) * F.col("trailing_sum")
            )
        )
        .cast("int")
        .alias("is_burst"),
    ).orderBy("event_type", "b")


def q86_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return burst_flags(hourly_counts(load(spark, sf_dir, "events")))


QUERIES = {
    "q01_fold_agg": q01_fold_agg,
    "q30_cube": q30_cube,
    "q31_approx_distinct": q31_approx_distinct,
    "q44_portable_hll": q44_portable_hll,
    "q02_join_revenue": q02_join_revenue,
    "q03_window_topk": q03_window_topk,
    "q04_set_ops": q04_set_ops,
    "q05_semi_anti": q05_semi_anti,
    "q06_filter_pushdown": q06_filter_pushdown,
    "q07_sessionize": q07_sessionize,
    "q08_window_agg": q08_window_agg,
    "q09_asof_join": q09_asof_join,
    "q51_range_join": q51_range_join,
    "q10_sample_take": q10_sample_take,
    "q34_cogroup": q34_cogroup,
    "q56_gapfill": q56_gapfill,
    "q63_funnel": q63_funnel,
    "q64_json_extract": q64_json_extract,
    "q65_pivot": q65_pivot,
    "q66_unpivot": q66_unpivot,
    "q67_stats_moments": q67_stats_moments,
    "q68_incremental_merge": q68_incremental_merge,
    "q69_rolling_window": q69_rolling_window,
    "q76_retention_cohorts": q76_retention_cohorts,
    "q86_burst_detect": q86_burst_detect,
}

ORACLE = {
    # q51: the oracle is the naive inequality join — the banded rewrite
    # must find exactly the same pairs.
    "q51_range_join": """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
m AS (
  SELECT p.event_id, count(*)::BIGINT AS n
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
  GROUP BY p.event_id
)
SELECT p.event_id AS purchase_id, p.user_id,
       coalesce(m.n, 0)::BIGINT AS n_clicks_1h
FROM p LEFT JOIN m USING (event_id)
ORDER BY purchase_id
""",
    "q30_cube": """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag, l_linestatus)::INT AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
    # q31: the engine sketch is asserted via the approx_ok flag (the
    # oracle pins TRUE — a >5% sketch drift flips the value hash red);
    # the raw sketch number is engine-specific so it is not emitted.
    "q31_approx_distinct": """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q01_fold_agg": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS sum_disc_price,
       CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "q02_join_revenue": """
SELECT r_name, n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""",
    "q03_window_topk": """
SELECT o_orderpriority, rk, o_orderkey, totalprice
FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_orderpriority, rk
""",
    "q04_set_ops": """
WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT s_nationkey AS nationkey FROM supplier),
     both_side AS (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn),
     conly AS (SELECT DISTINCT nationkey FROM cn
               EXCEPT SELECT DISTINCT nationkey FROM sn)
SELECT nationkey, 'both' AS side FROM both_side
UNION ALL
SELECT nationkey, 'cust_only' AS side FROM conly
ORDER BY side, nationkey
""",
    "q05_semi_anti": """
SELECT c_nationkey, count(*) AS n, 'with_orders' AS kind
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_nationkey
UNION ALL
SELECT c_nationkey, count(*) AS n, 'without_orders' AS kind
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
ORDER BY kind, c_nationkey
""",
    "q06_filter_pushdown": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2001-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "q07_sessionize": """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
""",
    "q08_window_agg": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
""",
    "q09_asof_join": """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
ORDER BY purchase_id
""",
    "q10_sample_take": """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
FROM orders
WHERE (o_orderkey * 2654435761) % 1000 < 50
ORDER BY o_orderkey
LIMIT 100
""",
    "q34_cogroup": """
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
                  CAST(sum(c_custkey) AS BIGINT) AS sum_custkeys
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp,
                  CAST(sum(s_suppkey) AS BIGINT) AS sum_suppkeys
           FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp,
       COALESCE(sum_custkeys, 0) AS sum_custkeys,
       COALESCE(sum_suppkeys, 0) AS sum_suppkeys
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
""",
}

# q44 oracle: same HLL, same constants (embedded from the Python values
# so both engines fold the identical IEEE literals), same exact-int64
# register sum. strpos == Spark instr; bin/lpad identical.
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
ORACLE["q44_portable_hll"] = f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
b AS (
  SELECT event_type, h >> {_HLL_W} AS bucket,
         CASE WHEN (h & {(1 << _HLL_W) - 1}) = 0 THEN {_HLL_W + 1}
              ELSE strpos(lpad(bin(h & {(1 << _HLL_W) - 1}), {_HLL_W}, '0'), '1')
         END AS rho
  FROM h
),
m AS (SELECT event_type, bucket, max(rho) AS mrho
      FROM b GROUP BY event_type, bucket),
s AS (
  SELECT event_type,
         sum(CAST(pow(2.0, {_HLL_W + 1} - mrho) AS BIGINT))::BIGINT AS s_present,
         count(*)::BIGINT AS n_present
  FROM m GROUP BY event_type
),
est AS (
  SELECT event_type,
         s_present + ({_HLL_M} - n_present) * {1 << (_HLL_W + 1)} AS s_all,
         {_HLL_M} - n_present AS v
  FROM s
),
fin AS (
  -- decimal literals are wrapped ::DOUBLE — DuckDB parses bare decimal
  -- literals as DECIMAL and the DECIMAL multiply overflows
  SELECT event_type,
         CASE WHEN {_HLL_ALPHA!r}::DOUBLE * {float(_HLL_M)!r}::DOUBLE
                   * {float(_HLL_M)!r}::DOUBLE
                   * pow(2.0, {_HLL_W + 1}) / s_all <= {2.5 * _HLL_M!r}::DOUBLE
                   AND v > 0
              THEN {float(_HLL_M)!r}::DOUBLE
                   * ln({float(_HLL_M)!r}::DOUBLE / v)
              ELSE {_HLL_ALPHA!r}::DOUBLE * {float(_HLL_M)!r}::DOUBLE
                   * {float(_HLL_M)!r}::DOUBLE
                   * pow(2.0, {_HLL_W + 1}) / s_all
         END AS est
  FROM est
),
exact AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
          FROM events GROUP BY event_type)
SELECT f.event_type, round(f.est, 9) AS hll_users, exact_users
FROM fin f JOIN exact USING (event_type)
ORDER BY event_type
"""

# q56 oracle: floor(epoch) before the integer div (epoch() is a DOUBLE
# with fractional seconds; a bare ::BIGINT cast ROUNDS, which would
# shift .5+ fractions across a bucket edge — unix_timestamp floors).
ORACLE["q56_gapfill"] = f"""
WITH obs AS (
  SELECT user_id, floor(epoch(ts))::BIGINT // {GAPFILL_BUCKET_S} AS b,
         sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_v
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, min(b) AS mn, max(b) AS mx FROM obs GROUP BY 1),
grid AS (
  SELECT user_id, g.b FROM spans, unnest(generate_series(mn, mx)) AS g(b)
),
j AS (
  SELECT g.user_id, g.b, o.avg_v,
         last_value(o.avg_v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN o.avg_v IS NOT NULL THEN g.b END IGNORE NULLS)
           OVER wp AS pb,
         first_value(o.avg_v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN o.avg_v IS NOT NULL THEN g.b END IGNORE NULLS)
           OVER wn AS nb
  FROM grid g LEFT JOIN obs o USING (user_id, b)
  WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY g.user_id ORDER BY g.b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, b * {GAPFILL_BUCKET_S} AS bucket_start_s,
       round(CASE WHEN avg_v IS NOT NULL THEN avg_v
                  ELSE pv + (nv - pv)
                       * ((b - pb)::DOUBLE / (nb - pb)::DOUBLE) END, 9) AS value,
       CASE WHEN avg_v IS NULL THEN 1 ELSE 0 END AS filled
FROM j
ORDER BY user_id, bucket_start_s
"""

# q63 oracle: the same strict-after conditional-min cascade.
ORACLE["q63_funnel"] = f"""
WITH ev AS (SELECT user_id, ts, event_type FROM events),
v1 AS (
  SELECT user_id, min(ts) AS t1 FROM ev
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
v2 AS (
  SELECT e.user_id, min(ts) AS t2 FROM ev e JOIN v1 USING (user_id)
  WHERE event_type = '{FUNNEL_STEPS[1]}' AND ts > t1 GROUP BY e.user_id
),
v3 AS (
  SELECT e.user_id, min(ts) AS t3 FROM ev e JOIN v2 USING (user_id)
  WHERE event_type = '{FUNNEL_STEPS[2]}' AND ts > t2 GROUP BY e.user_id
),
c AS (
  SELECT (SELECT count(*) FROM v1) AS n1,
         (SELECT count(*) FROM v2) AS n2,
         (SELECT count(*) FROM v3) AS n3
)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_name, n1::BIGINT AS n_users,
       round(n1::DOUBLE / n1, 9) AS conv FROM c
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', n2::BIGINT, round(n2::DOUBLE / n1, 9) FROM c
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', n3::BIGINT, round(n3::DOUBLE / n1, 9) FROM c
ORDER BY step
"""

# q64 oracle: json_extract_string == get_json_object for scalar paths.
ORACLE["q64_json_extract"] = """
WITH ev AS (
  SELECT event_type, user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         value::DECIMAL(18,2) AS val
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(k)::BIGINT AS sum_k,
       round(sum(k)::DOUBLE / count(*), 9) AS avg_k,
       CAST(sum(val) AS DOUBLE) AS sum_value
FROM ev GROUP BY event_type ORDER BY event_type
"""

# q65 oracle: pivot == conditional aggregation.
ORACLE["q65_pivot"] = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE)
           AS rev_f,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE)
           AS rev_o,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE)
           AS rev_p
FROM orders
GROUP BY 1
ORDER BY month
"""

# q66 oracle: unpivot == UNION ALL of one row-shape per metric.
ORACLE["q66_unpivot"] = """
WITH w AS (
  SELECT c_nationkey,
         count(*)::DOUBLE AS n_cust,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
         CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
  FROM customer GROUP BY 1
)
SELECT c_nationkey, 'n_cust' AS metric, n_cust AS val FROM w
UNION ALL SELECT c_nationkey, 'sum_bal', sum_bal FROM w
UNION ALL SELECT c_nationkey, 'max_bal', max_bal FROM w
ORDER BY c_nationkey, metric
"""

# q67 oracle: identical closed form over the same exact decimal moments
# (same double-expression shape => bit-identical before the 9dp round).
ORACLE["q67_stats_moments"] = """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
         -- width 19 forces DuckDB's int128 physical type: an 18-wide
         -- multiply overflows int64 on per-row products (~1e21 unscaled)
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
  FROM lineitem GROUP BY 1
), d AS (
  -- decimal -> double via VARCHAR: strtod is correctly rounded, matching
  -- Java's BigDecimal.doubleValue on the Spark side. DuckDB's direct
  -- DECIMAL(38,12)::DOUBLE rounds the int128 unscaled value first (two
  -- roundings), which diverges by ULPs once the unscaled exceeds 2^53.
  SELECT l_returnflag, n,
         n::DOUBLE AS nd,
         CAST(sx::VARCHAR AS DOUBLE) AS sx, CAST(sy::VARCHAR AS DOUBLE) AS sy,
         CAST(sxx::VARCHAR AS DOUBLE) AS sxx,
         CAST(syy::VARCHAR AS DOUBLE) AS syy,
         CAST(sxy::VARCHAR AS DOUBLE) AS sxy
  FROM m
)
SELECT l_returnflag, n,
       sx / nd AS avg_qty,
       sqrt((sxx - sx * sx / nd) / (nd - 1.0)) AS stddev_qty,
       sqrt((syy - sy * sy / nd) / (nd - 1.0)) AS stddev_price,
       (sxy - sx * sy / nd) / (nd - 1.0) AS covar_qty_price,
       (sxy - sx * sy / nd)
           / sqrt((sxx - sx * sx / nd) * (syy - sy * sy / nd))
           AS corr_qty_price
FROM d
ORDER BY l_returnflag
"""

# q68 oracle: the merged snapshot must equal base ⊕ delta recombined.
ORACLE["q68_incremental_merge"] = """
WITH base AS (
  SELECT o_custkey, count(*) AS n_b,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_b,
         max(o_orderdate) AS last_b
  FROM orders WHERE o_orderdate < DATE '2000-01-01' GROUP BY 1
), delta AS (
  SELECT o_custkey, count(*) AS n_d,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d,
         max(o_orderdate) AS last_d
  FROM orders WHERE o_orderdate >= DATE '2000-01-01' GROUP BY 1
)
SELECT COALESCE(base.o_custkey, delta.o_custkey) AS o_custkey,
       (COALESCE(n_b, 0) + COALESCE(n_d, 0))::BIGINT AS n_orders,
       CAST(COALESCE(rev_b, 0::DECIMAL(18,2))
            + COALESCE(rev_d, 0::DECIMAL(18,2)) AS DOUBLE) AS revenue,
       greatest(COALESCE(last_b, TIMESTAMP '1900-01-01 00:00:00'),
                COALESCE(last_d, TIMESTAMP '1900-01-01 00:00:00'))
           AS last_order
FROM base FULL OUTER JOIN delta ON base.o_custkey = delta.o_custkey
ORDER BY o_custkey
"""

# q69 oracle: RANGE frame over epoch micros — numeric ordering on both
# engines so the frame bounds are integer arithmetic, not interval logic.
ORACLE["q69_rolling_window"] = """
SELECT event_id, user_id,
       count(*) OVER w AS n_24h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

# q76 oracle: same epoch-day floor-div cohort arithmetic.
ORACLE["q76_retention_cohorts"] = """
WITH active AS (
  -- floor(double) matches Spark's floor(long/long -> double) for ALL
  -- epochs incl. pre-1970 (DuckDB's integer // truncates toward zero);
  -- exact while |epoch_us| < 2^53 (~year 2255)
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events
),
first AS (
  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY 1
)
SELECT cohort_day, (day - cohort_day) AS day_offset,
       count(DISTINCT a.user_id)::BIGINT AS n_users
FROM active a JOIN first USING (user_id)
GROUP BY cohort_day, (day - cohort_day)
ORDER BY cohort_day, day_offset
"""

# q86 oracle: same floor-epoch integer bucket as q56's (epoch() is a
# DOUBLE; floor before the integer div), the same RANGE frame over the
# integer bucket, the same integer burst compare; ratio guarded to NULL
# when there is no baseline (Spark and DuckDB disagree on x/0 doubles).
ORACLE["q86_burst_detect"] = f"""
WITH cnt AS (
  SELECT event_type, floor(epoch(ts))::BIGINT // {BURST_BUCKET_S} AS b,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, b, cnt,
         -- DuckDB sum(BIGINT) widens to HUGEINT; pin back to BIGINT
         coalesce(sum(cnt) OVER (
           PARTITION BY event_type ORDER BY b
           RANGE BETWEEN {BURST_TRAIL} PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS trailing_sum
  FROM cnt
)
SELECT event_type, b, cnt, trailing_sum,
       CASE WHEN trailing_sum > 0
            THEN CAST(cnt * {BURST_TRAIL} AS DOUBLE) / trailing_sum
       END AS ratio,
       CASE WHEN trailing_sum > 0
                 AND cnt * {BURST_TRAIL} >= {BURST_FACTOR} * trailing_sum
            THEN 1 ELSE 0 END AS is_burst
FROM w
ORDER BY event_type, b
"""


# --------------------------------------------------------------------------
# q142: freshness-driven recrawl scheduling (Cho/Garcia-Molina 2003's
# uniform-vs-proportional insight, integer form) — a crawler's revisit
# policy needs a per-page change-rate estimate from its own observation
# log: each monitored entity's observations ordered by time, a "change"
# = the observed value differing from the previous observation, and the
# revisit interval = observed span / (changes + 1) — pages that changed
# on every probe get recrawled at probe cadence, static pages back off
# to their full span. The priority rank feeds the frontier (q79).
#
# Exactness: epoch seconds via unix_timestamp (FLOORS; a double cast
# would round .5+ fractions across a second boundary — q56's lesson),
# change flags are integer CASEs on a lag window with the
# (ts, event_id) total order, the interval is exact integer division,
# and the rank window tie-breaks (interval ASC, user ASC) — no float
# anywhere.
#
# Scale shape: one (user)-partitioned lag window (the observation log
# is naturally partitioned by entity) + one (user) hash agg + one rank
# window over |entities| rows. The log never joins itself.
# --------------------------------------------------------------------------


def q142_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    obs = ev.withColumn(
        "chg",
        F.when(F.lag("value").over(w).isNull(), F.lit(0))
        .when(F.col("value") != F.lag("value").over(w), F.lit(1))
        .otherwise(F.lit(0)),
    )
    per = obs.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("chg").cast("long").alias("n_changes"),
        (F.max("ep") - F.min("ep")).cast("long").alias("span_s"),
    )
    out = per.withColumn(
        "recrawl_interval_s",
        F.expr("span_s div (n_changes + 1)").cast("long"),
    )
    wr = Window.orderBy(F.asc("recrawl_interval_s"), F.asc("user_id"))
    return out.withColumn(
        "crawl_rank", F.row_number().over(wr).cast("long")
    ).orderBy("user_id")


QUERIES["q142_recrawl_schedule"] = q142_recrawl_schedule

ORACLE["q142_recrawl_schedule"] = """
WITH obs AS (
  SELECT user_id,
         floor(epoch(ts))::BIGINT AS ep,
         event_id,
         value,
         CASE WHEN lag(value) OVER (PARTITION BY user_id
                                    ORDER BY floor(epoch(ts))::BIGINT,
                                             event_id) IS NULL THEN 0
              WHEN value <> lag(value) OVER (PARTITION BY user_id
                                             ORDER BY floor(epoch(ts))::BIGINT,
                                                      event_id) THEN 1
              ELSE 0 END AS chg
  FROM events
),
per AS (
  SELECT user_id,
         count(*)::BIGINT AS n_obs,
         sum(chg)::BIGINT AS n_changes,
         (max(ep) - min(ep))::BIGINT AS span_s
  FROM obs GROUP BY user_id
),
iv AS (
  SELECT *, (span_s // (n_changes + 1))::BIGINT AS recrawl_interval_s
  FROM per
)
SELECT user_id, n_obs, n_changes, span_s, recrawl_interval_s,
       row_number() OVER (ORDER BY recrawl_interval_s ASC,
                          user_id ASC)::BIGINT AS crawl_rank
FROM iv ORDER BY user_id
"""


# --------------------------------------------------------------------------
# q144: session co-occurrence pairs — the "related searches" primitive
# (a query-log miner sessionizes user activity by an inactivity gap,
# then counts which activity types co-occur within a session and
# scores the association by lift; the reference serves one query at a
# time — Mainpage.java:117-132 — this is the log-side analytics a real
# engine layers on top). Activity stream = the events table; the
# "query" token is event_type.
#
# Scale shape: sessionization is ONE (user)-partitioned lag+cumsum
# window over the (ep, event_id) total order (the shuffle key is the
# natural user key); the pair stage self-joins the per-session
# DISTINCT-type table on (user, sess) — per-session distinct types is
# bounded by the type vocabulary, so pair volume is |sessions|·t², not
# |events|²; rollups are |types|- and |types|²-row hash aggs. Totals
# ride as a 1-row broadcast (q91's idiom — no driver count()). Lift is
# one identical IEEE expression over exact int64 counts on both
# engines, emitted UNROUNDED (bit-identity beats round(x,9) — q67).
# --------------------------------------------------------------------------

SESS_GAP_S = 28_800  # 8 h of inactivity closes a session


def q144_session_copairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    brk = F.when(
        F.lag("ep").over(w).isNull()
        | (F.col("ep") - F.lag("ep").over(w) > SESS_GAP_S),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = (
        ev.withColumn("brk", brk)
        .withColumn("sess", F.sum("brk").over(w))
        .select("user_id", "sess", "event_type")
        .distinct()
    )
    totals = sess.groupBy().agg(
        F.countDistinct(F.struct("user_id", "sess"))
        .cast("long")
        .alias("n_sessions")
    )
    per_type = sess.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_type")
    )
    pairs = (
        sess.alias("a")
        .join(
            sess.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sess") == F.col("b.sess"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("etype_a"),
            F.col("b.event_type").alias("etype_b"),
        )
        .agg(F.count("*").cast("long").alias("n_co"))
    )
    out = (
        pairs.join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("etype_a"),
                    F.col("n_type").alias("n_a"),
                )
            ),
            "etype_a",
        )
        .join(
            F.broadcast(
                per_type.select(
                    F.col("event_type").alias("etype_b"),
                    F.col("n_type").alias("n_b"),
                )
            ),
            "etype_b",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lift",
            (F.col("n_co").cast("double") * F.col("n_sessions").cast("double"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        )
    )
    wr = Window.orderBy(
        F.desc("n_co"), F.asc("etype_a"), F.asc("etype_b")
    )
    return out.select(
        "etype_a",
        "etype_b",
        "n_co",
        "n_a",
        "n_b",
        "n_sessions",
        "lift",
        F.row_number().over(wr).cast("long").alias("pair_rank"),
    ).orderBy("etype_a", "etype_b")


QUERIES["q144_session_copairs"] = q144_session_copairs

ORACLE["q144_session_copairs"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id, event_type
  FROM events
),
b AS (
  SELECT *,
         CASE WHEN lag(ep) OVER (PARTITION BY user_id
                                 ORDER BY ep, event_id) IS NULL
                OR ep - lag(ep) OVER (PARTITION BY user_id
                                      ORDER BY ep, event_id)
                   > {SESS_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM ev
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id
                           ORDER BY ep, event_id) AS sess
  FROM b
),
st AS (SELECT DISTINCT user_id, sess, event_type FROM s),
tot AS (
  SELECT count(*)::BIGINT AS n_sessions
  FROM (SELECT DISTINCT user_id, sess FROM st)
),
pt AS (
  SELECT event_type, count(*)::BIGINT AS n_type FROM st GROUP BY event_type
),
pr AS (
  SELECT a.event_type AS etype_a, b.event_type AS etype_b,
         count(*)::BIGINT AS n_co
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sess = b.sess
   AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT etype_a, etype_b, n_co,
       pa.n_type AS n_a, pb.n_type AS n_b, tot.n_sessions,
       (n_co::DOUBLE * n_sessions::DOUBLE)
         / (pa.n_type::DOUBLE * pb.n_type::DOUBLE) AS lift,
       row_number() OVER (ORDER BY n_co DESC, etype_a ASC,
                          etype_b ASC)::BIGINT AS pair_rank
FROM pr JOIN pt pa ON pr.etype_a = pa.event_type
        JOIN pt pb ON pr.etype_b = pb.event_type, tot
ORDER BY etype_a, etype_b
"""


# --------------------------------------------------------------------------
# q152: item-item co-engagement cosine — "users who did X also did Y"
# collaborative similarity over the interaction log (the classic
# item-based CF primitive, Sarwar et al. WWW'01), complementing
# q144's session-level lift: q144 asks "same session", q152 asks
# "same user overall, frequency-weighted".
#
# Scale shape: one (user,type) hash agg collapses the log (map-side
# combinable), then a self-join ON user_id — per-user pair volume is
# bounded by the type vocabulary, so the pair stage is |users|·t²,
# never |events|²; final rollup is a |types|²-row agg. Every sum is
# exact int64 (dot products and squared norms of integer counts);
# the cosine is one identical IEEE tree over those integers on both
# engines, emitted UNROUNDED.
# --------------------------------------------------------------------------


def q152_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    n2 = ut.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    pairs = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("etype_a"),
            F.col("b.event_type").alias("etype_b"),
        )
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot_u"),
            F.count("*").cast("long").alias("n_users"),
        )
    )
    out = (
        pairs.join(
            F.broadcast(
                n2.select(
                    F.col("event_type").alias("etype_a"),
                    F.col("n2").alias("na2"),
                )
            ),
            "etype_a",
        )
        .join(
            F.broadcast(
                n2.select(
                    F.col("event_type").alias("etype_b"),
                    F.col("n2").alias("nb2"),
                )
            ),
            "etype_b",
        )
        .select(
            "etype_a",
            "etype_b",
            "n_users",
            "dot_u",
            "na2",
            "nb2",
            (
                F.col("dot_u").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    return out.orderBy("etype_a", "etype_b")


QUERIES["q152_item_cosine"] = q152_item_cosine

ORACLE["q152_item_cosine"] = """
WITH ut AS (
  SELECT user_id, event_type, count(*)::BIGINT AS c
  FROM events GROUP BY user_id, event_type
),
n2 AS (
  SELECT event_type, sum(c * c)::BIGINT AS n2
  FROM ut GROUP BY event_type
),
pr AS (
  SELECT a.event_type AS etype_a, b.event_type AS etype_b,
         sum(a.c * b.c)::BIGINT AS dot_u,
         count(*)::BIGINT AS n_users
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT etype_a, etype_b, n_users, dot_u,
       pa.n2 AS na2, pb.n2 AS nb2,
       CAST(dot_u AS DOUBLE)
         / (sqrt(CAST(pa.n2 AS DOUBLE)) * sqrt(CAST(pb.n2 AS DOUBLE)))
         AS cosine
FROM pr JOIN n2 pa ON pr.etype_a = pa.event_type
        JOIN n2 pb ON pr.etype_b = pb.event_type
ORDER BY etype_a, etype_b
"""


# --------------------------------------------------------------------------
# q159: first-order Markov transition model over session event streams —
# the navigation model behind "users who search usually click next"
# dashboards, next-event prediction baselines, and funnel-anomaly
# alerts. Within a session (q144's gap rule), each consecutive event
# pair (cur → next) is one transition observation; the model is the
# Laplace-smoothed conditional P(next | cur) = (n + 1) / (row_total +
# K) with K = |observed event types| so unseen transitions get mass
# and every row of the matrix sums to 1.
#
# Spark shape: ONE pass — a lead() window per user (no session-id
# materialization: a pair is in-session iff the gap to the next event
# is ≤ the threshold, which lead() gives directly), one (cur, next)
# hash agg, a per-cur window sum, and K folded in as a 1-row broadcast
# (in-plan, zero driver jobs — the r3-verdict retriever pattern). At
# 100 TB the user window partitions by user_id (millions of small
# partitions, no skew: one user's stream fits a task by construction)
# and the transition matrix is ≤ K² rows. All counts exact int64; the
# published probability is ONE identical IEEE division, UNROUNDED.
# --------------------------------------------------------------------------

MKV_GAP_S = SESS_GAP_S  # same session rule as q144


def q159_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    nxt = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_ep", F.lead("ep").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_ep") - F.col("ep") <= MKV_GAP_S)
        )
    )
    trans = nxt.groupBy(
        F.col("event_type").alias("cur_type"),
        F.col("next_type"),
    ).agg(F.count("*").cast("long").alias("n"))
    wrow = Window.partitionBy("cur_type")
    k = F.broadcast(
        ev.select("event_type")
        .distinct()
        .groupBy()
        .agg(F.count("*").cast("long").alias("n_states"))
    )
    out = (
        trans.withColumn(
            "row_total", F.sum("n").over(wrow).cast("long")
        )
        .crossJoin(k)
        .select(
            "cur_type",
            "next_type",
            "n",
            "row_total",
            "n_states",
            (
                (F.col("n") + F.lit(1)).cast("double")
                / (F.col("row_total") + F.col("n_states")).cast("double")
            ).alias("p_smooth"),
        )
        .orderBy("cur_type", "next_type")
    )
    return out


QUERIES["q159_markov_transitions"] = q159_markov_transitions

ORACLE["q159_markov_transitions"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id, event_type
  FROM events
),
nx AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER w AS next_type,
         lead(ep) OVER w - ep AS gap
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
tr AS (
  SELECT cur_type, next_type, count(*)::BIGINT AS n
  FROM nx
  WHERE next_type IS NOT NULL AND gap <= {MKV_GAP_S}
  GROUP BY cur_type, next_type
),
k AS (
  SELECT count(DISTINCT event_type)::BIGINT AS n_states FROM ev
),
rt AS (
  SELECT *, sum(n) OVER (PARTITION BY cur_type)::BIGINT AS row_total
  FROM tr
)
SELECT cur_type, next_type, n, row_total, k.n_states,
       CAST(n + 1 AS DOUBLE) / CAST(row_total + k.n_states AS DOUBLE)
         AS p_smooth
FROM rt, k
ORDER BY cur_type, next_type
"""


# --------------------------------------------------------------------------
# q160: two-proportion A/B z-test over the event log — the experiment
# readout a search/feeds team runs continuously (did the treatment arm
# convert better, and is the lift outside noise?). Deterministic
# assignment: arm = portable_hash(user_id) mod 2 (the q44 md5 recipe —
# the SAME user always lands in the SAME arm on any engine and any
# rerun, which is the property a real experiment system must have).
# Conversion = user has ≥1 'purchase' event above AB_CONV_MIN (a pure
# all-convert census is degenerate — the z-test needs variance).
# Pooled two-proportion z = (p1 − p0) / sqrt(p̂(1−p̂)(1/n0 + 1/n1)),
# NULL-guarded when p̂ ∈ {0, 1} (se = 0: both engines must agree on
# the undefined case — the q86 x/0 lesson).
#
# Scale shape: one (user) hash agg collapses the log (map-side
# combinable bool_or), one 2-row arm census folded to ONE row by
# conditional aggregation — no shuffle after the user collapse. At
# 100 TB the user agg is the only real cost; everything downstream is
# constant-size. Counts exact int64; z is ONE identical IEEE tree
# over the exact counts, UNROUNDED; the significance flag compares
# |z| to a shared literal.
# --------------------------------------------------------------------------

AB_Z_CRIT = 1.959963985  # two-sided 95%
AB_CONV_MIN = 150.0      # conversion = a purchase above this value


def q160_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > AB_CONV_MIN),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(arm.alias("arm"), "converted")
    g = users.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    z = F.when(se > 0.0, (p1 - p0) / se)
    return g.select(
        "n0",
        "c0",
        "n1",
        "c1",
        p0.alias("p0"),
        p1.alias("p1"),
        pp.alias("p_pooled"),
        z.alias("z"),
        F.when(se > 0.0, F.abs(z) > F.lit(AB_Z_CRIT)).alias(
            "significant"
        ),
    )


QUERIES["q160_ab_ztest"] = q160_ab_ztest

ORACLE["q160_ab_ztest"] = f"""
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > {AB_CONV_MIN!r}::DOUBLE
                  THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
a AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
           AS arm,
         converted
  FROM u
),
g AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)::BIGINT AS c0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)::BIGINT AS c1
  FROM a
)
SELECT n0, c0, n1, c1,
       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
       CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS p_pooled,
       CASE WHEN se > 0.0 THEN dz / se ELSE NULL END AS z,
       CASE WHEN se > 0.0 THEN abs(dz / se) > {AB_Z_CRIT!r}::DOUBLE
            ELSE NULL END AS significant
FROM (
  SELECT *,
         CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS dz,
         sqrt(CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
              * (1.0::DOUBLE - CAST(c0 + c1 AS DOUBLE)
                               / CAST(n0 + n1 AS DOUBLE))
              * (1.0::DOUBLE / CAST(n0 AS DOUBLE)
                 + 1.0::DOUBLE / CAST(n1 AS DOUBLE))) AS se
  FROM g
)
"""


# --------------------------------------------------------------------------
# q169: dwell-time percentiles per event type — the engagement metric
# a ranking team reads daily (how long does a user sit on a result
# page before the next action?). Dwell = gap to the NEXT event in the
# same session (q159's lead() — the last event of a session has no
# dwell and is excluded, standard practice since its gap is the
# inter-session gap, not engagement). Exact p50/p90/p99 via q39's
# distributed rank-selection recipe: one window rank per event type,
# linear interpolation at pos = q·(n−1) spelled identically on both
# engines.
#
# Scale shape: the lead() rides the same per-user partition sort as
# q159 (users never cross tasks); percentiles are one hash-partitioned
# rank per event type (range-partitioned at 100 TB) + a 3-row
# position probe per type — no per-group value collection anywhere.
# --------------------------------------------------------------------------

DWELL_QUANTILES = (0.5, 0.9, 0.99)


def q169_dwell_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    dw = (
        ev.withColumn("gap", F.lead("ep").over(w) - F.col("ep"))
        .filter(F.col("gap").isNotNull() & (F.col("gap") <= MKV_GAP_S))
        .select(
            "event_type",
            F.col("gap").cast("double").alias("dwell"),
            "event_id",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("dwell", "event_id")
    ranked = dw.withColumn("r", F.row_number().over(wr) - 1).select(
        "event_type", "dwell", "r"
    )
    n = dw.groupBy("event_type").agg(F.count("*").alias("n"))
    qs = spark.createDataFrame(
        [(q,) for q in DWELL_QUANTILES], "q double"
    )
    pos = (
        n.crossJoin(F.broadcast(qs))
        .withColumn("pos", F.col("q") * (F.col("n") - 1))
        .withColumn("lo", F.floor("pos").cast("long"))
        .withColumn("hi", F.ceil("pos").cast("long"))
    )
    rl = ranked.select(
        "event_type", F.col("r").alias("lo"), F.col("dwell").alias("vlo")
    )
    rh = ranked.select(
        "event_type", F.col("r").alias("hi"), F.col("dwell").alias("vhi")
    )
    vals = (
        pos.join(rl, ["event_type", "lo"])
        .join(rh, ["event_type", "hi"])
        .withColumn(
            "val",
            F.col("vlo")
            + (F.col("pos") - F.col("lo")) * (F.col("vhi") - F.col("vlo")),
        )
    )
    aggs = [
        F.round(
            F.max(F.when(F.col("q") == F.lit(q), F.col("val"))), 9
        ).alias(f"p{int(q * 100)}")
        for q in DWELL_QUANTILES
    ]
    return (
        vals.groupBy("event_type")
        .agg(F.max("n").cast("long").alias("n_dwells"), *aggs)
        .orderBy("event_type")
    )


QUERIES["q169_dwell_percentiles"] = q169_dwell_percentiles

_DW_QCOLS = ", ".join(
    f"""round(max(CASE WHEN q = {q!r} THEN val END), 9) AS p{int(q * 100)}"""
    for q in DWELL_QUANTILES
)

_DW_QVALS = ", ".join(f"({q!r}::DOUBLE)" for q in DWELL_QUANTILES)

ORACLE["q169_dwell_percentiles"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id, event_type
  FROM events
),
dw AS (
  SELECT event_type, CAST(gap AS DOUBLE) AS dwell, event_id
  FROM (
    SELECT event_type, event_id,
           lead(ep) OVER (PARTITION BY user_id
                          ORDER BY ep, event_id) - ep AS gap
    FROM ev
  ) WHERE gap IS NOT NULL AND gap <= {MKV_GAP_S}
),
ranked AS (
  SELECT event_type, dwell,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dwell, event_id) - 1 AS r
  FROM dw
),
n AS (SELECT event_type, count(*) AS n FROM dw GROUP BY event_type),
qs AS (SELECT unnest([{_DW_QVALS}]) AS q),
pos AS (
  SELECT event_type, n, q, q * (n - 1) AS pos,
         CAST(floor(q * (n - 1)) AS BIGINT) AS lo,
         CAST(ceil(q * (n - 1)) AS BIGINT) AS hi
  FROM n, qs
),
vals AS (
  SELECT p.event_type, p.n, p.q,
         rl.dwell + (p.pos - p.lo) * (rh.dwell - rl.dwell) AS val
  FROM pos p
  JOIN ranked rl ON p.event_type = rl.event_type AND p.lo = rl.r
  JOIN ranked rh ON p.event_type = rh.event_type AND p.hi = rh.r
)
SELECT event_type, max(n)::BIGINT AS n_dwells, {_DW_QCOLS}
FROM vals GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# q177: heavy-change detection between event-log halves — the
# monitoring twin of q47's heavy hitters: the ops question is rarely
# "what is big" (stable heads are boring) but "what MOVED" (a user
# whose event volume exploded = bot onset; one that vanished = churn
# or breakage). Split the log at its median timestamp (a pure
# expression split — same rule both engines), census per (user,
# half), and rank by absolute delta with a relative-change column
# NULL-guarded for new/vanished keys.
#
# Scale shape: ONE (user) hash agg with conditional int64 partials
# (the two halves are CASE arms of the same agg — one shuffle, not
# two scans), a 1-row median broadcast from an exact rank probe, and
# a TakeOrdered head. All counts exact int64; the relative change is
# a single guarded IEEE division, UNROUNDED.
# --------------------------------------------------------------------------

HC_TOP = 50


def q177_heavy_changers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_timestamp(ts)").alias("ep"), "event_id"
    )
    w = Window.orderBy("ep", "event_id")
    cnt = ev.groupBy().agg(F.count("*").cast("long").alias("n"))
    ranked = ev.withColumn("r", F.row_number().over(w))
    med = F.broadcast(
        ranked.crossJoin(F.broadcast(cnt))
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("ep").alias("med_ep"))
    )
    half = (
        ev.crossJoin(med)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ep") <= F.col("med_ep"), 1).otherwise(0))
            .cast("long")
            .alias("n_before"),
            F.sum(F.when(F.col("ep") > F.col("med_ep"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
        )
    )
    delta = F.col("n_after") - F.col("n_before")
    return (
        half.select(
            "user_id",
            "n_before",
            "n_after",
            delta.cast("long").alias("delta"),
            F.abs(delta).cast("long").alias("abs_delta"),
            F.when(
                F.col("n_before") > 0,
                delta.cast("double") / F.col("n_before").cast("double"),
            ).alias("rel_change"),
        )
        .orderBy(F.desc("abs_delta"), F.asc("user_id"))
        .limit(HC_TOP)
    )


QUERIES["q177_heavy_changers"] = q177_heavy_changers

ORACLE["q177_heavy_changers"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id FROM events
),
cnt AS (SELECT count(*)::BIGINT AS n FROM ev),
ranked AS (
  SELECT ep, row_number() OVER (ORDER BY ep, event_id) AS r FROM ev
),
med AS (
  SELECT ep AS med_ep FROM ranked, cnt WHERE r = (n + 1) // 2
),
half AS (
  SELECT user_id,
         sum(CASE WHEN ep <= med_ep THEN 1 ELSE 0 END)::BIGINT AS n_before,
         sum(CASE WHEN ep > med_ep THEN 1 ELSE 0 END)::BIGINT AS n_after
  FROM ev, med GROUP BY user_id
)
SELECT user_id, n_before, n_after,
       (n_after - n_before)::BIGINT AS delta,
       abs(n_after - n_before)::BIGINT AS abs_delta,
       CASE WHEN n_before > 0
            THEN CAST(n_after - n_before AS DOUBLE)
                 / CAST(n_before AS DOUBLE)
            ELSE NULL END AS rel_change
FROM half
ORDER BY abs_delta DESC, user_id ASC
LIMIT {HC_TOP}
"""


# --------------------------------------------------------------------------
# q178: last-touch conversion attribution — the revenue-accounting op
# behind every marketing/ranking dashboard: each purchase's value is
# credited to the LAST non-purchase event the same user produced
# within the session gap before it. One window pass (no self-join):
# sort each user's stream once, carry the most recent non-purchase
# event forward with a conditional last_value(ignoreNulls), gate it
# by the session rule, then roll credited value up by touch type.
#
# Determinism: money aggregates in DECIMAL(18,2) (CLAUDE.md money
# rule) — exact decimal addition, order-insensitive — and PUBLISHES
# as double (q02's convention: the driver hash stringifies Spark
# Decimal('10443.80') vs DuckDB float 10443.8 differently even when
# equal; the decimal→double cast is exact below 2^53 unscaled). Unattributed purchases (no prior touch in
# session) land in an explicit 'none' bucket so the rollup always
# accounts 100% of purchase value.
#
# Scale shape: per-user window sort (users never cross tasks), one
# (touch_type) hash agg ≤ |event types| rows, 1-row broadcast total.
# --------------------------------------------------------------------------


def q178_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_struct = F.when(
        F.col("event_type") != "purchase",
        F.struct("ep", "event_type"),
    )
    attrib = (
        ev.withColumn(
            "last_touch", F.last(touch_struct, ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ep",
            "value",
            F.when(
                F.col("last_touch").isNotNull()
                & (F.col("ep") - F.col("last_touch.ep") <= SESS_GAP_S),
                F.col("last_touch.event_type"),
            )
            .otherwise(F.lit("none"))
            .alias("touch_type"),
        )
    )
    per_touch = attrib.groupBy("touch_type").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum("value").cast("decimal(18,2)").alias("credited_dec"),
    )
    total = F.broadcast(
        attrib.groupBy().agg(
            F.sum("value").cast("decimal(18,2)").alias("total_value")
        )
    )
    return (
        per_touch.crossJoin(total)
        .select(
            "touch_type",
            "n_purchases",
            F.col("credited_dec").cast("double").alias("credited_value"),
            (
                F.col("credited_dec").cast("double")
                / F.col("total_value").cast("double")
            ).alias("value_share"),
        )
        .orderBy("touch_type")
    )


QUERIES["q178_attribution"] = q178_attribution

ORACLE["q178_attribution"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id, event_type,
         CAST(value AS DECIMAL(18,2)) AS value
  FROM events
),
marked AS (
  SELECT *,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN struct_pack(tep := ep, tt := event_type)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ep, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM ev
),
attrib AS (
  SELECT user_id, ep, value,
         CASE WHEN last_touch IS NOT NULL
                   AND ep - last_touch.tep <= {SESS_GAP_S}
              THEN last_touch.tt ELSE 'none' END AS touch_type
  FROM marked WHERE event_type = 'purchase'
),
per_touch AS (
  SELECT touch_type, count(*)::BIGINT AS n_purchases,
         CAST(sum(value) AS DECIMAL(18,2)) AS credited_dec
  FROM attrib GROUP BY touch_type
),
tot AS (
  SELECT CAST(sum(value) AS DECIMAL(18,2)) AS total_value FROM attrib
)
SELECT touch_type, n_purchases,
       CAST(credited_dec AS DOUBLE) AS credited_value,
       CAST(credited_dec AS DOUBLE) / CAST(total_value AS DOUBLE)
         AS value_share
FROM per_touch, tot
ORDER BY touch_type
"""


# --------------------------------------------------------------------------
# q182: hour-of-day seasonal anomaly detection — the seasonal
# complement to q86's trailing-window burst detector: q86 compares a
# bucket to its RECENT baseline (catches spikes but flags every
# morning rush), q182 compares it to the SAME-HOUR-OF-DAY baseline
# across days (the profile a traffic dashboard draws), so diurnal
# rhythm is modeled, not alarmed on. z-score per (type, day, hour)
# against the (type, hour-of-day) profile.
#
# Determinism: the z numerator/denominator reduce to exact int64
# moments — z = (m·n − Σn) / sqrt(m·(m·Σn² − (Σn)²) / (m−1)) with
# every product integer until the final IEEE tree; NULL-guarded when
# the profile has zero variance or a single day (both engines agree
# on the undefined case — the q86/q95 x/0 rule). UNROUNDED.
#
# Scale shape: one (type, day, hour) hash agg over the log, one
# (type, hod) profile agg (≤ types·24 rows, broadcast back), one
# map-only z expression + TakeOrdered head.
# --------------------------------------------------------------------------

SEAS_TOP = 40


def q182_seasonal_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("bucket"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("hod"),
    )
    per_bucket = ev.groupBy("event_type", "doy", "hod", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    profile = per_bucket.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    j = per_bucket.join(
        F.broadcast(profile), ["event_type", "hod"]
    )
    m = F.col("m")
    num = (m * F.col("n") - F.col("s1")).cast("double")
    var_num = (m * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    denom = F.sqrt(
        m.cast("double")
        * (var_num / (m - F.lit(1)).cast("double"))
    )
    z = F.when((m >= 2) & (var_num > 0.0), num / denom)
    return (
        j.select(
            "event_type",
            "bucket",
            "hod",
            "n",
            "m",
            "s1",
            z.alias("z"),
        )
        .filter(z.isNotNull())
        .orderBy(F.desc(F.abs(F.col("z"))), "event_type", "bucket")
        .limit(SEAS_TOP)
    )


QUERIES["q182_seasonal_anomaly"] = q182_seasonal_anomaly

ORACLE["q182_seasonal_anomaly"] = f"""
WITH ev AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         dayofyear(ts) AS doy,
         hour(ts) AS hod
  FROM events
),
per_bucket AS (
  SELECT event_type, doy, hod, bucket, count(*)::BIGINT AS n
  FROM ev GROUP BY event_type, doy, hod, bucket
),
profile AS (
  SELECT event_type, hod, count(*)::BIGINT AS m,
         sum(n)::BIGINT AS s1, sum(n * n)::BIGINT AS s2
  FROM per_bucket GROUP BY event_type, hod
),
j AS (
  SELECT b.event_type, b.bucket, b.hod, b.n, p.m, p.s1, p.s2
  FROM per_bucket b JOIN profile p
    ON b.event_type = p.event_type AND b.hod = p.hod
),
scored AS (
  SELECT event_type, bucket, hod, n, m, s1,
         CASE WHEN m >= 2
                   AND CAST(m * s2 - s1 * s1 AS DOUBLE) > 0.0
              THEN CAST(m * n - s1 AS DOUBLE)
                   / sqrt(CAST(m AS DOUBLE)
                          * (CAST(m * s2 - s1 * s1 AS DOUBLE)
                             / CAST(m - 1 AS DOUBLE)))
              ELSE NULL END AS z
  FROM j
)
SELECT event_type, bucket, hod, n, m, s1, z
FROM scored
WHERE z IS NOT NULL
ORDER BY abs(z) DESC, event_type, bucket
LIMIT {SEAS_TOP}
"""


# --------------------------------------------------------------------------
# q190: content-freshness half-life — fit an exponential decay to
# daily event volume by age (ln(count) ~ age, OLS) and publish the
# half-life ln2/λ: the number a recrawl scheduler (q142) and a
# retention policy both key on ("how fast does engagement with
# content decay?"). The log-linear fit is the standard closed form —
# q95's DECIMAL(28,12)-partial OLS, so the reduction is
# order-insensitive; λ and half-life are single IEEE expressions,
# NULL-guarded when the fitted slope is non-negative (no decay — a
# growing corpus; both engines agree on the undefined case).
#
# Scale shape: one (day) hash agg over the log, a 1-row max-date
# broadcast, a |days|-row OLS fold, 1-row output.
# --------------------------------------------------------------------------


def q190_freshness_halflife(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    )
    per_day = ev.groupBy("day").agg(
        F.count("*").cast("long").alias("n")
    )
    mx = F.broadcast(
        per_day.groupBy().agg(F.max("day").alias("max_day"))
    )
    xy = per_day.crossJoin(mx).select(
        F.datediff(F.col("max_day"), F.col("day"))
        .cast("long")
        .alias("age"),
        "n",
    ).select(
        F.col("age").cast("double").alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    d28 = "decimal(28,12)"
    sums = xy.groupBy().agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("x").cast(d28)).alias("sx"),
        F.sum(F.col("y").cast(d28)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d28)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d28)).alias("sxx"),
    )
    n = F.col("cnt").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lam = -slope
    return sums.filter(F.col("cnt") >= 2).select(
        F.col("cnt").cast("long").alias("n_days"),
        F.round(slope, 9).alias("decay_slope"),
        F.when(
            lam > 0.0,
            F.round(F.lit(0.6931471805599453) / lam, 9),
        ).alias("half_life_days"),
    )


QUERIES["q190_freshness_halflife"] = q190_freshness_halflife

ORACLE["q190_freshness_halflife"] = """
WITH per_day AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS n FROM events GROUP BY day
),
mx AS (SELECT max(day) AS max_day FROM per_day),
xy AS (
  SELECT CAST(date_diff('day', day, max_day) AS DOUBLE) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM per_day, mx
),
sums AS (
  SELECT count(*) AS cnt,
         CAST(CAST(sum(CAST(x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sx,
         CAST(CAST(sum(CAST(y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sy,
         CAST(CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sxy,
         CAST(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sxx
  FROM xy
)
SELECT cnt::BIGINT AS n_days,
       round((cnt::DOUBLE * sxy - sx * sy)
             / (cnt::DOUBLE * sxx - sx * sx), 9) AS decay_slope,
       CASE WHEN -((cnt::DOUBLE * sxy - sx * sy)
                   / (cnt::DOUBLE * sxx - sx * sx)) > 0.0
            THEN round(0.6931471805599453::DOUBLE
                       / (-((cnt::DOUBLE * sxy - sx * sy)
                            / (cnt::DOUBLE * sxx - sx * sx))), 9)
            ELSE NULL END AS half_life_days
FROM sums WHERE cnt >= 2
"""


# --------------------------------------------------------------------------
# q191: per-user session entropy — conditional next-event entropy
# H(next|cur) per user, the navigation-predictability score behind
# bot detection (near-zero entropy = scripted loops), prefetch value
# estimates, and personalization gating (high-entropy users get
# exploratory ranking). Transitions are q159's in-session lead()
# pairs; H = Σ n·(ln(rowtot) − ln(n)) / total over the user's
# transition counts — each term an identical IEEE tree over exact
# int64 counts, folded as DECIMAL(28,12) partials per user (order-
# insensitive), ONE double division at the end, UNROUNDED.
#
# Scale shape: q159's per-user window pass, one (user, cur, next)
# hash agg, a per-(user, cur) window sum, one (user) fold. Bounded
# by each user's observed transition matrix.
# --------------------------------------------------------------------------


def q191_session_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("ep"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_ep", F.lead("ep").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_ep") - F.col("ep") <= MKV_GAP_S)
        )
        .groupBy(
            "user_id",
            F.col("event_type").alias("cur"),
            F.col("next_type").alias("nxt"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    wrow = Window.partitionBy("user_id", "cur")
    terms = pairs.withColumn(
        "rowtot", F.sum("n").over(wrow).cast("long")
    ).withColumn(
        "term",
        (
            F.col("n").cast("double")
            * (
                F.log(F.col("rowtot").cast("double"))
                - F.log(F.col("n").cast("double"))
            )
        ).cast("decimal(28,12)"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_transitions"),
            F.countDistinct("cur", "nxt")
            .cast("long")
            .alias("n_distinct_pairs"),
            (
                F.sum("term").cast("double")
                / F.sum("n").cast("double")
            ).alias("h_cond"),
        )
        .orderBy("user_id")
    )


QUERIES["q191_session_entropy"] = q191_session_entropy

ORACLE["q191_session_entropy"] = f"""
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS ep, event_id, event_type
  FROM events
),
nx AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER w AS nxt,
         lead(ep) OVER w - ep AS gap
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
pairs AS (
  SELECT user_id, cur, nxt, count(*)::BIGINT AS n
  FROM nx WHERE nxt IS NOT NULL AND gap <= {MKV_GAP_S}
  GROUP BY user_id, cur, nxt
),
terms AS (
  SELECT user_id, cur, nxt, n,
         sum(n) OVER (PARTITION BY user_id, cur)::BIGINT AS rowtot
  FROM pairs
),
folded AS (
  SELECT user_id, cur, nxt, n,
         CAST(CAST(n AS DOUBLE)
              * (ln(CAST(rowtot AS DOUBLE)) - ln(CAST(n AS DOUBLE)))
              AS DECIMAL(28,12)) AS term
  FROM terms
)
SELECT user_id,
       sum(n)::BIGINT AS n_transitions,
       count(DISTINCT (cur, nxt))::BIGINT AS n_distinct_pairs,
       CAST(sum(term) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS h_cond
FROM folded GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# q195: empirical-Bayes shrunken item rates (Beta-binomial shrinkage)
# — the cold-start estimator every popularity/CTR prior uses: a part
# seen 3 times with 2 "hits" must NOT outrank one seen 500 times at
# 40% — shrink every per-item rate toward the global prior with
# strength SHRINK_TAU: rate* = (k + τ·p̄)/(n + τ). Hit here = a
# lineitem with quantity ≥ the global median (an exact rank probe,
# q177's idiom). Ranked by shrunken rate the list is stable; ranked
# by raw rate it is noise — both are published so the audit shows
# the correction.
#
# Determinism: k, n exact int64; p̄ and every rate are single IEEE
# trees over exact ints (τ integer). Scale shape: one (part) hash
# agg, a 1-row median + prior broadcast, map-only shrinkage,
# TakeOrdered head.
# --------------------------------------------------------------------------

SHRINK_TAU = 20
SHRINK_TOP = 100


def q195_shrunken_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("part"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    w = Window.orderBy("qty", "ok", "ln")
    cnt = li.groupBy().agg(F.count("*").cast("long").alias("n"))
    med = F.broadcast(
        li.withColumn("r", F.row_number().over(w))
        .crossJoin(F.broadcast(cnt))
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("qty").alias("med_qty"))
    )
    per_part = (
        li.crossJoin(med)
        .groupBy("part")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("qty") >= F.col("med_qty"), 1).otherwise(0)
            )
            .cast("long")
            .alias("k"),
        )
    )
    prior = F.broadcast(
        per_part.groupBy().agg(
            F.sum("k").cast("long").alias("k_tot"),
            F.sum("n").cast("long").alias("n_tot"),
        )
    )
    pbar = F.col("k_tot").cast("double") / F.col("n_tot").cast("double")
    raw = F.col("k").cast("double") / F.col("n").cast("double")
    shrunk = (
        F.col("k").cast("double") + F.lit(float(SHRINK_TAU)) * pbar
    ) / (F.col("n") + F.lit(SHRINK_TAU)).cast("double")
    return (
        per_part.crossJoin(prior)
        .select(
            "part",
            "n",
            "k",
            raw.alias("rate_raw"),
            shrunk.alias("rate_shrunk"),
            pbar.alias("prior_rate"),
        )
        .orderBy(F.desc("rate_shrunk"), F.asc("part"))
        .limit(SHRINK_TOP)
    )


QUERIES["q195_shrunken_rates"] = q195_shrunken_rates

ORACLE["q195_shrunken_rates"] = f"""
WITH li AS (
  SELECT l_partkey::BIGINT AS part, l_quantity::BIGINT AS qty,
         l_orderkey AS ok, l_linenumber AS ln
  FROM lineitem
),
cnt AS (SELECT count(*)::BIGINT AS n FROM li),
med AS (
  SELECT qty AS med_qty FROM (
    SELECT qty, row_number() OVER (ORDER BY qty, ok, ln) AS r FROM li
  ), cnt WHERE r = (n + 1) // 2
),
per_part AS (
  SELECT part, count(*)::BIGINT AS n,
         sum(CASE WHEN qty >= med_qty THEN 1 ELSE 0 END)::BIGINT AS k
  FROM li, med GROUP BY part
),
prior AS (
  SELECT sum(k)::BIGINT AS k_tot, sum(n)::BIGINT AS n_tot FROM per_part
)
SELECT part, n, k,
       CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate_raw,
       (CAST(k AS DOUBLE) + {float(SHRINK_TAU)!r}::DOUBLE
        * (CAST(k_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)))
       / CAST(n + {SHRINK_TAU} AS DOUBLE) AS rate_shrunk,
       CAST(k_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) AS prior_rate
FROM per_part, prior
ORDER BY rate_shrunk DESC, part ASC
LIMIT {SHRINK_TOP}
"""


# --------------------------------------------------------------------------
# q196: sequential probability ratio test (Wald SPRT) replayed over
# the treatment arm's purchase stream — modern experimentation stops
# tests EARLY: instead of q160's fixed-horizon z-test, the SPRT walks
# the log-likelihood ratio observation by observation and stops at
# the first boundary crossing (α=0.05, β=0.2, H0 p=0.40 vs H1
# p=0.45 over the q160 conversion rule). This replay answers "when
# WOULD we have stopped" on historical data — the calibration every
# sequential-testing rollout runs first.
#
# Determinism: the LLR at row n is cum_s·L1 + cum_f·L2 with EXACT
# integer cumulative counts and L1/L2/boundaries as Python-literal
# doubles — one identical IEEE tree per row (no float accumulation);
# first crossing = an exact integer argmin. Scale shape: one ordered
# per-arm window pass (at scale, per-experiment partitions), a 1-row
# decision rollup.
# --------------------------------------------------------------------------

SPRT_P0 = 0.40
SPRT_P1 = 0.45
SPRT_L_S = 0.11778303565638346    # ln(p1/p0)
SPRT_L_F = -0.08701137698962969   # ln((1-p1)/(1-p0))
SPRT_A = 2.772588722239781        # ln((1-beta)/alpha)
SPRT_B = -1.5581446180465497      # ln(beta/(1-alpha))


def q196_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )
    obs = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("arm", arm)
        .filter(F.col("arm") == 1)
        .select(
            F.expr("unix_timestamp(ts)").alias("ep"),
            "event_id",
            F.when(F.col("value") > AB_CONV_MIN, 1)
            .otherwise(0)
            .cast("long")
            .alias("s"),
        )
    )
    w = Window.orderBy("ep", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wr = Window.orderBy("ep", "event_id")
    walked = (
        obs.withColumn("n", F.row_number().over(wr).cast("long"))
        .withColumn("cs", F.sum("s").over(w).cast("long"))
        .withColumn("cf", (F.col("n") - F.col("cs")).cast("long"))
        .withColumn(
            "llr",
            F.col("cs").cast("double") * F.lit(SPRT_L_S)
            + F.col("cf").cast("double") * F.lit(SPRT_L_F),
        )
    )
    crossed = walked.withColumn(
        "cross",
        F.when(F.col("llr") >= F.lit(SPRT_A), F.lit("accept_h1"))
        .when(F.col("llr") <= F.lit(SPRT_B), F.lit("accept_h0")),
    )
    first = F.broadcast(
        crossed.filter(F.col("cross").isNotNull())
        .orderBy("n")
        .limit(1)
        .select(
            F.col("n").alias("n_decision"),
            F.col("cross").alias("decision"),
            F.col("cs").alias("s_at_decision"),
            F.col("llr").alias("llr_at_decision"),
        )
    )
    tot = F.broadcast(
        crossed.groupBy().agg(F.max("n").cast("long").alias("n_obs"))
    )
    fin = (
        crossed.crossJoin(tot)
        .filter(F.col("n") == F.col("n_obs"))
        .select("n_obs", F.col("llr").alias("llr_final"))
    )
    return (
        fin.join(first, F.lit(True), "left")
        .select(
            "n_obs",
            F.coalesce(F.col("decision"), F.lit("continue")).alias(
                "decision"
            ),
            "n_decision",
            "s_at_decision",
            "llr_at_decision",
            "llr_final",
        )
    )


QUERIES["q196_sprt"] = q196_sprt

ORACLE["q196_sprt"] = f"""
WITH obs AS (
  SELECT floor(epoch(ts))::BIGINT AS ep, event_id,
         CASE WHEN value > {AB_CONV_MIN!r}::DOUBLE THEN 1 ELSE 0 END
           AS s
  FROM events
  WHERE event_type = 'purchase'
    AND ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        % 2 = 1
),
walked AS (
  SELECT row_number() OVER w AS n,
         sum(s) OVER (ORDER BY ep, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS cs
  FROM obs
  WINDOW w AS (ORDER BY ep, event_id)
),
llrd AS (
  SELECT n, cs, (n - cs)::BIGINT AS cf,
         CAST(cs AS DOUBLE) * {SPRT_L_S!r}::DOUBLE
         + CAST(n - cs AS DOUBLE) * {SPRT_L_F!r}::DOUBLE AS llr
  FROM walked
),
crossed AS (
  SELECT *,
         CASE WHEN llr >= {SPRT_A!r}::DOUBLE THEN 'accept_h1'
              WHEN llr <= {SPRT_B!r}::DOUBLE THEN 'accept_h0' END
           AS cross_kind
  FROM llrd
),
first_x AS (
  SELECT n AS n_decision, cross_kind AS decision,
         cs AS s_at_decision, llr AS llr_at_decision
  FROM crossed WHERE cross_kind IS NOT NULL
  ORDER BY n LIMIT 1
),
fin AS (
  SELECT max(n)::BIGINT AS n_obs,
         max(CASE WHEN n = (SELECT max(n) FROM crossed) THEN llr END)
           AS llr_final
  FROM crossed
)
SELECT f.n_obs,
       COALESCE(x.decision, 'continue') AS decision,
       x.n_decision, x.s_at_decision, x.llr_at_decision,
       f.llr_final
FROM fin f LEFT JOIN first_x x ON TRUE
"""


# --------------------------------------------------------------------------
# q212: experiment sample-size calculator (two-proportion power
# analysis) — the table consulted BEFORE q160's z-test or q196's
# SPRT ever runs: per (baseline rate, detectable lift) on a literal
# grid, n per arm = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))² / δ².
# Shipping it as a registry op means the experiment platform's
# sizing math is versioned, tested, and engine-exact like everything
# else — not a spreadsheet.
#
# Determinism: fixed literal grid; z constants Python literals; the
# formula uses ONLY +,·,/ and sqrt (correctly rounded — the q192
# rule), so every value is bit-identical cross-engine; n rounds UP
# via ceil over the exact double. ZERO data reads.
# --------------------------------------------------------------------------

POWER_Z_A = 1.959963985   # alpha = 0.05 two-sided
POWER_Z_B = 0.8416212336  # power = 0.80
POWER_BASE = [0.02, 0.05, 0.10, 0.20]
POWER_LIFT = [0.01, 0.02, 0.05]  # absolute detectable delta


def q212_power_analysis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    grid = spark.createDataFrame(
        [(p, d) for p in POWER_BASE for d in POWER_LIFT],
        "p0 double, delta double",
    )
    p1 = F.col("p0") + F.col("delta")
    pbar = (F.col("p0") + p1) / F.lit(2.0)
    num = F.lit(POWER_Z_A) * F.sqrt(
        F.lit(2.0) * pbar * (F.lit(1.0) - pbar)
    ) + F.lit(POWER_Z_B) * F.sqrt(
        F.col("p0") * (F.lit(1.0) - F.col("p0"))
        + p1 * (F.lit(1.0) - p1)
    )
    n = F.ceil(num * num / (F.col("delta") * F.col("delta"))).cast(
        "long"
    )
    return grid.select(
        "p0",
        "delta",
        p1.alias("p1"),
        n.alias("n_per_arm"),
        (n * 2).cast("long").alias("n_total"),
    ).orderBy("p0", "delta")


QUERIES["q212_power_analysis"] = q212_power_analysis

_POWER_GRID = ", ".join(
    f"({p!r}::DOUBLE, {d!r}::DOUBLE)"
    for p in POWER_BASE
    for d in POWER_LIFT
)

ORACLE["q212_power_analysis"] = f"""
WITH grid(p0, delta) AS (VALUES {_POWER_GRID}),
calc AS (
  SELECT p0, delta, p0 + delta AS p1,
         CAST(ceil(
           ({POWER_Z_A!r}::DOUBLE
              * sqrt(2.0::DOUBLE * ((p0 + (p0 + delta)) / 2.0::DOUBLE)
                     * (1.0::DOUBLE - (p0 + (p0 + delta)) / 2.0::DOUBLE))
            + {POWER_Z_B!r}::DOUBLE
              * sqrt(p0 * (1.0::DOUBLE - p0)
                     + (p0 + delta) * (1.0::DOUBLE - (p0 + delta))))
           * ({POWER_Z_A!r}::DOUBLE
              * sqrt(2.0::DOUBLE * ((p0 + (p0 + delta)) / 2.0::DOUBLE)
                     * (1.0::DOUBLE - (p0 + (p0 + delta)) / 2.0::DOUBLE))
            + {POWER_Z_B!r}::DOUBLE
              * sqrt(p0 * (1.0::DOUBLE - p0)
                     + (p0 + delta) * (1.0::DOUBLE - (p0 + delta))))
           / (delta * delta)) AS BIGINT) AS n_per_arm
  FROM grid
)
SELECT p0, delta, p1, n_per_arm, (n_per_arm * 2)::BIGINT AS n_total
FROM calc
ORDER BY p0, delta
"""
