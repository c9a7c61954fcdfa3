"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time feature pipeline on
sf0.001; ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2B (plus the training-data-pipeline operators); each
SQL-expressible query has a matching DuckDB oracle in ``oracle_sql()``.

Float discipline for hash-exact comparison: money-style sums are
computed as integer cents (exact + associative on both engines);
computed floats are rounded to 6 decimals with identical expressions
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsarfeatureextractor_spark.functions.moments import with_lyon_features
from pulsarfeatureextractor_spark.functions.text import (
    STOPWORDS,
    with_fingerprint,
    with_langid,
    with_quality_metrics,
    with_token_counts,
)
from pulsarfeatureextractor_spark.operators.asof import asof_join
from pulsarfeatureextractor_spark.functions.scores import (
    with_profile_stats_sql,
    with_thornton_scores,
)
from pulsarfeatureextractor_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from pulsarfeatureextractor_spark.operators.rangejoin import range_join_count
from pulsarfeatureextractor_spark.operators.salt import salted_join
from pulsarfeatureextractor_spark.operators.sessionize import session_aggregates
from pulsarfeatureextractor_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    rp_lsh_topk,
)
from pulsarfeatureextractor_spark.operators.windows import ffill, lagged, rolling_agg
from pulsarfeatureextractor_spark.sources.readers import load_table
from pulsarfeatureextractor_spark.sources.tokenized import (
    documents_to_sequences,
    with_event_time,
)

GAP_SECONDS = 1800.0
SEVEN_DAYS = 7 * 24 * 3600


def _cents(col):
    """Exact integer cents: identical double product + round on both engines."""
    return F.round(col * 100, 0).cast("long")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature pipeline (SURVEY.md §3.2):
    tokenize documents -> derive event_time -> Lyon moment features
    (Arrow-vectorized) -> as-of join earlier feature observations
    (leakage-free window plan)."""
    docs = load_table(spark, sf_dir, "documents")
    # portable event-time mode: the DuckDB oracle reproduces the exact
    # same timestamps, so the WHOLE composition (tokenize -> features ->
    # as-of) is differentially checked end-to-end
    seqs = with_event_time(documents_to_sequences(docs), mode="portable")
    feats = with_lyon_features(seqs)

    # feature snapshots: the same features observed n_tok seconds
    # earlier (deterministic synthetic observation history)
    snaps = feats.select(
        "doc_id",
        (F.col("event_time") - F.make_interval(secs=F.col("n_tok").cast("double"))).alias("obs_time"),
        F.col("mean").alias("f_mean_obs"),
        F.col("stdev").alias("f_std_obs"),
    )
    joined = asof_join(
        feats, snaps, on="event_time", right_on="obs_time", by="doc_id",
        value_cols=["f_mean_obs", "f_std_obs"], strategy="window",
    )
    return joined.select(
        "doc_id", "source", "event_time", "n_tok",
        F.round("mean", 6).alias("mean"),
        F.round("stdev", 6).alias("stdev"),
        F.round("skew", 6).alias("skew"),
        F.round("kurt", 6).alias("kurt"),
        F.round("f_mean_obs", 6).alias("f_mean_obs"),
        F.round("f_std_obs", 6).alias("f_std_obs"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# relational core (TPC-H-ish)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(spark, sf):
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def region_customer_stats(spark, sf):
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
    )


def segment_customers_with_orders(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def segment_customers_without_orders(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def rollup_lineitem_status(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


def event_type_distinct_users(spark, sf):
    e = load_table(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def topk_orders_per_segment(spark, sf):
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rank")
    )


def custkeys_1995_not_1996(spark, sf):
    o = load_table(spark, sf, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return y95.subtract(y96)


def custkeys_1995_and_1996(spark, sf):
    o = load_table(spark, sf, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return y95.intersect(y96)


def union_event_slices(spark, sf):
    """U1: unionByName(allowMissingColumns) of two heterogeneous slices."""
    e = load_table(spark, sf, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id")
    combined = purchases.unionByName(errors, allowMissingColumns=True)
    return combined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_with_value"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


def json_props_stats(spark, sf):
    e = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def salted_join_quantity(spark, sf):
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_quantity"
    )
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "orderkey", k=8, how="inner")
    return joined.groupBy("o_orderpriority").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# point-in-time / window operators over events
# --------------------------------------------------------------------------

def brand_revenue(spark, sf):
    """part x lineitem: revenue + volume per brand (exercises the part
    dim; broadcast join, integer-cents)."""
    p = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def supplier_nation_stats(spark, sf):
    """supplier x lineitem x nation: shipped value per supplier nation."""
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    n = load_table(spark, sf, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("shipped_cents"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


def top_unshipped_orders(spark, sf):
    """TPC-H Q3-shaped: top 10 revenue among orders with lineitems
    shipping after the order date (join + agg + global top-k)."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents")
    )
    return agg.orderBy(
        F.col("revenue_cents").desc(), F.col("o_orderkey").asc()
    ).limit(10)


def big_spender_customers(spark, sf):
    """Scalar-subquery shape: customers whose lifetime order value
    exceeds 2x the average customer's (exact integer cents)."""
    o = load_table(spark, sf, "orders")
    totals = o.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents")
    )
    avg_total = totals.agg(F.avg("total_cents").alias("a"))
    return (
        totals.crossJoin(F.broadcast(avg_total))
        .where(F.col("total_cents") > 2 * F.col("a"))
        .select("o_custkey", "total_cents")
    )


def orders_above_customer_avg(spark, sf):
    """Correlated-subquery shape via window: orders pricier than their
    own customer's average order."""
    o = load_table(spark, sf, "orders")
    cents = _cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey")
    out = (
        o.withColumn("c", cents)
        .withColumn("avg_c", F.avg("c").over(w))
        .where(F.col("c") > F.col("avg_c"))
    )
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("c").alias("sum_cents"),
    )


def shipmode_priority_counts(spark, sf):
    """TPC-H Q12-shaped: conditional aggregation over a join — urgent
    vs non-urgent order counts per linestatus."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent).alias("high_line_count"),
            F.sum(1 - urgent).alias("low_line_count"),
        )
    )


def branded_small_qty_revenue(spark, sf):
    """TPC-H Q19-shaped: disjunctive predicates across the join — the
    OR-of-ANDs must still prune at the scan."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") <= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity") <= 20))
        | ((F.col("p_size") >= 40) & (F.col("l_quantity") <= 5))
    )
    return joined.where(cond).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


def asof_merge_plan_purchases(spark, sf):
    """The SECOND as-of physical plan (co-partitioned pandas merge_asof)
    against the same DuckDB ASOF oracle as the window plan — the driver
    gate cross-validates both plans' semantics."""
    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="merge_asof",
    ).select("event_id", "user_id", "ts", "last_purchase_value")


def asof_bucketed_plan_purchases(spark, sf):
    """Third as-of physical plan (skew-proof per-(entity, time-bucket)
    windows + carry-in) against the same DuckDB ASOF oracle."""
    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="bucketed",
        bucket_seconds=6 * 3600.0,
    ).select("event_id", "user_id", "ts", "last_purchase_value")


def lag_lead_events(spark, sf):
    e = load_table(spark, sf, "events")
    out = lagged(e, "user_id", "ts", ["value"], offsets=(1, -1))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    delta_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    return out.select(
        "event_id", "user_id",
        "value_lag1", "value_lead1",
        delta_us.alias("delta_t_us"),
    )


def ffill_purchase_value(spark, sf):
    e = load_table(spark, sf, "events")
    v = e.withColumn(
        "pval", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    filled = ffill(v, "user_id", "ts", ["pval"])
    return filled.select("event_id", "user_id", F.col("pval").alias("pval_ffill"))


def bfill_purchase_value(spark, sf):
    from pulsarfeatureextractor_spark.operators.windows import bfill

    e = load_table(spark, sf, "events")
    v = e.withColumn(
        "pval", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    filled = bfill(v, "user_id", "ts", ["pval"])
    return filled.select("event_id", "user_id", F.col("pval").alias("pval_bfill"))


def grouping_sets_lineitem(spark, sf):
    """G3: metrics at (returnflag, linestatus), (returnflag), and ()."""
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


def token_invariant_check(spark, sf):
    """The per-row invariant from BASELINE.json input_hint: the engine
    never mutates token arrays.  Recompute the tokenization twice, run
    one side through the full Arrow feature path, and count exact
    array-equality violations (must be 0) next to the row total."""
    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    after = with_lyon_features(seqs).select(
        F.col("doc_id"), F.col("tokens").alias("tokens_after")
    )
    ref = documents_to_sequences(d).select("doc_id", "tokens")
    joined = ref.join(after, "doc_id")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("tokens") == F.col("tokens_after"), 0).otherwise(1)
        ).alias("n_violations"),
    )


def user_activity_features(spark, sf):
    """Composition query: sessionize (W5) + trailing 7d frame (W3) +
    per-entity aggregation (G1) in one pipeline — the per-user feature
    vector a training pipeline would emit."""
    from pulsarfeatureextractor_spark.operators.sessionize import sessionize
    from pulsarfeatureextractor_spark.operators.windows import rolling_agg

    e = load_table(spark, sf, "events")
    s = sessionize(e, "user_id", "ts", GAP_SECONDS)
    r = rolling_agg(s, "user_id", "ts", {"roll_n": F.count(F.lit(1))}, SEVEN_DAYS)
    return r.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.max("roll_n").alias("peak_7d_events"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


def sessionize_events(spark, sf):
    e = load_table(spark, sf, "events")
    return session_aggregates(e, "user_id", "ts", GAP_SECONDS)


def asof_purchase_before_view(spark, sf):
    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="window",
    )


def asof_tolerance_1d(spark, sf):
    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["last_purchase_value"], tolerance=86400.0, strategy="window",
    )


def rolling_7d_user_value(spark, sf):
    e = load_table(spark, sf, "events")
    out = rolling_agg(
        e, "user_id", "ts",
        {"roll_n": F.count(F.lit(1)),
         "roll_cents": F.sum(_cents(F.col("value")))},
        SEVEN_DAYS,
    )
    return out.select("event_id", "user_id", "roll_n", "roll_cents")


def error_followup_count(spark, sf):
    e = load_table(spark, sf, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    return range_join_count(
        errors, e.select("user_id", "ts"), by="user_id",
        left_ts="ts", right_ts="ts", window_seconds=3600,
    ).select("event_id", "n_in_range")


# --------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings)
# --------------------------------------------------------------------------

def dedup_exact_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return exact_dedup(d, "text", "doc_id")


def doc_quality_metrics(spark, sf):
    d = load_table(spark, sf, "documents")
    out = with_quality_metrics(d, "text")
    return out.select(
        "doc_id", "n_tokens", "distinct_tokens",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("type_token_ratio", 6).alias("type_token_ratio"),
    )


def model_score_docs(spark, sf):
    """Learned-classifier curation stage (V1 + LLM-pipeline inference):
    quality features -> injected batch model (deterministic linear
    fixture; production swaps in an ONNX/torch callable) -> logit +
    keep flag.  The fixture accumulates the logit left-associatively
    in float64 (functions/inference.py), so the DuckDB oracle's SQL
    expression is bit-identical, not merely allclose."""
    from pulsarfeatureextractor_spark.functions.inference import (
        QUALITY_FEATURES,
        keep_flag,
        quality_model,
        score_with_model,
    )

    d = load_table(spark, sf, "documents")
    feats = with_quality_metrics(d, "text")
    scored = score_with_model(feats, QUALITY_FEATURES, quality_model())
    return scored.select(
        "doc_id",
        (F.round("model_score", 6) + F.lit(0.0)).alias("model_score"),
        keep_flag().alias("keep"),
    )


def quality_regression_docs(spark, sf):
    """In-engine model TRAINING, end-to-end exact (functions/
    regression.py — the train side of the learned-quality stage whose
    score side is model_score_docs): fit n_chars ~ b0 + b1*n_tokens +
    b2*distinct_tokens by least squares.  ONE map-side-combinable
    aggregate produces the exact BIGINT sufficient statistics; the 3x3
    normal-equation solve is a shared-text Cramer's-rule SQL expression
    (cramer3_sql) evaluated declaratively over the one-row stats frame;
    the fitted plane then scores every document through a broadcast
    one-row join — the model never leaves the cluster, training costs
    one scan at any corpus size.  The DuckDB oracle consumes the SAME
    generated solve/predict text, so the TRAINED prediction is
    hash-exact (integer stats are summation-order-free; IEEE ops on
    identical expression trees round identically)."""
    from pulsarfeatureextractor_spark.functions.regression import (
        cramer3_sql,
        linear_pred_sql,
    )

    d = load_table(spark, sf, "documents")
    w = F.split(F.col("text"), " ")
    m = d.select(
        "doc_id",
        F.size(w).cast("long").alias("x1"),
        F.size(F.array_distinct(w)).cast("long").alias("x2"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    co = cramer3_sql("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
    wts = s.select(
        F.expr(co["b0"]).alias("b0"),
        F.expr(co["b1"]).alias("b1"),
        F.expr(co["b2"]).alias("b2"),
    )
    pred = linear_pred_sql(
        "b0", "b1", "b2", "CAST(x1 AS DOUBLE)", "CAST(x2 AS DOUBLE)"
    )
    return m.crossJoin(F.broadcast(wts)).select(
        "doc_id",
        (F.round(F.expr(pred), 6) + F.lit(0.0)).alias("pred_chars"),
        (F.round(F.expr(f"CAST(y AS DOUBLE) - {pred}"), 6) + F.lit(0.0)).alias(
            "resid_chars"
        ),
    )


def embedding_generation_docs(spark, sf):
    """Docs→embeddings generation (functions/inference.py
    embed_with_model): vector-output batch inference through ONE
    Arrow-batched pandas UDF — the stage that PRODUCES the embedding
    column every banded/bucketed consumer here reads (ANN, embedding
    near-dup, SemDeDup).  The deterministic length-bucket fixture
    stands in for a sentence-transformer/ONNX encoder; each value is
    one exact integer-count division, so the DuckDB twin is
    bit-identical with NO rounding.  The vector serializes as
    (doc_id, dim_ix, value) rows — the driver's comparator cannot hash
    array cells."""
    from pulsarfeatureextractor_spark.functions.inference import (
        embed_with_model,
        length_bucket_embedder,
    )

    d = load_table(spark, sf, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    emb = embed_with_model(d, "text", length_bucket_embedder(8), dim=8)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("dim_ix", "value")
    )


def token_counts_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return with_token_counts(d, "text").select("doc_id", "ws_tokens", "subword_tokens")


def langid_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return with_langid(d, "text").groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def langid_model_docs(spark, sf):
    """Learned language ID (round-4 verdict Missing #5): scan-side
    char/stopword feature assembly (functions/text.langid_features)
    routed through the batched multiclass inference stage
    (functions/inference.classify_with_model) with the deterministic
    multinomial linear fixture — the fastText-shaped deployment with
    the model injected.  Integer features x exact binary-fraction
    weights -> per-class scores bit-identical to the oracle's
    left-associative SQL rendering; argmax ties break to the first
    class (np.argmax == first-match CASE); best score < 0 abstains to
    'und'."""
    from pulsarfeatureextractor_spark.functions.inference import (
        LANGID_CLASSES,
        classify_with_model,
        langid_model,
    )
    from pulsarfeatureextractor_spark.functions.text import langid_features

    d = load_table(spark, sf, "documents")
    feats, names = langid_features(d, "text")
    out = classify_with_model(
        feats, names, langid_model(), LANGID_CLASSES,
        output_col="lang_pred", min_score=0.0, fallback="und",
    )
    return out.select("doc_id", "lang_pred")


def raw_bins_passthrough(spark, sf):
    """A9 raw-bins feature set: tokens cast to double, unmodified.

    The driver's canonicalizer sorts result frames and cannot hash raw
    array cells, so the bins are serialized to a deterministic string
    (values are integral by construction); the oracle mirrors the exact
    serialization."""
    from pulsarfeatureextractor_spark.functions.featureset import extract_features

    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    out = extract_features(seqs, "raw")
    return out.select(
        "doc_id",
        "n_tok",
        F.array_join(
            F.transform("raw_bins", lambda v: v.cast("int").cast("string")), " "
        ).alias("raw_bins_str"),
    )


def token_histogram_udtf(spark, sf):
    """Python UDTF surface (Spark 4): per-doc token histogram emitted as
    (bin, n) rows via a LATERAL table function, then aggregated corpus-
    wide.  Exists to exercise the UDTF API (SURVEY §2C noted none was
    REQUIRED); the hot path stays mapInArrow — UDTF eval is per-row by
    API design, so this is surface coverage, not a scale path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bin: int, n: int")
    class TokenHistogram:
        def eval(self, tokens):
            if tokens is None:
                return
            counts = {}
            for t in tokens:
                b = int(t) // 16
                counts[b] = counts.get(b, 0) + 1
            for b in sorted(counts):
                yield b, counts[b]

    spark.udtf.register("token_hist", TokenHistogram)
    d = load_table(spark, sf, "documents")
    documents_to_sequences(d).createOrReplaceTempView("__seq_udtf")
    return spark.sql("""
        SELECT h.bin, CAST(SUM(h.n) AS BIGINT) AS total
        FROM __seq_udtf, LATERAL token_hist(tokens) h
        GROUP BY h.bin
    """)


def vocab_tokenize_docs(spark, sf):
    """Hash-id tokenization — the web-scale DEFAULT path (pure per-row
    expression, zero shuffle).  Token arrays are serialized to strings
    for the driver canon; the oracle is a committed VALUES literal
    generated by an INDEPENDENT pure-Python XXH64 port
    (tools/gen_value_oracles.py), so this row differentially checks
    Spark's JVM xxhash64 against a second implementation."""
    from pulsarfeatureextractor_spark.sources.tokenized import vocab_tokenize

    d = load_table(spark, sf, "documents")
    out = vocab_tokenize(d)  # id_mode="hash" default
    return out.select(
        "doc_id",
        F.array_join(F.transform("tokens", lambda t: t.cast("string")), " ").alias(
            "tokens_str"
        ),
        "n_tok",
    )


def vocab_tokenize_rank_docs(spark, sf):
    """Rank-id tokenization (small-vocab opt-in; SQL-oracle-checked —
    the DuckDB oracle recomputes the sorted-vocabulary ranks)."""
    from pulsarfeatureextractor_spark.sources.tokenized import vocab_tokenize

    d = load_table(spark, sf, "documents")
    out = vocab_tokenize(d, id_mode="rank")
    return out.select(
        "doc_id",
        F.array_join(F.transform("tokens", lambda t: t.cast("string")), " ").alias(
            "tokens_str"
        ),
        "n_tok",
    )


_BPE_MERGES_CACHE: "dict[str, list]" = {}


def _bpe_merges_for(spark, sf, n_merges=32):
    """Train (or reuse this process's already-trained) BPE merges for
    one sf dir — train_bpe is deterministic, so memoizing per fixture
    path only saves the two bpe_* driver queries re-running the same
    32-round training loop back-to-back."""
    key = (sf, n_merges)
    if key not in _BPE_MERGES_CACHE:
        from pulsarfeatureextractor_spark.functions.bpe import train_bpe

        _BPE_MERGES_CACHE[key] = train_bpe(
            load_table(spark, sf, "documents"), n_merges=n_merges
        )
    return _BPE_MERGES_CACHE[key]


def bpe_merges_docs(spark, sf):
    """Distributed BPE subword-vocabulary TRAINING (functions/bpe.py) —
    the learned merge list itself, as (rank, p1, p2).  Oracle: a
    committed VALUES literal from the INDEPENDENT pure-python twin
    (tools/gen_value_oracles._bpe_twin_train — Counter-based list-form
    implementation, not the engine's wrapped-string replace encoding),
    so the iterated argmax (tie-break (-count, p1, p2)) and the greedy
    merge-pass semantics are differentially pinned end-to-end."""
    from pulsarfeatureextractor_spark.functions.bpe import bpe_merge_table

    return bpe_merge_table(spark, _bpe_merges_for(spark, sf))


def bpe_train_tokenize_docs(spark, sf):
    """Train BPE on the corpus, then encode the same corpus with the
    learned merges (scan-side expression chain, zero shuffles) — the
    full learn-a-vocabulary -> tokenize round trip.  Token arrays are
    serialized for the driver canon; exact token-for-token equality
    against the pure-python twin's VALUES literal."""
    from pulsarfeatureextractor_spark.functions.bpe import bpe_encode

    d = load_table(spark, sf, "documents")
    out = bpe_encode(d, _bpe_merges_for(spark, sf))
    return out.select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("tokens_str"),
        F.col("n_bpe"),
    )


_WORDPIECE_CACHE: "dict[str, tuple]" = {}


def _wordpiece_for(spark, sf):
    """Train (or reuse this process's already-trained) WordPiece model
    for one sf dir (deterministic; memoized like _bpe_merges_for)."""
    if sf not in _WORDPIECE_CACHE:
        from pulsarfeatureextractor_spark.functions.wordpiece import (
            train_wordpiece,
        )

        _WORDPIECE_CACHE[sf] = train_wordpiece(
            load_table(spark, sf, "documents"), n_merges=24
        )
    return _WORDPIECE_CACHE[sf]


def wordpiece_merges_docs(spark, sf):
    """Distributed WordPiece tokenizer TRAINING
    (functions/wordpiece.py) — the learned likelihood-scored merge
    list (rank, p1, p2, score), the third standard subword learner
    beside bpe_* and unigram_*.  Score = cnt / (c1 * c2) as one double
    division over exact integer counts, argmax by (score desc, p1,
    p2) — partitioning-independent.  Oracle: committed VALUES literal
    from the INDEPENDENT pure-python twin
    (tools/gen_value_oracles._wp_twin_train — Counter counts,
    list-form merge pass); score rounded 6dp both sides."""
    merges, _vocab = _wordpiece_for(spark, sf)
    m = spark.createDataFrame(
        [(i, p1, p2, sc) for i, (p1, p2, sc) in enumerate(merges)],
        "rank int, p1 string, p2 string, score double",
    )
    return m.select("rank", "p1", "p2", F.round("score", 6).alias("score"))


def wordpiece_train_tokenize_docs(spark, sf):
    """Train WordPiece on the corpus, then greedy-longest-match encode
    the same corpus against the learned vocabulary (ONE Arrow
    crossing, zero shuffles) — published WordPiece inference
    semantics.  Exact token-for-token equality against the
    independent descending-scan twin's VALUES literal."""
    from pulsarfeatureextractor_spark.functions.wordpiece import (
        wordpiece_encode,
    )

    _merges, vocab = _wordpiece_for(spark, sf)
    d = load_table(spark, sf, "documents")
    out = wordpiece_encode(d, vocab)
    return out.select(
        "doc_id",
        F.array_join("wp_tokens", " ").alias("tokens_str"),
        F.col("n_wp"),
    )


_UNIGRAM_MODEL_CACHE: "dict[str, list]" = {}


def _unigram_model_for(spark, sf):
    """Train (or reuse this process's already-trained) unigram-LM
    model for one sf dir (deterministic; memoized for the same reason
    as _bpe_merges_for)."""
    if sf not in _UNIGRAM_MODEL_CACHE:
        from pulsarfeatureextractor_spark.functions.unigram import (
            train_unigram,
        )

        _UNIGRAM_MODEL_CACHE[sf] = train_unigram(
            load_table(spark, sf, "documents"),
            vocab_size=64, max_piece_len=4, seed_max_pieces=256,
            em_iters=2, prune_frac=0.25,
        )
    return _UNIGRAM_MODEL_CACHE[sf]


def unigram_vocab_docs(spark, sf):
    """Distributed unigram-LM (SentencePiece-style) subword-vocabulary
    TRAINING (functions/unigram.py) — the learned (piece, logp) model
    itself.  Hard-EM: Viterbi E-step counts are exact integers, the
    M-step is the pinned add-one form log(c+1)-log(T+V), so the model
    is partitioning-independent.  Oracle: committed VALUES literal from
    the INDEPENDENT pure-python twin (tools/gen_value_oracles.
    _uni_twin_train — memoized-recursion Viterbi, Counter counts, not
    the engine's iterative DP / Spark aggregates); logp rounded 6dp on
    both sides (spark_round6 convention)."""
    from pulsarfeatureextractor_spark.functions.unigram import (
        unigram_model_table,
    )

    m = unigram_model_table(spark, _unigram_model_for(spark, sf))
    return m.select("piece", F.round("logp", 6).alias("logp"))


def unigram_train_tokenize_docs(spark, sf):
    """Train the unigram LM on the corpus, then Viterbi-encode the
    same corpus (ONE Arrow crossing, zero shuffles) — the full
    learn-a-vocabulary -> tokenize round trip for the second standard
    subword learner.  Exact token-for-token equality against the
    pure-python twin's VALUES literal."""
    from pulsarfeatureextractor_spark.functions.unigram import (
        unigram_encode,
    )

    d = load_table(spark, sf, "documents")
    out = unigram_encode(d, _unigram_model_for(spark, sf))
    return out.select(
        "doc_id",
        F.array_join("unigram_tokens", " ").alias("tokens_str"),
        F.col("n_unigram"),
    )


def lyon_features_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    out = with_lyon_features(seqs)
    return out.select(
        "doc_id",
        F.round("mean", 6).alias("mean"),
        F.round("stdev", 6).alias("stdev"),
        F.round("skew", 6).alias("skew"),
        F.round("kurt", 6).alias("kurt"),
    )


def embedding_norms_by_label(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(
        F.transform(vec, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    ))
    return (
        emb.withColumn("norm6", F.round(norm, 6))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm6"), 6).alias("avg_norm"),
        )
    )


def ann_cosine_topk(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def grouped_moments_event_k(spark, sf):
    """Per-event_type moments of the integer props.k series via the
    grouped-map moment UDAF (exact integer power sums; pinned float
    expression order mirrored by the DuckDB oracle)."""
    from pulsarfeatureextractor_spark.functions.moments import grouped_moments

    e = load_table(spark, sf, "events")
    k = e.select(
        "event_type", F.get_json_object("props", "$.k").cast("int").alias("k")
    )
    out = grouped_moments(k, "event_type", "k")
    return out.select(
        "event_type", "n",
        F.round("mean", 6).alias("mean"),
        F.round("stdev", 6).alias("stdev"),
        F.round("skew", 6).alias("skew"),
        F.round("kurt", 6).alias("kurt"),
    )


def ngram_jaccard_pairs_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    out = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def split_assign_docs(spark, sf):
    """Deterministic train/val/test assignment keyed off a portable md5
    bucket of doc_id — the engine-independent split definition a
    warehouse can reproduce verbatim (the oracle runs the identical
    expression in DuckDB).  Production default is the cheaper
    xxhash64 tier (functions/splits.py)."""
    from pulsarfeatureextractor_spark.functions.splits import hash_split

    d = load_table(spark, sf, "documents")
    return hash_split(
        d, "doc_id", seed="sf", hasher="md5", bucket_out="bucket"
    ).select("doc_id", "bucket", "split")


def stratified_sample_docs(spark, sf):
    """Exactly-5-per-source deterministic sample (seeded-hash order,
    ties by doc_id) — reproducible across engines and reruns."""
    from pulsarfeatureextractor_spark.functions.splits import stratified_sample

    d = load_table(spark, sf, "documents")
    return stratified_sample(d, "source", k=5, id_col="doc_id", seed="sf").select(
        "doc_id", "source", "rk"
    )


def tfidf_topk_docs(spark, sf):
    """Top-3 TF-IDF terms per document — score rounded to 6 decimals
    BEFORE ranking so the (score, rank) pair is engine-reproducible."""
    from pulsarfeatureextractor_spark.functions.tfidf import tfidf_topk

    d = load_table(spark, sf, "documents")
    return tfidf_topk(d, "text", "doc_id", k=3)


def profile_numeric_docs(spark, sf):
    """Per-source numeric profile of n_chars (pipeline-QA first query:
    counts, range, moments, exact median)."""
    from pulsarfeatureextractor_spark.functions.profile import numeric_profile

    d = load_table(spark, sf, "documents")
    return numeric_profile(d, "source", "n_chars")


def pack_sequences_docs(spark, sf):
    """Concat-and-chunk sequence packing via the two-level distributed
    prefix sum (operators/packing.py) — bucket_size 50 forces ~10
    buckets at sf0.01 so the bucket-prefix path is actually exercised.
    Oracle: the equivalent single global window cumsum in DuckDB."""
    from pulsarfeatureextractor_spark.operators.packing import pack_sequences

    d = load_table(spark, sf, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    return pack_sequences(t, seq_len=512, bucket_size=50).select(
        "doc_id", "n_tok", "tok_start", "pack_id", "pack_offset"
    )


def contamination_check_docs(spark, sf):
    """Eval-vs-train shingle overlap: docs with doc_id % 10 == 0 act as
    the held-out eval set, the rest as the training corpus."""
    from pulsarfeatureextractor_spark.operators.contamination import (
        contamination_ratio,
    )

    d = load_table(spark, sf, "documents")
    ev = d.where(F.col("doc_id") % 10 == 0)
    tr = d.where(F.col("doc_id") % 10 != 0)
    return contamination_ratio(tr, ev, "text", "doc_id", shingle_n=3)


def incremental_backfill_docs(spark, sf):
    """Incremental feature backfill: snapshot 1 = docs 0-249 (already
    processed), snapshot 2 appends 250+; the job reads ONLY the
    manifest diff (read_incremental) and computes Lyon moments for the
    new files — the oracle is the moment SQL restricted to the
    appended id range."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable

    d = load_table(spark, sf, "documents")
    tbl = IcebergLikeTable(tempfile.mkdtemp(prefix="incr_docs_"))
    m1 = tbl.write(d.where(F.col("doc_id") < 250))
    tbl.write(d.where(F.col("doc_id") >= 250), mode="append")
    new_docs = tbl.read_incremental(spark, m1["snapshot_id"])
    out = with_lyon_features(documents_to_sequences(new_docs))
    return out.select(
        "doc_id",
        F.round("mean", 6).alias("mean"),
        F.round("stdev", 6).alias("stdev"),
        F.round("skew", 6).alias("skew"),
        F.round("kurt", 6).alias("kurt"),
    )


def merge_upsert_docs(spark, sf):
    """Copy-on-write MERGE roundtrip run INSIDE the query (like the
    sink-resume gate): seed the snapshot table with docs 0-199, append
    200-399, then upsert 200-499 with n_chars shifted by 1000 — the
    readback must equal the oracle's CASE expression over documents."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable

    d = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    tbl = IcebergLikeTable(tempfile.mkdtemp(prefix="merge_docs_"))
    tbl.write(d.where(F.col("doc_id") < 200))
    tbl.write(
        d.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)), mode="append"
    )
    upd = d.where(F.col("doc_id") >= 200).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    tbl.merge_upsert(upd, keys=["doc_id"])
    return tbl.read(spark).select("doc_id", "n_chars")


def pipeline_curation_docs(spark, sf):
    """End-to-end curation composition (the training-data twin of the
    feature flagship): length filter → exact near-dup pairs → group
    resolution → canonical-keep → deterministic split.  One oracle
    covers the whole chain (quality CTE + recursive-CTE components +
    portable split expression)."""
    from pulsarfeatureextractor_spark.functions.splits import hash_split
    from pulsarfeatureextractor_spark.operators.components import dedup_groups

    d = load_table(spark, sf, "documents")
    filt = d.where(F.size(F.split(F.col("text"), " ")) >= 20)
    pairs = ngram_jaccard_pairs(filt, "text", "doc_id", shingle_n=3, threshold=0.5)
    groups = dedup_groups(filt, pairs, "doc_id")
    keep = groups.where(F.col("group_id") == F.col("doc_id"))
    return hash_split(keep, "doc_id", seed="sf", hasher="md5").select(
        "doc_id", "group_size", "split"
    )


def chunk_documents_docs(spark, sf):
    """Sliding-window chunking (64-token chunks, 16 overlap) — the
    embedding/training prep staple; all JVM, fused into the scan."""
    from pulsarfeatureextractor_spark.functions.text import chunk_documents

    d = load_table(spark, sf, "documents")
    return chunk_documents(d, "text", "doc_id", chunk_tokens=64, overlap=16)


def redact_pii_docs(spark, sf):
    """PII redaction over text with deterministically planted PII (the
    fixtures contain none): docs with doc_id % 7 == 0 get an email and
    an IPv4 appended before redaction; the oracle plants and redacts
    identically (Java regex ∩ RE2 pattern subset)."""
    from pulsarfeatureextractor_spark.functions.text import redact_pii

    d = load_table(spark, sf, "documents")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact sam@example.org at 10.1.2.3")),
        ).otherwise(F.col("text")),
    )
    return redact_pii(planted, "text").select(
        "doc_id", "n_email", "n_ipv4", "text_redacted"
    )


def dedup_against_docs(spark, sf):
    """Cross-corpus exact dedup: treat docs 0-249 as the already-ingested
    corpus, 250+ as the new crawl; survivors = new docs whose text does
    not already exist verbatim in the corpus."""
    from pulsarfeatureextractor_spark.operators.dedup import dedup_against

    d = load_table(spark, sf, "documents")
    corpus = d.where(F.col("doc_id") < 250)
    crawl = d.where(F.col("doc_id") >= 250)
    return dedup_against(crawl, corpus, "text", ref_col="text").select(
        "doc_id", "n_chars"
    )


def training_set_assembly_docs(spark, sf):
    """North-star synthesis: point-in-time features + leakage-free
    AS-OF label attach + deterministic split — the full training-set
    assembly in one plan.  The label history carries a DECOY: a
    flipped label observed 1h AFTER event_time; the as-of must pick
    the earlier true label (zero temporal leakage), which the oracle's
    DuckDB ASOF certifies."""
    from pulsarfeatureextractor_spark.functions.splits import hash_split

    docs = load_table(spark, sf, "documents")
    seqs = with_event_time(documents_to_sequences(docs), mode="portable")
    feats = with_lyon_features(seqs)
    base = feats.select("doc_id", "event_time", "n_tok")
    lab_true = base.select(
        "doc_id",
        (F.col("event_time")
         - F.make_interval(secs=F.col("n_tok").cast("double"))).alias("label_time"),
        F.pmod(F.col("doc_id").cast("long"), F.lit(2)).cast("int").alias("label"),
    )
    lab_decoy = base.select(
        "doc_id",
        (F.col("event_time") + F.make_interval(secs=F.lit(3600.0))).alias("label_time"),
        (1 - F.pmod(F.col("doc_id").cast("long"), F.lit(2))).cast("int").alias("label"),
    )
    labels = lab_true.union(lab_decoy)
    # merge_asof strategy: the co-partitioned applyInPandas plan — this
    # in-window query carries §2B V2 (grouped-map) coverage now that the
    # standalone merge-plan variant moved to the tail (all four as-of
    # plans are property-tested equal in tests/test_asof*.py)
    joined = asof_join(
        feats, labels, on="event_time", right_on="label_time", by="doc_id",
        value_cols=["label"], strategy="merge_asof",
    )
    return hash_split(joined, "doc_id", seed="sf", hasher="md5").select(
        "doc_id", "event_time",
        F.round("mean", 6).alias("mean"),
        "label", "split",
    )


def repetition_metrics_docs(spark, sf):
    """Gopher-style repetition quality filters: top n-gram count mass
    per doc for n=1..3 (functions/text.with_repetition_metrics)."""
    from pulsarfeatureextractor_spark.functions.text import with_repetition_metrics

    d = load_table(spark, sf, "documents")
    return with_repetition_metrics(d, "text").select(
        "doc_id", "rep_1", "rep_2", "rep_3"
    )


def dedup_groups_docs(spark, sf):
    """Dedup-group resolution: exact n-gram Jaccard pairs → distributed
    connected components (min-label propagation) → one group_id per doc
    (its component's min doc_id; itself if never paired).  The oracle is
    a DuckDB recursive CTE computing the same transitive closure over
    the same pair graph."""
    from pulsarfeatureextractor_spark.operators.components import dedup_groups

    d = load_table(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    return dedup_groups(d, pairs, "doc_id").select(
        "doc_id", "group_id", "group_size"
    )


def width_features_docs(spark, sf):
    from pulsarfeatureextractor_spark.functions.scores import with_width_features

    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    out = with_width_features(seqs)
    return out.select(
        "doc_id", "n_above_half", "n_above_q3",
        F.round("peak_to_mean", 6).alias("peak_to_mean"),
        F.round("crest", 6).alias("crest"),
    )


def profile_stats_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    out = with_profile_stats_sql(seqs)
    return out.select(
        "doc_id",
        F.round("sn_ratio", 6).alias("sn_ratio"),
        F.round("peak_offset", 6).alias("peak_offset"),
    )


def lyon8_two_curve_docs(spark, sf):
    """A6/A7: the 8-wide Lyon candidate vector — profile moments + a
    second kind-discriminated DM-style curve's moments, pivoted into one
    row per doc.  Both curves derive deterministically from the text so
    the DuckDB oracle reproduces the whole composition."""
    from pulsarfeatureextractor_spark.functions.moments import lyon8_features

    d = load_table(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    did = F.col("doc_id").cast("string").alias("doc_id")
    prof = d.select(
        did,
        F.lit("profile").alias("kind"),
        F.transform(words, lambda w: (F.length(w) % F.lit(256)).cast("int")).alias(
            "tokens"
        ),
    )
    dm = d.select(
        did,
        F.lit("dm").alias("kind"),
        F.transform(
            words, lambda w: ((F.length(w) * F.lit(7) + F.lit(3)) % F.lit(256)).cast("int")
        ).alias("tokens"),
    )
    out = lyon8_features(prof.unionByName(dm))
    cols = [f + s for s in ("_prof", "_dm")
            for f in ("mean", "stdev", "skew", "kurt")]
    return out.select("doc_id", *[F.round(c, 6).alias(c) for c in cols])


def label_attach_docs(spark, sf):
    """A10 candidate labelling: broadcast-join a labels dim table onto
    the feature rows, then per-label statistics.  Float discipline:
    per-doc means are summed as exact integer micro-units (associative
    on both engines) rather than averaged as floats."""
    d = load_table(spark, sf, "documents")
    labels = spark.range(0, 2).select(
        F.col("id").cast("int").alias("label_id"),
        F.when(F.col("id") == 0, "pulsar").otherwise("rfi").alias("label"),
    )
    feats = with_lyon_features(documents_to_sequences(d))
    labeled = feats.withColumn(
        "label_id", F.pmod(F.col("doc_id").cast("long"), F.lit(2)).cast("int")
    ).join(F.broadcast(labels), "label_id")
    micro = lambda c: F.round(F.col(c) * 1000000, 0).cast("long")  # noqa: E731
    return labeled.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(micro("mean")).alias("sum_mean_micro"),
        F.sum(micro("kurt")).alias("sum_kurt_micro"),
    )


def peace_features_docs(spark, sf):
    """A9: PEACE-style six scores (Lee et al. 2013) on the token curve
    — all JVM expressions, DuckDB-oracle-checked (tail entry)."""
    from pulsarfeatureextractor_spark.functions.scores import with_peace_features

    d = load_table(spark, sf, "documents")
    out = with_peace_features(documents_to_sequences(d))
    return out.select(
        "doc_id",
        F.round("peace_snr", 6).alias("peace_snr"),
        F.round("peace_duty", 6).alias("peace_duty"),
        F.round("peace_persist", 6).alias("peace_persist"),
        F.round("peace_top_bottom", 6).alias("peace_top_bottom"),
        "peace_n_peaks",
        F.round("peace_mean_adiff", 6).alias("peace_mean_adiff"),
    )


def spinn_features_docs(spark, sf):
    """A9: SPINN-style six features (Morello et al. 2014) on the token
    curve — all JVM expressions, DuckDB-oracle-checked (tail entry)."""
    from pulsarfeatureextractor_spark.functions.scores import with_spinn_features

    d = load_table(spark, sf, "documents")
    out = with_spinn_features(documents_to_sequences(d))
    return out.select(
        "doc_id",
        F.round("spinn_log_snr", 6).alias("spinn_log_snr"),
        F.round("spinn_duty", 6).alias("spinn_duty"),
        F.round("spinn_persist", 6).alias("spinn_persist"),
        F.round("spinn_log_n", 6).alias("spinn_log_n"),
        F.round("spinn_contrast", 6).alias("spinn_contrast"),
        F.round("spinn_tail_frac", 6).alias("spinn_tail_frac"),
    )


def eatough_features_docs(spark, sf):
    """A9: the Eatough et al. 2010 (MNRAS 407:2443) 12-feature set,
    recast onto the two deterministic curves the lyon8 query derives
    (profile = len(word)%256, DM curve = (len*7+3)%256) — profile S/N,
    W50/W25 widths, peak offset/count, centroid offset; DM-curve S/N,
    width, offset, triangle-template chi2, max gradient; snr ratio.
    All JVM expressions, full-composition DuckDB oracle (replaces the
    round-2 width-proxy as the A9 Eatough row; see
    functions/scores.with_eatough_features for the reconstruction
    provenance)."""
    from pulsarfeatureextractor_spark.functions.scores import (
        EATOUGH_FIELDS,
        with_eatough_features,
    )

    d = load_table(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    two = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(
            words, lambda w: (F.length(w) % F.lit(256)).cast("int")
        ).alias("tokens_prof"),
        F.transform(
            words,
            lambda w: ((F.length(w) * F.lit(7) + F.lit(3)) % F.lit(256)).cast(
                "int"
            ),
        ).alias("tokens_dm"),
    )
    out = with_eatough_features(two)
    cols = [
        F.col(c) if c == "eat_n_peaks" else F.round(c, 6).alias(c)
        for c in EATOUGH_FIELDS
    ]
    return out.select("doc_id", *cols)


def embedding_neardup_exact(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    out = embedding_neardup_pairs(emb, threshold=0.45, exact=True)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


# rows-only (no SQL oracle): sketches, fingerprints, ANN-approx, stubs
def embedding_neardup_lsh(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    out = embedding_neardup_pairs(
        emb, threshold=0.45, exact=False, n_bits=6, n_tables=12, dim=64
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def thornton_scores_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    out = with_thornton_scores(seqs)
    return out.select(
        "doc_id",
        *[F.round(c, 6).alias(c) for c in (
            "sin_chi2", "sin2_chi2", "gauss_chi2", "gauss_amp", "gauss_fwhm",
            "n_peaks", "sn_ratio", "hist_dist", "peak_offset", "quad_chi2")],
    )


def subband_scores_docs(spark, sf):
    """A8 2-D family: Thornton/Bates-style sub-band scores (band-vs-
    profile correlation, peak-phase jitter, per-band intensity/snr
    evenness) over a deterministic synthetic (8 x n_tok) cube derived
    JVM-side from the token curve (with_synthetic_subbands — the input
    hint carries no real sub-band data).  Kernel is one mapInArrow pass
    over the flat band-major cube (functions/scores.py); the oracle is
    a committed VALUES literal generated from an independent per-row
    transcription (tools/gen_value_oracles.gen_subband)."""
    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        with_subband_scores,
    )
    from pulsarfeatureextractor_spark.sources.tokenized import (
        with_synthetic_subbands,
    )

    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    # prune BEFORE the opaque Arrow boundary (tokens/source would ride
    # the crossing otherwise) and drop the wide cube on the way back
    sb = with_synthetic_subbands(seqs, n_chan=8).select("doc_id", "sb_flat")
    out = with_subband_scores(sb, "sb_flat", n_chan=8, drop=("sb_flat",))
    return out.select(
        "doc_id", *[F.round(c, 6).alias(c) for c in SUBBAND_FIELDS]
    )


def subint_scores_docs(spark, sf):
    """A8 second cube axis: Thornton-style SUB-INTEGRATION scores —
    the same (channels x bins) kernel as subband_scores_docs applied to
    a deterministic synthetic (6 x n_tok) time-axis cube
    (with_synthetic_subints; real sub-int data loads into the same flat
    column).  With the 10 1-D scores + 6 sub-band + 6 sub-int the
    Thornton-style family reaches the published 22-score count; oracle
    is a committed VALUES literal (tools/gen_value_oracles.gen_subint,
    independence-checked per row against tests/oracle.subband_oracle_row)."""
    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        with_subband_scores,
    )
    from pulsarfeatureextractor_spark.sources.tokenized import (
        with_synthetic_subints,
    )

    d = load_table(spark, sf, "documents")
    seqs = documents_to_sequences(d)
    si = with_synthetic_subints(seqs, n_int=6).select("doc_id", "si_flat")
    out = with_subband_scores(si, "si_flat", n_chan=6, drop=("si_flat",))
    return out.select(
        "doc_id",
        *[F.round(c, 6).alias(c.replace("sb_", "si_"))
          for c in SUBBAND_FIELDS],
    )


def minhash_lsh_pairs_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=64, bands=16, threshold=0.7
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def simhash_pairs_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=3)


def minhash_signatures_docs(spark, sf):
    """Full 64-perm signature, serialized (driver canon cannot hash
    array cells); exact VALUES oracle from the independent pure-python
    XXH64 + universal-hash port (tools/gen_value_oracles.py)."""
    d = load_table(spark, sf, "documents")
    out = minhash_signatures(d, "text", "doc_id", num_perm=64)
    return out.select(
        "doc_id", F.array_join("signature", ",").alias("signature")
    )


def simhash_signatures_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return simhash_signatures(d, "text", "doc_id")


def fingerprint_docs(spark, sf):
    d = load_table(spark, sf, "documents")
    return with_fingerprint(d, "text").select("doc_id", "fingerprint")


def ann_ivf_topk(spark, sf):
    from pulsarfeatureextractor_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=6)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def semantic_dedup_embeddings(spark, sf):
    """SemDeDup-style semantic deduplication over the embeddings table
    (operators/similarity.semantic_dedup): spherical-k-means cells
    bound the pair comparison, within-cell cosine >= 0.45 pairs feed
    connected components, one canonical member per semantic-dup group.
    Oracle: VALUES literal from the pure-python twin
    (tools/gen_value_oracles.gen_semantic_dedup — identical centroid
    arithmetic, sequential-fold cosine, union-find)."""
    from pulsarfeatureextractor_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = load_table(spark, sf, "embeddings")
    return semantic_dedup(emb, threshold=0.45, n_centroids=8).select(
        "vec_id", "group_id", "group_size"
    )


def ann_lsh_topk_docs(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = rp_lsh_topk(emb, queries, k=5, dim=64, n_bits=10, n_tables=6)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def phcx_ingest_docs(spark, sf):
    """A3/A4 ingest gate: synthesize the deterministic PHCX-like fixture
    set (sources/candidates.write_synthetic_phcx), read it back
    DISTRIBUTED (binaryFile scan + mapInPandas gzip/XML parse), and emit
    one row per (candidate, curve kind) with an exact token checksum.
    The oracle is a VALUES literal from the SAME pure-python truth
    function the writer uses (synthetic_phcx_truth) — no Spark, no
    disk on the oracle side."""
    import tempfile

    from pulsarfeatureextractor_spark.sources.candidates import (
        read_phcx_dir,
        write_synthetic_phcx,
    )

    d = tempfile.mkdtemp(prefix="phcx_gate_")
    write_synthetic_phcx(d, n_files=4, candidates_per_file=3)
    out = read_phcx_dir(spark, d)
    tok_sum = F.aggregate(
        F.transform("tokens", lambda v: v.cast("long")),
        F.lit(0).cast("long"), lambda a, v: a + v,
    )
    return out.select("doc_id", "kind", "n_tok", tok_sum.alias("token_sum"))


def media_stats_summary(spark, sf):
    """Multimodal: JVM-only binary-column stats on the deterministic
    synthetic media table (no codec libs in container; decode kernels
    are injection-gated — see functions/multimodal.py)."""
    from pulsarfeatureextractor_spark.functions.multimodal import (
        synthetic_media,
        with_media_stats,
    )

    m = with_media_stats(synthetic_media(spark, 300))
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("aspect"), 6).alias("avg_aspect"),
    )


def media_frame_samples(spark, sf):
    from pulsarfeatureextractor_spark.functions.multimodal import (
        frame_sample,
        synthetic_media,
    )

    frames = frame_sample(synthetic_media(spark, 300), every_k=2)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
    )


def pipeline_pointintime_features(spark, sf):
    return _flagship(spark, sf)


# --------------------------------------------------------------------------
# sink / exchange / UDF-surface / streaming driver gates
#
# These queries close the last §2B rows that round 1 could only
# pytest-verify (S1, S3/S4, O2, V1, X1-X4): each runs the actual
# machinery (manifest commit, resumable sink, range exchange, scalar
# pandas UDF, Structured Streaming into a memory sink) INSIDE the
# callable and returns a DataFrame a plain DuckDB batch oracle can
# differentially verify.
# --------------------------------------------------------------------------

def snapshot_scan_docs(spark, sf):
    """S1 driver gate: commit documents into an IcebergLike table in TWO
    append snapshots (split on doc_id parity, hive-partitioned by
    source), then scan the LATEST snapshot.  The DuckDB differential
    against the raw documents view proves the manifest commit chain and
    the snapshot scan (incl. partition-column rebuild) reproduce the
    table exactly.  SURVEY.md §1.4/§2B S1."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable

    d = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tbl = IcebergLikeTable(tempfile.mkdtemp(prefix="snapshot_scan_docs_"))
    tbl.write(d.where(F.col("doc_id") % 2 == 0), partition_by=["source"])
    tbl.write(d.where(F.col("doc_id") % 2 != 0), partition_by=["source"])
    return tbl.read(spark).select("doc_id", "lang", "source", "n_chars")


def partitioned_sink_resume_docs(spark, sf):
    """S3+S4 driver gate: resumable partitioned sink end-to-end.  Run 1
    is killed after one 3-partition batch (simulated mid-run kill);
    run 2 resumes from the checkpoint manifest and re-emits ONLY the
    missing partitions (lineage sidecars land per partition).  Reading
    the sink back must equal the full input — DuckDB differential.
    SURVEY.md §2B S3/S4."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.partitioned import run_partitioned_job

    d = load_table(spark, sf, "documents").select("doc_id", "source", "n_chars")
    out_dir = tempfile.mkdtemp(prefix="partitioned_sink_docs_")
    try:
        run_partitioned_job(
            d, out_dir, ["source"], batch_size=3, fail_after_batches=1,
            lineage={"job": "driver-gate"},
        )
    except RuntimeError:
        pass  # the simulated kill between batches
    run_partitioned_job(d, out_dir, ["source"], batch_size=3,
                        lineage={"job": "driver-gate"})
    return spark.read.parquet(out_dir).select("doc_id", "source", "n_chars")


def range_partition_sorted_events(spark, sf):
    """O2 driver gate: range repartition + partition-local sort, audited
    distributively.  mapInPandas emits one row per task (row count,
    intra-partition lex-order violations, first/last key); a window
    over partition id counts cross-partition boundary inversions.  A
    correct range exchange yields exactly (COUNT(*), 0, 0) — the
    invariant-check pattern of token_invariant_check.  SURVEY.md §2B
    O2 (+V3 for the audit)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf, "events").select("user_id", "ts")
    rp = e.repartitionByRange(8, "user_id", "ts").sortWithinPartitions(
        "user_id", "ts"
    )

    schema = ("pid int, n long, intra long, "
              "first_uid long, first_us long, last_uid long, last_us long")

    def audit(pdfs):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        viol = 0
        first = None
        last = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            uid = pdf["user_id"].to_numpy()
            us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            if last is not None and (
                uid[0] < last[0] or (uid[0] == last[0] and us[0] < last[1])
            ):
                viol += 1
            du = np.diff(uid)
            dt = np.diff(us)
            viol += int(((du < 0) | ((du == 0) & (dt < 0))).sum())
            n += len(uid)
            if first is None:
                first = (int(uid[0]), int(us[0]))
            last = (int(uid[-1]), int(us[-1]))
        if n:
            yield pd.DataFrame([{
                "pid": pid, "n": n, "intra": viol,
                "first_uid": first[0], "first_us": first[1],
                "last_uid": last[0], "last_us": last[1],
            }])

    per = rp.mapInPandas(audit, schema=schema)
    w = Window.orderBy("pid")
    prev_uid = F.lag("last_uid").over(w)
    prev_us = F.lag("last_us").over(w)
    audited = per.select(
        "n", "intra",
        F.when(
            (prev_uid > F.col("first_uid"))
            | ((prev_uid == F.col("first_uid")) & (prev_us > F.col("first_us"))),
            1,
        ).otherwise(0).alias("boundary"),
    )
    return audited.agg(
        F.sum("n").alias("n_rows"),
        F.sum("intra").alias("intra_violations"),
        F.sum("boundary").cast("long").alias("boundary_inversions"),
    )


def lyon_pandas_udf_docs(spark, sf):
    """V1 driver gate: the scalar Arrow ``@pandas_udf`` moment path
    (struct return) — same pinned expression order as the mapInArrow
    default, so it hits the same DuckDB oracle bit-for-bit.
    SURVEY.md §2C V1."""
    from pulsarfeatureextractor_spark.functions.moments import lyon_moments

    seqs = documents_to_sequences(load_table(spark, sf, "documents"))
    m = seqs.select("doc_id", lyon_moments("tokens").alias("m"))
    return m.select(
        "doc_id",
        F.round(F.col("m.mean"), 6).alias("mean"),
        F.round(F.col("m.stdev"), 6).alias("stdev"),
        F.round(F.col("m.skew"), 6).alias("skew"),
        F.round(F.col("m.kurt"), 6).alias("kurt"),
    )


def _events_stream(spark, sf):
    """Replay bridge (tests/test_streaming.py pattern): rewrite events
    as ONE parquet file with the declared schema and open it as a
    file-source stream — a deterministic single-trigger replay under
    ``trigger(availableNow=True)``."""
    import tempfile

    from pulsarfeatureextractor_spark.streaming.mirror import (
        stream_events_from_table,
    )

    d = tempfile.mkdtemp(prefix="events_stream_")
    src = f"{d}/events"
    load_table(spark, sf, "events").coalesce(1).write.parquet(src)
    return stream_events_from_table(spark, src), d


def streaming_tumbling_counts_events(spark, sf):
    """X1+X2+X3 driver gate: file-source stream → watermark → tumbling
    1h windows → memory sink under availableNow, returned as a
    DataFrame and differentially checked against a batch DuckDB
    date_trunc aggregate.  value is pre-cast to exact integer cents so
    the windowed SUM is associative on both engines."""
    import uuid

    from pulsarfeatureextractor_spark.streaming.mirror import (
        streaming_tumbling_counts,
    )

    stream, d = _events_stream(spark, sf)
    stream = stream.withColumn("value", _cents(F.col("value")))
    name = f"stream_tumble_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_tumbling_counts(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):  # partial table would fake the diff
        q.stop()
        raise RuntimeError("streaming tumbling replay did not finish")
    return spark.table(name).select(
        "w_start", "w_end", "event_type", "n_events",
        F.col("sum_value").alias("value_cents"),
    )


def streaming_stateful_asof_events(spark, sf):
    """X4 driver gate: stateful streaming AS-OF
    (``applyInPandasWithState``, one double of state per entity)
    replayed under availableNow and checked against DuckDB's native
    ASOF JOIN — the online twin of asof_purchase_before_view, sharing
    its oracle."""
    import uuid

    from pulsarfeatureextractor_spark.streaming.mirror import streaming_asof_state

    stream, d = _events_stream(spark, sf)
    name = f"stream_asof_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_asof_state(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):  # partial table would fake the diff
        q.stop()
        raise RuntimeError("streaming as-of replay did not finish")
    return spark.table(name).select(
        "event_id", "user_id", "ts", "last_purchase_value"
    )


def asof_storage_plan_purchases(spark, sf):
    """J1 FOURTH physical plan — storage-bucketed, Exchange-free: the
    as-of union is materialized once as a bucketed table (the Iceberg
    ``bucket(N, entity)`` layout), after which the query itself is
    Scan → local Sort → Window → Filter with ZERO shuffle
    (tests/test_asof_storage.py pins the plan shape).  Same DuckDB
    native-ASOF oracle as the other three plans."""
    import tempfile
    import uuid

    from pulsarfeatureextractor_spark.operators.asof import (
        asof_bucketed_storage,
        prepare_bucketed_asof_table,
    )

    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    name = f"asof_storage_{uuid.uuid4().hex[:8]}"
    prepare_bucketed_asof_table(
        views, purchases, name,
        tempfile.mkdtemp(prefix="asof_storage_") + "/t",
        on="ts", by="user_id", value_cols=["last_purchase_value"],
        n_buckets=8,
    )
    return asof_bucketed_storage(
        spark, name, on="ts", by="user_id",
        value_cols=["last_purchase_value"],
    )


def asof_broadcast_plan_purchases(spark, sf):
    """J1 FIFTH physical plan — broadcast: the (small) purchase side is
    collapsed into per-entity time-sorted arrays by ONE hash aggregate
    and broadcast-hash-joined onto the view stream, which is never
    shuffled or sorted (tests/test_asof.py::test_broadcast_plan_shape
    pins the shape).  The 100 TB-left / GB-right regime's cheapest
    plan: zero Exchange on the big side.  Same DuckDB native-ASOF
    oracle as the other four plans."""
    e = load_table(spark, sf, "events")
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="broadcast",
    )


def expectations_docs(spark, sf):
    """Declarative data-quality gate (functions/quality_checks.py):
    null counts, key uniqueness, value range, and format regex over
    documents — every rule folded into ONE aggregate pass (one
    column-pruned scan; the exact-uniqueness rule adds the one
    COUNT(DISTINCT) expansion).  Deequ-shaped surface the curation
    pipeline gates ingests on."""
    from pulsarfeatureextractor_spark.functions import quality_checks as qc

    d = load_table(spark, sf, "documents")
    rules = [
        qc.expect_not_null("text"),
        qc.expect_unique("doc_id"),
        qc.expect_in_range("n_chars", 0, 10_000_000),
        qc.expect_matches("lang", "^[a-z]{2}$"),
    ]
    return qc.expectation_metrics(d, rules)


def shuffle_shards_docs(spark, sf):
    """Deterministic global shuffle + fixed-size shard assignment
    (operators/shuffle.py): dense 0-based rank under the seeded
    portable md5 order WITHOUT a single-partition pass over the data —
    range-partition on the digest, pid-local ranking, K-row offset
    prefix sum broadcast back (the packing two-level shape).  Oracle
    is the single-window SQL spelling of the same order."""
    from pulsarfeatureextractor_spark.operators.shuffle import (
        global_shuffle_rank,
    )

    d = load_table(spark, sf, "documents")
    out = global_shuffle_rank(
        d, id_col="doc_id", seed="shuf-r4", shard_size=64
    )
    return out.select("doc_id", "shuffle_rank", "shard_ix")


# corpus-mixing constants shared by the query and its oracle so both
# engines render the IDENTICAL expression text (portability is part of
# the operator contract, like hash_split's md5 tier)
_MIX_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0}
_MIX_BUDGET = 30000.0
_MIX_SEED = "mix-r4"
_MIX_MAX_RATE = 4.0


def mix_corpora_docs(spark, sf):
    """Weighted corpus mixing to a token budget (operators/mixing.py):
    the LLaMA/DoReMi-style recipe stage — per-source targets
    budget*w/sum(w), ONE tiny source-key aggregate broadcast back onto
    the corpus (big side never shuffles), then deterministic portable
    md5 up/down-sampling materialized as floor(rate) copies plus a
    fractional-acceptance copy; copy_ix distinguishes epochs.  Oracle
    embeds the byte-identical copy-count expression via
    mixing_copies_sql and reproduces the sample row-for-row."""
    from pulsarfeatureextractor_spark.operators.mixing import mix_corpora

    d = load_table(spark, sf, "documents")
    out = mix_corpora(
        d, _MIX_WEIGHTS, _MIX_BUDGET, source_col="source",
        token_col="n_chars", id_col="doc_id", seed=_MIX_SEED,
        max_rate=_MIX_MAX_RATE,
    )
    return out.select("doc_id", "source", "n_chars", "copy_ix")


def shard_export_docs(spark, sf):
    """Shard-export SINK gate (sinks/shards.py): shuffle the documents
    table into fixed-size shards, WRITE one parquet file per shard,
    read the files back — the persisted layout must reproduce the
    declared shuffle order exactly (same oracle as shuffle_shards_docs,
    so the write+readback path is differentially checked end-to-end,
    not just the in-memory rank)."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.shards import (
        export_shuffled_shards,
    )

    d = load_table(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="shard_export_") + "/t"
    export_shuffled_shards(d, out, shard_size=64, id_col="doc_id",
                           seed="shuf-r4")
    back = spark.read.parquet(out)
    return back.select(
        "doc_id",
        "shuffle_rank",
        F.col("shard_ix").cast("long").alias("shard_ix"),
    )


_ZORDER_DIR_CACHE: dict = {}


def zorder_prune_events(spark, sf):
    """Z-order clustered write -> min/max file pruning, differentially
    gated end-to-end (closes the round-4 'pytest-only' gap on
    sinks/layout.py): events are written z-ordered on (user_id, value)
    into 16 files, a 2-column box predicate selects the overlapping
    files by per-file min/max ONLY, and the pruned scan must return
    exactly the full-scan rows (the DuckDB oracle filters the original
    table).  ``files_skipped`` pins the layout's actual win: it is
    emitted from the observed file counts and the oracle demands >= 8
    of 16 skipped — a z-order that stops localizing the 2-D box fails
    the gate, not just a pytest."""
    import tempfile

    from pulsarfeatureextractor_spark.sinks.layout import (
        files_overlapping,
        write_zordered,
    )

    if sf not in _ZORDER_DIR_CACHE:
        # memoized per sf (the minhash_dedup_against_docs pattern): a
        # window query re-invoked across correctness + bench trials
        # must not rewrite the 16-file table into a fresh temp dir
        # every call
        ev = load_table(spark, sf, "events")
        out = tempfile.mkdtemp(prefix="zorder_prune_") + "/t"
        write_zordered(ev, out, ["user_id", "value"], n_files=16)
        _ZORDER_DIR_CACHE[sf] = out
    out = _ZORDER_DIR_CACHE[sf]
    total = len(spark.read.parquet(out).inputFiles())
    box = {"user_id": (40, 60), "value": (100.0, 150.0)}
    keep = files_overlapping(spark, out, box)
    pruned = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(out).limit(0)
    )
    skipped_floor = min(total - len(keep), 8)  # oracle pins ">= 8 skipped"
    return pruned.where(
        F.col("user_id").between(40, 60) & F.col("value").between(100.0, 150.0)
    ).select(
        "event_id",
        "user_id",
        "value",
        F.lit(skipped_floor).cast("int").alias("files_skipped_floor"),
    )


def boilerplate_removal_docs(spark, sf):
    """C4-style corpus boilerplate removal (functions/text.py
    remove_boilerplate): tokens present in >=79% of documents (exact
    integer-ratio cut, dfc*100 >= n_docs*79, min_docs=2) are dropped
    from every document, order and multiplicity of survivors
    preserved.  The boilerplate vocabulary is bounded by construction
    (<= max_distinct_per_doc * den/num), collected driver-side
    (metadata tier, IVF-centroid precedent) and inlined into a
    scan-fused higher-order filter — the removal costs ZERO shuffles;
    only the distinct-pair vocabulary aggregate exchanges data."""
    from pulsarfeatureextractor_spark.functions.text import remove_boilerplate

    d = load_table(spark, sf, "documents")
    return remove_boilerplate(d, "text", ratio=(79, 100), min_docs=2).select(
        "doc_id", "clean_text", "n_kept"
    )


def dsir_weights_docs(spark, sf):
    """DSIR importance weights (functions/dsir.py, Xie et al. 2023):
    target = the corpus's English slice, raw = the full corpus; every
    raw doc scored by its hashed-n-gram (uni+bi, portable md5 4096
    buckets — splits.py's cross-engine expression) log-likelihood
    ratio under add-one-smoothed target vs raw multinomials.  Float
    discipline: per-bucket log-ratios rounded 9dp and cast
    DECIMAL(20,9) BEFORE the per-doc sum (lm.py's exactly-associative
    trick), so the single corpus-scale shuffle carries exact partial
    sums; final cast to double rounds 6dp.  Oracle: full DuckDB SQL —
    no committed literal."""
    from pulsarfeatureextractor_spark.functions.dsir import (
        dsir_log_ratios,
        with_dsir_logweight,
    )

    d = load_table(spark, sf, "documents")
    lr = dsir_log_ratios(d.where(F.col("lang") == "en"), d)
    return with_dsir_logweight(d, lr).select(
        "doc_id", "n_grams", "dsir_logw"
    )


def dsir_select_docs(spark, sf):
    """DSIR Gumbel top-k resampling (functions/dsir.dsir_select): the
    weighted docs from dsir_weights_docs, perturbed by a deterministic
    per-doc Gumbel draw (portable md5 bucket -> strictly-interior
    uniform -> -ln(-ln u)) and cut to the top 25 % per source stratum
    by (key desc, doc_id).  The window partitions on the stratum, so
    parallelism tracks stratum count; returns only the selected rows.
    Oracle: full DuckDB SQL."""
    from pulsarfeatureextractor_spark.functions.dsir import (
        dsir_log_ratios,
        dsir_select,
        with_dsir_logweight,
    )

    d = load_table(spark, sf, "documents")
    lr = dsir_log_ratios(d.where(F.col("lang") == "en"), d)
    w = with_dsir_logweight(d, lr)
    return dsir_select(w, frac=0.25).select("doc_id", "source", "sel_key")


def repeated_spans_docs(spark, sf):
    """Repeated n-gram span coverage (operators/spans.py — the
    distributable predicate of Lee et al. 2021 exact-substring dedup):
    per doc, how many 3-gram start positions repeat ≥ 2× corpus-wide
    (intra-doc repeats count, as in the suffix-array formulation) and
    how many distinct token indices those grams cover.  Two keyed
    shuffles + one LEFT SEMI join (never row-multiplying); coverage
    expansion is scan-side array math.  Oracle: full DuckDB SQL."""
    from pulsarfeatureextractor_spark.operators.spans import (
        repeated_ngram_coverage,
    )

    return repeated_ngram_coverage(
        load_table(spark, sf, "documents"), n=3, min_count=2
    )


def gopher_rules_docs(spark, sf):
    """Gopher quality rules (functions/text.gopher_rules, Rae et al.
    2021 A1.1 word-level subset): word count in [50, 100k], mean word
    length in [3, 10], ≥ 80 % alphabetic words, '#'/'...' symbol
    ratio ≤ 0.1, ≥ 2 distinct Gopher stopwords.  All counts exact
    integers, each ratio one final division rounded 6dp, keep =
    conjunction — scan-fused, zero shuffles.  Full SQL oracle."""
    from pulsarfeatureextractor_spark.functions.text import gopher_rules

    return gopher_rules(load_table(spark, sf, "documents")).select(
        "doc_id", "n_words", "mean_word_len_g", "alpha_frac",
        "symbol_ratio", "stop_hits", "gopher_keep",
    )


def lm_kneser_ney_docs(spark, sf):
    """Interpolated Kneser-Ney bigram perplexity (functions/lm.py,
    smoothing='kneser_ney' — the KenLM family's smoothing, upgrading
    the add-1 row lm_perplexity_docs): discounted ML term + backoff
    mass times an add-1-smoothed continuation distribution, all KN
    statistics aggregated from the bigram TABLE (vocabulary²-bounded).
    Same decimal(20,9) exact-sum discipline; the float expression has
    ONE pinned parenthesization mirrored verbatim in the oracle."""
    from pulsarfeatureextractor_spark.functions.lm import with_lm_perplexity

    d = load_table(spark, sf, "documents")
    return with_lm_perplexity(
        d, "text", "doc_id", smoothing="kneser_ney", out_col="lm_ppl_kn"
    ).select("doc_id", "n_bigrams", "lm_ppl_kn")


def curation_v2_docs(spark, sf):
    """Round-5 curation flagship: the three new published stages
    composed end-to-end — Gopher rules (fixture-adapted
    min_stop_hits=1: the synthetic vocabulary contains only 'the'
    from the Gopher stopword list) AND repeated-3-gram coverage
    ≤ 0.9 (the synthetic small-vocab corpus repeats heavily; the
    gate still splits it) as the survivor filter, then DSIR scoring
    of the survivors under full-corpus target/raw multinomials and
    Gumbel top-50 % per source.  One chained DuckDB oracle reproduces
    the whole pipeline — every intermediate is exact-integer or
    exact-decimal, so the composition differentials end-to-end."""
    from pulsarfeatureextractor_spark.functions.dsir import (
        dsir_log_ratios,
        dsir_select,
        with_dsir_logweight,
    )
    from pulsarfeatureextractor_spark.functions.text import gopher_rules
    from pulsarfeatureextractor_spark.operators.spans import (
        repeated_ngram_coverage,
    )

    d = load_table(spark, sf, "documents")
    g = gopher_rules(d, min_stop_hits=1)
    cov = repeated_ngram_coverage(d, n=3).select("doc_id", "dup_fraction")
    surv = g.join(cov, ["doc_id"]).where(
        F.col("gopher_keep") & (F.col("dup_fraction") <= 0.9)
    )
    lr = dsir_log_ratios(d.where(F.col("lang") == "en"), d)
    w = with_dsir_logweight(surv, lr)
    return dsir_select(w, frac=0.5).select(
        "doc_id", "source", "n_words", "dup_fraction", "dsir_logw",
        "sel_key",
    )


def lm_perplexity_docs(spark, sf):
    """CCNet-style bigram-LM perplexity scoring (functions/lm.py):
    add-1-smoothed bigram LM trained on the corpus itself, every doc
    scored exp(-mean ln p) over its bigrams.  Float discipline: each
    ln p is rounded to 9 decimals and cast DECIMAL(20,9) BEFORE the
    per-doc sum (exact integer arithmetic — associative under any
    partitioning); only the final exp returns to double (round 6).
    LM sides are vocabulary-bounded broadcasts; scan-side bigram
    transform; two hash aggs to train, one to score."""
    from pulsarfeatureextractor_spark.functions.lm import with_lm_perplexity

    d = load_table(spark, sf, "documents")
    return with_lm_perplexity(d, "text", "doc_id").select(
        "doc_id", "n_bigrams", "lm_ppl"
    )


def line_dedup_docs(spark, sf):
    """RefinedWeb-style exact line-level dedup (operators/dedup.
    line_dedup, Penedo et al. 2023 §3.3): every occurrence of a
    non-blank line appearing >= 2 times corpus-wide is removed,
    survivors rejoin in order.  The fixture text has no newlines, so
    the query first PLANTS a deterministic line segmentation (3-token
    lines via scan-side slice/array_join — same plant discipline as
    redact_pii_docs) in arithmetic both engines reproduce exactly;
    3-token lines over the ~30-word fixture vocabulary collide
    heavily across documents, so the gate genuinely splits.  One
    line-frequency hash aggregate + LEFT ANTI + ordered reassembly;
    full SQL oracle."""
    from pulsarfeatureextractor_spark.operators.dedup import line_dedup

    d = load_table(spark, sf, "documents")
    ws = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    n_lines = F.floor((F.size(ws) + F.lit(2)) / F.lit(3)).cast("int")
    planted = F.array_join(
        F.transform(
            F.when(n_lines > 0, F.sequence(F.lit(1), n_lines)).otherwise(
                F.expr("array()").cast("array<int>")
            ),
            lambda i: F.array_join(
                F.slice(ws, (i - F.lit(1)) * F.lit(3) + F.lit(1), F.lit(3)),
                " ",
            ),
        ),
        "\n",
    )
    return line_dedup(
        d.select("doc_id", planted.alias("planted")), text_col="planted"
    ).select("doc_id", "clean_text", "n_lines", "n_kept", "n_removed")


# C4 §2.2 drops any page containing a blocklisted word; the fixture
# vocabulary stands in for the published list so the gate splits.
_BLOCKLIST_FIXTURE = ["big", "slow", "vector"]


def blocklist_filter_docs(spark, sf):
    """C4-style blocklist gate (functions/text.blocklist_filter,
    Raffel et al. 2020 §2.2, tolerance max_distinct_hits=1): distinct
    and total blocked-token counts + keep flag, exact-integer counts,
    scan-fused zero-shuffle plan.  Full SQL oracle (list_intersect /
    list_filter mirror array_intersect / filter)."""
    from pulsarfeatureextractor_spark.functions.text import blocklist_filter

    d = load_table(spark, sf, "documents")
    return blocklist_filter(
        d, _BLOCKLIST_FIXTURE, "text", max_distinct_hits=1
    ).select(
        "doc_id", "n_blocked_distinct", "n_blocked_tokens", "blocklist_keep"
    )


_MINHASH_REF_CACHE: dict = {}


def _minhash_ref_for(spark, sf):
    """Build (or reuse this process's already-built) bucketed MinHash
    reference index for one sf dir — memoized like _unigram_model_for
    so repeated invocations (correctness pass + bench trials) neither
    leak metastore tables/temp dirs nor pay the index build again."""
    if sf not in _MINHASH_REF_CACHE:
        import tempfile
        import uuid

        from pulsarfeatureextractor_spark.operators.dedup import (
            prepare_minhash_reference,
        )

        d = load_table(spark, sf, "documents")
        name = f"mh_ref_{uuid.uuid4().hex[:8]}"
        prepare_minhash_reference(
            d.where(F.col("doc_id") % 3 == 0), name,
            tempfile.mkdtemp(prefix="mh_ref_") + "/t", n_buckets=8,
        )
        _MINHASH_REF_CACHE[sf] = name
    return _MINHASH_REF_CACHE[sf]


def minhash_dedup_against_docs(spark, sf):
    """Cross-corpus NEAR-duplicate dedup (operators/dedup.
    minhash_dedup_against): docs with doc_id % 3 == 0 are the
    already-ingested corpus, materialized once as a band_hash-BUCKETED
    MinHash index (prepare_minhash_reference — the fuzzy companion of
    the digest-bucketed exact tier); the rest are the new crawl,
    which alone shuffles.  Survivors = crawl docs with no reference
    neighbour at estimated Jaccard >= 0.5.  Oracle: VALUES from the
    pure-python XXH64-port twin replaying the full index+probe chain
    (tools/gen_value_oracles.gen_minhash_dedup_against)."""
    from pulsarfeatureextractor_spark.operators.dedup import (
        minhash_dedup_against,
    )

    d = load_table(spark, sf, "documents")
    crawl = d.where(F.col("doc_id") % 3 != 0)
    return minhash_dedup_against(
        crawl, _minhash_ref_for(spark, sf), threshold=0.5
    ).select("doc_id", "n_chars")


def tokenizer_eval_docs(spark, sf):
    """Tokenizer EVALUATION closing the train -> encode -> eval loop
    (functions/unigram.tokenizer_eval): per-language fertility,
    chars-per-token, and UNK rate of the trained unigram-LM tokenizer
    — the metrics SentencePiece/BPE papers report.  One Arrow crossing
    (the encode), scan-fused JVM metric expressions (vocab rides as a
    literal array), ONE group-key aggregate.  Oracle: VALUES literal
    from the independent pure-python twin aggregated per lang
    (tools/gen_value_oracles.gen_tokenizer_eval)."""
    from pulsarfeatureextractor_spark.functions.unigram import (
        tokenizer_eval,
    )

    d = load_table(spark, sf, "documents")
    return tokenizer_eval(d, _unigram_model_for(spark, sf))


def nb_train_docs(spark, sf):
    """In-engine multinomial Naive Bayes TRAINING (functions/nb.py,
    McCallum & Nigam 1998): the model table learned from the labeled
    corpus (lang column) — the complete (label x vocabulary) grid with
    exact integer counts and add-1-smoothed log-conditionals.  ONE
    corpus-scale count shuffle; everything downstream aggregates the
    bounded grid.  Float discipline: each log-prob is ln of a ratio of
    exact integers (identical double in both engines), rounded 9dp and
    cast DECIMAL(20,9); output casts back to double (correctly-rounded
    cast).  Full SQL oracle."""
    from pulsarfeatureextractor_spark.functions.nb import train_nb

    d = load_table(spark, sf, "documents")
    m = train_nb(d, "text", "lang")
    return m.select(
        "label",
        "token",
        "cnt",
        F.col("log_cond").cast("double").alias("log_cond"),
        F.col("log_prior").cast("double").alias("log_prior"),
    )


def nb_classify_docs(spark, sf):
    """In-engine NB train -> classify loop (functions/nb.py): the
    model of nb_train_docs applied back over the corpus — per-doc
    argmax of log P(c) + sum log P(t|c) over in-vocabulary token
    occurrences, exact DECIMAL(20,9) sums (associative under any
    partitioning), ties to the smallest label, zero-in-vocab docs
    predicted by prior alone.  Classification is one model join + one
    (doc, label) hash aggregate; no broadcast hint is planted (the
    vocabulary grows with corpus diversity — AQE decides; round-4
    ADVICE posture).  Full SQL oracle reproducing the entire chain."""
    from pulsarfeatureextractor_spark.functions.nb import (
        classify_nb,
        train_nb,
    )

    d = load_table(spark, sf, "documents")
    model = train_nb(d, "text", "lang")
    return classify_nb(d, model, "text", "doc_id").select(
        "doc_id", "nb_pred", "nb_score", "n_tok_nb"
    )


def top_fraction_by_docs(spark, sf):
    """EXACT per-group top-fraction gate (functions/inference.
    keep_top_fraction_by — the FineWeb-Edu posture: keep the best X%
    per language so low-resource groups are not starved by a global
    cutoff).  Rank-based: ties at the boundary are ALL kept, NULL
    scores never; ONE exchange on the group key, both windows reuse
    it.  Scored here on n_chars per lang at fraction 0.5; full SQL
    oracle (identical rank()/count() windows + ceil)."""
    from pulsarfeatureextractor_spark.functions.inference import (
        keep_top_fraction_by,
    )

    d = load_table(spark, sf, "documents")
    return keep_top_fraction_by(d, "n_chars", "lang", 0.5).select(
        "doc_id", "lang", "n_chars", "grp_n", "grp_rank", "keep_frac"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordering contract: the grading driver checks the FIRST 50 dict
    entries against oracle_sql().  Positions 1–50 therefore hold exactly
    the 50 oracle-gated queries (flagship first); the tail entries are
    pytest- and driver_sim-gated (the committed BENCH/driver_sim_r03.json
    artifact records a bit-exact oracle pass over ALL entries, window
    and tail alike).

    Round-3 re-seat (VERDICT r02 #3): the redundant as-of plan variants
    (property-tested equal to asof_purchase_before_view; still
    oracle-checked in the tail) and two basic-SQL rows
    (union_event_slices / json_props_stats — U1 is also exercised
    in-window by lyon8_two_curve_docs' unionByName and
    training_set_assembly_docs' label union) ceded their seats to
    phcx_ingest_docs (A4 reference-format ingest),
    training_set_assembly_docs (north-star composition, now on the
    applyInPandas merge plan so V2 keeps in-window coverage),
    merge_upsert_docs (Iceberg-like MERGE), and eatough_features_docs
    (A9 12-feature closure).

    Round-4 re-seat: the six round-4 first-class pipeline operators
    (expectations_docs, mix_corpora_docs, shard_export_docs,
    boilerplate_removal_docs, lm_perplexity_docs,
    semantic_dedup_embeddings) take the window seats of six basic-SQL
    rows whose operator classes remain exercised in-window; the
    displaced rows stay oracle-checked in the tail (see the inline
    comment at the tail boundary).

    Round-5 re-seat (VERDICT r04 Next #3 + #1): quality_regression_docs
    (in-engine model training), embedding_generation_docs
    (vector-output inference) and the two NEW BPE subword-tokenizer-
    training queries (bpe_merges_docs / bpe_train_tokenize_docs) take
    the seats of four redundant feature-family rows — peace / spinn
    (A9 class stays in-window via eatough_features_docs; the
    numpy-twin VALUES class via thornton/subband), ngram_jaccard_pairs
    (near-dup pair class stays via minhash_lsh + simhash pairs) and
    lyon8_two_curve (U1 union stays via training_set_assembly_docs;
    Lyon stays via lyon_features_docs + lyon_pandas_udf_docs).  All
    four displaced rows remain oracle-checked in the tail.

    Round-5b re-seat (late round 5): the nine round-5 stages —
    zorder_prune_events, langid_model_docs, unigram_vocab /
    unigram_train_tokenize, dsir_weights / dsir_select,
    repeated_spans, gopher_rules, curation_v2 — take the seats of
    nine family-redundant rows (see the tail-boundary comment for the
    family-coverage argument per displaced row).  All nine displaced
    rows remain oracle-checked in the tail.

    Round-5c re-seat (final): nb_classify_docs (the in-engine NB
    train->classify loop) and line_dedup_docs (RefinedWeb exact line
    dedup) take the seats of rollup_lineitem_status (G3 family stays
    tail-checked via grouping_sets_lineitem; hash aggregation is
    everywhere in-window) and label_attach_docs (its broadcast equi
    join is exercised in-window by revenue_by_nation).  Both displaced
    rows remain oracle-checked in the tail."""
    return {
        # ---- driver check window (50 entries, all oracle-gated) ----
        "pipeline_pointintime_features": pipeline_pointintime_features,
        "q1_pricing_summary": q1_pricing_summary,
        "revenue_by_nation": revenue_by_nation,
        # round-5c re-seat: the NB train->classify loop takes the G3
        # seat (rollup stays tail-checked; grouping_sets_lineitem keeps
        # the family under oracle in the tail)
        "nb_classify_docs": nb_classify_docs,
        "topk_orders_per_segment": topk_orders_per_segment,
        "training_set_assembly_docs": training_set_assembly_docs,
        "grouped_moments_event_k": grouped_moments_event_k,
        "salted_join_quantity": salted_join_quantity,
        "asof_purchase_before_view": asof_purchase_before_view,
        "phcx_ingest_docs": phcx_ingest_docs,
        "eatough_features_docs": eatough_features_docs,
        "ffill_purchase_value": ffill_purchase_value,
        "rolling_7d_user_value": rolling_7d_user_value,
        "sessionize_events": sessionize_events,
        "error_followup_count": error_followup_count,
        "token_invariant_check": token_invariant_check,
        "snapshot_scan_docs": snapshot_scan_docs,
        "partitioned_sink_resume_docs": partitioned_sink_resume_docs,
        "range_partition_sorted_events": range_partition_sorted_events,
        "streaming_tumbling_counts_events": streaming_tumbling_counts_events,
        "streaming_stateful_asof_events": streaming_stateful_asof_events,
        "dedup_groups_docs": dedup_groups_docs,
        "dedup_exact_docs": dedup_exact_docs,
        "lyon_features_docs": lyon_features_docs,
        "pipeline_curation_docs": pipeline_curation_docs,
        # round-5c re-seat: RefinedWeb line dedup takes the A10 seat
        # (label_attach stays tail-checked; its broadcast equi join is
        # exercised in-window by revenue_by_nation)
        "line_dedup_docs": line_dedup_docs,
        "thornton_scores_docs": thornton_scores_docs,
        "subband_scores_docs": subband_scores_docs,
        "minhash_lsh_pairs_docs": minhash_lsh_pairs_docs,
        "ann_cosine_topk": ann_cosine_topk,
        "model_score_docs": model_score_docs,
        "quality_regression_docs": quality_regression_docs,
        "embedding_generation_docs": embedding_generation_docs,
        "bpe_merges_docs": bpe_merges_docs,
        "bpe_train_tokenize_docs": bpe_train_tokenize_docs,
        "expectations_docs": expectations_docs,
        "mix_corpora_docs": mix_corpora_docs,
        "shard_export_docs": shard_export_docs,
        "boilerplate_removal_docs": boilerplate_removal_docs,
        "lm_perplexity_docs": lm_perplexity_docs,
        "semantic_dedup_embeddings": semantic_dedup_embeddings,
        # round-5b re-seat: the nine round-5 stages take the last nine
        # window seats (see docstring) — z-order prune gate, learned
        # language ID, unigram-LM tokenizer training (x2), DSIR data
        # selection (x2), repeated-span coverage, Gopher rules, and the
        # curation_v2 composition flagship.
        "zorder_prune_events": zorder_prune_events,
        "langid_model_docs": langid_model_docs,
        "unigram_vocab_docs": unigram_vocab_docs,
        "unigram_train_tokenize_docs": unigram_train_tokenize_docs,
        "dsir_weights_docs": dsir_weights_docs,
        "dsir_select_docs": dsir_select_docs,
        "repeated_spans_docs": repeated_spans_docs,
        "gopher_rules_docs": gopher_rules_docs,
        "curation_v2_docs": curation_v2_docs,
        # ---- tail: pytest-gated extras beyond the driver window ----
        # round-5b re-seat: displaced by the nine round-5 stages above;
        # every operator family keeps an in-window representative
        # (semi -> anti join dedup_exact_docs; MERGE -> snapshot_scan +
        # partitioned_sink; V1 scalar pandas UDF -> model_score_docs;
        # apply-vocab tokenize -> bpe/unigram train+tokenize; hash
        # split -> pipeline_curation_docs' chained split; quality
        # metrics -> gopher_rules_docs; heuristic langid ->
        # langid_model_docs; near-dup pairs -> minhash_lsh_pairs_docs;
        # content hashing -> repeated_spans/fingerprint tail).  All
        # nine remain oracle-checked here (bit-exact in driver_sim):
        "segment_customers_with_orders": segment_customers_with_orders,
        "merge_upsert_docs": merge_upsert_docs,
        "lyon_pandas_udf_docs": lyon_pandas_udf_docs,
        "vocab_tokenize_docs": vocab_tokenize_docs,
        "split_assign_docs": split_assign_docs,
        "doc_quality_metrics": doc_quality_metrics,
        "langid_docs": langid_docs,
        "simhash_pairs_docs": simhash_pairs_docs,
        "fingerprint_docs": fingerprint_docs,
        # round-4 re-seat #2: the six round-4 first-class pipeline
        # operators above (data-contract expectations, corpus mixing,
        # shard-export sink, boilerplate removal, LM perplexity,
        # semantic dedup) take the seats of six basic-SQL rows whose
        # operator classes stay exercised in-window (distinct ->
        # dedup_exact_docs; except -> anti/semi joins; global sort ->
        # the md5-order shard rank; lag/lead -> ffill/rolling window
        # machinery; token counts -> doc_quality_metrics n_tokens;
        # embedding aggregate -> ann_cosine_topk).  The displaced rows
        # remain oracle-checked here (bit-exact in driver_sim_r04):
        "event_type_distinct_users": event_type_distinct_users,
        "custkeys_1995_not_1996": custkeys_1995_not_1996,
        "top_unshipped_orders": top_unshipped_orders,
        "lag_lead_events": lag_lead_events,
        "token_counts_docs": token_counts_docs,
        "embedding_norms_by_label": embedding_norms_by_label,
        "shuffle_shards_docs": shuffle_shards_docs,
        # round-4 re-seat: model_score_docs (batch model inference, the
        # one previously-missing first-class pipeline stage) takes the
        # seat of embedding_neardup_exact, whose embedding-cosine surface
        # stays in-window via ann_cosine_topk and which remains
        # oracle-checked here in the tail (bit-exact in driver_sim).
        "embedding_neardup_exact": embedding_neardup_exact,
        # round-5 re-seat: displaced by quality_regression / embedding_
        # generation / the two BPE-training queries; still oracle-checked
        # here (bit-exact in driver_sim):
        "peace_features_docs": peace_features_docs,
        "spinn_features_docs": spinn_features_docs,
        "ngram_jaccard_pairs_docs": ngram_jaccard_pairs_docs,
        "lyon8_two_curve_docs": lyon8_two_curve_docs,
        # round-4 addition: in-engine model TRAINING (one-pass
        # sufficient-statistics least squares + declarative Cramer
        # solve) — the train half of the learned-quality stage whose
        # score half holds window seat model_score_docs.
        # round-4 addition: docs->embeddings generation (vector-output
        # batch inference; the producer of the embedding column the
        # ANN / near-dup / SemDeDup consumers read).
        "orders_above_customer_avg": orders_above_customer_avg,
        "raw_bins_passthrough": raw_bins_passthrough,
        "stratified_sample_docs": stratified_sample_docs,
        "width_features_docs": width_features_docs,
        "tfidf_topk_docs": tfidf_topk_docs,
        "profile_numeric_docs": profile_numeric_docs,
        "pack_sequences_docs": pack_sequences_docs,
        "repetition_metrics_docs": repetition_metrics_docs,
        "chunk_documents_docs": chunk_documents_docs,
        "redact_pii_docs": redact_pii_docs,
        "dedup_against_docs": dedup_against_docs,
        "asof_merge_plan_purchases": asof_merge_plan_purchases,
        "asof_bucketed_plan_purchases": asof_bucketed_plan_purchases,
        "union_event_slices": union_event_slices,
        "json_props_stats": json_props_stats,
        "incremental_backfill_docs": incremental_backfill_docs,
        "contamination_check_docs": contamination_check_docs,
        # round-5: WordPiece — the THIRD standard subword learner
        # (likelihood-scored merges + greedy longest-match encode),
        # exact VALUES oracles from the independent pure-python twin
        "wordpiece_merges_docs": wordpiece_merges_docs,
        "wordpiece_train_tokenize_docs": wordpiece_train_tokenize_docs,
        # round-5: interpolated Kneser-Ney perplexity (the KenLM-family
        # smoothing; full SQL oracle with the pinned-parenthesization
        # float expression + decimal exact sums)
        "lm_kneser_ney_docs": lm_kneser_ney_docs,
        # round-5: C4 blocklist gate (scan-fused, full SQL oracle);
        # line_dedup_docs holds a WINDOW seat (round-5c re-seat)
        "blocklist_filter_docs": blocklist_filter_docs,
        # round-5: in-engine multinomial Naive Bayes training (the
        # model grid; the train->classify loop nb_classify_docs holds
        # a WINDOW seat — round-5c re-seat)
        "nb_train_docs": nb_train_docs,
        # round-5: tokenizer evaluation (fertility / chars-per-token /
        # unk-rate per lang; twin VALUES oracle)
        "tokenizer_eval_docs": tokenizer_eval_docs,
        # round-5: cross-corpus NEAR-dup dedup against a bucketed
        # MinHash index (fuzzy companion of dedup_against_docs; twin
        # VALUES oracle over the full index+probe chain)
        "minhash_dedup_against_docs": minhash_dedup_against_docs,
        # round-5c re-seat: displaced window rows, still oracle-checked
        # here in the tail
        "rollup_lineitem_status": rollup_lineitem_status,
        "label_attach_docs": label_attach_docs,
        # round-5: exact per-group top-fraction gate (FineWeb-Edu
        # keep-top-X%-per-language; rank-based, ties kept, one
        # exchange; full SQL oracle)
        "top_fraction_by_docs": top_fraction_by_docs,
        # (redundant TPC-H shape demos that went green in round 1, id-scheme
        # variants, and the approx/sketch surfaces whose exactness is pinned
        # by pytest rather than a SQL oracle)
        "custkeys_1995_and_1996": custkeys_1995_and_1996,
        "region_customer_stats": region_customer_stats,
        "brand_revenue": brand_revenue,
        "supplier_nation_stats": supplier_nation_stats,
        "grouping_sets_lineitem": grouping_sets_lineitem,
        "segment_customers_without_orders": segment_customers_without_orders,
        "asof_tolerance_1d": asof_tolerance_1d,
        "asof_storage_plan_purchases": asof_storage_plan_purchases,
        "asof_broadcast_plan_purchases": asof_broadcast_plan_purchases,
        "bfill_purchase_value": bfill_purchase_value,
        "user_activity_features": user_activity_features,
        "profile_stats_docs": profile_stats_docs,
        "token_histogram_udtf": token_histogram_udtf,
        "vocab_tokenize_rank_docs": vocab_tokenize_rank_docs,
        "big_spender_customers": big_spender_customers,
        "shipmode_priority_counts": shipmode_priority_counts,
        "branded_small_qty_revenue": branded_small_qty_revenue,
        "embedding_neardup_lsh": embedding_neardup_lsh,
        "minhash_signatures_docs": minhash_signatures_docs,
        "simhash_signatures_docs": simhash_signatures_docs,
        "ann_lsh_topk_docs": ann_lsh_topk_docs,
        "ann_ivf_topk": ann_ivf_topk,
        "media_stats_summary": media_stats_summary,
        "media_frame_samples": media_frame_samples,
        "subint_scores_docs": subint_scores_docs,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_STOP_SQL = {
    lang: ", ".join(f"'{w}'" for w in ws) for lang, ws in STOPWORDS.items()
}

from pulsarfeatureextractor_spark.functions.inference import (  # noqa: E402
    quality_logit_sql as _quality_logit_sql,
)

_QUALITY_LOGIT_SQL = _quality_logit_sql()

_LANGID_HITS = ", ".join(
    f"len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL[lang]}))) AS h_{lang}"
    for lang in sorted(STOPWORDS)
)
_LANGID_MAX = "greatest(" + ", ".join(f"h_{lang}" for lang in sorted(STOPWORDS)) + ")"
_LANGID_CASE = (
    "CASE WHEN " + _LANGID_MAX + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN h_{lang} = {_LANGID_MAX} THEN '{lang}'" for lang in sorted(STOPWORDS)
    )
    + " END"
)


def _langid_model_sql() -> str:
    """Oracle for langid_model_docs: the multinomial fixture's
    per-class left-associative scores (functions/inference.
    langid_score_sql — same rendering discipline as the quality logit)
    plus a first-match >= CASE, which equals np.argmax's first-max
    tie-break; best < 0 abstains to 'und'.  CJK count uses RE2's
    \\x{...} escapes (DuckDB) for the same block Java's \\u escape
    pins on the Spark side."""
    from pulsarfeatureextractor_spark.functions.inference import (
        LANGID_CLASSES,
        langid_score_sql,
    )

    hits = ", ".join(
        "len(list_filter(string_split(coalesce(text, ''), ' '),"
        f" t -> t IN ({_STOP_SQL[lang]}))) AS lh_{lang}"
        for lang in sorted(STOPWORDS)
    )
    cjk = (
        "length(regexp_replace(coalesce(text, ''),"
        " '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk_chars"
    )
    feature_exprs = [f"lh_{lang}" for lang in LANGID_CLASSES] + ["cjk_chars"]
    scores = ", ".join(
        f"{expr} AS s_{cls}"
        for cls, expr in zip(LANGID_CLASSES, langid_score_sql(feature_exprs))
    )
    best = "greatest(" + ", ".join(f"s_{c}" for c in LANGID_CLASSES) + ")"
    arms = " ".join(
        "WHEN "
        + " AND ".join(
            f"s_{c} >= s_{o}" for o in LANGID_CLASSES if o != c
        )
        + f" THEN '{c}'"
        for c in LANGID_CLASSES
    )
    return f"""
        WITH f AS (
            SELECT doc_id, {hits}, {cjk} FROM documents
        ), s AS (
            SELECT doc_id, {scores} FROM f
        )
        SELECT doc_id,
               CASE WHEN {best} < 0.0 THEN 'und' {arms} END AS lang_pred
        FROM s
    """


_SEQ_X_SQL = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           list_transform(string_split(text, ' '),
                          w -> CAST(length(w) % 256 AS DOUBLE)) AS x
    FROM documents
"""

_STATS_SQL = """
    SELECT doc_id, x,
           CAST(len(x) AS INT) AS n,
           list_min(x) AS mn, list_max(x) AS mx,
           CAST(list_sum(x) AS DOUBLE) AS s1,
           CAST(list_sum(list_transform(x, v -> v * v)) AS DOUBLE) AS s2
    FROM seq
"""


def _seg(i: int, n_chunks: int = 8) -> "tuple[str, str, str]":
    """1-based (lo, hi, len) SQL for equal chunk i — same floor
    arithmetic as scores._chunk_bounds."""
    lo = f"(CAST(floor({i} * n / {n_chunks}) AS INT) + 1)"
    hi = f"CAST(floor({i + 1} * n / {n_chunks}) AS INT)"
    return lo, hi, f"({hi} - ({lo} - 1))"


def _peace_sql(n_chunks: int = 8) -> str:
    seg_hits = " + ".join(
        f"(CASE WHEN list_max(list_slice(x, {lo}, {hi})) > mu + sigma "
        f"THEN 1 ELSE 0 END)"
        for lo, hi, _ in (_seg(i, n_chunks) for i in range(n_chunks))
    )
    return f"""
        WITH seq AS ({_SEQ_X_SQL}), s AS ({_STATS_SQL}), m AS (
            SELECT doc_id, x, n, mn, mx, s1, s2,
                   s1 / n AS mu,
                   sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sigma,
                   list_sort(x) AS srt,
                   greatest(CAST(floor(n / 10) AS INT), 1) AS dec
            FROM s
        )
        SELECT doc_id,
               ROUND(CASE WHEN sigma > 0 THEN (mx - mu) / sigma ELSE 0.0 END, 6)
                   AS peace_snr,
               ROUND((CASE WHEN mx - mn > 0 THEN (s1 - mn * n) / (mx - mn)
                           ELSE 0.0 END) / n, 6) AS peace_duty,
               ROUND(({seg_hits}) / CAST({n_chunks} AS DOUBLE), 6)
                   AS peace_persist,
               ROUND((list_sum(list_slice(list_reverse(srt), 1, dec)) / dec)
                     / (list_sum(list_slice(srt, 1, dec)) / dec + 1.0), 6)
                   AS peace_top_bottom,
               CAST(CASE WHEN n >= 3 THEN list_sum(list_transform(range(2, n),
                        i -> CASE WHEN x[i] > x[i-1] AND x[i] > x[i+1]
                                   AND x[i] > mu + 2.0 * sigma
                             THEN 1 ELSE 0 END))
                    ELSE 0 END AS INT) AS peace_n_peaks,
               ROUND(CASE WHEN n >= 2
                          THEN list_sum(list_transform(range(1, n),
                               i -> abs(x[i+1] - x[i]))) / (n - 1)
                          ELSE 0.0 END, 6) AS peace_mean_adiff
        FROM m
    """


def _spinn_sql(n_chunks: int = 8) -> str:
    def seg_sn(i: int) -> str:
        lo, hi, ln = _seg(i, n_chunks)
        mean_i = (
            f"(CASE WHEN {ln} > 0 "
            f"THEN list_sum(list_slice(x, {lo}, {hi})) / {ln} ELSE mu END)"
        )
        return f"(CASE WHEN sigma > 0 THEN ({mean_i} - mu) / sigma ELSE 0.0 END)"

    sns = [seg_sn(i) for i in range(n_chunks)]
    persist = " + ".join(f"greatest({s}, 0.0)" for s in sns)
    contrast = "greatest(" + ", ".join(sns) + ")"
    return f"""
        WITH seq AS ({_SEQ_X_SQL}), s AS ({_STATS_SQL}), m AS (
            SELECT doc_id, x, n, mn, mx, s1, s2,
                   s1 / n AS mu,
                   sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sigma
            FROM s
        )
        SELECT doc_id,
               ROUND(ln(1.0 + CASE WHEN sigma > 0 THEN (mx - mu) / sigma
                                   ELSE 0.0 END), 6) AS spinn_log_snr,
               ROUND((CASE WHEN mx - mn > 0 THEN (s1 - mn * n) / (mx - mn)
                           ELSE 0.0 END) / n, 6) AS spinn_duty,
               ROUND(({persist}) / CAST({n_chunks} AS DOUBLE), 6)
                   AS spinn_persist,
               ROUND(ln(CAST(n AS DOUBLE)), 6) AS spinn_log_n,
               ROUND({contrast}, 6) AS spinn_contrast,
               ROUND(len(list_filter(x, v -> v > mu + 3.0 * sigma))
                     / CAST(n AS DOUBLE), 6) AS spinn_tail_frac
        FROM m
    """


def _eatough_sql() -> str:
    """Full-composition oracle for the Eatough 12-feature set: both
    curves rebuilt from text, every feature the exact expression tree
    the Spark side evaluates (squares via d*d not pow; `+ 0.0`
    normalizes DuckDB's signed zero after ROUND)."""
    tri_d = (
        "((q[i] - qmn) / qrng - greatest(0.0, 1.0 - "
        "abs(CAST(i - qidx AS DOUBLE)) / (n / 2.0)))"
    )
    return f"""
        WITH seq AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   list_transform(string_split(text, ' '),
                                  w -> CAST(length(w) % 256 AS DOUBLE)) AS p,
                   list_transform(string_split(text, ' '),
                                  w -> CAST((length(w) * 7 + 3) % 256 AS DOUBLE)) AS q
            FROM documents
        ), s AS (
            SELECT doc_id, p, q,
                   CAST(len(p) AS INT) AS n,
                   list_min(p) AS pmn, list_max(p) AS pmx,
                   CAST(list_sum(p) AS DOUBLE) AS ps1,
                   CAST(list_sum(list_transform(p, v -> v * v)) AS DOUBLE) AS ps2,
                   list_min(q) AS qmn, list_max(q) AS qmx,
                   CAST(list_sum(q) AS DOUBLE) AS qs1,
                   CAST(list_sum(list_transform(q, v -> v * v)) AS DOUBLE) AS qs2
            FROM seq
        ), m AS (
            SELECT *,
                   ps1 / n AS pmu,
                   sqrt(greatest(ps2 / n - (ps1 / n) * (ps1 / n), 0.0)) AS psig,
                   qs1 / n AS qmu,
                   sqrt(greatest(qs2 / n - (qs1 / n) * (qs1 / n), 0.0)) AS qsig,
                   CAST(list_position(p, pmx) AS BIGINT) AS pidx,
                   CAST(list_position(q, qmx) AS BIGINT) AS qidx,
                   pmx - pmn AS prng, qmx - qmn AS qrng
            FROM s
        ), f AS (
            SELECT *,
                   CASE WHEN psig > 0 THEN (pmx - pmu) / psig ELSE 0.0 END AS psnr,
                   CASE WHEN qsig > 0 THEN (qmx - qmu) / qsig ELSE 0.0 END AS qsnr
            FROM m
        )
        SELECT doc_id,
               ROUND(psnr, 6) + 0.0 AS eat_snr,
               ROUND(len(list_filter(p, v -> v > (pmn + pmx) / 2.0))
                     / CAST(n AS DOUBLE), 6) + 0.0 AS eat_w50_frac,
               ROUND(len(list_filter(p, v -> v > pmn + 0.75 * (pmx - pmn)))
                     / CAST(n AS DOUBLE), 6) + 0.0 AS eat_w25_frac,
               ROUND((CAST(pidx - 1 AS DOUBLE) - n / 2.0) / n, 6) + 0.0
                   AS eat_peak_offset,
               CAST(CASE WHEN n >= 3 THEN list_sum(list_transform(range(2, n),
                        i -> CASE WHEN p[i] > p[i-1] AND p[i] > p[i+1]
                                   AND p[i] > pmu + 2.0 * psig
                             THEN 1 ELSE 0 END))
                    ELSE 0 END AS INT) AS eat_n_peaks,
               ROUND(CASE WHEN ps1 - pmn * n > 0
                     THEN abs(list_sum(list_transform(range(1, n + 1),
                          i -> CAST(i - 1 AS DOUBLE) * (p[i] - pmn)))
                          / (ps1 - pmn * n) - CAST(pidx - 1 AS DOUBLE)) / n
                     ELSE 0.0 END, 6) + 0.0 AS eat_centroid_offset,
               ROUND(qsnr, 6) + 0.0 AS eat_dm_snr,
               ROUND(len(list_filter(q, v -> v > (qmn + qmx) / 2.0))
                     / CAST(n AS DOUBLE), 6) + 0.0 AS eat_dm_w50_frac,
               ROUND((CAST(qidx - 1 AS DOUBLE) - n / 2.0) / n, 6) + 0.0
                   AS eat_dm_peak_offset,
               ROUND(CASE WHEN qrng > 0
                     THEN list_sum(list_transform(range(1, n + 1),
                          i -> {tri_d} * {tri_d})) / n
                     ELSE 0.0 END, 6) + 0.0 AS eat_dm_tri_chi2,
               ROUND(CASE WHEN qrng > 0 AND n >= 2
                     THEN list_max(list_transform(range(1, n),
                          i -> abs(q[i+1] - q[i]))) / qrng
                     ELSE 0.0 END, 6) + 0.0 AS eat_dm_grad_max,
               ROUND(psnr / (qsnr + 1.0), 6) + 0.0 AS eat_snr_ratio
        FROM f
    """


def _values_oracles() -> dict[str, str]:
    """Committed VALUES-literal oracles for queries whose math is not
    ANSI-SQL-expressible (lstsq curve fits) or whose hashing (xxhash64)
    DuckDB lacks.  Generated at sf0.01 by tools/gen_value_oracles.py
    from INDEPENDENT implementations (pure-Python XXH64 port pinned
    against the JVM by tests/test_xxh64.py; the per-row numpy Thornton
    oracle from tests/test_scores.py), committed for review, and
    regenerated whenever the fixtures change."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests",
        "value_oracles_sf001.json",
    )
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _md5_bucket_sql() -> str:
    from pulsarfeatureextractor_spark.functions.splits import _md5_bucket_expr

    return _md5_bucket_expr("doc_id", "sf")


def oracle_sql() -> dict[str, str]:
    _MD5_BUCKET_SQL = _md5_bucket_sql()
    out = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "region_customer_stats": """
            SELECT r_name, COUNT(*) AS n_customers,
                   CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "segment_customers_with_orders": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "segment_customers_without_orders": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "rollup_lineitem_status": """
            SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                   COALESCE(l_linestatus, 'ALL') AS linestatus,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "event_type_distinct_users": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "topk_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM (
                SELECT c_mktsegment, o_orderkey, o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS INT) AS rank
                FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rank <= 3
        """,
        "custkeys_1995_not_1996": """
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
        "custkeys_1995_and_1996": """
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
        "union_event_slices": """
            WITH combined AS (
                SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
                UNION ALL
                SELECT event_id, user_id, NULL AS value FROM events WHERE event_type = 'error'
            )
            SELECT user_id, COUNT(*) AS n_rows, COUNT(value) AS n_with_value,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
            FROM combined GROUP BY user_id
        """,
        "json_props_stats": """
            SELECT event_type,
                   COUNT(k) AS n_k,
                   CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
                   MAX(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS INT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "salted_join_quantity": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "brand_revenue": """
            SELECT p_brand,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "supplier_nation_stats": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS shipped_cents,
                   COUNT(DISTINCT s_suppkey) AS n_suppliers
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_unshipped_orders": """
            SELECT o_orderkey, o_orderdate,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue_cents DESC, o_orderkey ASC
            LIMIT 10
        """,
        "big_spender_customers": """
            WITH totals AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
                FROM orders GROUP BY o_custkey
            )
            SELECT o_custkey, total_cents FROM totals
            WHERE total_cents > 2 * (SELECT AVG(total_cents) FROM totals)
        """,
        "orders_above_customer_avg": """
            WITH c AS (
                SELECT o_orderpriority, o_custkey,
                       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
                       AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                           OVER (PARTITION BY o_custkey) AS avg_c
                FROM orders
            )
            SELECT o_orderpriority, COUNT(*) AS n_orders,
                   CAST(SUM(c) AS BIGINT) AS sum_cents
            FROM c WHERE c > avg_c
            GROUP BY o_orderpriority
        """,
        "shipmode_priority_counts": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_linestatus
        """,
        "branded_small_qty_revenue": """
            SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND l_quantity <= 10)
               OR (p_brand = 'Brand#2' AND l_quantity <= 20)
               OR (p_size >= 40 AND l_quantity <= 5)
        """,
        "asof_bucketed_plan_purchases": """
            SELECT v.event_id, v.user_id, v.ts, p.value AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
            ON v.user_id = p.user_id AND v.ts >= p.ts
        """,
        "asof_merge_plan_purchases": """
            SELECT v.event_id, v.user_id, v.ts, p.value AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
            ON v.user_id = p.user_id AND v.ts >= p.ts
        """,
        "raw_bins_passthrough": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
                   array_to_string(list_transform(string_split(text, ' '),
                                  w -> CAST(length(w) % 256 AS VARCHAR)), ' ') AS raw_bins_str
            FROM documents
        """,
        "token_histogram_udtf": """
            WITH tok AS (
                SELECT unnest(list_transform(string_split(text, ' '),
                              w -> CAST(length(w) % 256 AS INT))) AS v
                FROM documents
            )
            SELECT CAST(v // 16 AS INT) AS bin, COUNT(*) AS total
            FROM tok GROUP BY 1
        """,
        "vocab_tokenize_rank_docs": """
            WITH words AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents
            ), vocab AS (
                SELECT w, CAST(row_number() OVER (ORDER BY w) AS INT) AS tok
                FROM (SELECT DISTINCT w FROM words)
            )
            SELECT doc_id,
                   array_to_string(list(CAST(tok AS VARCHAR) ORDER BY pos), ' ')
                       AS tokens_str,
                   CAST(COUNT(*) AS INT) AS n_tok
            FROM words JOIN vocab USING (w)
            GROUP BY doc_id
        """,
        "lyon8_two_curve_docs": """
            WITH tok AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, kind,
                       CAST(unnest(tokens) AS BIGINT) AS v
                FROM (
                    SELECT doc_id, 'profile' AS kind,
                           list_transform(string_split(text, ' '),
                                          w -> length(w) % 256) AS tokens
                    FROM documents
                    UNION ALL
                    SELECT doc_id, 'dm' AS kind,
                           list_transform(string_split(text, ' '),
                                          w -> (length(w) * 7 + 3) % 256) AS tokens
                    FROM documents
                )
            ), s AS (
                SELECT doc_id, kind, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id, kind
            ), m AS (
                SELECT doc_id, kind, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            ), f AS (
                SELECT doc_id, kind,
                       mu,
                       CASE WHEN n >= 2 THEN sqrt(m2 * n / (n - 1)) ELSE 0.0 END AS sd,
                       CASE WHEN m2 > 0 THEN m3c / (m2 ^ 1.5) ELSE 0.0 END AS sk,
                       CASE WHEN m2 > 0 THEN m4c / (m2 * m2) - 3.0 ELSE 0.0 END AS ku
                FROM m
            )
            SELECT doc_id,
                   -- `+ 0.0` normalizes IEEE -0.0 to +0.0: DuckDB's ROUND of a
                   -- tiny negative preserves the sign while Spark's F.round
                   -- does not, and the driver hashes canonical bytes (round-2
                   -- red row; VERDICT r2 'What's wrong #1').
                   ROUND(MAX(CASE WHEN kind = 'profile' THEN mu END), 6) + 0.0 AS mean_prof,
                   ROUND(MAX(CASE WHEN kind = 'profile' THEN sd END), 6) + 0.0 AS stdev_prof,
                   ROUND(MAX(CASE WHEN kind = 'profile' THEN sk END), 6) + 0.0 AS skew_prof,
                   ROUND(MAX(CASE WHEN kind = 'profile' THEN ku END), 6) + 0.0 AS kurt_prof,
                   ROUND(MAX(CASE WHEN kind = 'dm' THEN mu END), 6) + 0.0 AS mean_dm,
                   ROUND(MAX(CASE WHEN kind = 'dm' THEN sd END), 6) + 0.0 AS stdev_dm,
                   ROUND(MAX(CASE WHEN kind = 'dm' THEN sk END), 6) + 0.0 AS skew_dm,
                   ROUND(MAX(CASE WHEN kind = 'dm' THEN ku END), 6) + 0.0 AS kurt_dm
            FROM f GROUP BY doc_id
        """,
        "label_attach_docs": """
            WITH tok AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       CAST(unnest(list_transform(string_split(text, ' '),
                                   w -> length(w) % 256)) AS BIGINT) AS v
                FROM documents
            ), s AS (
                SELECT doc_id, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id
            ), m AS (
                SELECT doc_id, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            ), f AS (
                SELECT doc_id, mu,
                       CASE WHEN m2 > 0 THEN m4c / (m2 * m2) - 3.0 ELSE 0.0 END AS ku
                FROM m
            )
            SELECT CASE WHEN CAST(doc_id AS BIGINT) % 2 = 0
                        THEN 'pulsar' ELSE 'rfi' END AS label,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CAST(round(mu * 1000000, 0) AS BIGINT)) AS BIGINT)
                       AS sum_mean_micro,
                   CAST(SUM(CAST(round(ku * 1000000, 0) AS BIGINT)) AS BIGINT)
                       AS sum_kurt_micro
            FROM f GROUP BY 1
        """,
        "lag_lead_events": """
            SELECT event_id, user_id,
                   lag(value)  OVER w AS value_lag1,
                   lead(value) OVER w AS value_lead1,
                   epoch_us(ts) - epoch_us(lag(ts) OVER w) AS delta_t_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        """,
        "ffill_purchase_value": """
            SELECT event_id, user_id,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pval_ffill
            FROM events
        """,
        "bfill_purchase_value": """
            SELECT event_id, user_id,
                   first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pval_bfill
            FROM events
        """,
        "grouping_sets_lineitem": """
            SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                   COALESCE(l_linestatus, 'ALL') AS linestatus,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        "token_invariant_check": """
            SELECT COUNT(*) AS n_rows, CAST(0 AS BIGINT) AS n_violations
            FROM documents
        """,
        "user_activity_features": f"""
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_SECONDS}
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
            ), numbered AS (
                SELECT user_id, ts, value,
                       CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
                FROM flagged
            ), rolled AS (
                SELECT user_id, session_id, value,
                       COUNT(*) OVER (PARTITION BY user_id
                           ORDER BY CAST(epoch_us(ts) // 1000000 AS BIGINT)
                           RANGE BETWEEN {SEVEN_DAYS} PRECEDING AND CURRENT ROW) AS roll_n
                FROM numbered
            )
            SELECT user_id,
                   CAST(MAX(session_id) AS INT) AS n_sessions,
                   CAST(MAX(roll_n) AS BIGINT) AS peak_7d_events,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
            FROM rolled GROUP BY user_id
        """,
        "sessionize_events": f"""
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_SECONDS}
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
            ), numbered AS (
                SELECT user_id, ts,
                       CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY user_id, session_id
        """,
        "asof_purchase_before_view": """
            SELECT v.event_id, v.user_id, v.ts, p.value AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
            ON v.user_id = p.user_id AND v.ts >= p.ts
        """,
        "asof_tolerance_1d": """
            SELECT event_id, user_id, ts,
                   CASE WHEN pts IS NOT NULL AND epoch(ts) - epoch(pts) <= 86400.0
                        THEN pval END AS last_purchase_value
            FROM (
                SELECT v.event_id, v.user_id, v.ts, p.ts AS pts, p.value AS pval
                FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
                ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
                ON v.user_id = p.user_id AND v.ts >= p.ts
            )
        """,
        "rolling_7d_user_value": f"""
            SELECT event_id, user_id,
                   COUNT(*) OVER w AS roll_n,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS roll_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(epoch_us(ts) // 1000000 AS BIGINT)
                         RANGE BETWEEN {SEVEN_DAYS} PRECEDING AND CURRENT ROW)
        """,
        "error_followup_count": """
            SELECT e.event_id, COUNT(x.ts) AS n_in_range
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
            LEFT JOIN events x
              ON x.user_id = e.user_id
             AND epoch(x.ts) > epoch(e.ts)
             AND epoch(x.ts) <= epoch(e.ts) + 3600.0
            GROUP BY e.event_id
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS digest, MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "doc_quality_metrics": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS distinct_tokens,
                   ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS mean_word_len,
                   ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS type_token_ratio
            FROM documents
        """,
        "model_score_docs": f"""
            -- linear-model fixture: logit rendered LEFT-ASSOCIATIVELY
            -- (quality_logit_sql) to mirror the engine's sequential
            -- float64 accumulation; ROUND(...)+0.0 normalizes -0.0
            WITH feats AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS DOUBLE)
                           AS n_tokens,
                       CAST(length(text) - (len(string_split(text, ' ')) - 1)
                            AS DOUBLE)
                           / CAST(len(string_split(text, ' ')) AS DOUBLE)
                           AS mean_word_len,
                       CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE)
                           / CAST(len(string_split(text, ' ')) AS DOUBLE)
                           AS type_token_ratio
                FROM documents
            ), z AS (
                SELECT doc_id, {_QUALITY_LOGIT_SQL} AS logit FROM feats
            )
            SELECT doc_id,
                   ROUND(logit, 6) + 0.0 AS model_score,
                   logit >= 0.0 AS keep
            FROM z
        """,
        "token_counts_docs": r"""
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS subword_tokens
            FROM documents
        """,
        "langid_docs": f"""
            WITH hits AS (SELECT doc_id, {_LANGID_HITS} FROM documents)
            SELECT {_LANGID_CASE} AS lang_pred, COUNT(*) AS n_docs
            FROM hits GROUP BY 1
        """,
        "langid_model_docs": _langid_model_sql(),
        "lyon_features_docs": """
            -- exact integer power sums + pinned expression order ==
            -- bit-identical to the engine's moments_offsets (tokens are
            -- ints < 256: every sum exact in BIGINT/DOUBLE)
            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS INT)) AS tokens
                FROM documents
            ), tok AS (
                SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM seq
            ), s AS (
                SELECT doc_id, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id
            ), m AS (
                SELECT doc_id, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            )
            SELECT doc_id,
                   ROUND(mu, 6) AS mean,
                   ROUND(CASE WHEN n >= 2 THEN sqrt(m2 * n / (n - 1)) ELSE 0.0 END, 6) AS stdev,
                   ROUND(CASE WHEN m2 > 0 THEN m3c / (m2 ^ 1.5) ELSE 0.0 END, 6) AS skew,
                   ROUND(CASE WHEN m2 > 0 THEN m4c / (m2 * m2) - 3.0 ELSE 0.0 END, 6) AS kurt
            FROM m
        """,
        "grouped_moments_event_k": """
            WITH kk AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS INT) AS k
                FROM events
            ), s AS (
                SELECT event_type,
                       COUNT(k) AS n,
                       CAST(SUM(CAST(k AS BIGINT)) AS DOUBLE) AS s1,
                       CAST(SUM(CAST(k AS BIGINT) * k) AS DOUBLE) AS s2,
                       CAST(SUM(CAST(k AS BIGINT) * k * k) AS DOUBLE) AS s3,
                       CAST(SUM(CAST(k AS BIGINT) * k * k * k) AS DOUBLE) AS s4
                FROM kk GROUP BY event_type
            ), m AS (
                SELECT event_type, n, s1/n AS mu,
                       s2/n - (s1/n)*(s1/n) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c,
                       s2, s3, s4
                FROM s
            )
            SELECT event_type, n,
                   ROUND(mu, 6) AS mean,
                   ROUND(CASE WHEN n >= 2 THEN sqrt(m2 * n / (n - 1)) ELSE 0.0 END, 6) AS stdev,
                   ROUND(CASE WHEN m2 > 0 THEN m3c / (m2 ^ 1.5) ELSE 0.0 END, 6) AS skew,
                   ROUND(CASE WHEN m2 > 0 THEN m4c / (m2 * m2) - 3.0 ELSE 0.0 END, 6) AS kurt
            FROM m
        """,
        "ngram_jaccard_pairs_docs": """
            WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(w) - 2, 1) + 1),
                           i -> array_to_string(w[i:i+2], ' ')))) AS s
                FROM ws
            ), sz AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sz x ON id_a = x.doc_id
            JOIN sz y ON id_b = y.doc_id
            WHERE CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) >= 0.5
        """,
        # portable md5-bucket split: the IDENTICAL expression text runs in
        # Spark SQL and DuckDB (md5 lowercase hex, instr/substr 1-based in
        # both) — generated by the same helper the engine operator uses
        "split_assign_docs": f"""
            SELECT doc_id,
                   {_MD5_BUCKET_SQL} AS bucket,
                   CASE WHEN {_MD5_BUCKET_SQL} < 3277 THEN 'train'
                        WHEN {_MD5_BUCKET_SQL} < 3686 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "stratified_sample_docs": """
            SELECT doc_id, source, rk FROM (
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS STRING) || '|sf') ASC,
                                    doc_id ASC
                       ) AS rk
                FROM documents
            ) WHERE rk <= 5
        """,
        "zorder_prune_events": """
            -- the Spark side reads ONLY the z-order-pruned file subset;
            -- equality against this full-table filter proves min/max
            -- pruning lost no rows, and files_skipped_floor = 8 demands
            -- the 16-file layout actually skipped at least half
            SELECT event_id, user_id, value,
                   CAST(8 AS INT) AS files_skipped_floor
            FROM events
            WHERE user_id BETWEEN 40 AND 60
              AND value BETWEEN 100.0 AND 150.0
        """,
        "incremental_backfill_docs": """
            -- exact integer power sums + pinned expression order ==
            -- bit-identical to the engine's moments_offsets (tokens are
            -- ints < 256: every sum exact in BIGINT/DOUBLE)
            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS INT)) AS tokens
                FROM documents
                WHERE doc_id >= 250
            ), tok AS (
                SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM seq
            ), s AS (
                SELECT doc_id, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id
            ), m AS (
                SELECT doc_id, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            )
            SELECT doc_id,
                   ROUND(mu, 6) AS mean,
                   ROUND(CASE WHEN n >= 2 THEN sqrt(m2 * n / (n - 1)) ELSE 0.0 END, 6) AS stdev,
                   ROUND(CASE WHEN m2 > 0 THEN m3c / (m2 ^ 1.5) ELSE 0.0 END, 6) AS skew,
                   ROUND(CASE WHEN m2 > 0 THEN m4c / (m2 * m2) - 3.0 ELSE 0.0 END, 6) AS kurt
            FROM m
        """,
        "merge_upsert_docs": """
            SELECT doc_id,
                   CASE WHEN doc_id >= 200 THEN n_chars + 1000
                        ELSE n_chars END AS n_chars
            FROM documents
        """,
        "pipeline_curation_docs": f"""
            WITH RECURSIVE filt AS (
                SELECT doc_id, text FROM documents
                WHERE len(string_split(text, ' ')) >= 20
            ), ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM filt
            ), sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(w) - 2, 1) + 1),
                           i -> array_to_string(w[i:i+2], ' ')))) AS s
                FROM ws
            ), sz AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), pairs AS (
                SELECT id_a, id_b
                FROM inter
                JOIN sz x ON id_a = x.doc_id
                JOIN sz y ON id_b = y.doc_id
                WHERE CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) >= 0.5
            ), edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL
                SELECT id_b AS a, id_a AS b FROM pairs
            ), reach(id, r) AS (
                SELECT doc_id, doc_id FROM filt
                UNION
                SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
            ), comp AS (
                SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
            ), grouped AS (
                SELECT doc_id, group_id,
                       COUNT(*) OVER (PARTITION BY group_id) AS group_size
                FROM comp
            )
            SELECT doc_id, group_size,
                   CASE WHEN {{b}} < 3277 THEN 'train'
                        WHEN {{b}} < 3686 THEN 'val'
                        ELSE 'test' END AS split
            FROM grouped WHERE group_id = doc_id
        """.replace("{b}", _MD5_BUCKET_SQL),
        "training_set_assembly_docs": """

            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS INT)) AS tokens,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
                       make_timestamp((1704067200 +
                           (CAST(doc_id AS BIGINT) * 2654435761) % 2592000) * 1000000) AS event_time
                FROM documents
            ), tok AS (
                SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM seq
            ), s AS (
                SELECT doc_id, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id
            ), c AS (
                SELECT doc_id, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            ), stats AS (
                SELECT seq.doc_id, seq.source, seq.event_time, seq.n_tok,
                       c.mu AS mean_raw,
                       CASE WHEN c.n >= 2 THEN sqrt(c.m2 * c.n / (c.n - 1)) ELSE 0.0 END AS stdev_raw,
                       CASE WHEN c.m2 > 0
                            THEN c.m3c / (c.m2 ^ 1.5) ELSE 0.0 END AS skew_raw,
                       CASE WHEN c.m2 > 0
                            THEN c.m4c / (c.m2 * c.m2) - 3.0 ELSE 0.0 END AS kurt_raw
                FROM seq JOIN c ON seq.doc_id = c.doc_id
            ), labs AS (
                SELECT doc_id, event_time - to_seconds(n_tok) AS label_time,
                       CAST(CAST(doc_id AS BIGINT) % 2 AS INT) AS label
                FROM stats
                UNION ALL
                SELECT doc_id, event_time + to_seconds(3600) AS label_time,
                       CAST(1 - CAST(doc_id AS BIGINT) % 2 AS INT) AS label
                FROM stats
            )
            SELECT f.doc_id, f.event_time,
                   ROUND(f.mean_raw, 6) AS mean,
                   l.label,
                   CASE WHEN {b} < 3277 THEN 'train'
                        WHEN {b} < 3686 THEN 'val'
                        ELSE 'test' END AS split
            FROM stats f
            ASOF LEFT JOIN labs l
              ON f.doc_id = l.doc_id AND f.event_time >= l.label_time
        """.replace("{b}", _MD5_BUCKET_SQL.replace("doc_id", "f.doc_id")),
        "dedup_against_docs": """
            SELECT n.doc_id, n.n_chars
            FROM documents n
            WHERE n.doc_id >= 250
              AND NOT EXISTS (
                  SELECT 1 FROM documents c
                  WHERE c.doc_id < 250 AND md5(c.text) = md5(n.text)
              )
        """,
        "chunk_documents_docs": """
            WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), n AS (
                SELECT doc_id, w,
                       GREATEST(CAST(ceil((len(w) - 64) / 48.0) AS INT) + 1, 1)
                           AS nc
                FROM ws
            ), c AS (
                SELECT doc_id,
                       unnest(list_transform(range(0, nc), i -> struct_pack(
                           chunk_id := i,
                           chunk_text := array_to_string(
                               w[i*48+1:i*48+64], ' '),
                           chunk_len := len(w[i*48+1:i*48+64])))) AS s
                FROM n
            )
            SELECT doc_id,
                   CAST(s.chunk_id AS INT) AS chunk_id,
                   s.chunk_text AS chunk_text,
                   CAST(s.chunk_len AS INT) AS chunk_len
            FROM c
        """,
        "redact_pii_docs": """
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' contact sam@example.org at 10.1.2.3'
                            ELSE text END AS text
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS INT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                       AS INT) AS n_ipv4,
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<PII>', 'g'),
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                       '<PII>', 'g') AS text_redacted
            FROM planted
        """,
        "repetition_metrics_docs": """
            WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), g AS (
                SELECT doc_id, nn.n,
                       unnest(list_transform(
                           range(1, greatest(len(w) - (nn.n - 1), 1) + 1),
                           i -> array_to_string(w[i:i+nn.n-1], ' '))) AS gram
                FROM ws CROSS JOIN (VALUES (1), (2), (3)) AS nn(n)
            ), pg AS (
                SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3
            ), pn AS (
                SELECT doc_id, n,
                       ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
                           AS rep
                FROM pg GROUP BY 1, 2
            )
            SELECT doc_id,
                   MAX(CASE WHEN n = 1 THEN rep END) AS rep_1,
                   MAX(CASE WHEN n = 2 THEN rep END) AS rep_2,
                   MAX(CASE WHEN n = 3 THEN rep END) AS rep_3
            FROM pn GROUP BY doc_id
        """,
        "pack_sequences_docs": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                FROM documents
            ), c AS (
                SELECT doc_id, n_tok,
                       CAST(COALESCE(SUM(n_tok) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS tok_start
                FROM t
            )
            SELECT doc_id, n_tok, tok_start,
                   tok_start // 512 AS pack_id,
                   tok_start % 512 AS pack_offset
            FROM c
        """,
        "contamination_check_docs": """
            WITH ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(w) - 2, 1) + 1),
                           i -> array_to_string(w[i:i+2], ' ')))) AS s
                FROM ws
            ), tr AS (
                SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0
            ), ev AS (
                SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0
            )
            SELECT ev.doc_id,
                   COUNT(*) AS n_shingles,
                   COUNT(tr.s) AS n_hit,
                   ROUND(COUNT(tr.s) * 1.0 / COUNT(*), 6) AS ratio
            FROM ev LEFT JOIN tr ON ev.s = tr.s
            GROUP BY ev.doc_id
        """,
        "tfidf_topk_docs": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM w WHERE term <> '' GROUP BY 1, 2
            ), dfq AS (
                SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1
            ), n AS (
                SELECT COUNT(*) AS n FROM documents
            ), s AS (
                SELECT tf.doc_id, tf.term,
                       ROUND(tf.tf * (ln((n.n + 1.0) / (dfq.dfc + 1.0)) + 1.0), 6)
                           AS tfidf
                FROM tf JOIN dfq USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tfidf, rk FROM (
                SELECT doc_id, term, tfidf,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY tfidf DESC, term ASC
                       ) AS rk
                FROM s
            ) WHERE rk <= 3
        """,
        "profile_numeric_docs": """
            SELECT source,
                   COUNT(*) AS n,
                   MIN(n_chars) AS v_min,
                   MAX(n_chars) AS v_max,
                   ROUND(AVG(n_chars), 6) AS v_avg,
                   ROUND(stddev_samp(n_chars), 6) AS v_stddev,
                   ROUND(quantile_cont(n_chars, 0.5), 6) AS v_median
            FROM documents
            GROUP BY source
        """,
        "dedup_groups_docs": """
            WITH RECURSIVE ws AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(w) - 2, 1) + 1),
                           i -> array_to_string(w[i:i+2], ' ')))) AS s
                FROM ws
            ), sz AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), pairs AS (
                SELECT id_a, id_b
                FROM inter
                JOIN sz x ON id_a = x.doc_id
                JOIN sz y ON id_b = y.doc_id
                WHERE CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) >= 0.5
            ), edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL
                SELECT id_b AS a, id_a AS b FROM pairs
            ), reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
            ), comp AS (
                SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
            )
            SELECT doc_id, group_id,
                   COUNT(*) OVER (PARTITION BY group_id) AS group_size
            FROM comp
        """,
        "width_features_docs": """
            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS DOUBLE)) AS x
                FROM documents
            ), s AS (
                SELECT doc_id, x,
                       CAST(len(x) AS INT) AS n,
                       list_min(x) AS mn, list_max(x) AS mx,
                       CAST(list_sum(x) AS DOUBLE) AS s1,
                       CAST(list_sum(list_transform(x, v -> v * v)) AS DOUBLE) AS s2
                FROM seq
            )
            SELECT doc_id,
                   CAST(len(list_filter(x, v -> v > (mn + mx) / 2.0)) AS INT) AS n_above_half,
                   CAST(len(list_filter(x, v -> v > mn + 0.75 * (mx - mn))) AS INT) AS n_above_q3,
                   ROUND(CASE WHEN s1 / n > 0 THEN mx / (s1 / n) ELSE 0.0 END, 6) AS peak_to_mean,
                   ROUND(CASE WHEN sqrt(s2 / n) > 0 THEN mx / sqrt(s2 / n) ELSE 0.0 END, 6) AS crest
            FROM s
        """,
        "profile_stats_docs": """
            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS INT)) AS tokens
                FROM documents
            ), s AS (
                SELECT doc_id,
                       CAST(len(tokens) AS INT) AS n,
                       CAST(list_sum(list_transform(tokens, v -> CAST(v AS DOUBLE))) AS DOUBLE) AS s1,
                       CAST(list_sum(list_transform(tokens, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS DOUBLE) AS s2,
                       CAST(list_max(tokens) AS DOUBLE) AS mx,
                       CAST(list_indexof(tokens, list_max(tokens)) AS INT) AS pos
                FROM seq
            )
            SELECT doc_id,
                   ROUND(CASE WHEN sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0)) > 0
                              THEN (mx - s1/n) / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
                              ELSE 0.0 END, 6) AS sn_ratio,
                   ROUND(((pos - 1) - n / 2.0) / n, 6) AS peak_offset
            FROM s
        """,
        "embedding_norms_by_label": """
            SELECT label, COUNT(*) AS n_vecs,
                   ROUND(AVG(norm6), 6) AS avg_norm
            FROM (
                SELECT label,
                       ROUND(sqrt(list_sum(list_transform(embedding,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm6
                FROM embeddings
            )
            GROUP BY label
        """,
        "pipeline_pointintime_features": """
            WITH seq AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                       list_transform(string_split(text, ' '),
                                      w -> CAST(length(w) % 256 AS INT)) AS tokens,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
                       make_timestamp((1704067200 +
                           (CAST(doc_id AS BIGINT) * 2654435761) % 2592000) * 1000000) AS event_time
                FROM documents
            ), tok AS (
                SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS v FROM seq
            ), s AS (
                SELECT doc_id, COUNT(*) AS n,
                       CAST(SUM(v) AS DOUBLE) AS s1,
                       CAST(SUM(v*v) AS DOUBLE) AS s2,
                       CAST(SUM(v*v*v) AS DOUBLE) AS s3,
                       CAST(SUM(v*v*v*v) AS DOUBLE) AS s4
                FROM tok GROUP BY doc_id
            ), c AS (
                SELECT doc_id, n, s1/n AS mu,
                       greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2,
                       s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3c,
                       s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4c
                FROM s
            ), stats AS (
                SELECT seq.doc_id, seq.source, seq.event_time, seq.n_tok,
                       c.mu AS mean_raw,
                       CASE WHEN c.n >= 2 THEN sqrt(c.m2 * c.n / (c.n - 1)) ELSE 0.0 END AS stdev_raw,
                       CASE WHEN c.m2 > 0
                            THEN c.m3c / (c.m2 ^ 1.5) ELSE 0.0 END AS skew_raw,
                       CASE WHEN c.m2 > 0
                            THEN c.m4c / (c.m2 * c.m2) - 3.0 ELSE 0.0 END AS kurt_raw
                FROM seq JOIN c ON seq.doc_id = c.doc_id
            ), snaps AS (
                SELECT doc_id, event_time - to_seconds(n_tok) AS obs_time,
                       mean_raw AS f_mean_raw, stdev_raw AS f_std_raw
                FROM stats
            )
            SELECT f.doc_id, f.source, f.event_time, f.n_tok,
                   ROUND(f.mean_raw, 6) AS mean,
                   ROUND(f.stdev_raw, 6) AS stdev,
                   ROUND(f.skew_raw, 6) AS skew,
                   ROUND(f.kurt_raw, 6) AS kurt,
                   ROUND(s.f_mean_raw, 6) AS f_mean_obs,
                   ROUND(s.f_std_raw, 6) AS f_std_obs
            FROM stats f
            ASOF LEFT JOIN snaps s
              ON f.doc_id = s.doc_id AND f.event_time >= s.obs_time
        """,
        "embedding_neardup_exact": """
            WITH p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_sum(list_transform(range(1, len(a.embedding) + 1),
                           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                       AS cos_raw
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, ROUND(cos_raw, 6) AS cosine
            FROM p WHERE cos_raw >= 0.45
        """,
        "ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10
            ), scored AS (
                SELECT q.query_id, c.vec_id,
                       list_sum(list_transform(range(1, len(c.embedding) + 1),
                           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                       AS cos_raw
                FROM embeddings c, q
                WHERE c.vec_id != q.query_id
            )
            SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine, rank FROM (
                SELECT query_id, vec_id, cos_raw,
                       CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, vec_id ASC) AS INT) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "snapshot_scan_docs": """
            SELECT doc_id, lang, source, n_chars FROM documents
        """,
        "partitioned_sink_resume_docs": """
            SELECT doc_id, source, n_chars FROM documents
        """,
        "range_partition_sorted_events": """
            SELECT COUNT(*) AS n_rows,
                   CAST(0 AS BIGINT) AS intra_violations,
                   CAST(0 AS BIGINT) AS boundary_inversions
            FROM events
        """,
        "streaming_tumbling_counts_events": """
            SELECT date_trunc('hour', ts) AS w_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events
            GROUP BY 1, 2, 3
        """,
    }
    out["peace_features_docs"] = _peace_sql()
    out["spinn_features_docs"] = _spinn_sql()
    out["eatough_features_docs"] = _eatough_sql()
    # same math, same oracle: the scalar pandas-UDF path reproduces the
    # mapInArrow moment path bit-for-bit, and the streaming stateful
    # as-of is the online twin of the batch as-of query.
    out["lyon_pandas_udf_docs"] = out["lyon_features_docs"]
    out["streaming_stateful_asof_events"] = out["asof_purchase_before_view"]
    out["asof_storage_plan_purchases"] = out["asof_purchase_before_view"]
    out["asof_broadcast_plan_purchases"] = out["asof_purchase_before_view"]
    out["expectations_docs"] = """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_null_count,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_id_distinct_count,
               CAST(COUNT(doc_id) AS BIGINT) AS doc_id_nonnull_count,
               CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars < 0 OR n_chars > 10000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_out_of_range_count,
               CAST(SUM(CASE WHEN lang IS NULL OR NOT regexp_matches(lang, '^[a-z]{2}$')
                        THEN 1 ELSE 0 END) AS BIGINT) AS lang_regex_violation_count
        FROM documents
    """
    out["shuffle_shards_docs"] = """
        WITH ranked AS (
          SELECT doc_id,
                 CAST(row_number() OVER (
                   ORDER BY md5(concat(CAST(doc_id AS STRING), '|', 'shuf-r4')) ASC,
                            doc_id ASC
                 ) - 1 AS BIGINT) AS shuffle_rank
          FROM documents
        )
        SELECT doc_id, shuffle_rank,
               CAST(FLOOR(shuffle_rank / 64) AS BIGINT) AS shard_ix
        FROM ranked
    """
    # the sink gate shares the shuffle oracle: written files read back
    # must reproduce the exact same (doc_id, rank, shard) assignment
    out["shard_export_docs"] = out["shuffle_shards_docs"]
    from pulsarfeatureextractor_spark.operators.mixing import mixing_copies_sql

    _mix_copies = mixing_copies_sql(
        "d.source", "d.doc_id", "t.__src_tokens",
        _MIX_WEIGHTS, _MIX_BUDGET, _MIX_SEED, _MIX_MAX_RATE,
    )
    _mix_in = ", ".join(f"'{s}'" for s in sorted(_MIX_WEIGHTS))
    out["mix_corpora_docs"] = f"""
        WITH totals AS (
          SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS __src_tokens
          FROM documents
          WHERE source IN ({_mix_in})
          GROUP BY source
        )
        SELECT d.doc_id, d.source, d.n_chars, u.copy_ix
        FROM documents d
        JOIN totals t ON d.source = t.source, unnest(range({_mix_copies})) AS u(copy_ix)
    """
    from pulsarfeatureextractor_spark.functions.regression import (
        cramer3_sql,
        linear_pred_sql,
    )

    # shared-text training oracle: the SAME cramer3_sql / linear_pred_sql
    # strings the Spark query evaluates via F.expr, so both engines run
    # the identical expression tree over identical exact integer stats
    _reg_co = cramer3_sql(
        "n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"
    )
    _reg_pred = linear_pred_sql(
        "b0", "b1", "b2", "CAST(x1 AS DOUBLE)", "CAST(x2 AS DOUBLE)"
    )
    out["quality_regression_docs"] = f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                       AS x2,
                   CAST(n_chars AS BIGINT) AS y
            FROM documents
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                   CAST(SUM(x2 * y) AS BIGINT) AS s2y
            FROM m
        ), w AS (
            SELECT {_reg_co["b0"]} AS b0,
                   {_reg_co["b1"]} AS b1,
                   {_reg_co["b2"]} AS b2
            FROM s
        )
        SELECT m.doc_id,
               ROUND({_reg_pred}, 6) + 0.0 AS pred_chars,
               ROUND(CAST(y AS DOUBLE) - {_reg_pred}, 6) + 0.0 AS resid_chars
        FROM m, w
    """
    out["embedding_generation_docs"] = """
        -- independent SQL twin of the length-bucket embedding fixture:
        -- dimension d = fraction of non-empty tokens with length % 8 = d.
        -- Integer counts cast to DOUBLE, ONE division -> bit-identical
        -- to the Python encoder with no rounding anywhere.
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               t -> t <> '') AS ws
            FROM documents
        ), sized AS (
            SELECT doc_id, ws, len(ws) AS n FROM base
        )
        SELECT sized.doc_id,
               CAST(d.dim_ix AS INT) AS dim_ix,
               CASE WHEN n = 0 THEN 0.0 ELSE
                   CAST(len(list_filter(ws, t -> length(t) % 8 = d.dim_ix))
                        AS DOUBLE) / CAST(n AS DOUBLE)
               END AS value
        FROM sized, (SELECT unnest(range(8)) AS dim_ix) d
    """
    out["boilerplate_removal_docs"] = """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM documents
        ), words AS (
          SELECT doc_id, tok, pos FROM w WHERE tok <> ''
        ), dfc AS (
          SELECT tok, COUNT(DISTINCT doc_id) AS dfc FROM words GROUP BY tok
        ), n AS (
          SELECT COUNT(*) AS n_docs FROM documents
        ), freq AS (
          SELECT tok FROM dfc CROSS JOIN n
          WHERE dfc * 100 >= n_docs * 79 AND dfc >= 2
        ), kept AS (
          SELECT wo.doc_id,
                 string_agg(wo.tok, ' ' ORDER BY wo.pos) AS clean_text,
                 COUNT(*) AS n_kept
          FROM words wo ANTI JOIN freq f ON wo.tok = f.tok
          GROUP BY wo.doc_id
        )
        SELECT d.doc_id,
               COALESCE(k.clean_text, '') AS clean_text,
               CAST(COALESCE(k.n_kept, 0) AS INT) AS n_kept
        FROM documents d LEFT JOIN kept k USING (doc_id)
    """
    from pulsarfeatureextractor_spark.functions.splits import (
        _md5_bucket_expr as _mdb,
    )

    _DSIR_WEIGHTS_CTE = f"""
        WITH ws AS (
          SELECT doc_id, source,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents
        ), grams AS (
          SELECT doc_id, unnest(ws) AS gram FROM ws
          UNION ALL
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
          FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t
          WHERE len(ws) >= 2
        ), buck AS (
          SELECT doc_id, {_mdb("gram", "dsir")} AS bucket FROM grams
        ), tbuck AS (
          SELECT b.* FROM buck b JOIN documents d USING (doc_id)
          WHERE d.lang = 'en'
        ), ct AS (
          SELECT bucket, COUNT(*) AS ct FROM tbuck GROUP BY 1
        ), cr AS (
          SELECT bucket, COUNT(*) AS cr FROM buck GROUP BY 1
        ), tt AS (SELECT COUNT(*) AS tt FROM tbuck),
        tr AS (SELECT COUNT(*) AS tr FROM buck),
        lr AS (
          SELECT cr.bucket,
                 CAST(ROUND(
                   ln((COALESCE(ct.ct, 0) + 1) / CAST(tt.tt + 4096 AS DOUBLE))
                   - ln((cr.cr + 1) / CAST(tr.tr + 4096 AS DOUBLE)), 9)
                 AS DECIMAL(20,9)) AS lr
          FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tt CROSS JOIN tr
        ), agg AS (
          SELECT b.doc_id, COUNT(*) AS n, SUM(l.lr) AS s
          FROM buck b JOIN lr l USING (bucket) GROUP BY 1
        ), wdoc AS (
          SELECT d.doc_id, d.source,
                 CAST(COALESCE(a.n, 0) AS INT) AS n_grams,
                 ROUND(CAST(a.s AS DOUBLE), 6) AS dsir_logw
          FROM documents d LEFT JOIN agg a USING (doc_id)
        )
    """
    out["dsir_weights_docs"] = (
        _DSIR_WEIGHTS_CTE + "SELECT doc_id, n_grams, dsir_logw FROM wdoc"
    )
    out["dsir_select_docs"] = _DSIR_WEIGHTS_CTE + f"""
        , keyed AS (
          SELECT doc_id, source,
                 ROUND(dsir_logw +
                       -ln(-ln(({_mdb("doc_id", "dsir-gumbel")} + 0.5)
                               / 4096.0)), 6) AS sel_key
          FROM wdoc
        ), ranked AS (
          SELECT doc_id, source, sel_key,
                 rank() OVER (PARTITION BY source
                              ORDER BY sel_key DESC NULLS LAST, doc_id) AS rk,
                 GREATEST(1, FLOOR(0.25 * COUNT(*) OVER (PARTITION BY source)))
                   AS k
          FROM keyed
        )
        SELECT doc_id, source, sel_key FROM ranked WHERE rk <= k
    """
    out["curation_v2_docs"] = _DSIR_WEIGHTS_CTE + f"""
        , gop AS (
          SELECT w.doc_id, len(w.ws) AS n_words,
                 CASE WHEN len(w.ws) > 0 THEN
                   ROUND(CAST(list_sum(list_transform(w.ws, x -> len(x)))
                              AS DOUBLE) / len(w.ws), 6) END AS ml,
                 CASE WHEN len(w.ws) > 0 THEN
                   ROUND(CAST(len(list_filter(w.ws,
                              x -> regexp_matches(x, '[a-zA-Z]')))
                              AS DOUBLE) / len(w.ws), 6) END AS af,
                 CASE WHEN len(w.ws) > 0 THEN
                   ROUND(CAST(CAST(len(d2.t2) - len(replace(d2.t2, '#', ''))
                              + (len(d2.t2) - len(replace(d2.t2, '...', '')))
                                / 3 AS INT) AS DOUBLE) / len(w.ws), 6)
                 END AS sr,
                 len(list_intersect(w.ws, ['the','be','to','of','and',
                                           'that','have','with'])) AS sh
          FROM ws w
          JOIN (SELECT doc_id, COALESCE(text, '') AS t2 FROM documents) d2
            USING (doc_id)
        ), pos3 AS (
          SELECT doc_id, i AS pos, array_to_string(ws[i:i+2], ' ') AS gram3
          FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
          WHERE len(ws) >= 3
        ), dup3 AS (
          SELECT gram3 FROM pos3 GROUP BY gram3 HAVING COUNT(*) >= 2
        ), hit3 AS (
          SELECT * FROM pos3 WHERE gram3 IN (SELECT gram3 FROM dup3)
        ), cov3 AS (
          SELECT doc_id, COUNT(DISTINCT idx) AS dup_tokens
          FROM hit3, LATERAL (SELECT unnest(generate_series(pos, pos + 2)) AS idx) u
          GROUP BY 1
        ), spanf AS (
          SELECT w.doc_id,
                 ROUND(COALESCE(c.dup_tokens, 0)
                       / GREATEST(len(w.ws), 1), 6) AS dup_fraction
          FROM ws w LEFT JOIN cov3 c USING (doc_id)
        ), surv AS (
          SELECT wd.doc_id, wd.source, g.n_words, s.dup_fraction,
                 wd.dsir_logw
          FROM wdoc wd
          JOIN gop g USING (doc_id)
          JOIN spanf s USING (doc_id)
          WHERE COALESCE(g.n_words BETWEEN 50 AND 100000
                         AND g.ml BETWEEN 3.0 AND 10.0
                         AND g.af >= 0.8 AND g.sr <= 0.1 AND g.sh >= 1,
                         FALSE)
            AND s.dup_fraction <= 0.9
        ), keyed2 AS (
          SELECT *, ROUND(dsir_logw +
                          -ln(-ln(({_mdb("doc_id", "dsir-gumbel")} + 0.5)
                                  / 4096.0)), 6) AS sel_key
          FROM surv
        ), ranked2 AS (
          SELECT *, rank() OVER (PARTITION BY source
                                 ORDER BY sel_key DESC NULLS LAST, doc_id)
                      AS rk,
                 GREATEST(1, FLOOR(0.5 * COUNT(*) OVER (PARTITION BY source)))
                   AS k
          FROM keyed2
        )
        SELECT doc_id, source, CAST(n_words AS INT) AS n_words,
               dup_fraction, dsir_logw, sel_key
        FROM ranked2 WHERE rk <= k
    """
    out["line_dedup_docs"] = """
        WITH ws AS (
          SELECT doc_id,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents
        ), planted AS (
          SELECT doc_id,
                 array_to_string(
                   list_transform(range(1, CAST((len(ws) + 2) // 3 AS INT) + 1),
                                  i -> array_to_string(
                                         ws[(i-1)*3+1 : (i-1)*3+3], ' ')),
                   chr(10)) AS planted
          FROM ws
        ), l AS (
          SELECT doc_id,
                 unnest(string_split(planted, chr(10))) AS line,
                 unnest(range(1, len(string_split(planted, chr(10))) + 1))
                   AS pos
          FROM planted
        ), dup AS (
          SELECT line FROM l WHERE trim(line) <> ''
          GROUP BY line HAVING COUNT(*) >= 2
        ), kept AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                 COUNT(*) AS n_kept
          FROM l ANTI JOIN dup USING (line)
          GROUP BY doc_id
        ), nl AS (
          SELECT doc_id,
                 len(string_split(planted, chr(10))) AS n_lines
          FROM planted
        )
        SELECT n.doc_id,
               COALESCE(k.clean_text, '') AS clean_text,
               CAST(n.n_lines AS INT) AS n_lines,
               CAST(COALESCE(k.n_kept, 0) AS INT) AS n_kept,
               CAST(n.n_lines - COALESCE(k.n_kept, 0) AS INT) AS n_removed
        FROM nl n LEFT JOIN kept k USING (doc_id)
    """
    out["blocklist_filter_docs"] = """
        WITH ws AS (
          SELECT doc_id,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents
        )
        SELECT doc_id,
               CAST(len(list_intersect(list_distinct(ws),
                    ['big', 'slow', 'vector'])) AS INT)
                 AS n_blocked_distinct,
               CAST(len(list_filter(ws,
                    x -> list_contains(['big', 'slow', 'vector'], x)))
                    AS INT) AS n_blocked_tokens,
               len(list_intersect(list_distinct(ws),
                   ['big', 'slow', 'vector'])) <= 1 AS blocklist_keep
        FROM ws
    """
    out["nb_train_docs"] = """
        WITH ws AS (
          SELECT lang,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents WHERE lang IS NOT NULL
        ), tok AS (
          SELECT lang AS label, unnest(ws) AS token FROM ws
        ), counts AS (
          SELECT label, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
        ), tot AS (
          SELECT label, SUM(cnt) AS tot FROM counts GROUP BY 1
        ), vocab AS (SELECT DISTINCT token FROM counts),
        v AS (SELECT COUNT(*) AS v FROM vocab),
        pri AS (
          SELECT lang AS label, COUNT(*) AS ndocs FROM documents
          WHERE lang IS NOT NULL GROUP BY 1
        ), ntot AS (SELECT SUM(ndocs) AS ntot FROM pri),
        priors AS (
          SELECT label,
                 CAST(ROUND(ln(ndocs / CAST(ntot AS DOUBLE)), 9)
                      AS DECIMAL(20,9)) AS log_prior
          FROM pri CROSS JOIN ntot
        ), grid AS (
          -- label set from the PRIORS (zero-token labels keep their
          -- grid rows via tot coalesced to 0), mirroring train_nb
          SELECT p.label, vb.token FROM pri p CROSS JOIN vocab vb
        )
        SELECT g.label, g.token,
               CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt,
               CAST(CAST(ROUND(ln((COALESCE(c.cnt, 0) + 1)
                                  / CAST(COALESCE(t.tot, 0) + v.v
                                         AS DOUBLE)), 9)
                         AS DECIMAL(20,9)) AS DOUBLE) AS log_cond,
               CAST(p.log_prior AS DOUBLE) AS log_prior
        FROM grid g
        LEFT JOIN counts c ON c.label = g.label AND c.token = g.token
        LEFT JOIN tot t ON t.label = g.label
        CROSS JOIN v
        JOIN priors p ON p.label = g.label
    """
    out["nb_classify_docs"] = """
        WITH ws AS (
          SELECT doc_id, lang,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents
        ), tok AS (
          SELECT lang AS label, unnest(ws) AS token FROM ws
          WHERE lang IS NOT NULL
        ), counts AS (
          SELECT label, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
        ), tot AS (
          SELECT label, SUM(cnt) AS tot FROM counts GROUP BY 1
        ), vocab AS (SELECT DISTINCT token FROM counts),
        v AS (SELECT COUNT(*) AS v FROM vocab),
        pri AS (
          SELECT lang AS label, COUNT(*) AS ndocs FROM documents
          WHERE lang IS NOT NULL GROUP BY 1
        ), ntot AS (SELECT SUM(ndocs) AS ntot FROM pri),
        priors AS (
          SELECT label,
                 CAST(ROUND(ln(ndocs / CAST(ntot AS DOUBLE)), 9)
                      AS DECIMAL(20,9)) AS log_prior
          FROM pri CROSS JOIN ntot
        ), model AS (
          -- label set from the PRIORS, tot coalesced (train_nb mirror)
          SELECT p.label, vb.token,
                 CAST(ROUND(ln((COALESCE(c.cnt, 0) + 1)
                               / CAST(COALESCE(t.tot, 0) + v.v
                                      AS DOUBLE)), 9)
                      AS DECIMAL(20,9)) AS log_cond
          FROM pri p CROSS JOIN vocab vb
          LEFT JOIN counts c ON c.label = p.label AND c.token = vb.token
          LEFT JOIN tot t ON t.label = p.label
          CROSS JOIN v
        ), toks AS (
          SELECT doc_id, unnest(ws) AS token FROM ws
        ), scored AS (
          SELECT tk.doc_id, m.label,
                 SUM(m.log_cond) AS s, COUNT(*) AS n
          FROM toks tk JOIN model m ON m.token = tk.token
          GROUP BY 1, 2
        ), filled AS (
          SELECT d.doc_id, p.label,
                 COALESCE(s.s, CAST(0 AS DECIMAL(20,9))) + p.log_prior
                   AS score,
                 COALESCE(s.n, 0) AS n
          FROM documents d CROSS JOIN priors p
          LEFT JOIN scored s
            ON s.doc_id = d.doc_id AND s.label = p.label
        ), best AS (
          SELECT doc_id, MAX(score) AS ms FROM filled GROUP BY 1
        )
        SELECT f.doc_id, MIN(f.label) AS nb_pred,
               CAST(f.score AS DOUBLE) AS nb_score,
               CAST(MIN(f.n) AS BIGINT) AS n_tok_nb
        FROM filled f
        JOIN best b ON b.doc_id = f.doc_id AND f.score = b.ms
        GROUP BY f.doc_id, f.score
    """
    out["top_fraction_by_docs"] = """
        SELECT doc_id, lang, n_chars,
               CAST(COUNT(n_chars) OVER (PARTITION BY lang) AS BIGINT)
                 AS grp_n,
               CAST(RANK() OVER (PARTITION BY lang
                                 ORDER BY n_chars DESC NULLS LAST)
                    AS BIGINT) AS grp_rank,
               n_chars IS NOT NULL
                 AND RANK() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC NULLS LAST)
                     <= CAST(ceil(COUNT(n_chars) OVER (PARTITION BY lang)
                                  * 0.5) AS BIGINT)
                 AS keep_frac
        FROM documents
    """
    out["gopher_rules_docs"] = """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             x -> x <> '') AS ws,
                 COALESCE(text, '') AS t
          FROM documents
        ), m AS (
          SELECT doc_id, len(ws) AS n,
                 CASE WHEN len(ws) > 0 THEN
                   ROUND(CAST(list_sum(list_transform(ws, x -> len(x)))
                              AS DOUBLE) / len(ws), 6) END AS ml,
                 CASE WHEN len(ws) > 0 THEN
                   ROUND(CAST(len(list_filter(ws,
                              x -> regexp_matches(x, '[a-zA-Z]')))
                              AS DOUBLE) / len(ws), 6) END AS af,
                 CASE WHEN len(ws) > 0 THEN
                   ROUND(CAST(CAST(len(t) - len(replace(t, '#', ''))
                              + (len(t) - len(replace(t, '...', ''))) / 3
                              AS INT) AS DOUBLE) / len(ws), 6) END AS sr,
                 len(list_intersect(ws, ['the','be','to','of','and',
                                         'that','have','with'])) AS sh
          FROM w
        )
        SELECT doc_id,
               CAST(n AS INT) AS n_words,
               ml AS mean_word_len_g,
               af AS alpha_frac,
               sr AS symbol_ratio,
               CAST(sh AS INT) AS stop_hits,
               COALESCE(n BETWEEN 50 AND 100000
                        AND ml BETWEEN 3.0 AND 10.0
                        AND af >= 0.8 AND sr <= 0.1 AND sh >= 2,
                        FALSE) AS gopher_keep
        FROM m
    """
    out["repeated_spans_docs"] = """
        WITH ws AS (
          SELECT doc_id,
                 list_filter(string_split(COALESCE(text, ''), ' '),
                             w -> w <> '') AS ws
          FROM documents
        ), pos AS (
          SELECT doc_id, i AS pos, array_to_string(ws[i:i+2], ' ') AS gram
          FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
          WHERE len(ws) >= 3
        ), dup AS (
          SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) >= 2
        ), hit AS (
          SELECT * FROM pos WHERE gram IN (SELECT gram FROM dup)
        ), cov AS (
          SELECT doc_id, COUNT(DISTINCT pos) AS n_dup_grams,
                 COUNT(DISTINCT idx) AS dup_tokens
          FROM hit, LATERAL (SELECT unnest(generate_series(pos, pos + 2)) AS idx) u
          GROUP BY 1
        )
        SELECT w.doc_id,
               CAST(len(w.ws) AS INT) AS n_tokens,
               CAST(COALESCE(c.n_dup_grams, 0) AS INT) AS n_dup_grams,
               CAST(COALESCE(c.dup_tokens, 0) AS INT) AS dup_tokens,
               ROUND(COALESCE(c.dup_tokens, 0)
                     / GREATEST(len(w.ws), 1), 6) AS dup_fraction
        FROM ws w LEFT JOIN cov c USING (doc_id)
    """
    out["lm_perplexity_docs"] = """
        WITH ws AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS ws
          FROM documents
        ), big AS (
          SELECT doc_id,
                 unnest(ws[1:len(ws)-1]) AS w1,
                 unnest(ws[2:len(ws)]) AS w2
          FROM ws WHERE len(ws) >= 2
        ), bi AS (
          SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2
        ), ctx AS (
          SELECT w1, SUM(c) AS cd FROM bi GROUP BY 1
        ), v AS (
          SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(ws) AS w FROM ws)
        ), scored AS (
          SELECT b.doc_id,
                 CAST(ROUND(ln((COALESCE(bi.c, 0) + 1) /
                               CAST(COALESCE(ctx.cd, 0) + v.v AS DOUBLE)), 9)
                      AS DECIMAL(20,9)) AS logp
          FROM big b
          LEFT JOIN bi USING (w1, w2)
          LEFT JOIN ctx USING (w1)
          CROSS JOIN v
        ), agg AS (
          SELECT doc_id, COUNT(*) AS n, SUM(logp) AS s
          FROM scored GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n, 0) AS INT) AS n_bigrams,
               ROUND(EXP(-(CAST(a.s AS DOUBLE) / a.n)), 6) AS lm_ppl
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    out["lm_kneser_ney_docs"] = """
        WITH ws AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS ws
          FROM documents
        ), big AS (
          SELECT doc_id,
                 unnest(ws[1:len(ws)-1]) AS w1,
                 unnest(ws[2:len(ws)]) AS w2
          FROM ws WHERE len(ws) >= 2
        ), bi AS (
          SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2
        ), ctxk AS (
          SELECT w1, SUM(c) AS cd, COUNT(*) AS n1fw FROM bi GROUP BY 1
        ), cont AS (
          SELECT w2, COUNT(*) AS n1bw FROM bi GROUP BY 1
        ), t AS (SELECT COUNT(*) AS nt FROM bi),
        v AS (
          SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(ws) AS w FROM ws)
        ), scored AS (
          SELECT b.doc_id,
                 CAST(ROUND(ln(
                   CASE WHEN k.cd IS NULL THEN
                     (COALESCE(cn.n1bw, 0) + 1)
                       / CAST(t.nt + v.v + 1 AS DOUBLE)
                   ELSE
                     GREATEST(CAST(COALESCE(bi.c, 0) AS DOUBLE) - 0.75, 0.0)
                       / CAST(k.cd AS DOUBLE)
                     + ((0.75 * k.n1fw) / CAST(k.cd AS DOUBLE))
                       * ((COALESCE(cn.n1bw, 0) + 1)
                          / CAST(t.nt + v.v + 1 AS DOUBLE))
                   END), 9) AS DECIMAL(20,9)) AS logp
          FROM big b
          LEFT JOIN bi USING (w1, w2)
          LEFT JOIN ctxk k USING (w1)
          LEFT JOIN cont cn USING (w2)
          CROSS JOIN t CROSS JOIN v
        ), agg AS (
          SELECT doc_id, COUNT(*) AS n, SUM(logp) AS s
          FROM scored GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n, 0) AS INT) AS n_bigrams,
               ROUND(EXP(-(CAST(a.s AS DOUBLE) / a.n)), 6) AS lm_ppl_kn
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    # PHCX ingest: expected rows from the SAME pure-python truth the
    # fixture writer uses — deterministic, sf-independent
    from pulsarfeatureextractor_spark.sources.candidates import (
        synthetic_phcx_truth,
    )

    phcx_rows = []
    for doc_id, prof, dm in synthetic_phcx_truth(n_files=4, candidates_per_file=3):
        phcx_rows.append(f"('{doc_id}', 'profile', {len(prof)}, {sum(prof)})")
        phcx_rows.append(f"('{doc_id}', 'dmcurve', {len(dm)}, {sum(dm)})")
    out["phcx_ingest_docs"] = (
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(kind AS VARCHAR) AS kind, "
        "CAST(n_tok AS INT) AS n_tok, CAST(token_sum AS BIGINT) AS token_sum "
        "FROM (VALUES " + ", ".join(phcx_rows) + ") AS t(doc_id, kind, n_tok, token_sum)"
    )

    out.update(_values_oracles())
    return out
