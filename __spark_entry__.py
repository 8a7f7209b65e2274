"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator surface from SURVEY.md §2 plus the
training-data-pipeline operators (dedup family, similarity search, text
analysis), each with a DuckDB-equivalent ANSI-SQL oracle where the semantics
are SQL-expressible.  Column names/aliases match between the Spark plan and
the SQL so the driver's order-insensitive value-hash compares cleanly; all
floating-point aggregates are rounded on both sides (sum->2dp, avg/ratio->
4-6dp) because distributed summation order differs from DuckDB's.

Every registry entry has a DuckDB oracle as of r04 (the last two rows-only
entries were upgraded: approx_count_distinct now returns an officially-
checkable |approx-exact| <= 5% bound, and the multimodal stand-in feature
is md5-byte arithmetic reproduced in SQL) — including the ANN/simhash family, whose md5-
derived hyperplanes/fingerprints are deterministic constants reproducible
in SQL, and whose per-row sequential float folds are bit-identical across
engines (verified: zero bucket or cosine-at-6dp mismatches at sf0.01);
distributed float reductions are avoided by integer quantization wherever
a mean/sum crosses partitions.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_ent_crawler_spark.functions import text as TX
from new_ent_crawler_spark.operators import dedup_text as DT
from new_ent_crawler_spark.operators import similarity as SIM


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, name + ".parquet"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact-dedup the documents corpus (hash-groupBy, newest/first
    writer wins), then per-(lang, source) dedup statistics — the engine's
    REPLACE-INTO-md5-key semantics (utils/MysqlDBHelper.py:22-31) expressed
    as one declarative plan."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    digests = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.md5(DT.normalized_text("text")).alias("digest"))
    w = Window.partitionBy("digest").orderBy("doc_id")
    keep = (digests.withColumn("rn", F.row_number().over(w))
            .withColumn("n_copies", F.count("*").over(
                Window.partitionBy("digest")))
            .filter(F.col("rn") == 1))
    return (keep.groupBy("lang", "source")
            .agg(F.count("*").alias("n_unique_docs"),
                 F.sum(F.col("n_copies") - 1).alias("n_dupes_removed"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .orderBy("lang", "source"))


# --------------------------------------------------------------------------
# query surface
# --------------------------------------------------------------------------

def _q_frontier_topk_per_host(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (ev.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("event_type", "event_id", "rk"))


def _q_dedup_last_writer_wins(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (o.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").select("o_custkey", "o_orderkey"))


def _q_seen_set_anti_join(spark, sf):
    """Customers with no order since 1998 — the URL-seen anti-join shape
    (operators/dedup.py::prune_seen's exact arm).  The pre-r05 version
    anti-joined against ALL orders, which is empty at every SF (every
    customer has an order) — a broken anti-join returning no rows would
    have passed; the date filter makes the expected result non-empty and
    discriminating."""
    c = _t(spark, sf, "customer")
    o = (_t(spark, sf, "orders")
         .filter(F.col("o_orderdate") >= "1998-01-01"))
    return (c.join(o.select(F.col("o_custkey").alias("c_custkey")),
                   "c_custkey", "left_anti")
            .select("c_custkey"))


def _q_semi_join_active(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter("o_totalprice > 100000")
    return (c.join(o.select(F.col("o_custkey").alias("c_custkey")),
                   "c_custkey", "left_semi")
            .select("c_custkey"))


def _q_broadcast_dim_join(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (c.join(F.broadcast(n),
                   c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("r_name")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal")))


def _q_fanout_rejoin(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.count("*").alias("n_items"),
                      F.round(F.sum("l_quantity"), 2).alias("sum_qty")))
    return (o.join(per_order, o["o_orderkey"] == per_order["l_orderkey"])
            .select("o_orderkey", "o_orderpriority", "n_items", "sum_qty"))


def _q_wave_priority_dequeue(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("o_orderpriority", "o_orderkey", "rk"))


def _q_md5_dedup_key(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(F.countDistinct(
        F.md5(DT.normalized_text("text"))).alias("n_keys"))


def _q_union_keys(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    s = _t(spark, sf, "supplier").select(F.col("s_suppkey").alias("k"))
    return c.union(s).distinct().agg(F.count("*").alias("n_keys"))


def _q_explode_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return (d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.length("tok") > 0)
            .groupBy("lang")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("tok").alias("n_distinct_tokens")))


def _q_regex_digits(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select("c_custkey",
                    F.regexp_replace("c_name", "[^0-9]", "").alias("digits"))


def _q_date_format_day(spark, sf):
    o = _t(spark, sf, "orders")
    return (o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("n_orders")))


def _q_enum_decode(spark, sf):
    li = _t(spark, sf, "lineitem")
    label = (F.when(F.col("l_returnflag") == "R", "退货")
             .when(F.col("l_returnflag") == "A", "认可")
             .otherwise("正常"))
    return (li.select(label.alias("label"))
            .groupBy("label").agg(F.count("*").alias("n_rows")))


def _q_term_concat_none(spark, sf):
    p = _t(spark, sf, "part")
    term = F.concat(
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#13")), F.lit("None")),
        F.lit("-"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("ECONOMY")), F.lit("None")))
    return (p.select(term.alias("term"))
            .groupBy("term").agg(F.count("*").alias("n_parts")))


def _q_events_daily(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type",
                       F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def _q_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= "1997-12-01 00:00:00")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc), 2).alias("sum_disc_price"),
                 F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def _q_tpch_q3(spark, sf):
    c = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (c.join(o, c["c_custkey"] == o["o_custkey"])
            .join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.round(rev, 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10))


def _q_tpch_q5ish(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    li = _t(spark, sf, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (c.join(o, c["c_custkey"] == o["o_custkey"])
            .join(li, o["o_orderkey"] == li["l_orderkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(F.round(rev, 2).alias("revenue")))


def _q_rollup_region_nation(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    joined = (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
              .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]))
    return (joined.rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_customers")))


def _q_count_distinct_users(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users")))


def _q_text_token_count(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.size(F.filter(F.split("text", " "),
                           lambda x: F.length(x) > 0)).cast("long")
    return d.select("doc_id", toks.alias("n_tokens"))


def _q_text_quality(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.quality_score("text").alias("quality"))


def _q_text_fingerprint_dups(spark, sf):
    d = _t(spark, sf, "documents")
    return (d.select(TX.fingerprint("text").alias("fp"))
            .groupBy("fp").agg(F.count("*").alias("n_docs"))
            .filter("n_docs > 1"))


def _q_text_repetition(spark, sf):
    """Gopher-style repetition quality signals: duplicate-line fraction and
    token-repetition fraction per doc — pure array expressions, no shuffle,
    no Python (functions/text.py)."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id",
                    TX.dup_line_fraction("text").alias("dup_line_frac"),
                    TX.token_repetition_fraction("text").alias(
                        "tok_rep_frac"))


def _q_stratified_sample(spark, sf):
    """Deterministic 3-per-lang document sample via salted two-phase top-K
    on an md5 shuffle key (operators/sampling.py) — the skew-safe form of
    `row_number() over (partition by lang order by md5(id))`."""
    from new_ent_crawler_spark.operators import sampling as SMP
    d = _t(spark, sf, "documents").select("doc_id", "lang")
    return SMP.stratified_topk(d, "lang", "doc_id", k=3) \
        .select("lang", "doc_id", "rnk")


def _q_dedup_cluster_keep(spark, sf):
    """Near-dup PAIRS -> dedup DECISIONS: hash-min connected components over
    the word-trigram Jaccard candidate graph (operators/dedup_text.py
    connected_components), then keep = (doc_id == min id of its component).
    The iterative label propagation is the one step of the dedup family
    SQL cannot express directly — the oracle uses a recursive CTE."""
    docs = _t(spark, sf, "documents")
    pairs = DT.word_ngram_jaccard_pairs(docs, n=3, threshold=0.5) \
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return DT.dedup_cluster_keep(docs, pairs).orderBy("doc_id")


def _q_dedup_exact(spark, sf):
    return DT.exact_dedup(_t(spark, sf, "documents"))


_SHINGLE_K = 8
_MINHASHES = 6
_BANDS = 3


def _q_minhash_signatures(spark, sf):
    """Portable minhash (Kirsch-Mitzenmacher md5 family — one md5 per
    shingle, K derived functions, one aggregate pass; see
    operators/dedup_text.py::minhash_signatures).  md5 is the hash both
    engines share, so the DuckDB oracle rebuilds every signature exactly."""
    return DT.minhash_signatures(_t(spark, sf, "documents"),
                                 k=_SHINGLE_K, num_hashes=_MINHASHES)


def _q_minhash_lsh_pairs(spark, sf):
    """Banded-LSH candidate pairs over the KM signatures — the engine
    operator itself (bucket collect_set + bucket-local pairing, one
    shuffle by band key), exact semantics (no bucket cap)."""
    return DT.minhash_lsh_pairs(_t(spark, sf, "documents"), k=_SHINGLE_K,
                                num_hashes=_MINHASHES, bands=_BANDS)


def _q_ngram_jaccard_pairs(spark, sf):
    return DT.ngram_jaccard_pairs(_t(spark, sf, "documents"),
                                  k=_SHINGLE_K, threshold=0.5)


def _q_json_extract(spark, sf):
    """Section-JSON projection analogue (from_json over the props payload;
    reference json.loads at parser/DetaiParser.py:747)."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


def _q_collect_sorted(spark, sf):
    """Pagination re-assembly analogue: collect rows per key in
    deterministic page order (SURVEY.md §2.4 pagination accumulation)."""
    li = _t(spark, sf, "lineitem")
    return (li.groupBy("l_orderkey")
            .agg(F.concat_ws(
                ",", F.sort_array(F.collect_list(
                    F.col("l_linenumber").cast("string")))).alias("lines")))


def _q_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the streaming-style stateful op expressed with windows."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id")
            .agg(F.max("sess_id").alias("n_sessions"),
                 F.count("*").alias("n_events")))


def _q_stats_per_type(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.avg("value"), 4).alias("avg_value"),
                 F.round(F.stddev_samp("value"), 4).alias("std_value"),
                 F.round(F.min("value"), 6).alias("min_value"),
                 F.round(F.max("value"), 6).alias("max_value"),
                 F.round(F.expr("percentile(value, 0.5)"), 6)
                 .alias("median_value")))


def _q_pivot_lang(spark, sf):
    d = _t(spark, sf, "documents")
    langs = ["en", "zh", "de", "fr", "es"]
    return (d.groupBy("source")
            .pivot("lang", langs)
            .agg(F.count(F.lit(1)))
            .select("source",
                    *[F.coalesce(F.col(l), F.lit(0)).alias("n_" + l)
                      for l in langs]))


def _q_cube_type_lang(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.cube("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def _q_sim_brute_topk(spark, sf):
    """Integer-quantized dot-product top-10 vs the vec_id=0 query vector —
    quantization makes the score exact in both engines."""
    e = _t(spark, sf, "embeddings")
    qvec = e.filter("vec_id = 0").select(
        F.transform("embedding",
                    lambda x: F.round(x.cast("double") * 1000)).alias("q"))
    quant = F.transform("embedding",
                        lambda x: F.round(x.cast("double") * 1000))
    dot = F.aggregate(
        F.zip_with(quant, F.col("q"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v)
    return (e.crossJoin(F.broadcast(qvec))
            .select("vec_id", dot.cast("long").alias("dot"))
            .orderBy(F.col("dot").desc(), F.col("vec_id"))
            .limit(10))


def _q_sim_label_centroid_topk(spark, sf):
    """Per-label centroid top-k over integer-quantized embeddings: the
    quantization makes every per-dimension sum an exact integer, so the
    distributed centroid mean is reduction-order independent and the
    cosine (a per-row sequential fold) is bit-identical cross-engine —
    which is what makes the DuckDB oracle possible."""
    e = _t(spark, sf, "embeddings").withColumn(
        "embedding",
        F.transform("embedding",
                    lambda x: F.round(x.cast("double") * 1000)))
    return SIM.pairwise_topk_by_label(e, k=5)


def _q_ann_lsh_topk(spark, sf):
    # oracle-able: the hyperplanes are deterministic md5-derived constants
    # (similarity.py::_hyperplane) embedded as literals in the SQL, and the
    # per-row dot/cosine folds are bit-identical across engines (verified:
    # 0 bucket mismatches, 0 cosine-at-6dp mismatches on sf0.01)
    e = _t(spark, sf, "embeddings")
    query = [r[0] for r in
             e.filter("vec_id = 0")
             .select(F.explode("embedding")).collect()]
    return SIM.lsh_topk(e, query, k=10, bits=8)


def _q_ann_ivf_topk(spark, sf):
    # lloyd_iters=0 variant: seed centroids are the n_centroids lowest-id
    # vectors — fully expressible in SQL, so this entry gets an oracle;
    # the Lloyd-refined variant stays covered by the pytest recall tests
    e = _t(spark, sf, "embeddings")
    query = [r[0] for r in
             e.filter("vec_id = 0")
             .select(F.explode("embedding")).collect()]
    cents = SIM.ivf_centroids(e, n_centroids=16, lloyd_iters=0)
    return SIM.ivf_topk(e, query, k=10, nprobe=4, centroids=cents)


def _q_simhash_groups(spark, sf):
    # oracle-able: the 60-bit fingerprint derives from md5 (the shared
    # hash), reproducible in DuckDB via CAST('0x'||substr(md5(..),1,15))
    return DT.simhash_dup_groups(_t(spark, sf, "documents"))


def _q_simhash_near_pairs(spark, sf):
    """Hamming<=3 near-dup pairs via 4-band pigeonhole banding + exact
    popcount verify (operators/dedup_text.py::simhash_near_pairs).  The
    oracle is the brute-force all-pairs Hamming filter — banding only
    prunes candidates, so the results must be identical."""
    return DT.simhash_near_pairs(_t(spark, sf, "documents"),
                                 max_hamming=3, n_bands=4)


def _q_max_by(spark, sf):
    """max_by/min_by with a composite (value, id) key; the oracle expresses
    the same lexicographic argmax with row_number windows."""
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.max_by("event_id", F.struct("value", "event_id"))
                 .alias("top_event_id"),
                 F.min_by("event_id", F.struct("value", "event_id"))
                 .alias("bottom_event_id")))


def _q_approx_distinct(spark, sf):
    """HLL frontier-cardinality metric (SURVEY.md §2.4) made officially
    checkable (VERDICT r03 ask #3): the HLL estimate itself is
    engine-specific, so the checked surface is the per-group exact count
    plus a boolean `within_5pct` = |approx − exact| ≤ 0.05·exact computed
    from the SAME aggregation — the oracle returns the exact counts with
    a constant-true bound, turning the pytest-only ±5% tolerance
    (tests/test_multimodal_codec.py) into a driver-verified row."""
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id").alias("approx"),
                 F.countDistinct("user_id").alias("exact_users"))
            .select("event_type", "exact_users",
                    (F.abs(F.col("approx") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users")).alias("within_5pct")))


def _q_approx_quantiles(spark, sf):
    """Sketch quantiles (`percentile_approx`, Spark's KLL-family summary —
    the latency/size-distribution workhorse at 100 TB where an exact
    percentile would global-sort) made officially checkable with the
    approx_distinct_users recipe: the sketch output is engine-specific,
    so the checked surface is (a) the exact interpolated quantiles from
    the same data and (b) per-group booleans asserting the sketch's rank
    contract held — the empirical rank of the approx p-quantile (fraction
    of values ≤ it, one broadcast-join pass, no sort) is within
    0.01 + the group's largest tie fraction of p (accuracy=10000 → rank
    error ≤ 1e-4; the tie term covers the corpus-dependent step height of
    the empirical CDF — see the inline note).  The
    oracle returns the same exact quantiles (quantile_cont: both engines
    interpolate at rank (n-1)p) with constant-true bounds."""
    ev = _t(spark, sf, "events")
    agg = (ev.groupBy("event_type")
           .agg(F.percentile_approx("value", 0.5, 10000).alias("ap50"),
                F.percentile_approx("value", 0.9, 10000).alias("ap90"),
                F.expr("percentile(value, 0.5D)").alias("ex50"),
                F.expr("percentile(value, 0.9D)").alias("ex90"),
                F.count(F.lit(1)).alias("n_events")))
    ranks = (ev.join(F.broadcast(agg), "event_type")
             .groupBy("event_type")
             .agg((F.sum((F.col("value") <= F.col("ap50")).cast("long"))
                   / F.first("n_events")).alias("r50"),
                  (F.sum((F.col("value") <= F.col("ap90")).cast("long"))
                   / F.first("n_events")).alias("r90")))
    # Tie-aware bound: the empirical rank of ANY point lands on a step of
    # height (tie mass)/n, so the achievable deviation from p is bounded
    # below by the largest per-group tie fraction — a corpus property, not
    # a sketch property.  A fixed 0.01 happened to clear the current
    # corpus (worst tie ~1.06% of one group, worst deviation 0.0075) but
    # would spuriously fail on a seed/scale with a heavier tie at the
    # p50/p90 rank; 0.01 + tie_frac tests the sketch contract itself.
    ties = (ev.groupBy("event_type", "value")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("event_type")
            .agg((F.max("c") / F.sum("c")).alias("tie_frac")))
    bound = F.lit(0.01) + F.col("tie_frac")
    return (agg.join(ranks, "event_type").join(ties, "event_type")
            .select("event_type", "n_events",
                    F.round("ex50", 4).alias("exact_p50"),
                    F.round("ex90", 4).alias("exact_p90"),
                    (F.abs(F.col("r50") - 0.5) <= bound).alias("rank_ok_p50"),
                    (F.abs(F.col("r90") - 0.9) <= bound).alias("rank_ok_p90")))


def _q_multimodal_features(spark, sf):
    """Binary-payload feature plumbing (operators/multimodal.py) over the
    deterministic md5 stand-in path.  The raw array<float> feature stays
    inside the operator — the check surface projects it to scalar columns
    (dim + concat of rounded components) because the driver's canonicalizer
    cannot sort/factorize list cells (r01 hard error: "unhashable type:
    'list'").  Oracled since r04: the stand-in feature is md5-byte
    arithmetic (byte i/255 as float32), exactly reproducible in SQL — all
    256 possible byte values were verified to format identically under
    Spark's format_number(HALF_UP decimal) and DuckDB's printf (binary
    round-half-even) because k/255 never lands on a .00005 boundary."""
    from new_ent_crawler_spark.operators import multimodal as MM
    d = _t(spark, sf, "documents")
    media = d.select(F.col("doc_id").alias("media_id"),
                     F.encode("text", "utf-8").alias("payload"))
    feats = MM.extract_features(media, dim=8)
    feat_sig = F.concat_ws(
        ",", F.transform("feature",
                         lambda x: F.format_number(x.cast("double"), 4)))
    return feats.select("media_id", "n_bytes", "digest",
                        F.size("feature").cast("long").alias("feature_dim"),
                        feat_sig.alias("feature_sig"))


def _q_bmp_decode_features(spark, sf):
    """REAL image-codec path: per doc, synthesize a deterministic 4x4
    24-bpp BMP worker-side, round-trip it through the pure-numpy
    encode_bmp/decode_image pair (operators/multimodal.py), and emit
    per-channel pixel sums + the md5 of the decoded RGB hex.  The oracle
    reproduces the identical values from md5 string arithmetic, so BGR
    ordering, the bottom-up row flip, and stride handling are all
    hash-checked."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.bmp_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_png_decode_features(spark, sf):
    """REAL compressed-image-codec path (VERDICT r03 ask #4): per doc,
    synthesize a deterministic 4x5 RGB image worker-side, round-trip it
    through the pure stdlib+numpy encode_png/decode_image pair
    (operators/multimodal.py) — rows are filtered with PNG filter y%5, so
    all five scanline filters (None/Sub/Up/Average/Paeth) plus the zlib
    inflate and chunk CRCs sit on the checked path — and emit per-channel
    pixel sums + the md5 of the decoded RGB hex.  The oracle reproduces
    the identical values from md5 string arithmetic."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.png_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_gif_decode_features(spark, sf):
    """REAL GIF codec path: per doc, synthesize a deterministic 5-color
    4x4 paletted image worker-side, round-trip it through the pure
    stdlib+numpy encode_gif/decode_gif pair (operators/multimodal.py —
    palette quantization + variable-width LZW with the width schedule the
    1x1-pixel public golden fixture pins), and emit per-channel pixel
    sums + the md5 of the decoded RGB hex.  The oracle rebuilds the same
    values from md5 string arithmetic (palette lookup by hex slice)."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.gif_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_wav_decode_features(spark, sf):
    """REAL audio-codec path: per doc, synthesize 8 stereo frames of
    deterministic int16 PCM worker-side (two md5 digests taken as
    little-endian samples), round-trip them through the pure
    stdlib+numpy encode_wav/decode_audio pair (operators/multimodal.py —
    a chunk-walking RIFF parser, not a byte-offset hardcode), and emit
    per-channel sample sums + the md5 of the decoded PCM hex.  The
    oracle reproduces the identical sums from hex-substring arithmetic
    (lo + 256*hi, sign-corrected) and the digest from the concatenated
    block hex, so byte order, channel interleave, and header parsing are
    all hash-checked."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.wav_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_mp3_header_features(spark, sf):
    """REAL compressed-audio metadata path: per doc, synthesize a VBR
    MPEG-1 Layer III stream (valid spec headers + filler payloads, behind
    an ID3v2.3 tag) worker-side and walk it back through the pure-python
    frame-header scanner (operators/multimodal.py::scan_mp3_headers —
    syncsafe tag skip, sync scan, Table B.1 bitrate lookup, the
    144*bitrate/rate+padding frame-length hop).  Emits frame count,
    stream bytes, duration, bitrate sum, and the md5 of the concatenated
    frame headers; the oracle reproduces every column from md5 hex
    arithmetic and the same public tables."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.mp3_header_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_jpeg_decode_features(spark, sf):
    """REAL lossy-image-codec path: per doc, synthesize a 16x16 grayscale
    image of four flat 8x8 blocks worker-side and round-trip it through
    the pure-numpy baseline JPEG codec (operators/multimodal.py —
    canonical Annex K Huffman entropy coding, zigzag, quantization,
    float IDCT, byte stuffing).  Flat blocks under an all-ones
    quantization table make baseline JPEG exactly invertible, so the
    DuckDB oracle reproduces the pixel sum and the decoded-bytes digest
    from md5 string arithmetic alone; the general lossy path is
    tolerance-tested in pytest (tests/test_multimodal_codec.py)."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.jpeg_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_jpeg_color_decode_features(spark, sf):
    """Color JPEG path: the flat-block oracle trick extended to 4:4:4
    YCbCr — flat GRAY blocks convert to chroma planes of exactly 128, so
    the 3-component interleaved encode/decode (per-component DC
    predictors, JFIF color transforms both ways) stays byte-exact and
    the oracle rebuilds the RGB hex by tripling each gray md5 byte.
    Lossy color content is tolerance-tested in pytest."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.jpeg_color_roundtrip_features(
        _t(spark, sf, "documents").select("doc_id"))


def _q_contamination_probes(spark, sf):
    """Benchmark-contamination check (functions/text.py::
    contamination_hits): five probe strings — substrings of docs 1-5, a
    bounded driver-side collect since probe sets are small by definition
    — are scanned against every document's text in ONE JVM-side pass
    (filter over an array literal with contains; no cross join), then
    counted per probe.  The oracle re-derives the probes and joins on
    contains()."""
    from new_ent_crawler_spark.functions.text import contamination_hits
    d = _t(spark, sf, "documents")
    probes = [r.probe for r in
              d.filter(F.col("doc_id").isin(1, 2, 3, 4, 5))
              .select(F.expr("substr(text, 11, 24)").alias("probe"))
              .collect()]
    return (contamination_hits(d, probes)
            .orderBy("probe"))


def _q_avi_frame_sample(spark, sf):
    """REAL video-container path: per doc, synthesize a 6-frame 4x2 RGB
    video worker-side, round-trip it through the pure stdlib+numpy
    encode_avi/decode_avi pair (operators/multimodal.py — RIFF chunk
    walk of hdrl/strl/movi/idx1, uncompressed bottom-up BGR DIB frames),
    sample one frame per 500 ms of timeline at 4 fps (frame index
    t*fps//1000 -> frames 0, 2, 4), and emit per-channel sums + the md5
    of each sampled frame's RGB hex.  The oracle replays the identical
    sampling arithmetic and rebuilds the values from md5 strings."""
    from new_ent_crawler_spark.operators import multimodal as MM
    return MM.avi_frame_sample_features(
        _t(spark, sf, "documents").select("doc_id"))


# --------------------------------------------------------------------------
# temporal joins, window frames, extended TPC-H, set ops, string/array suite
# --------------------------------------------------------------------------

def _q_asof_click_purchase(spark, sf):
    """As-of join (operators/temporal.py): for each click, the most recent
    purchase by the same user at or before the click — one shuffle, union +
    window, no per-key range probe.  Generalizes the reference's
    last-writer-wins lookups (utils/MysqlDBHelper.py:22-31) to event time."""
    from new_ent_crawler_spark.operators.temporal import asof_join
    ev = _t(spark, sf, "events")
    clicks = ev.filter("event_type = 'click'").select(
        "event_id", "user_id", "ts")
    purch = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_event_id"), "user_id",
        F.col("ts").alias("p_ts"), F.col("value").alias("p_value"))
    out = asof_join(clicks, purch, on="user_id",
                    left_ts="ts", right_ts="p_ts",
                    payload_cols=["purchase_event_id", "p_value"],
                    tiebreak="purchase_event_id")
    return out.select("event_id", "user_id", "purchase_event_id",
                      F.round("p_value", 6).alias("purchase_value"))


def _q_range_join_tiers(spark, sf):
    """Range join: facts into half-open [lo, hi) interval buckets from a
    broadcast dim (operators/temporal.py::range_join)."""
    from new_ent_crawler_spark.operators.temporal import range_join
    li = _t(spark, sf, "lineitem")
    tiers = spark.createDataFrame(
        [("low", 1, 15), ("mid", 15, 35), ("high", 35, 51)],
        "tier string, lo int, hi int")
    return (range_join(li, tiers, "l_quantity")
            .groupBy("tier")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


def _q_moving_avg_daily(spark, sf):
    """ROWS-frame moving average (4-day trailing) over daily event counts."""
    ev = _t(spark, sf, "events")
    daily = (ev.groupBy("event_type",
                        F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.count("*").alias("n_events")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 0))
    return daily.select(
        "event_type", "day", "n_events",
        F.round(F.avg("n_events").over(w), 4).alias("moving_avg"))


def _q_lag_delta_user(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"))


def _q_ntile_quartiles(spark, sf):
    """ntile(4) global quartiles via operators/ranking.distributed_ntile:
    a sampled range exchange + per-partition row_number + P-integer offset
    broadcast reproduces SQL NTILE's remainder rule exactly WITHOUT the
    single-partition global window (the plan shows RangePartitioning, not
    SinglePartition — parallel at any scale)."""
    from new_ent_crawler_spark.operators.ranking import distributed_ntile
    o = _t(spark, sf, "orders")
    t = distributed_ntile(o, 4, ["o_totalprice", "o_orderkey"])
    return (t.select(F.col("tile").alias("quartile"), "o_totalprice")
            .groupBy("quartile")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("min_price"),
                 F.round(F.max("o_totalprice"), 2).alias("max_price")))


def _q_running_total_daily(spark, sf):
    ev = _t(spark, sf, "events")
    daily = (ev.groupBy("event_type",
                        F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.count("*").alias("n_events")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return daily.select("event_type", "day", "n_events",
                        F.sum("n_events").over(w).alias("running_total"))


def _q_first_last_event(spark, sf):
    ev = _t(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (ev.select("user_id",
                      F.first("event_type").over(w).alias("first_type"),
                      F.last("event_type").over(w).alias("last_type"))
            .distinct())


def _q_tpch_q4ish(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter("l_returnflag = 'R'")
    return (o.join(li.select(F.col("l_orderkey").alias("o_orderkey")),
                   "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


def _q_tpch_q6(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * F.col("l_discount")), 2).alias("revenue")))


def _q_tpch_q12ish(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_count")))


def _q_tpch_q14ish(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01"))
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg(F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                        .otherwise(0.0)) / F.sum(rev), 4)
                .alias("promo_revenue")))


def _q_tpch_q18ish(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    li = _t(spark, sf, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter("sum_qty > 150"))
    return (o.join(big, o["o_orderkey"] == big["l_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .select("c_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice"),
                    F.round("sum_qty", 2).alias("sum_qty")))


def _q_tpch_q19ish(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#13")
         & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#20")
           & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#11")
           & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15)))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .filter(cond)
            .agg(F.round(F.sum(rev), 2).alias("revenue")))


def _q_tpch_q17ish(spark, sf):
    """Correlated-avg decorrelated as a self-agg join: lineitems below 20%%
    of their part's average quantity (avg of integer quantities is exact, so
    the threshold is reduction-order independent)."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter("p_brand = 'Brand#13'")
    lim = (li.groupBy(F.col("l_partkey").alias("pk"))
           .agg((F.lit(0.2) * F.avg("l_quantity")).alias("lim")))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(lim, li["l_partkey"] == lim["pk"])
            .filter(F.col("l_quantity") < F.col("lim"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


def _q_tpch_q22ish(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    avg_bal = c.filter("c_acctbal > 0").agg(
        F.avg("c_acctbal").alias("abal"))
    big_orders = (o.filter("o_totalprice > 400000")
                  .select(F.col("o_custkey").alias("c_custkey")))
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("abal"))
            .join(big_orders, "c_custkey", "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


def _q_top_supplier_revenue(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    s = _t(spark, sf, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
            .join(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .select("s_suppkey", "s_name", "total_revenue"))


def _q_grouping_sets_daily(spark, sf):
    ev = _t(spark, sf, "events")
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql("""
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day,
               count(*) AS n_events
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type, date_format(ts, 'yyyy-MM-dd')),
                                (date_format(ts, 'yyyy-MM-dd')), ())
    """)


def _q_intersect_except(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    inter = c.intersect(o).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("op"), "n")
    exc = c.subtract(o).agg(
        F.count("*").alias("n")).select(F.lit("except").alias("op"), "n")
    return inter.unionByName(exc)


def _q_string_funcs(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("pad"),
        F.substring("c_name", 10, 4).alias("mid"),
        F.regexp_replace("c_name", "Customer", "C").alias("rep"),
        F.length("c_name").alias("len"),
        F.instr("c_name", "#").alias("pos"),
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("dist"))


def _q_array_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.array_sort(F.array_distinct(
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0)))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_distinct"),
        F.concat_ws(",", F.slice(toks, 1, 3)).alias("first3"))


def _q_value_histogram(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.floor(F.col("value") / 50).alias("bucket"))
            .agg(F.count("*").alias("n_events")))


def _q_corr_value_ts(spark, sf):
    ev = _t(spark, sf, "events")
    # ts is TIMESTAMP_NTZ; the ntz->tz cast adds a constant offset, which
    # cancels in corr (shift-invariant). Both engines truncate to whole ms.
    secs = (F.unix_millis(F.col("ts").cast("timestamp"))
            - F.lit(1704067200000)) / 1000.0
    return (ev.groupBy("event_type")
            .agg(F.round(F.corr(F.col("value"), secs), 4).alias("corr_vt")))


def _q_embedding_pair_topk(spark, sf):
    """Embedding near-dup / similarity pairs: exact integer-quantized dot
    product over ALL vec pairs, top-20 — via the sharded-GEMM plan
    (operators/similarity.py::exact_pair_topk): blocks join B(B+1)/2
    ways, each block pair scores with one numpy matmul and keeps a local
    top-k, so only B²·k candidate rows reach the final sort instead of
    n²/2 (the r01-r03 self-join pin is gone).  LSH buckets
    (operators/similarity.py::lsh_topk) remain the approximate path when
    even sharded-exact is too costly."""
    from new_ent_crawler_spark.operators.similarity import exact_pair_topk
    return exact_pair_topk(_t(spark, sf, "embeddings"), k=20, n_blocks=4)


def _q_map_pivot_user(spark, sf):
    """MapType surface: per-user event_type->count map built with
    map_from_entries, probed with element_at (projected to scalar columns
    so the cross-engine compare stays deterministic)."""
    ev = _t(spark, sf, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"))
    m = (counts.groupBy("user_id")
         .agg(F.map_from_entries(
             F.sort_array(F.collect_list(F.struct("event_type", "n"))))
             .alias("m")))
    return m.select(
        "user_id",
        *[F.coalesce(F.element_at("m", t), F.lit(0)).alias("n_" + t)
          for t in ["click", "view", "purchase", "signup", "error"]])


def _q_hof_order_prices(spark, sf):
    """Higher-order-function surface: per-order discounted price array via
    collect_list -> sort_array, reduced with aggregate / filter / array_max.
    The array is sorted first so float summation order is identical in both
    engines."""
    li = _t(spark, sf, "lineitem")
    # raw doubles, no per-element rounding (a .xx5 cent boundary rounds
    # differently across engines); the sorted order fixes the summation
    # order, so the float total is bit-identical before the final round
    price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    arr = F.sort_array(F.collect_list(price))
    per = li.groupBy("l_orderkey").agg(arr.alias("prices"))
    total = F.aggregate("prices", F.lit(0.0), lambda a, v: a + v)
    n = F.size("prices")
    # no decimal rounding anywhere: the pinned order makes every double
    # bit-identical across engines, and rounding a .xx5-adjacent double is
    # the one thing the engines disagree on
    return per.select(
        "l_orderkey",
        n.cast("long").alias("n_items"),
        total.alias("total"),
        F.array_max("prices").alias("max_price"),
        F.size(F.filter("prices", lambda v: v > total / n))
        .cast("long").alias("n_above_avg"))


def _q_lang_id_confusion(spark, sf):
    """Heuristic language-ID (functions/text.py::lang_id) scored against the
    corpus's lang labels as a confusion-matrix count."""
    d = _t(spark, sf, "documents")
    return (d.select(TX.lang_id("text").alias("pred_lang"), "lang")
            .groupBy("pred_lang", "lang")
            .agg(F.count("*").alias("n_docs")))


def _q_salted_skew_join(spark, sf):
    """Skew-safe salted join: fact side salted by a deterministic key hash,
    dim side exploded across the salt domain — result provably equals the
    plain join (the oracle IS the plain join)."""
    nsalt = 8
    ev = _t(spark, sf, "events").withColumn(
        "_salt", F.pmod(F.col("event_id"), F.lit(nsalt)).cast("int"))
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    dim = c.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(nsalt)])))
    return (ev.join(dim, ["user_id", "_salt"])
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def _q_bloom_prune_new_keys(spark, sf):
    """Official check of the Bloom-pruned seen-set path (operators/
    dedup.py::filter_new_urls): candidates minus seen keys with the Bloom
    as a pruning pre-filter.  The oracle is the plain anti-join — Bloom
    false positives fall through to the exact join, so the result must be
    identical (the engine's correctness rule, SURVEY.md §4)."""
    from new_ent_crawler_spark.operators import dedup as DDUP
    seen = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("url"))
    cand = (_t(spark, sf, "orders")
            .select((F.col("o_orderkey") % 3000).cast("string").alias("url"))
            .distinct())
    bloom = DDUP.build_bloom(seen, expected=5000)
    return DDUP.filter_new_urls(cand, seen, bloom).select("url")


def _q_cuckoo_prune_new_keys(spark, sf):
    """Official check of the CUCKOO-pruned seen-set path — the
    north_star's named alternative to the Bloom (supports deletion;
    operators/dedup.py::CuckooFilter).  Built via the same treeReduce
    partition-local pattern; a cuckoo positive falls through to the exact
    anti-join, so the result must equal the plain anti-join (the oracle).
    The add-then-delete sentinel exercises the deletion path and is
    provably oracle-safe: delete only ever follows an insert of the SAME
    key (the standard cuckoo deletion precondition — see CuckooFilter's
    docstring), and because the alternate bucket is an involution of
    (bucket, fp), any other key colliding with the sentinel shares its
    exact bucket pair — the add put one extra copy of that (pair, fp)
    in, the delete takes exactly one out, so every still-present key
    keeps >= its original copies and stays positive."""
    from new_ent_crawler_spark.operators import dedup as DDUP
    seen = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("url"))
    cand = (_t(spark, sf, "orders")
            .select((F.col("o_orderkey") % 3000).cast("string").alias("url"))
            .distinct())
    cf = DDUP.build_cuckoo(seen, expected=5000)
    cf.add("sentinel-key")
    cf.delete("sentinel-key")  # deletion support, exercised
    return DDUP.filter_new_urls(cand, seen, cf).select("url")


def _q_window_range_frame(spark, sf):
    """RANGE frame (value-based window): per user, the 5-minute trailing
    sum of event values ordered by epoch second — peers at the same second
    are all included, which is what distinguishes RANGE from ROWS."""
    ev = _t(spark, sf, "events")
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (Window.partitionBy("user_id").orderBy(secs.alias("sec"))
         .rangeBetween(-300, 0))
    # quantize to centi-units before the frame sum: integral doubles sum
    # exactly, so the windowed total is independent of the engines'
    # frame-aggregation association order (Spark running-sum vs DuckDB
    # segment tree)
    q = F.round(F.col("value") * 100)
    return ev.select("event_id", "user_id",
                     (F.sum(q).over(w) / 100.0).alias("sum_5min"))


def _q_time_bucket_5min(spark, sf):
    """Tumbling 5-minute windows via F.window — the batch analogue of the
    streaming windowed aggregation (streaming/stream.py)."""
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm")
                    .alias("bucket"),
                    "event_type", "n_events", "sum_value"))


def _q_unpivot_lang_counts(spark, sf):
    """Wide -> long unpivot (melt) of the per-source language counts."""
    wide = _q_pivot_lang(spark, sf)
    langs = ["en", "zh", "de", "fr", "es"]
    return (wide.unpivot("source", ["n_" + l for l in langs], "lang", "n")
            .withColumn("lang", F.regexp_replace("lang", "^n_", "")))


def _q_rank_functions(spark, sf):
    """rank / dense_rank / percent_rank / cume_dist with a unique composite
    sort key, so peer groups are singletons and the fractional ranks are
    exact rationals (identical doubles in both engines)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority", "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"))


def _q_word_ngram_jaccard(spark, sf):
    """Word-trigram Jaccard near-dup pairs — the cheap dedup granularity
    (one shingle per word position, ~15x fewer rows than char-8 shingles
    on this corpus; same posting-list plan)."""
    return DT.word_ngram_jaccard_pairs(_t(spark, sf, "documents"),
                                       n=3, threshold=0.5)


def _q_top_terms_per_doc(spark, sf):
    """Per-document top-3 terms by raw term frequency with document-
    frequency and term tiebreaks — the TF-IDF shape with integer-only
    ranking (no cross-engine float ordering)."""
    d = _t(spark, sf, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(DT.normalized_text("text"), " "))
                     .alias("term"))
            .filter(F.length("term") > 0))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (tf.join(df, "term")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "term", "tf", "df", "rk"))


def _q_link_pagerank(spark, sf):
    """Damped PageRank (3 power iterations, d=0.85, dangling-mass
    redistribution) over a deterministic link graph derived from events —
    the centrality signal a crawl scheduler feeds into frontier priority
    (generalizing the reference's listing-before-detail score,
    spiders/worker.py:168-190).  Iterative DataFrame plan with
    localCheckpoint lineage truncation; oracle is the same recurrence
    unrolled as chained CTEs."""
    from new_ent_crawler_spark.operators import linkgraph as LG
    edges = LG.derive_edges(_t(spark, sf, "events"))
    return (LG.pagerank(edges, damping=0.85, iterations=3)
            .select("node", F.round("rank", 6).alias("pr")))


def _q_link_degree_stats(spark, sf):
    """Per-node in/out degree over the derived link graph — the fan-in /
    fan-out profile a politeness scheduler reads (full-outer stitch so
    pure sinks and pure sources both appear)."""
    from new_ent_crawler_spark.operators import linkgraph as LG
    edges = LG.derive_edges(_t(spark, sf, "events"))
    return LG.degree_stats(edges)


def _q_recrawl_schedule(spark, sf):
    """Change-frequency recrawl scheduling (operators/recrawl.py): map a
    deterministic sitemaps.org changefreq onto events, compute the revisit
    interval, next-due timestamp and due flag against a fixed mid-range
    clock — all JVM expressions, NTZ-frame comparisons (session timezone
    cannot shift the schedule).  'never' rows have NULL interval/next_due
    and are never due."""
    from new_ent_crawler_spark.operators import recrawl as RC
    ev = _t(spark, sf, "events").select(
        "event_id", F.col("ts").alias("lastmod_ts"),
        F.when(F.col("event_type") == "click", "hourly")
        .when(F.col("event_type") == "view", "always")
        .when(F.col("event_type") == "purchase", "weekly")
        .when(F.col("event_type") == "signup", "monthly")
        .otherwise("never").alias("changefreq"))
    out = RC.revisit_schedule(ev, now="2024-01-20 00:00:00")
    return out.select(
        "event_id", "changefreq", "interval_s",
        F.date_format("next_due", "yyyy-MM-dd HH:mm:ss").alias("next_due"),
        "is_due")


def _q_registered_domain(spark, sf):
    """Public-suffix registered-domain extraction (publicsuffix.org
    algorithm: exception > longest normal/wildcard rule > implicit ``*``)
    over hosts synthesized to hit every rule shape — multi-label suffixes
    (co.uk), wildcard (``*.kawasaki.jp``, ``*.ck``), exceptions
    (``!city.kawasaki.jp``, ``!www.ck``), private-section rules
    (github.io), unknown TLDs, and hosts that ARE a public suffix (NULL
    registered domain).  Plan: explode trailing label suffixes +
    broadcast rules dim + per-host argmax (functions/psl.py) — no Python.
    The reference never needs this (single registry domain); an open-web
    politeness/link-graph bucket does."""
    from new_ent_crawler_spark.functions import psl
    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    host = (
        F.when(eid % 9 == 0, F.lit("www.example.com"))
        .when(eid % 9 == 1, F.lit("a.b.example.co.uk"))
        .when(eid % 9 == 2, F.lit("co.uk"))
        .when(eid % 9 == 3, F.concat(F.lit("x"), (eid % 5).cast("string"),
                                     F.lit(".kawasaki.jp")))
        .when(eid % 9 == 4, F.lit("city.kawasaki.jp"))
        .when(eid % 9 == 5, F.concat(F.lit("shop"), (eid % 3).cast("string"),
                                     F.lit(".other.ck")))
        .when(eid % 9 == 6, F.lit("www.ck"))
        .when(eid % 9 == 7, F.concat(F.lit("u"), (eid % 4).cast("string"),
                                     F.lit(".github.io")))
        .otherwise(F.concat(F.lit("site"), (eid % 7).cast("string"),
                            F.lit(".nosuchtld"))))
    hosts = ev.select(host.alias("host")).groupBy("host") \
        .agg(F.count("*").alias("n_urls"))
    return psl.with_registered_domain(hosts).select(
        "host", "public_suffix", "registered_domain", "n_urls")


def _q_cdx_index(spark, sf):
    """CDX index rows (SURT, 14-digit timestamp, url, sha-256 digest,
    length) — the Common-Crawl per-segment URL index — built from URLs
    synthesized over events with the event's payload standing in for the
    page body.  Pure JVM expressions end to end (sources/cdx.py); the
    stored form is range-partitioned by SURT so prefix lookups prune
    (tests/test_cdx_psl_warcsink.py)."""
    from new_ent_crawler_spark.sources.cdx import build_cdx
    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    url = F.concat(
        F.lit("https://h"), (eid % 5).cast("string"),
        F.lit(".site"), (eid % 3).cast("string"),
        F.lit(".example.com/p/"), (eid % 13).cast("string"),
        F.when(eid % 4 == 0, F.lit("?b=2&a=1"))
        .when(eid % 4 == 1, F.lit("?a=1&b=2")).otherwise(F.lit("")))
    pages = ev.select("event_id", url.alias("url"),
                      F.col("ts").alias("warc_ts"),
                      F.col("props").alias("body"))
    return build_cdx(pages, body_col="body", utc_from_tz=None,
                     keep_cols=["event_id"])


def _q_cdx_revisit(spark, sf):
    """WARC revisit-record classification (ISO 28500 §6.7.2 / Common
    Crawl dedup): each recrawl capture is ``new`` (url never captured),
    ``revisit`` (payload digest equals the url's latest previous
    capture — store a reference, not a body copy), or ``changed``.  Two
    index generations are synthesized from events: the previous crawl
    covers url keys k=0-29 with body ``A<k>``; the recrawl covers keys
    0-39, each capture keeping body ``A<k>`` iff its event_id%3==0.
    Expected per capture: k>=30 → new; event_id%3==0 and k<30 → revisit;
    else changed (sources/cdx.py::classify_revisits, one max-aggregate +
    one url join, no window sort)."""
    from new_ent_crawler_spark.sources.cdx import build_cdx, classify_revisits
    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    k = (eid % 40).cast("string")
    url = F.concat(F.lit("https://s"), (eid % 3).cast("string"),
                   F.lit(".example.com/p/"), k)
    prev_pages = ev.where(eid % 40 < 30).select(
        url.alias("url"), F.col("ts").alias("warc_ts"),
        F.concat(F.lit("A"), k).alias("body"))
    new_pages = ev.select(
        "event_id", url.alias("url"), F.col("ts").alias("warc_ts"),
        F.when(eid % 3 == 0, F.concat(F.lit("A"), k))
        .otherwise(F.concat(F.lit("B"), k)).alias("body"))
    prev_cdx = build_cdx(prev_pages, body_col="body", utc_from_tz=None)
    new_cdx = build_cdx(new_pages, body_col="body", utc_from_tz=None,
                        keep_cols=["event_id"])
    return classify_revisits(new_cdx, prev_cdx).select(
        "event_id", "url", "digest", "status", "prev_ts14")


def _q_dup_span_stats(spark, sf):
    """Exact duplicated-span statistics (operators/dedup_text.py::
    dup_span_stats): per document, how many of its 20-token rolling
    spans occur >= 2 times anywhere in the corpus — the fixed-window
    Spark shape of Lee et al.'s exact substring dedup.  Span hashes are
    built in-row (narrow); only compact (md5, doc) digests shuffle."""
    return (DT.dup_span_stats(_t(spark, sf, "documents"), span_tokens=20)
            .orderBy("doc_id"))


def _q_training_shards(spark, sf):
    """Token-budget training-shard packing (operators/sharding.py): lay
    documents out in doc_id order and bucket them at 2,000 tokens per
    shard (shard_id = floor(tokens-before / target) — deterministic,
    contiguous, bounded by target + one document).  The running token
    offset is a range-parallel global window sum (ranking.py::
    with_global_cumsum — range exchange + P-integer offset broadcast,
    never a SinglePartition window).  Returns the per-shard manifest."""
    from new_ent_crawler_spark.operators import sharding as SH
    return (SH.shard_summary(_t(spark, sf, "documents"),
                             target_tokens=2000, order_cols=("doc_id",))
            .orderBy("shard_id"))


def _q_url_canonicalize(spark, sf):
    """Canonicalize messy raw URLs (case, default ports, query-param order,
    fragments, empty paths) into the seen-set/frontier key form — the
    generalization of raw-URL equality the reference gets for free from its
    self-built URL grammar (spiders/worker.py).  Raw URLs are synthesized
    deterministically from events; the whole plan is JVM expressions
    (functions/url.py), no Python."""
    from new_ent_crawler_spark.functions import url as U
    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    raw = ev.select(
        "event_id",
        F.concat(
            F.when(eid % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
            F.lit("://Host"), (eid % 7).cast("string"),
            F.lit(".Example.COM"),
            F.when(eid % 3 == 0,
                   F.when(eid % 2 == 0, F.lit(":80")).otherwise(F.lit(":443"))
                   ).otherwise(F.lit("")),
            F.when(eid % 5 == 0, F.lit("")).otherwise(
                F.concat(F.lit("/"), F.col("event_type"),
                         F.lit("/p"), (eid % 11).cast("string"))),
            F.when(eid % 4 == 0,
                   F.concat(F.lit("?b=2&a="), (eid % 9).cast("string")))
            .when(eid % 4 == 1,
                  F.concat(F.lit("?a="), (eid % 9).cast("string"),
                           F.lit("&b=2")))
            .when(eid % 4 == 2, F.lit("?")).otherwise(F.lit("")),
            F.when(eid % 6 == 0, F.lit("#sec")).otherwise(F.lit("")),
        ).alias("url"))
    return raw.select(
        "event_id",
        U.canonicalize_url("url").alias("url_canon"),
        U.url_host("url").alias("host"),
        U.surt_key("url").alias("surt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is deliberate: the driver records official
    correctness rows for exactly the first 50 dict entries each round.
    Round-5 rotation (the final round): positions 1-5 are the entries
    with no official row yet or changed semantics this round
    (seen_set_anti_join's discriminating rewrite, the new
    mp3_header_features, and the three r04-late additions
    approx_quantiles_value / training_shards / dup_span_stats), followed
    by every entry whose most recent official green row is r03 — so
    after this round each of the 99 oracled entries has a green row
    within the last two CORRECTNESS files (everything displaced past
    position 50 is r04-green).  ALL oracled entries are additionally
    re-verified every run by tests/test_queries.py with the
    driver-parity compare."""
    return {
        # -- first-50 official window: no-official-row/changed first,
        #    then the stale-since-r03 set --------------------------------
        "seen_set_anti_join": _q_seen_set_anti_join,
        "mp3_header_features": _q_mp3_header_features,
        "approx_quantiles_value": _q_approx_quantiles,
        "training_shards": _q_training_shards,
        "dup_span_stats": _q_dup_span_stats,
        "sim_brute_topk": _q_sim_brute_topk,
        "explode_tokens": _q_explode_tokens,
        "events_daily": _q_events_daily,
        "text_quality": _q_text_quality,
        "asof_click_purchase": _q_asof_click_purchase,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "frontier_topk_per_host": _q_frontier_topk_per_host,
        "tpch_q5ish": _q_tpch_q5ish,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "dedup_exact": _q_dedup_exact,
        "fanout_rejoin": _q_fanout_rejoin,
        "broadcast_dim_join": _q_broadcast_dim_join,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "range_join_tiers": _q_range_join_tiers,
        "moving_avg_daily": _q_moving_avg_daily,
        "ntile_quartiles": _q_ntile_quartiles,
        "md5_dedup_key": _q_md5_dedup_key,
        "union_keys": _q_union_keys,
        "regex_digits": _q_regex_digits,
        "date_format_day": _q_date_format_day,
        "enum_decode": _q_enum_decode,
        "term_concat_none": _q_term_concat_none,
        "rollup_region_nation": _q_rollup_region_nation,
        "count_distinct_users": _q_count_distinct_users,
        "text_token_count": _q_text_token_count,
        "text_fingerprint_dups": _q_text_fingerprint_dups,
        "collect_sorted_lines": _q_collect_sorted,
        "stats_per_type": _q_stats_per_type,
        "cube_type": _q_cube_type_lang,
        "max_by_event": _q_max_by,
        "lag_delta_user": _q_lag_delta_user,
        "first_last_event": _q_first_last_event,
        "bmp_decode_features": _q_bmp_decode_features,
        "text_repetition": _q_text_repetition,
        "stratified_sample_lang": _q_stratified_sample,
        "dedup_cluster_keep": _q_dedup_cluster_keep,
        "tpch_q4ish": _q_tpch_q4ish,
        "tpch_q6": _q_tpch_q6,
        "semi_join_active": _q_semi_join_active,
        "minhash_signatures": _q_minhash_signatures,
        "simhash_groups": _q_simhash_groups,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "bloom_prune_new_keys": _q_bloom_prune_new_keys,
        "cuckoo_prune_new_keys": _q_cuckoo_prune_new_keys,
        # -- r04-green; behind the 50-row window, re-verified every run
        #    by tests/test_queries.py -------------------------------------
        "word_ngram_jaccard": _q_word_ngram_jaccard,
        "top_terms_per_doc": _q_top_terms_per_doc,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "sim_label_centroid_topk": _q_sim_label_centroid_topk,
        "embedding_pair_topk": _q_embedding_pair_topk,
        "tpch_q12ish": _q_tpch_q12ish,
        "tpch_q14ish": _q_tpch_q14ish,
        "tpch_q17ish": _q_tpch_q17ish,
        "tpch_q18ish": _q_tpch_q18ish,
        "tpch_q19ish": _q_tpch_q19ish,
        "tpch_q22ish": _q_tpch_q22ish,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "grouping_sets_daily": _q_grouping_sets_daily,
        "intersect_except_keys": _q_intersect_except,
        "string_funcs": _q_string_funcs,
        "array_token_stats": _q_array_token_stats,
        "value_histogram": _q_value_histogram,
        "corr_value_ts": _q_corr_value_ts,
        "salted_skew_join": _q_salted_skew_join,
        "lang_id_confusion": _q_lang_id_confusion,
        "map_pivot_user": _q_map_pivot_user,
        "hof_order_prices": _q_hof_order_prices,
        "json_extract_props": _q_json_extract,
        "sessionize_users": _q_sessionize,
        "pivot_lang_counts": _q_pivot_lang,
        "running_total_daily": _q_running_total_daily,
        "window_range_frame": _q_window_range_frame,
        "time_bucket_5min": _q_time_bucket_5min,
        "unpivot_lang_counts": _q_unpivot_lang_counts,
        "rank_functions": _q_rank_functions,
        "png_decode_features": _q_png_decode_features,
        "approx_distinct_users": _q_approx_distinct,
        "multimodal_features": _q_multimodal_features,
        "registered_domain": _q_registered_domain,
        "cdx_index": _q_cdx_index,
        "cdx_revisit": _q_cdx_revisit,
        "wave_priority_dequeue": _q_wave_priority_dequeue,
        "dedup_last_writer_wins": _q_dedup_last_writer_wins,
        "wav_decode_features": _q_wav_decode_features,
        "jpeg_decode_features": _q_jpeg_decode_features,
        "jpeg_color_decode_features": _q_jpeg_color_decode_features,
        "avi_frame_sample": _q_avi_frame_sample,
        "contamination_probes": _q_contamination_probes,
        "link_pagerank": _q_link_pagerank,
        "link_degree_stats": _q_link_degree_stats,
        "url_canonicalize": _q_url_canonicalize,
        "gif_decode_features": _q_gif_decode_features,
        "recrawl_schedule": _q_recrawl_schedule,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

_SHINGLES_SQL = f"""
    WITH norm AS (
        SELECT doc_id, {_NORM_SQL} AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               substring(t, CAST(pos AS INTEGER), {_SHINGLE_K}) AS shingle
        FROM (SELECT doc_id, t,
                     unnest(range(1, length(t) - {_SHINGLE_K - 2})) AS pos
              FROM norm WHERE length(t) >= {_SHINGLE_K})
    )
"""

# Kirsch-Mitzenmacher minhash family (operators/dedup_text.py::
# minhash_signatures): ONE md5 per shingle, two 56-bit base hashes from
# its hex, K functions derived as h1 + i*h2 (exact in signed 64-bit).
# DuckDB's CAST('0x'||hex AS BIGINT) == Spark's conv(hex,16,10)::long.
_MINHASH_SIG_SQL = _SHINGLES_SQL + """, kmb AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS b1,
               CAST('0x' || substr(md5(shingle), 17, 14) AS BIGINT) AS b2
        FROM sh
    ), sig AS (SELECT doc_id, """ + ", ".join(
    f"min(b1 + {i} * b2) AS h{i}" for i in range(_MINHASHES)
) + " FROM kmb GROUP BY doc_id)"

# DuckDB replica of operators/dedup_text.py::simhash: 60-bit fingerprint
# from md5-derived token hashes (CAST('0x'||hex AS BIGINT) == Spark's
# conv(hex,16,10)), per-bit majority vote, bit i set iff vote > 0.
_SIMHASH_FP_SQL = f"""
    WITH norm AS (
        SELECT doc_id, {_NORM_SQL} AS t FROM documents
    ), tok AS (
        SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
    ), tokh AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('0:' || tok), 1, 15) AS BIGINT) AS h
        FROM tok WHERE length(tok) > 0
    ), votes AS (
        SELECT doc_id, i,
               sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM tokh, (SELECT unnest(range(0, 60)) AS i)
        GROUP BY doc_id, i
    ), fp AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    )
"""

_VEC_DOUBLE = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sql_array(vals) -> str:
    """Double literals with full repr precision (exact round-trip)."""
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _lsh_bucket_sql(dim: int = 64, bits: int = 8) -> str:
    """DuckDB replica of similarity.py::rhp_signature_col with the
    deterministic md5-derived hyperplanes embedded as literals."""
    terms = []
    for b in range(bits):
        plane = _sql_array(SIM._hyperplane(b, dim))
        terms.append(f"(CASE WHEN list_dot_product(a, {plane}) >= 0 "
                     f"THEN {2 ** b} ELSE 0 END)")
    return " + ".join(terms)


# DuckDB replica of operators/linkgraph.py::derive_edges — the same
# md5-derived deterministic edge set (nodes >= 180 are pure sinks).
_LINK_EDGES_SQL = """
        raw AS (
            SELECT CAST(('0x' || substr(md5('s:' || CAST(event_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 180 AS src,
                   CAST(('0x' || substr(md5('d:' || CAST(event_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 211 AS dst
            FROM events),
        edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)"""


def _pagerank_oracle(damping: float = 0.85, iterations: int = 3) -> str:
    """operators/linkgraph.py::pagerank's recurrence unrolled as chained
    CTEs (one per power iteration) — aggregation inside a recursive CTE's
    recursive term is not portable SQL, so the fixed iteration count is
    unrolled instead."""
    sql = ("WITH" + _LINK_EDGES_SQL + """,
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
                   FROM edges GROUP BY src),
        cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes)""")
    for k in range(1, iterations + 1):
        sql += f""",
        r{k} AS (
            SELECT nd.node,
                   (1 - {damping}) / (SELECT n FROM cnt)
                   + {damping} * (
                       COALESCE(inc.m, 0)
                       + (SELECT COALESCE(SUM(r.rank), 0) FROM r{k - 1} r
                          WHERE r.node NOT IN (SELECT src FROM outdeg))
                         / (SELECT n FROM cnt)) AS rank
            FROM nodes nd
            LEFT JOIN (SELECT e.dst AS node, SUM(r.rank / o.deg) AS m
                       FROM edges e
                       JOIN r{k - 1} r ON e.src = r.node
                       JOIN outdeg o ON e.src = o.src
                       GROUP BY e.dst) inc ON nd.node = inc.node)"""
    return sql + f"""
        SELECT node, ROUND(rank, 6) AS pr FROM r{iterations}"""


def _psl_oracle() -> str:
    """DuckDB mirror of functions/psl.py: same built-in rules inlined as a
    VALUES list, same exception > longest normal/wildcard > implicit-*
    resolution, over the same synthesized hosts."""
    from new_ent_crawler_spark.functions.psl import parse_rules
    values = ", ".join(
        f"('{k}', {n}, {str(w).lower()}, {str(e).lower()})"
        for k, n, w, e in parse_rules())
    return """
        WITH ev AS (
            SELECT CASE CAST(event_id % 9 AS INT)
                WHEN 0 THEN 'www.example.com'
                WHEN 1 THEN 'a.b.example.co.uk'
                WHEN 2 THEN 'co.uk'
                WHEN 3 THEN 'x' || CAST(event_id % 5 AS VARCHAR)
                             || '.kawasaki.jp'
                WHEN 4 THEN 'city.kawasaki.jp'
                WHEN 5 THEN 'shop' || CAST(event_id % 3 AS VARCHAR)
                             || '.other.ck'
                WHEN 6 THEN 'www.ck'
                WHEN 7 THEN 'u' || CAST(event_id % 4 AS VARCHAR)
                             || '.github.io'
                ELSE 'site' || CAST(event_id % 7 AS VARCHAR)
                     || '.nosuchtld' END AS host
            FROM events),
        hosts AS (SELECT host, count(*) AS n_urls FROM ev GROUP BY host),
        lab AS (SELECT host, n_urls, string_split(host, '.') AS ls,
                       len(string_split(host, '.')) AS nl
                FROM hosts),
        cand AS (SELECT l.host, l.nl, g.k,
                        array_to_string(l.ls[l.nl - g.k + 1 : l.nl],
                                        '.') AS suf
                 FROM lab l,
                      (SELECT unnest(generate_series(1, 4)) AS k) g
                 WHERE g.k <= l.nl),
        rules(key, keyn, is_wild, is_exc) AS (VALUES __RULES__),
        m AS (SELECT c.host, c.nl, r.keyn, r.is_wild, r.is_exc
              FROM cand c JOIN rules r ON c.suf = r.key),
        agg AS (SELECT host,
                    max(CASE WHEN is_exc THEN keyn - 1 END) AS exc_ps,
                    max(CASE WHEN NOT is_exc AND NOT is_wild THEN keyn
                             WHEN NOT is_exc AND is_wild
                                  AND nl >= keyn + 1 THEN keyn + 1
                        END) AS norm_ps
                FROM m GROUP BY host)
        SELECT l.host,
               array_to_string(l.ls[l.nl - ps + 1 : l.nl], '.')
                   AS public_suffix,
               CASE WHEN l.nl > ps
                    THEN array_to_string(l.ls[l.nl - ps : l.nl], '.')
               END AS registered_domain,
               l.n_urls
        FROM (SELECT l.*, COALESCE(a.exc_ps, a.norm_ps, 1) AS ps
              FROM lab l LEFT JOIN agg a USING (host)) l
    """.replace("__RULES__", values)


def oracle_sql() -> dict[str, str]:
    rows_per_band = _MINHASHES // _BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(h{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)))
        for b in range(_BANDS))
    return {
        "frontier_topk_per_host": """
            SELECT event_type, event_id, rk FROM (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value DESC, event_id) AS rk
                FROM events) WHERE rk <= 3
        """,
        "dedup_last_writer_wins": """
            SELECT o_custkey, o_orderkey FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate DESC,
                                                   o_orderkey DESC) AS rn
                FROM orders) WHERE rn = 1
        """,
        "seen_set_anti_join": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= DATE '1998-01-01')
        """,
        "semi_join_active": """
            SELECT c_custkey FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 100000)
        """,
        "broadcast_dim_join": """
            SELECT r_name, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS sum_acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
        """,
        "fanout_rejoin": """
            SELECT o_orderkey, o_orderpriority, n_items, sum_qty
            FROM orders o
            JOIN (SELECT l_orderkey, count(*) AS n_items,
                         round(sum(l_quantity), 2) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey) li
              ON o.o_orderkey = li.l_orderkey
        """,
        "wave_priority_dequeue": """
            SELECT o_orderpriority, o_orderkey, rk FROM (
                SELECT o_orderpriority, o_orderkey,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey) AS rk
                FROM orders) WHERE rk <= 5
        """,
        "md5_dedup_key": f"""
            SELECT count(DISTINCT md5({_NORM_SQL})) AS n_keys FROM documents
        """,
        "union_keys": """
            SELECT count(*) AS n_keys FROM (
                SELECT c_custkey AS k FROM customer
                UNION SELECT s_suppkey FROM supplier)
        """,
        "explode_tokens": """
            SELECT lang, count(*) AS n_tokens,
                   count(DISTINCT tok) AS n_distinct_tokens
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE length(tok) > 0 GROUP BY lang
        """,
        "regex_digits": """
            SELECT c_custkey,
                   regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
            FROM customer
        """,
        "date_format_day": """
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   count(*) AS n_orders
            FROM orders GROUP BY day
        """,
        "enum_decode": """
            SELECT CASE WHEN l_returnflag = 'R' THEN '退货'
                        WHEN l_returnflag = 'A' THEN '认可'
                        ELSE '正常' END AS label,
                   count(*) AS n_rows
            FROM lineitem GROUP BY label
        """,
        "term_concat_none": """
            SELECT coalesce(nullif(p_brand, 'Brand#13'), 'None') || '-' ||
                   coalesce(nullif(p_type, 'ECONOMY'), 'None') AS term,
                   count(*) AS n_parts
            FROM part GROUP BY term
        """,
        "events_daily": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, day
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1997-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "tpch_q5ish": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n_name
        """,
        "rollup_region_nation": """
            SELECT r_name, n_name, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "count_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "text_token_count": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents
        """,
        "text_quality": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS toks,
                       length(text) AS n,
                       length(text) - length(regexp_replace(text,
                           '[.,;:!?''"()\\[\\]{}]', '', 'g')) AS punct,
                       length(text) - length(regexp_replace(text,
                           '[0-9]', '', 'g')) AS digits
                FROM documents)
            SELECT doc_id,
                   round(least(toks / 64.0, 1.0)
                         * greatest(0.0, 1.0 - CASE WHEN n > 0
                               THEN punct * 1.0 / n ELSE 0 END * 4)
                         * greatest(0.0, 1.0 - CASE WHEN n > 0
                               THEN digits * 1.0 / n ELSE 0 END * 4), 6)
                       AS quality
            FROM t
        """,
        "text_fingerprint_dups": f"""
            SELECT substring(md5({_NORM_SQL}), 1, 16) AS fp,
                   count(*) AS n_docs
            FROM documents GROUP BY fp HAVING count(*) > 1
        """,
        "text_repetition": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> length(trim(x)) > 0) AS lines,
                       CASE WHEN length(trim(text)) = 0
                            THEN CAST([] AS VARCHAR[])
                            ELSE string_split_regex(trim(text), '\\s+')
                       END AS toks
                FROM documents)
            SELECT doc_id,
                   CASE WHEN len(lines) > 0
                        THEN round(1.0 - len(list_distinct(lines))
                                   * 1.0 / len(lines), 6)
                        ELSE 0.0 END AS dup_line_frac,
                   CASE WHEN len(toks) > 0
                        THEN round(1.0 - len(list_distinct(toks))
                                   * 1.0 / len(toks), 6)
                        ELSE 0.0 END AS tok_rep_frac
            FROM t
        """,
        "stratified_sample_lang": """
            SELECT lang, doc_id, rnk FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                           AS rnk
                FROM documents)
            WHERE rnk <= 3
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM_SQL}) AS digest, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY digest
        """,
        "minhash_signatures":
            _MINHASH_SIG_SQL + " SELECT * FROM sig",
        "minhash_lsh_pairs":
            _MINHASH_SIG_SQL + f""", banded AS ({band_selects})
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        """,
        "ngram_jaccard_pairs": _SHINGLES_SQL + """
            , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
            , ok AS (SELECT shingle FROM sh GROUP BY shingle
                     HAVING count(*) <= 100)
            , shf AS (SELECT sh.* FROM sh JOIN ok USING (shingle))
            , inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_common
                FROM shf a JOIN shf b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(n_common * 1.0 /
                         (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        """,
        "json_extract_props": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS max_k
            FROM events GROUP BY event_type
        """,
        "collect_sorted_lines": """
            SELECT l_orderkey,
                   string_agg(CAST(l_linenumber AS VARCHAR), ','
                              ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "sessionize_users": """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       -- floor(epoch()) matches Spark's cast(ts AS LONG)
                       -- truncation; the ts values carry fractional seconds
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT)
                                    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                                    > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id,
                       sum(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM flagged)
            SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM sess GROUP BY user_id
        """,
        "stats_per_type": """
            SELECT event_type,
                   round(avg(value), 4) AS avg_value,
                   round(stddev_samp(value), 4) AS std_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   round(quantile_cont(value, 0.5), 6) AS median_value
            FROM events GROUP BY event_type
        """,
        # every integer sum is CAST(... AS BIGINT): DuckDB sum(int) returns
        # HUGEINT, which pandas renders as float64 and the driver's
        # value-hash then diverges from Spark's int64 (r01 hash-fail root
        # cause for this + running_total/sessionize/json_extract)
        "pivot_lang_counts": """
            SELECT source,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                   CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
                   CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                   CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                   CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es
            FROM documents GROUP BY source
        """,
        "cube_type": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY CUBE (event_type)
        """,
        "sim_brute_topk": """
            WITH q AS (SELECT list_transform(embedding,
                                x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   CAST(list_dot_product(
                        list_transform(embedding,
                            x -> round(CAST(x AS DOUBLE) * 1000)), qv)
                        AS BIGINT) AS dot
            FROM embeddings, q
            ORDER BY dot DESC, vec_id LIMIT 10
        """,
        "asof_click_purchase": """
            WITH j AS (
                SELECT l.event_id, l.user_id,
                       r.event_id AS purchase_event_id, r.value AS pval,
                       row_number() OVER (
                           PARTITION BY l.event_id
                           ORDER BY r.ts DESC, r.event_id DESC) AS rn
                FROM (SELECT * FROM events WHERE event_type = 'click') l
                JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
                  ON l.user_id = r.user_id AND r.ts <= l.ts)
            SELECT event_id, user_id, purchase_event_id,
                   round(pval, 6) AS purchase_value
            FROM j WHERE rn = 1
        """,
        "range_join_tiers": """
            SELECT tier, count(*) AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            JOIN (VALUES ('low', 1, 15), ('mid', 15, 35),
                         ('high', 35, 51)) t(tier, lo, hi)
              ON l_quantity >= lo AND l_quantity < hi
            GROUP BY tier
        """,
        "moving_avg_daily": """
            WITH daily AS (
                SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                       count(*) AS n_events
                FROM events GROUP BY event_type, day)
            SELECT event_type, day, n_events,
                   round(avg(n_events) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
                       AS moving_avg
            FROM daily
        """,
        "lag_delta_user": """
            SELECT user_id, event_id,
                   round(value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 6)
                       AS delta
            FROM events
        """,
        "ntile_quartiles": """
            SELECT quartile, count(*) AS n_orders,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM (SELECT o_totalprice,
                         ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                             AS quartile
                  FROM orders)
            GROUP BY quartile
        """,
        "running_total_daily": """
            WITH daily AS (
                SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                       count(*) AS n_events
                FROM events GROUP BY event_type, day)
            SELECT event_type, day, n_events,
                   CAST(sum(n_events) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total
            FROM daily
        """,
        "first_last_event": """
            SELECT DISTINCT user_id,
                   first_value(event_type) OVER w AS first_type,
                   last_value(event_type) OVER w AS last_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        """,
        "tpch_q4ish": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q12ish": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus
        """,
        "tpch_q14ish": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                       AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01'
              AND l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "tpch_q17ish": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS lim
                  FROM lineitem GROUP BY l_partkey) a
              ON a.pk = l.l_partkey
            WHERE p.p_brand = 'Brand#13' AND l.l_quantity < a.lim
        """,
        "tpch_q18ish": """
            SELECT c_custkey, o_orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   round(sum_qty, 2) AS sum_qty
            FROM orders o
            JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 150) big
              ON o.o_orderkey = big.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "tpch_q19ish": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11
                   AND p_size BETWEEN 1 AND 5)
               OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 10 AND 20
                   AND p_size BETWEEN 1 AND 10)
               OR (p_brand = 'Brand#11' AND l_quantity BETWEEN 20 AND 30
                   AND p_size BETWEEN 1 AND 15)
        """,
        "tpch_q22ish": """
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000)
            GROUP BY c_nationkey
        """,
        "top_supplier_revenue": """
            WITH rev AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "grouping_sets_daily": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n_events
            FROM events
            GROUP BY GROUPING SETS ((event_type, strftime(ts, '%Y-%m-%d')),
                                    (strftime(ts, '%Y-%m-%d')), ())
        """,
        "intersect_except_keys": """
            SELECT 'intersect' AS op, count(*) AS n FROM (
                SELECT c_custkey AS k FROM customer
                INTERSECT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'except' AS op, count(*) AS n FROM (
                SELECT c_custkey AS k FROM customer
                EXCEPT SELECT o_custkey FROM orders)
        """,
        "string_funcs": """
            SELECT c_custkey, upper(c_name) AS up,
                   lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS pad,
                   substring(c_name, 10, 4) AS mid,
                   replace(c_name, 'Customer', 'C') AS rep,
                   length(c_name) AS len,
                   strpos(c_name, '#') AS pos,
                   levenshtein(c_name, 'Customer#000000001') AS dist
            FROM customer
        """,
        "array_token_stats": """
            WITH t AS (
                SELECT doc_id,
                       list_sort(list_distinct(list_filter(
                           string_split(text, ' '),
                           x -> length(x) > 0))) AS toks
                FROM documents)
            SELECT doc_id, len(toks) AS n_distinct,
                   array_to_string(toks[1:3], ',') AS first3
            FROM t
        """,
        "value_histogram": """
            SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
                   count(*) AS n_events
            FROM events GROUP BY bucket
        """,
        "corr_value_ts": """
            SELECT event_type,
                   round(corr(value,
                              (epoch_ms(ts) - 1704067200000) / 1000.0), 4)
                       AS corr_vt
            FROM events GROUP BY event_type
        """,
        "embedding_pair_topk": """
            WITH q AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> round(CAST(x AS DOUBLE) * 1000)) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot
            FROM q a JOIN q b ON a.vec_id < b.vec_id
            ORDER BY dot DESC, id_a, id_b LIMIT 20
        """,
        "salted_skew_join": """
            SELECT c_mktsegment, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY c_mktsegment
        """,
        "map_pivot_user": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_error
            FROM events GROUP BY user_id
        """,
        "hof_order_prices": """
            WITH per AS (
                SELECT l_orderkey,
                       list_sort(list(
                           l_extendedprice * (1 - l_discount))) AS prices
                FROM lineitem GROUP BY l_orderkey)
            SELECT l_orderkey,
                   len(prices) AS n_items,
                   list_aggregate(prices, 'sum') AS total,
                   list_max(prices) AS max_price,
                   len(list_filter(prices,
                       v -> v > list_aggregate(prices, 'sum')
                                / len(prices))) AS n_above_avg
            FROM per
        """,
        "max_by_event": """
            SELECT event_type,
                   max(CASE WHEN rn_top = 1 THEN event_id END)
                       AS top_event_id,
                   max(CASE WHEN rn_bot = 1 THEN event_id END)
                       AS bottom_event_id
            FROM (SELECT event_type, event_id,
                         row_number() OVER (PARTITION BY event_type
                             ORDER BY value DESC, event_id DESC) AS rn_top,
                         row_number() OVER (PARTITION BY event_type
                             ORDER BY value ASC, event_id ASC) AS rn_bot
                  FROM events)
            GROUP BY event_type
        """,
        "lang_id_confusion": r"""
            WITH p AS (
                SELECT lang,
                       length(text) AS n,
                       length(text) - length(regexp_replace(
                           text, '[一-龥]', '', 'g')) AS cjk,
                       len(regexp_extract_all(lower(text),
                           '\b(the|and|of|to|is|in)\b')) AS en_stop
                FROM documents)
            SELECT CASE WHEN n = 0 THEN 'unknown'
                        WHEN cjk * 1.0 / n > 0.05 THEN 'zh'
                        WHEN en_stop >= 2 THEN 'en'
                        ELSE 'unknown' END AS pred_lang,
                   lang, count(*) AS n_docs
            FROM p GROUP BY pred_lang, lang
        """,
        "simhash_groups": _SIMHASH_FP_SQL + """
            SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
            FROM fp GROUP BY simhash HAVING count(*) > 1
        """,
        "simhash_near_pairs": _SIMHASH_FP_SQL + """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                       AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "ann_lsh_topk": f"""
            WITH v AS (
                SELECT vec_id, {_VEC_DOUBLE} AS a FROM embeddings
            ), b AS (
                SELECT vec_id, a, {_lsh_bucket_sql(64, 8)} AS bucket FROM v
            ), q AS (
                SELECT bucket AS qb, a AS qa,
                       sqrt(list_dot_product(a, a)) AS qn
                FROM b WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(a, qa)
                         / (sqrt(list_dot_product(a, a)) * qn), 6) AS cosine
            FROM b, q
            WHERE bit_count(xor(bucket, qb)) <= 1
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "ann_ivf_topk": f"""
            WITH v AS (
                SELECT vec_id, {_VEC_DOUBLE} AS a FROM embeddings
            ), c AS (
                -- lloyd_iters=0 seeds: the 16 lowest-id vectors
                SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                            AS INTEGER) AS cid, a AS cv
                FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 16
            ), assign AS (
                -- argmax dot with first-max tie-break, replicating
                -- array_position(dots, array_max(dots))
                SELECT vec_id, a, cid,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY list_dot_product(a, cv) DESC, cid) AS rn
                FROM v CROSS JOIN c
            ), clustered AS (
                SELECT vec_id, a, cid AS cluster FROM assign WHERE rn = 1
            ), q AS (
                SELECT a AS qa, sqrt(list_dot_product(a, a)) AS qn
                FROM v WHERE vec_id = 0
            ), probe AS (
                SELECT cid FROM (
                    SELECT cid, row_number() OVER (
                        ORDER BY list_dot_product(qa, cv) DESC, cid) AS rn
                    FROM c CROSS JOIN q) WHERE rn <= 4)
            SELECT vec_id,
                   round(list_dot_product(a, qa)
                         / (sqrt(list_dot_product(a, a)) * qn), 6) AS cosine
            FROM clustered JOIN probe ON clustered.cluster = probe.cid
            CROSS JOIN q
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "sim_label_centroid_topk": """
            WITH v AS (
                SELECT vec_id, label,
                       list_transform(embedding,
                           x -> round(CAST(x AS DOUBLE) * 1000)) AS a
                FROM embeddings
            ), cent AS (
                -- exact integer sums -> order-independent mean per dim
                SELECT label, pos, avg(a[pos]) AS m
                FROM v, (SELECT unnest(range(1, 65)) AS pos)
                GROUP BY label, pos
            ), centarr AS (
                SELECT label, list(m ORDER BY pos) AS cent
                FROM cent GROUP BY label
            ), scored AS (
                SELECT v.label, v.vec_id,
                       round(list_dot_product(a, cent)
                             / (sqrt(list_dot_product(a, a))
                                * sqrt(list_dot_product(cent, cent))), 6)
                           AS sim
                FROM v JOIN centarr ON v.label = centarr.label)
            SELECT label, vec_id, sim, rk FROM (
                SELECT label, vec_id, sim,
                       CAST(row_number() OVER (PARTITION BY label
                           ORDER BY sim DESC, vec_id) AS INTEGER) AS rk
                FROM scored) WHERE rk <= 5
        """,
        "bloom_prune_new_keys": """
            SELECT url FROM (
                SELECT DISTINCT CAST(o_orderkey % 3000 AS VARCHAR) AS url
                FROM orders) o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE CAST(c.c_custkey AS VARCHAR) = o.url)
        """,
        "cuckoo_prune_new_keys": """
            SELECT url FROM (
                SELECT DISTINCT CAST(o_orderkey % 3000 AS VARCHAR) AS url
                FROM orders) o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE CAST(c.c_custkey AS VARCHAR) = o.url)
        """,
        "window_range_frame": """
            SELECT event_id, user_id,
                   sum(round(value * 100)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                       RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) / 100.0
                       AS sum_5min
            FROM events
        """,
        "time_bucket_5min": """
            SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
                            '%Y-%m-%d %H:%M') AS bucket,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY bucket, event_type
        """,
        "unpivot_lang_counts": """
            WITH p AS (
                SELECT source,
                       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
                       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es
                FROM documents GROUP BY source)
            SELECT source, 'en' AS lang, n_en AS n FROM p
            UNION ALL SELECT source, 'zh', n_zh FROM p
            UNION ALL SELECT source, 'de', n_de FROM p
            UNION ALL SELECT source, 'fr', n_fr FROM p
            UNION ALL SELECT source, 'es', n_es FROM p
        """,
        "rank_functions": """
            SELECT o_orderpriority, o_orderkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   round(percent_rank() OVER w, 6) AS prnk,
                   round(cume_dist() OVER w, 6) AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
        """,
        "word_ngram_jaccard": f"""
            WITH norm AS (
                SELECT doc_id, list_filter(
                    string_split({_NORM_SQL}, ' '),
                    x -> length(x) > 0) AS toks
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(toks[pos:pos+2], ' ') AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(range(1, len(toks) - 1)) AS pos
                      FROM norm WHERE len(toks) >= 3)
            ), sizes AS (
                SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), ok AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) BETWEEN 2 AND 100
            ), shf AS (SELECT sh.* FROM sh JOIN ok USING (shingle)
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_common
                FROM shf a JOIN shf b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(n_common * 1.0 /
                         (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        """,
        # pairs -> components -> keep decision: the recursive CTE computes
        # the same min-reachable-id labels the engine's iterative hash-min
        # propagation converges to (dup clusters are tiny at sf0.01, so the
        # transitive closure is cheap for DuckDB)
        "dedup_cluster_keep": f"""
            WITH RECURSIVE norm AS (
                SELECT doc_id, list_filter(
                    string_split({_NORM_SQL}, ' '),
                    x -> length(x) > 0) AS toks
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(toks[pos:pos+2], ' ') AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(range(1, len(toks) - 1)) AS pos
                      FROM norm WHERE len(toks) >= 3)
            ), sizes AS (
                SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), ok AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) BETWEEN 2 AND 100
            ), shf AS (SELECT sh.* FROM sh JOIN ok USING (shingle)
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_common
                FROM shf a JOIN shf b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE n_common * 1.0 /
                      (sa.n_sh + sb.n_sh - n_common) >= 0.5
            ), edges AS (
                SELECT id_a AS s, id_b AS d FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ), reach AS (
                SELECT s AS id, s AS lbl FROM edges
                UNION
                SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
            ), comp AS (
                SELECT id, min(lbl) AS comp FROM reach GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(c.comp, d.doc_id) AS comp,
                   d.doc_id = coalesce(c.comp, d.doc_id) AS keep
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
            ORDER BY d.doc_id
        """,
        "top_terms_per_doc": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
                FROM documents
            ), tokf AS (
                SELECT doc_id, term FROM toks WHERE length(term) > 0
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tokf GROUP BY doc_id, term
            ), df AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM tokf GROUP BY term)
            SELECT doc_id, term, tf, df, rk FROM (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       CAST(row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)
                           AS INTEGER) AS rk
                FROM tf JOIN df USING (term)) WHERE rk <= 3
        """,
        # The BMP round-trip oracle rebuilds the decoded image from pure
        # md5 string arithmetic: row y's 12 pixel bytes are the first 12
        # bytes of md5('<doc_id>:<y>') stored as BGR triples, so byte j is
        # CAST('0x' || substr(hex, 2j+1, 2) AS BIGINT) and the RGB hex of
        # pixel x is the three byte-hex pairs re-ordered R,G,B.  Any codec
        # defect (channel order, bottom-up flip, stride) breaks px_md5.
        "bmp_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            rows_ AS (
                SELECT doc_id, y,
                       md5(CAST(doc_id AS VARCHAR) || ':'
                           || CAST(y AS VARCHAR)) AS hx
                FROM ids, (SELECT unnest(range(0, 4)) AS y)
            ), px AS (
                SELECT doc_id, y, x,
                       CAST('0x' || substr(hx, 6*x+5, 2) AS BIGINT) AS r,
                       CAST('0x' || substr(hx, 6*x+3, 2) AS BIGINT) AS g,
                       CAST('0x' || substr(hx, 6*x+1, 2) AS BIGINT) AS b,
                       substr(hx, 6*x+5, 2) || substr(hx, 6*x+3, 2)
                           || substr(hx, 6*x+1, 2) AS rgb_hex
                FROM rows_, (SELECT unnest(range(0, 4)) AS x)
            )
            SELECT doc_id,
                   4 AS width, 4 AS height,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b,
                   md5(string_agg(rgb_hex, '' ORDER BY y, x)) AS px_md5
            FROM px GROUP BY doc_id
        """,
        # mirror of the engine's synth->encode_png(cycle filters)->decode
        # round trip: row y's pixels are md5(doc_id:png:y) bytes taken as
        # straight RGB triples, so byte k is hex substr(2k+1, 2); the
        # engine-side zlib inflate + all five scanline filters must restore
        # these exact bytes or the per-doc digest mismatches
        "png_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            rows_ AS (
                SELECT doc_id, y,
                       md5(CAST(doc_id AS VARCHAR) || ':png:'
                           || CAST(y AS VARCHAR)) AS hx
                FROM ids, (SELECT unnest(range(0, 5)) AS y)
            ), px AS (
                SELECT doc_id, y, x,
                       CAST('0x' || substr(hx, 6*x+1, 2) AS BIGINT) AS r,
                       CAST('0x' || substr(hx, 6*x+3, 2) AS BIGINT) AS g,
                       CAST('0x' || substr(hx, 6*x+5, 2) AS BIGINT) AS b,
                       substr(hx, 6*x+1, 6) AS rgb_hex
                FROM rows_, (SELECT unnest(range(0, 4)) AS x)
            )
            SELECT doc_id,
                   4 AS width, 5 AS height,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b,
                   md5(string_agg(rgb_hex, '' ORDER BY y, x)) AS px_md5
            FROM px GROUP BY doc_id
        """,
        # gif round-trip: palette color i is hex slice 6i+1..6i+6 of
        # md5(doc:gp); pixel j's palette index is byte j of md5(doc:gi)
        # mod 5; the decoded RGB hex is the palette slices concatenated in
        # pixel order because the codec must restore the exact bytes
        "gif_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            h AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':gp') AS hp,
                       md5(CAST(doc_id AS VARCHAR) || ':gi') AS hi
                FROM ids
            ), px AS (
                SELECT doc_id, j, hp,
                       CAST('0x' || substr(hi, 2*j+1, 2) AS BIGINT) % 5
                           AS idx
                FROM h, (SELECT unnest(range(0, 16)) AS j)
            ), pix AS (
                SELECT doc_id, j,
                       substr(hp, 6*idx+1, 6) AS rgb_hex,
                       CAST('0x' || substr(hp, 6*idx+1, 2) AS BIGINT) AS r,
                       CAST('0x' || substr(hp, 6*idx+3, 2) AS BIGINT) AS g,
                       CAST('0x' || substr(hp, 6*idx+5, 2) AS BIGINT) AS b
                FROM px
            )
            SELECT doc_id, 4 AS width, 4 AS height, 1 AS n_frames,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b,
                   md5(string_agg(rgb_hex, '' ORDER BY j)) AS px_md5
            FROM pix GROUP BY doc_id
        """,
        # mirror of the engine's synth->encode_wav->decode_audio round
        # trip: block b's 16 md5 bytes are 8 little-endian int16 samples
        # (4 stereo frames), so sample k's bytes are hex substr(4k+1,2)
        # (lo) and substr(4k+3,2) (hi); the decoded PCM digest equals the
        # md5 of the concatenated block hex because the codec must restore
        # the exact bytes
        "wav_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            blk AS (
                SELECT doc_id, b,
                       md5(CAST(doc_id AS VARCHAR) || ':wav:'
                           || CAST(b AS VARCHAR)) AS hx
                FROM ids, (SELECT unnest(range(0, 2)) AS b)
            ), smp AS (
                SELECT doc_id, k,
                       CAST('0x' || substr(hx, 4*k+3, 2) AS BIGINT) * 256
                         + CAST('0x' || substr(hx, 4*k+1, 2) AS BIGINT)
                         AS uv
                FROM blk, (SELECT unnest(range(0, 8)) AS k)
            ), sv AS (
                SELECT doc_id, k,
                       uv - CASE WHEN uv >= 32768 THEN 65536 ELSE 0 END AS v
                FROM smp
            ), sums AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN k % 2 = 0 THEN v END) AS BIGINT)
                           AS sum_l,
                       CAST(sum(CASE WHEN k % 2 = 1 THEN v END) AS BIGINT)
                           AS sum_r
                FROM sv GROUP BY doc_id
            ), dig AS (
                SELECT doc_id, md5(string_agg(hx, '' ORDER BY b)) AS pcm_md5
                FROM blk GROUP BY doc_id
            )
            SELECT doc_id, 8 AS n_frames, 2 AS channels,
                   16000 AS sample_rate, sum_l, sum_r, pcm_md5
            FROM sums JOIN dig USING (doc_id)
        """,
        # mirrors operators/multimodal.py::mp3_header_features: ISO/IEC
        # 11172-3 Table B.1 as a CASE, the 144*bitrate/rate+padding frame
        # length, the 32-byte ID3v2.3 prefix (10 hdr + 22 body), and the
        # fffb/xx/c4 header bytes the scanner digests
        "mp3_header_features": """
            WITH ids AS (SELECT doc_id, 6 + doc_id % 5 AS n_fr
                         FROM documents),
            fr AS (
                SELECT doc_id, n_fr, f,
                       md5(CAST(doc_id AS VARCHAR) || ':mp3:'
                           || CAST(f AS VARCHAR)) AS hx
                FROM ids, (SELECT unnest(range(0, 11)) AS f)
                WHERE f < n_fr
            ), p AS (
                SELECT doc_id, n_fr, f,
                       1 + CAST('0x' || substr(hx, 1, 2) AS BIGINT) % 14
                           AS idx,
                       CAST('0x' || substr(hx, 3, 2) AS BIGINT) % 2 AS pad
                FROM fr
            ), b AS (
                SELECT doc_id, n_fr, f, pad,
                       CASE idx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                                WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                                WHEN 7 THEN 96 WHEN 8 THEN 112
                                WHEN 9 THEN 128 WHEN 10 THEN 160
                                WHEN 11 THEN 192 WHEN 12 THEN 224
                                WHEN 13 THEN 256 ELSE 320 END AS kbps,
                       printf('fffb%02xc4', idx * 16 + pad * 2) AS hdr
                FROM p
            )
            SELECT doc_id,
                   CAST(n_fr AS INTEGER) AS n_frames,
                   CAST(32 + sum(144000 * kbps // 44100 + pad) AS INTEGER)
                       AS n_bytes,
                   44100 AS sample_rate,
                   CAST(n_fr * 1152 * 1000 // 44100 AS BIGINT)
                       AS duration_ms,
                   CAST(sum(kbps) AS BIGINT) AS sum_kbps,
                   md5(string_agg(hdr, '' ORDER BY f)) AS hdr_md5
            FROM b GROUP BY doc_id, n_fr
        """,
        # flat 8x8 blocks + all-ones qtable make baseline JPEG exactly
        # invertible (integer DC, zero AC), so the oracle rebuilds the
        # decoded image's bytes from the md5 hex: block value i is hex
        # byte i, rows 0-7 are 8x h0 then 8x h1, rows 8-15 are 8x h2
        # then 8x h3, and the digest is md5 of that hex string
        "jpeg_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            h AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':jpg') AS hx
                FROM ids
            ), v AS (
                SELECT doc_id,
                       CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS v0,
                       CAST('0x' || substr(hx, 3, 2) AS BIGINT) AS v1,
                       CAST('0x' || substr(hx, 5, 2) AS BIGINT) AS v2,
                       CAST('0x' || substr(hx, 7, 2) AS BIGINT) AS v3,
                       substr(hx, 1, 2) AS h0, substr(hx, 3, 2) AS h1,
                       substr(hx, 5, 2) AS h2, substr(hx, 7, 2) AS h3
                FROM h
            )
            SELECT doc_id, 16 AS width, 16 AS height,
                   CAST(64 * (v0 + v1 + v2 + v3) AS BIGINT) AS sum_px,
                   md5(repeat(repeat(h0, 8) || repeat(h1, 8), 8)
                       || repeat(repeat(h2, 8) || repeat(h3, 8), 8))
                       AS px_md5
            FROM v
        """,
        # operators/recrawl.py::revisit_schedule replicated: changefreq ->
        # interval seconds, next_due = lastmod + interval in the NTZ frame,
        # due vs the same fixed clock; 'never' -> NULL interval, never due
        "recrawl_schedule": """
            WITH m AS (
                SELECT event_id, ts,
                    CASE event_type
                        WHEN 'click' THEN 'hourly'
                        WHEN 'view' THEN 'always'
                        WHEN 'purchase' THEN 'weekly'
                        WHEN 'signup' THEN 'monthly'
                        ELSE 'never' END AS changefreq
                FROM events),
            s AS (
                SELECT event_id, ts, changefreq,
                    CASE changefreq
                        WHEN 'always' THEN 0
                        WHEN 'hourly' THEN 3600
                        WHEN 'weekly' THEN 604800
                        WHEN 'monthly' THEN 2592000
                        ELSE NULL END AS interval_s
                FROM m)
            SELECT event_id, changefreq,
                CAST(interval_s AS BIGINT) AS interval_s,
                strftime(ts + to_seconds(interval_s),
                         '%Y-%m-%d %H:%M:%S') AS next_due,
                COALESCE(ts + to_seconds(interval_s)
                         <= TIMESTAMP '2024-01-20 00:00:00',
                         FALSE) AS is_due
            FROM s
        """,
        # functions/url.py::canonicalize_url replicated with DuckDB's
        # regexp/list primitives over the same synthesized raw URLs
        "url_canonicalize": r"""
            WITH raw AS (
                SELECT event_id,
                    (CASE WHEN event_id % 2 = 0 THEN 'HTTP'
                          ELSE 'https' END)
                    || '://Host' || CAST(event_id % 7 AS VARCHAR)
                    || '.Example.COM'
                    || (CASE WHEN event_id % 3 = 0 THEN
                            (CASE WHEN event_id % 2 = 0 THEN ':80'
                                  ELSE ':443' END)
                        ELSE '' END)
                    || (CASE WHEN event_id % 5 = 0 THEN ''
                        ELSE '/' || event_type || '/p'
                             || CAST(event_id % 11 AS VARCHAR) END)
                    || (CASE event_id % 4
                        WHEN 0 THEN '?b=2&a=' || CAST(event_id % 9 AS VARCHAR)
                        WHEN 1 THEN '?a=' || CAST(event_id % 9 AS VARCHAR)
                                    || '&b=2'
                        WHEN 2 THEN '?' ELSE '' END)
                    || (CASE WHEN event_id % 6 = 0 THEN '#sec'
                        ELSE '' END) AS url
                FROM events),
            parts AS (
                SELECT event_id, url,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
                        1)) AS scheme,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
                        2)) AS auth0,
                    regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
                        3) AS path0,
                    substr(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
                        4), 2) AS qbody
                FROM raw)
            SELECT event_id,
                CASE WHEN scheme = '' THEN trim(url) ELSE
                    scheme || '://'
                    || (CASE WHEN scheme = 'http'
                             THEN regexp_replace(auth0, ':80$', '')
                             WHEN scheme = 'https'
                             THEN regexp_replace(auth0, ':443$', '')
                             ELSE auth0 END)
                    || (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
                    || (CASE WHEN length(qbody) = 0 THEN ''
                        ELSE '?' || array_to_string(
                            list_sort(string_split(qbody, '&')), '&') END)
                END AS url_canon,
                regexp_replace(auth0, ':\d+$', '') AS host,
                CASE WHEN regexp_replace(auth0, ':\d+$', '') = '' THEN NULL
                ELSE
                    array_to_string(list_reverse(string_split(
                        regexp_replace(auth0, ':\d+$', ''), '.')), ',')
                    || ')/'
                    || regexp_replace(
                        (CASE WHEN path0 = '' THEN '/' ELSE path0 END),
                        '^/', '')
                    || (CASE WHEN length(qbody) = 0 THEN ''
                        ELSE '?' || array_to_string(
                            list_sort(string_split(qbody, '&')), '&') END)
                END AS surt
            FROM parts
        """,
        "registered_domain": _psl_oracle(),
        "cdx_revisit": """
            WITH base AS (
                SELECT event_id, ts,
                    CAST(event_id % 40 AS VARCHAR) AS k,
                    event_id % 40 AS kn,
                    'https://s' || CAST(event_id % 3 AS VARCHAR)
                    || '.example.com/p/'
                    || CAST(event_id % 40 AS VARCHAR) AS url
                FROM events),
            prev AS (
                SELECT url,
                    strftime(ts, '%Y%m%d%H%M%S') AS ts14,
                    sha256('A' || k) AS digest
                FROM base WHERE kn < 30),
            prev_latest AS (
                SELECT url, max(ts14 || '|' || digest) AS td
                FROM prev GROUP BY url),
            newcap AS (
                SELECT event_id, url,
                    sha256(CASE WHEN event_id % 3 = 0
                           THEN 'A' || k ELSE 'B' || k END) AS digest
                FROM base)
            SELECT n.event_id, n.url, n.digest,
                CASE WHEN p.td IS NULL THEN 'new'
                     WHEN n.digest = string_split(p.td, '|')[2]
                     THEN 'revisit' ELSE 'changed' END AS status,
                CASE WHEN p.td IS NOT NULL
                          AND n.digest = string_split(p.td, '|')[2]
                     THEN string_split(p.td, '|')[1] END AS prev_ts14
            FROM newcap n LEFT JOIN prev_latest p USING (url)
        """,
        "cdx_index": """
            WITH pages AS (
                SELECT event_id,
                    'https://h' || CAST(event_id % 5 AS VARCHAR)
                    || '.site' || CAST(event_id % 3 AS VARCHAR)
                    || '.example.com/p/' || CAST(event_id % 13 AS VARCHAR)
                    || (CASE CAST(event_id % 4 AS INT)
                        WHEN 0 THEN '?b=2&a=1'
                        WHEN 1 THEN '?a=1&b=2' ELSE '' END) AS url,
                    ts, props AS body
                FROM events)
            SELECT event_id,
                'com,example,site' || CAST(event_id % 3 AS VARCHAR)
                || ',h' || CAST(event_id % 5 AS VARCHAR)
                || ')/p/' || CAST(event_id % 13 AS VARCHAR)
                || (CASE WHEN event_id % 4 IN (0, 1)
                    THEN '?a=1&b=2' ELSE '' END) AS surt,
                strftime(ts, '%Y%m%d%H%M%S') AS ts14,
                url,
                sha256(body) AS digest,
                CAST(length(body) AS BIGINT) AS length
            FROM pages
        """,
        "link_pagerank": _pagerank_oracle(damping=0.85, iterations=3),
        "link_degree_stats": "WITH" + _LINK_EDGES_SQL + """,
            outd AS (SELECT src AS node, count(*) AS out_deg
                     FROM edges GROUP BY src),
            ind AS (SELECT dst AS node, count(*) AS in_deg
                    FROM edges GROUP BY dst)
            SELECT COALESCE(o.node, i.node) AS node,
                   CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
                   CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
            FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
        """,
        # the md5 stand-in feature replicated in SQL: byte i of md5(text)
        # over 255 as float32, formatted %.4f (cross-engine equality of all
        # 256 byte values verified — see _q_multimodal_features docstring)
        "multimodal_features": """
            WITH d AS (
                SELECT doc_id AS media_id, text, md5(text) AS hx
                FROM documents
            )
            SELECT media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   hx AS digest,
                   CAST(8 AS BIGINT) AS feature_dim,
                   concat_ws(',',
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 1, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 3, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 5, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 7, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 9, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 11, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 13, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE)),
                       printf('%.4f', CAST(CAST(CAST('0x' || substr(hx, 15, 2)
                           AS BIGINT) / 255.0 AS FLOAT) AS DOUBLE))
                   ) AS feature_sig
            FROM d
        """,
        # probes are substrings of docs 1-5; the oracle joins documents
        # against the probe set on contains() and counts hits per probe
        "contamination_probes": """
            WITH probes AS (
                SELECT substr(text, 11, 24) AS probe
                FROM documents WHERE doc_id IN (1, 2, 3, 4, 5)
            )
            SELECT probe, CAST(count(*) AS BIGINT) AS n_docs_hit
            FROM probes p JOIN documents d ON contains(d.text, p.probe)
            GROUP BY probe ORDER BY probe
        """,
        # color 4:4:4 JPEG of flat GRAY blocks is byte-exact (chroma
        # planes are exactly 128 -> all-zero blocks), so the oracle is
        # the gray oracle with every hex byte tripled (R=G=B)
        "jpeg_color_decode_features": """
            WITH ids AS (SELECT doc_id FROM documents),
            h AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':jpgc') AS hx
                FROM ids
            ), v AS (
                SELECT doc_id,
                       CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS v0,
                       CAST('0x' || substr(hx, 3, 2) AS BIGINT) AS v1,
                       CAST('0x' || substr(hx, 5, 2) AS BIGINT) AS v2,
                       CAST('0x' || substr(hx, 7, 2) AS BIGINT) AS v3,
                       repeat(substr(hx, 1, 2), 3) AS p0,
                       repeat(substr(hx, 3, 2), 3) AS p1,
                       repeat(substr(hx, 5, 2), 3) AS p2,
                       repeat(substr(hx, 7, 2), 3) AS p3
                FROM h
            )
            SELECT doc_id, 16 AS width, 16 AS height,
                   CAST(192 * (v0 + v1 + v2 + v3) AS BIGINT) AS sum_px,
                   md5(repeat(repeat(p0, 8) || repeat(p1, 8), 8)
                       || repeat(repeat(p2, 8) || repeat(p3, 8), 8))
                       AS px_md5
            FROM v
        """,
        # uncompressed-DIB AVI round-trips bit-exactly, and the frame
        # sampler picks index t*fps//1000 at t = 0, 500, 1000 ms (fps 4,
        # 6 frames) -> frames 0, 2, 4; the oracle replays that arithmetic
        # and rebuilds each sampled frame's sums/digest from the md5 hex
        # (frame f row y = md5('{id}:avi:{f}:{y}') first 12 bytes as RGB)
        "avi_frame_sample": """
            WITH ids AS (SELECT doc_id FROM documents),
            fr AS (
                SELECT doc_id, CAST(2 * k AS INT) AS frame_no,
                       CAST(500 * k AS INT) AS ts_ms
                FROM ids, (SELECT unnest(range(0, 3)) AS k)
            ), rows_ AS (
                SELECT doc_id, frame_no, ts_ms, y,
                       md5(CAST(doc_id AS VARCHAR) || ':avi:'
                           || CAST(frame_no AS VARCHAR) || ':'
                           || CAST(y AS VARCHAR)) AS hx
                FROM fr, (SELECT unnest(range(0, 2)) AS y)
            ), px AS (
                SELECT doc_id, frame_no, ts_ms, y,
                       CAST('0x' || substr(hx, 6*x+1, 2) AS BIGINT) AS r,
                       CAST('0x' || substr(hx, 6*x+3, 2) AS BIGINT) AS g,
                       CAST('0x' || substr(hx, 6*x+5, 2) AS BIGINT) AS b
                FROM rows_, (SELECT unnest(range(0, 4)) AS x)
            ), dig AS (
                SELECT doc_id, frame_no,
                       md5(string_agg(substr(hx, 1, 24), '' ORDER BY y))
                           AS px_md5
                FROM rows_ GROUP BY doc_id, frame_no
            )
            SELECT p.doc_id, p.frame_no, p.ts_ms,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b,
                   any_value(d.px_md5) AS px_md5
            FROM px p JOIN dig d USING (doc_id, frame_no)
            GROUP BY p.doc_id, p.frame_no, p.ts_ms
        """,
        # the HLL estimate is engine-specific, so the oracle checks the
        # exact counts and asserts the engine's |approx-exact| <= 5% bound
        # held for every group (constant-true column on the oracle side)
        "approx_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   true AS within_5pct
            FROM events GROUP BY event_type
        """,
        # sketch quantiles: the oracle checks the exact interpolated
        # quantiles (both engines interpolate at rank (n-1)p) and asserts
        # the engine's empirical-rank bound held for every group
        "approx_quantiles_value": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(quantile_cont(value, 0.5), 4) AS exact_p50,
                   round(quantile_cont(value, 0.9), 4) AS exact_p90,
                   true AS rank_ok_p50,
                   true AS rank_ok_p90
            FROM events GROUP BY event_type
        """,
        # multimodal_features: intentionally no SQL oracle (feature vector
        # comes from the container-stubbed codec path) -> rows-only
        "training_shards": """
            WITH t AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, ' '),
                                       x -> length(x) > 0)) AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cum_before
                FROM t
            )
            SELECT CAST(FLOOR(cum_before / 2000) AS BIGINT) AS shard_id,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "dup_span_stats": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '),
                                   x -> length(x) > 0) AS toks
                FROM documents
            ), s AS (
                SELECT doc_id,
                       greatest(len(toks) - 19, 0) AS n_spans,
                       list_transform(
                           generate_series(1, len(toks) - 19),
                           i -> md5(array_to_string(toks[i:i+19], ' '))
                       ) AS spans
                FROM t
            ), e AS (
                SELECT doc_id, unnest(spans) AS h FROM s
            ), occ AS (
                SELECT h, COUNT(*) AS occ FROM e GROUP BY h
            ), d AS (
                SELECT e.doc_id, COUNT(*) AS n_dup
                FROM e JOIN occ USING (h)
                WHERE occ.occ >= 2 GROUP BY e.doc_id
            )
            SELECT s.doc_id,
                   CAST(s.n_spans AS BIGINT) AS n_spans,
                   CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
                   ROUND(CASE WHEN s.n_spans = 0 THEN 0.0
                              ELSE COALESCE(d.n_dup, 0)::DOUBLE / s.n_spans
                         END, 6) AS dup_frac
            FROM s LEFT JOIN d USING (doc_id)
            ORDER BY s.doc_id
        """,
    }
