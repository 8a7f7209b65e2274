"""Round-3 additions: deterministic stratified sampling (salted two-phase
top-K == naive global window) and the Gopher-style repetition signals."""
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from new_ent_crawler_spark.operators import sampling as SMP
from new_ent_crawler_spark.functions import text as TX
from .conftest import spark  # noqa: F401


def _docs(spark, n=500, langs=("zh", "en", "de", "fr")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(*[F.lit(x) for x in langs]),
                     (F.col("id") % len(langs) + 1).cast("int"))
        .alias("lang"))


def test_salted_topk_equals_naive_window(spark):
    d = _docs(spark)
    got = SMP.stratified_topk(d, "lang", "doc_id", k=5).select(
        "lang", "doc_id", "rnk")
    w = Window.partitionBy("lang").orderBy(
        SMP.sample_order_key("doc_id"), "doc_id")
    want = (d.withColumn("rnk", F.row_number().over(w))
            .filter("rnk <= 5").select("lang", "doc_id", "rnk"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_stratified_topk_skewed_group(spark):
    # one giant group + tiny groups: same answer, and phase 1 must prune
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1900, F.lit("big")).otherwise(
            F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
        .alias("lang"))
    got = SMP.stratified_topk(d, "lang", "doc_id", k=3)
    counts = {r.lang: r.n for r in
              got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 3
    assert all(v <= 3 for v in counts.values())
    # determinism: same input -> same sample
    again = SMP.stratified_topk(d, "lang", "doc_id", k=3)
    assert sorted(map(tuple, got.select("lang", "doc_id").collect())) == \
        sorted(map(tuple, again.select("lang", "doc_id").collect()))


@pytest.mark.parametrize("text,dup,rep", [
    ("a\nb\nc", 0.0, 0.0),
    ("a\na\nb", 1.0 - 2.0 / 3.0, 1.0 - 2.0 / 3.0),
    ("x\n\n  \nx", 0.5, 0.5),          # blank lines ignored
    ("", 0.0, 0.0),
    ("   ", 0.0, 0.0),
    ("w w w w", 0.0, 0.75),
])
def test_repetition_fractions(spark, text, dup, rep):
    df = spark.createDataFrame([(text,)], "text string")
    r = df.select(TX.dup_line_fraction("text").alias("d"),
                  TX.token_repetition_fraction("text").alias("t")).first()
    assert abs(r.d - round(dup, 6)) < 1e-9, (text, r.d, dup)
    assert abs(r.t - round(rep, 6)) < 1e-9, (text, r.t, rep)


def test_repetition_plan_no_shuffle(spark):
    df = spark.createDataFrame([("a\nb",), ("c c",)], "text string")
    plan = df.select(
        TX.dup_line_fraction("text"),
        TX.token_repetition_fraction("text"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
