"""End-to-end crawl: Spark wave engine vs single-threaded reference
simulator — seen-set, crawl-order, status, and byte-identity gates
(SURVEY.md §5.2, BASELINE.json metric)."""

import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from new_ent_crawler_spark.operators import assemble as ASM
from new_ent_crawler_spark.oracle import sink as SK
from new_ent_crawler_spark.plans.wave import WaveEngine
from new_ent_crawler_spark.simulator import Simulator
from new_ent_crawler_spark.synth import webgen


def _simulator_for(web_dir, **kw):
    pages = webgen.load_fetch(web_dir)
    seeds = pq.read_table(web_dir + "/seeds.parquet").to_pylist()
    robots_rows = pq.read_table(web_dir + "/robots.parquet").to_pylist()
    robots = {r["host"]: (r["disallow"], r["crawl_delay"])
              for r in robots_rows}
    sim = Simulator(pages, seeds, robots, **kw)
    sim.run()
    return sim


@pytest.fixture(scope="module")
def crawl(spark, tiny_web, tmp_path_factory):
    web_dir, _ = tiny_web
    work = str(tmp_path_factory.mktemp("work"))
    eng = WaveEngine(spark, web_dir, work, per_host_k=8, max_waves=30,
                     expected_total_urls=10_000)
    stats = eng.run()
    sim = _simulator_for(web_dir, per_host_k=8, max_waves=30)
    return eng, sim, stats


def test_crawl_terminates(crawl):
    eng, sim, stats = crawl
    assert len(stats) >= 4  # listing -> main -> sections -> children
    assert stats[-1]["claimed"] > 0


def test_seen_set_equality(crawl):
    eng, sim, _ = crawl
    assert eng.seen_urls() == sim.seen_urls()


def test_crawl_order_equality(crawl):
    eng, sim, _ = crawl
    assert eng.crawl_order() == sim.crawl_order()


def test_statuses_equal(crawl):
    eng, sim, _ = crawl
    got = {r.url: r.status
           for r in eng.frontier().select("url", "status").collect()}
    assert got == sim.statuses()


def test_byte_identical_extracted_text(crawl, spark, tiny_web):
    """input_hint invariant: per-url extracted text == golden pages.text."""
    eng, sim, _ = crawl
    web_dir, _ = tiny_web
    pages = spark.read.parquet(web_dir + "/pages.parquet")
    ext = eng.extracted().filter(F.col("text").isNotNull())
    joined = (ext.alias("e")
              .join(pages.alias("p"), "url")
              .select("url", F.col("e.text").alias("got"),
                      F.col("p.text").alias("want")))
    bad = joined.filter(~F.col("got").eqNullSafe(F.col("want"))) \
        .limit(5).collect()
    assert bad == [], bad
    # and the engine extracted every page the simulator extracted
    got_urls = {r.url for r in ext.select("url").distinct().collect()}
    assert got_urls == set(sim.extracted)


def test_lineage_counts(crawl):
    eng, sim, _ = crawl
    lin = eng.lineage_t.read(eng.spark)
    parse_in = lin.filter("stage = 'parse'").agg(
        F.sum("urls_in")).collect()[0][0]
    assert parse_in == len(sim.crawl_order())
    dedup_hits = lin.filter("stage = 'dedup'").agg(
        F.sum("dedup_hits")).collect()[0][0]
    assert dedup_hits == sim.dedup_hits


def test_fast_seeding_equals_spark_seeding(crawl, spark, tiny_web):
    """The driver-side pyarrow seeding fast path (no Spark jobs) must
    produce exactly the frontier + budgets the Spark projections produce —
    value-for-value, dtype-for-dtype."""
    web_dir, _ = tiny_web
    from new_ent_crawler_spark.operators import frontier as FR
    from new_ent_crawler_spark.operators import politeness as PL

    seeds_pa = pq.read_table(web_dir + "/seeds.parquet")
    fast = FR.init_frontier_pa(seeds_pa)
    via_spark = FR.init_frontier(
        spark.read.parquet(web_dir + "/seeds.parquet"))
    assert [f.name for f in via_spark.schema.fields] == fast.column_names
    assert (sorted(map(tuple, fast.to_pandas().itertuples(index=False)))
            == sorted(map(tuple, via_spark.toPandas()
                          .itertuples(index=False))))

    robots_pa = pq.read_table(web_dir + "/robots.parquet")
    fast_b = PL.init_budgets_pd(robots_pa.to_pandas(), per_wave_k=8)
    spark_b = PL.init_budgets(
        spark.read.parquet(web_dir + "/robots.parquet"), per_wave_k=8
    ).toPandas()
    assert (sorted(map(tuple, fast_b.itertuples(index=False)))
            == sorted(map(tuple, spark_b.itertuples(index=False))))


def test_pending_after_exact(crawl):
    """The fused still-eligible counters must predict the next wave's
    pending count exactly — they are what lets run() stop without a probe
    wave (per-run fixed cost on every scaling leg)."""
    _, _, stats = crawl
    for prev, nxt in zip(stats, stats[1:]):
        if "pending_after" in prev:  # absent on zero-claim refill waves
            assert prev["pending_after"] == nxt["pending_before"]
    assert stats[-1].get("pending_after") == 0


def test_resume_from_checkpoint(spark, tiny_web, tmp_path_factory):
    """Kill after wave 2, resume, end state byte-identical (north_rule)."""
    web_dir, _ = tiny_web
    w_full = str(tmp_path_factory.mktemp("full"))
    w_part = str(tmp_path_factory.mktemp("part"))
    full = WaveEngine(spark, web_dir, w_full, per_host_k=8, max_waves=30,
                      expected_total_urls=10_000)
    full.run()

    part = WaveEngine(spark, web_dir, w_part, per_host_k=8, max_waves=2,
                      expected_total_urls=10_000)
    part.run()
    resumed = WaveEngine(spark, web_dir, w_part, per_host_k=8, max_waves=30,
                         expected_total_urls=10_000)
    resumed.run(resume=True)

    assert resumed.seen_urls() == full.seen_urls()
    assert resumed.crawl_order() == full.crawl_order()


def test_cuckoo_seen_filter_equivalence(crawl, spark, tiny_web,
                                        tmp_path_factory):
    """seen_filter="cuckoo" (the north_star's deletion-capable alternative
    to the Bloom) must yield an identical crawl: same seen set, same crawl
    order — the filter only ever prunes the exact anti-join."""
    eng, _, _ = crawl
    web_dir, _ = tiny_web
    work = str(tmp_path_factory.mktemp("cuckoo_work"))
    c = WaveEngine(spark, web_dir, work, per_host_k=8, max_waves=30,
                   expected_total_urls=10_000, seen_filter="cuckoo")
    c.run()
    assert c.seen_urls() == eng.seen_urls()
    assert c.crawl_order() == eng.crawl_order()


def test_delta_frontier_compaction_equivalence(spark, tiny_web,
                                               tmp_path_factory):
    """The merge-on-read frontier (VERDICT r02 ask #6): per-wave commits
    are O(wave) deltas; aggressive compaction (every 2 waves) and lazy
    compaction (never within the run) yield byte-identical crawl results,
    and each delta dir holds only that wave's touched rows, not the whole
    frontier."""
    import json
    import os

    import pyarrow.parquet as pq
    web_dir, _ = tiny_web
    w_a = str(tmp_path_factory.mktemp("compact2"))
    w_b = str(tmp_path_factory.mktemp("compact100"))
    a = WaveEngine(spark, web_dir, w_a, per_host_k=8, max_waves=30,
                   expected_total_urls=10_000, compact_every=2)
    a.run()
    b = WaveEngine(spark, web_dir, w_b, per_host_k=8, max_waves=30,
                   expected_total_urls=10_000, compact_every=10_000)
    b.run()
    assert a.seen_urls() == b.seen_urls()
    assert a.crawl_order() == b.crawl_order()
    sa = {r.url: r.status for r in a.frontier().select("url", "status").collect()}
    sb = {r.url: r.status for r in b.frontier().select("url", "status").collect()}
    assert sa == sb

    # O(wave) write cost: in the never-compacted run, every post-seed
    # snapshot adds one delta dir whose row count equals claimed + new for
    # that wave — never the full frontier
    with open(os.path.join(w_b, "frontier", "manifest.json")) as f:
        man = json.load(f)
    snaps = [s for s in man["snapshots"] if s["meta"].get("wave", 0) > 0]
    total = len(sb)
    assert snaps, "expected per-wave delta snapshots"
    for s in snaps:
        delta_dir = os.path.join(w_b, "frontier", s["dirs"][-1])
        n_rows = pq.read_table(delta_dir).num_rows
        assert n_rows < total, (n_rows, total)


def test_assembly_byte_identity(crawl, spark, tiny_web):
    """Company sink rows (JSON columns) equal the oracle's assembly."""
    eng, sim, _ = crawl
    web_dir, _ = tiny_web
    pages = spark.read.parquet(web_dir + "/pages.parquet")
    assembled = ASM.assemble_companies(eng.frontier(), pages)
    got = {r["company"]: r.asDict() for r in assembled.collect()}

    oracle_infos = sim.assemble_all()
    assert set(got) == set(oracle_infos)
    assert len(got) > 0
    ts_tbl = pq.read_table(web_dir + "/pages.parquet",
                           columns=["url", "warc_ts"])
    ts_map = dict(zip(ts_tbl.column("url").to_pylist(),
                      ts_tbl.column("warc_ts").to_pylist()))
    from datetime import timedelta, timezone
    cst = timezone(timedelta(hours=8))
    for company, info in oracle_infos.items():
        create_time = ts_map[company].astimezone(cst).strftime("%Y-%m-%d")
        host = company.split("://")[1].split("/")[0]
        recs = SK.build_sink_records(info, host, create_time)
        row = got[company]
        assert row["create_time"] == create_time
        assert row["bus_base"] == recs["business"]["base"]
        assert row["bus_mortgages"] == recs["business"]["mortgages"]
        assert row["ent_investors"] == recs["enterprise"]["investors"]
        assert row["md5"] == recs["business"]["md5"]
        assert len(row["reports"]) == len(recs["reports"])
        for got_rep, want_rep in zip(
                sorted(row["reports"], key=lambda r: r["year"] or ""),
                sorted(recs["reports"], key=lambda r: r["year"] or "")):
            assert got_rep["general"] == want_rep["general"]
            assert got_rep["invents"] == "null"  # faithful sink quirk


def test_run_crawl_cli_assemble(crawl, spark, tiny_web):
    """spark-submit entry point: resume no-op + sink tables + status 5."""
    import run_crawl
    from new_ent_crawler_spark.sources.snapshot import SnapshotTable
    eng, sim, _ = crawl
    web_dir, _ = tiny_web
    run_crawl.main(["--data", web_dir, "--work", eng.work_dir,
                    "--per-host-k", "8", "--assemble"])
    bus = SnapshotTable(eng.work_dir + "/business_info").read(spark)
    assert bus.count() == len(sim.assemble_all())
    assert set(bus.columns) >= {"province", "create_time", "name", "md5",
                                "type", "regno", "base", "mortgages"}
    rep = SnapshotTable(eng.work_dir + "/report_info").read(spark)
    assert "invents" in rep.columns
    sim.finalize_exact_matches()
    got = {r.url: r.status
           for r in eng.frontier().select("url", "status").collect()}
    assert got == sim.statuses()
