"""Link-graph operators: PageRank vs a numpy reference, mass conservation,
dangling-node handling, and degree stitching."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from new_ent_crawler_spark.operators import linkgraph as LG


def _np_pagerank(edges, damping=0.85, iterations=5):
    """Dense numpy reference: same recurrence, same dangling handling."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for s, d in edges:
            nxt[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def edges_df(spark):
    # hand graph with a sink (node 9 has no out-edges) and a hub (node 0)
    e = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (4, 0),
         (5, 9), (6, 9), (7, 9), (8, 0), (1, 9)]
    return spark.createDataFrame(e, "src long, dst long"), e


def test_pagerank_matches_numpy(edges_df):
    df, e = edges_df
    got = {r["node"]: r["rank"]
           for r in LG.pagerank(df, iterations=5).collect()}
    want = _np_pagerank(e, iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_mass_conserved(edges_df):
    df, _ = edges_df
    for k in (0, 1, 4):
        total = (LG.pagerank(df, iterations=k)
                 .agg(F.sum("rank")).collect()[0][0])
        assert total == pytest.approx(1.0, abs=1e-12)


def test_pagerank_zero_iterations_uniform(edges_df):
    df, e = edges_df
    n = len({s for s, _ in e} | {d for _, d in e})
    rows = LG.pagerank(df, iterations=0).collect()
    assert all(r["rank"] == pytest.approx(1.0 / n) for r in rows)


def test_degree_stats_full_outer(edges_df):
    df, e = edges_df
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in LG.degree_stats(df).collect()}
    # sink: in only
    assert got[9] == (0, 4)
    # hub: both directions
    assert got[0] == (3, 4)
    assert sum(o for o, _ in got.values()) == len(e)
    assert sum(i for _, i in got.values()) == len(e)


def test_centrality_host_boost_tiers(edges_df):
    df, e = edges_df
    ranks = LG.pagerank(df, iterations=4)
    boost = {r["host"]: r["boost"]
             for r in LG.centrality_host_boost(ranks, n_tiers=4).collect()}
    n = len({s for s, _ in e} | {d for _, d in e})
    assert set(boost.values()) <= set(range(4))
    assert len(boost) == n
    # the sink node 9 absorbs mass from 4 in-links -> top tier;
    # pure sources (5, 6, 7, 8: no in-links) hold the minimum rank, but
    # 10 rows over 4 exact-NTILE tiers bucket as 3,3,2,2 so the node-id
    # tiebreak spills the last of the four into tier 2
    assert boost[9] == 3
    assert all(boost[v] == 0 for v in (5, 6, 7))
    assert boost[8] <= 1
    # monotone: a higher rank never gets a lower boost
    rk = {r["node"]: r["rank"] for r in ranks.collect()}
    pairs = [(rk[v], boost[v]) for v in boost]
    pairs.sort()
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(pairs, pairs[1:]))


def test_derive_edges_deterministic_with_sinks(spark):
    ev = spark.range(0, 2000).select(F.col("id").alias("event_id"))
    e1 = LG.derive_edges(ev, n_src=10, n_nodes=14)
    e2 = LG.derive_edges(ev, n_src=10, n_nodes=14)
    r1 = sorted(map(tuple, e1.collect()))
    assert r1 == sorted(map(tuple, e2.collect()))
    assert all(s < 10 and d < 14 and s != d for s, d in r1)
    # nodes >= n_src appear only as targets -> true dangling nodes exist
    assert any(d >= 10 for _, d in r1)
