"""Large-star/small-star connected components on adversarial graph
shapes — the structural property the oracle query can't show: round
count stays logarithmic where plain label propagation is linear."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark.plans.graph import cc_large_small_star


def _graph(spark, edge_list, n_nodes):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    return nodes, edges


def test_path_graph_converges_logarithmically(spark):
    """A 256-node path is the worst case for min-label propagation
    (needs ~256 rounds); large/small-star must collapse it to one
    component in O(log² n) — assert a small constant bound."""
    n = 256
    nodes, edges = _graph(spark, [(i, i + 1) for i in range(n - 1)], n)
    labels, rounds = cc_large_small_star(nodes, edges)
    comps = labels.select("component_id").distinct().collect()
    assert [r.component_id for r in comps] == [0]
    assert rounds <= 12, rounds


def test_disjoint_components_and_isolated_nodes(spark):
    """Two separate components + isolated nodes: labels must be the
    component minimum for members and self for isolated nodes."""
    # component A: 0-1-2 ; component B: 10-11, 11-12, 10-13 ; isolated: 20
    nodes, edges = _graph(
        spark, [(0, 1), (1, 2), (10, 11), (11, 12), (10, 13)], 0
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 10, 11, 12, 13, 20]], "doc_id long"
    )
    labels, _ = cc_large_small_star(nodes, edges)
    got = {r.doc_id: r.component_id for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20}


def test_star_and_clique_single_round_shapes(spark):
    """Star and clique graphs (already min-rooted) close in very few
    rounds and produce the correct single component."""
    star = [(0, i) for i in range(1, 30)]
    nodes, edges = _graph(spark, star, 30)
    labels, rounds = cc_large_small_star(nodes, edges)
    assert labels.select("component_id").distinct().count() == 1
    assert rounds <= 3, rounds

    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    nodes, edges = _graph(spark, clique, 8)
    labels, rounds = cc_large_small_star(nodes, edges)
    assert labels.select("component_id").distinct().count() == 1
    assert rounds <= 3, rounds
