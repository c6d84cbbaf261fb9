"""Connected-components operator: toy-graph ground truth + convergence."""

from __future__ import annotations

from eviction_lab_etl_spark.operators.clustering import connected_components


def test_cc_two_components_and_chain(spark):
    # Component 1 is a 4-vertex chain (worst diameter per vertex count);
    # component 2 is a triangle; vertex ids deliberately out of order so the
    # min label is not the first-seen one.
    edges = spark.createDataFrame(
        [(7, 3), (3, 9), (9, 1), (20, 30), (30, 10), (10, 20)],
        "a long, b long",
    )
    got = {(r.v, r.lbl) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (3, 1), (7, 1), (9, 1),
        (10, 10), (20, 10), (30, 10),
    }


def test_cc_singleton_edge(spark):
    edges = spark.createDataFrame([(5, 2)], "a long, b long")
    got = {(r.v, r.lbl) for r in connected_components(edges).collect()}
    assert got == {(2, 2), (5, 2)}
