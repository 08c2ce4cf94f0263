"""Heatmap facet (SpatialHeatmapFacets.java:77 / HeatmapFacetCounter.java:86):
dense 2D grid counts over a cell-aligned query region at a fixed grid level.
"""

import pandas as pd

from lucene_solr_spark.ops.relational import _HM, heatmap_facet

SF = "/root/testdata/sf0.001"


def test_heatmap_dense_grid_and_counts(spark):
    out = heatmap_facet(spark, SF).toPandas()

    cols = _HM["x1"] - _HM["x0"]
    rows = _HM["y1"] - _HM["y0"]
    # dense columns×rows array including zero cells (Heatmap.counts is
    # int[columns*rows] in the reference)
    assert len(out) == cols * rows
    assert out.facet_count.min() >= 0
    # in x-major order: 1st column (all rows), then 2nd column, ...
    expect_order = [
        (x, y)
        for x in range(_HM["x0"], _HM["x1"])
        for y in range(_HM["y0"], _HM["y1"])
    ]
    assert list(zip(out.cell_x, out.cell_y)) == expect_order

    # exact counts vs a single-node pandas recompute of the derived points
    c = pd.read_parquet(f"{SF}/customer.parquet")
    cx = ((c.c_custkey * 9301 + 49297) % 36000) // _HM["cw"]
    cy = ((c.c_custkey * 6619 + 293) % 18000) // _HM["ch"]
    in_region = (
        (cx >= _HM["x0"]) & (cx < _HM["x1"]) & (cy >= _HM["y0"]) & (cy < _HM["y1"])
    )
    truth = (
        pd.DataFrame({"cell_x": cx[in_region], "cell_y": cy[in_region]})
        .value_counts()
        .to_dict()
    )
    for _, r in out.iterrows():
        assert r.facet_count == truth.get((r.cell_x, r.cell_y), 0)
    assert out.facet_count.sum() == int(in_region.sum())
