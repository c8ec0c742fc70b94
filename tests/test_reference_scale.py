"""Small-cardinality correctness of the reference-scale benchmark pieces
(sources/synthetic.py + the pivot/extents jobs bench_reference.py times)."""

from pyspark.sql import functions as F

from map_v2_etl_spark.operators.extents import column_extents
from map_v2_etl_spark.operators.pivot import pivot_long_to_wide
from map_v2_etl_spark.schemas import COL_MAP_RAW, ID_COLS, YY
from map_v2_etl_spark.sources.synthetic import reference_long_table


def test_synthetic_long_shape_and_determinism(spark):
    d = reference_long_table(spark, places=500)
    assert d.count() == 500 * 19
    metrics = [k for k in COL_MAP_RAW if k not in ID_COLS]
    assert set(d.columns) == {"id", "year", "name", "parent_location", *metrics}
    # pure hash data: two independent generations are identical
    a = d.orderBy("id", "year").limit(50).collect()
    b = (
        reference_long_table(spark, places=500)
        .orderBy("id", "year")
        .limit(50)
        .collect()
    )
    assert a == b


def test_reference_pivot_shape(spark):
    wide = pivot_long_to_wide(reference_long_table(spark, places=300), "raw")
    metrics = [v for k, v in COL_MAP_RAW.items() if k not in ID_COLS]
    assert wide.count() == 300
    assert len(wide.columns) == 3 + len(metrics) * len(YY)
    # JS-falsy fill applied to the every-50th empty parent_location
    assert (
        wide.filter(F.col("pl") == "United States").count() == 300 // 50
    )


def test_reference_extents_bounds(spark):
    wide = pivot_long_to_wide(reference_long_table(spark, places=300), "raw")
    ext = column_extents(wide).collect()
    assert len(ext) == len(wide.columns) - 3
    for r in ext:
        assert r["min"] <= r["q1"] <= r["q99"] <= r["max"]
