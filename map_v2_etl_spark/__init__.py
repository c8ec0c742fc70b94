"""map_v2_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
EvictionLab/map-v2-etl reference pipeline (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
Parquet at rest, shuffle-based aggregation instead of driver-memory
accumulation, plus LLM-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal columns, streaming windows).

Layout:
    session    — SparkSession factory tuned for local and cluster runs
    schemas    — explicit StructTypes + the reference's column-rename maps
    sources/   — CSV / Parquet / GeoJSON readers and ordered single-file sinks
    operators/ — pivot, extents, joins, slicing, dedup, similarity, text, geo
    functions/ — scalar/vector column expression helpers
    plans/     — end-to-end pipelines (long CSV -> wide CSV -> extents CSV)
    streaming/ — Structured Streaming extension (windowed event aggregation)
"""

__version__ = "0.1.0"
