"""Source/sink format coverage: gzip CSV, ORC, JSON lines, streaming
parquet sink."""

import os

from pyspark.sql import functions as F

from map_v2_etl_spark.schemas import long_schema
from map_v2_etl_spark.sources.csv_io import read_long_csv, write_csv_dir
from map_v2_etl_spark.sources.registry import load_table


def test_gzip_csv_roundtrip(spark, tmp_path):
    """S2: transparent .gz on both sides (the reference gunzips by hand)."""
    header = "id,year,name,parent_location,population,extra"
    rows = ["01,2000,A,PL,10,x", "02,2001,B,,20,y"]
    src = tmp_path / "long.csv.gz"
    import gzip

    with gzip.open(src, "wt") as f:
        f.write("\n".join([header] + rows) + "\n")

    df = read_long_csv(spark, str(src), long_schema("raw"))
    got = {r.id: (r.population, r.parent_location) for r in df.collect()}
    assert got == {"01": (10.0, "PL"), "02": (20.0, None)}

    out = str(tmp_path / "out_csv")
    write_csv_dir(df.select("id", "year", "population"), out, ["id"],
                  compression="gzip")
    assert any(p.endswith(".csv.gz") for p in os.listdir(out))
    back = (
        spark.read.option("header", True).csv(out)
        .select("id", "year", "population")
    )
    assert {r.id for r in back.collect()} == {"01", "02"}


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, "nation", sf_dir)
    path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in nation.collect()
    }


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).limit(100).select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "events_json")
    ev.write.mode("overwrite").json(path)
    back = spark.read.json(path, schema=ev.schema)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in ev.collect()
    }


def test_stream_to_parquet_sink(spark, sf_dir, tmp_path):
    """File sink + checkpoint (availableNow trigger) equals the batch
    transform."""
    from map_v2_etl_spark.streaming.windows import (
        stream_to_parquet,
        tumbling_window_counts,
    )

    src = os.path.join(sf_dir, "events.parquet")
    out = str(tmp_path / "windows_out")
    ckpt = str(tmp_path / "ckpt")
    stream_to_parquet(
        spark, src, tumbling_window_counts, out, ckpt
    )
    streamed = spark.read.parquet(out)
    batch = tumbling_window_counts(load_table(spark, "events", sf_dir))
    cols = ["window_start", "event_type", "n_events", "total_value"]
    a = {tuple(r[c] for c in cols) for r in streamed.collect()}
    b = {tuple(r[c] for c in cols) for r in batch.collect()}
    # append mode emits a window only once the watermark passes its end;
    # windows still open when availableNow drains stay in state. So the
    # sink holds exactly the FINALIZED subset of the batch answer.
    assert a <= b
    assert len(a) > 0
    from datetime import timedelta

    max_ts = load_table(spark, "events", sf_dir).agg(
        F.max("ts")
    ).collect()[0][0]
    finalized = {
        t for t in b
        # window end (start + 5 min) <= watermark (max ts - 10 min)
        if t[0] + timedelta(minutes=5) <= max_ts - timedelta(minutes=10)
    }
    assert finalized <= a


def test_jsonl_roundtrip_gzip(spark, sf_dir, tmp_path):
    """documents parquet -> gzipped JSONL shards -> read back: lossless."""
    from map_v2_etl_spark.sources.jsonl import (
        documents_schema,
        read_jsonl,
        write_jsonl,
    )
    from map_v2_etl_spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, compression="gzip", shards=3)
    back = read_jsonl(spark, out, documents_schema())
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    import glob as g
    assert len(g.glob(out + "/part-*.json.gz")) == 3


def test_jsonl_missing_and_extra_keys(spark, tmp_path):
    """Declared-schema read: missing keys -> null, extra keys dropped."""
    from map_v2_etl_spark.sources.jsonl import documents_schema, read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "s", '
        '"n_chars": 5, "extra": true}\n'
        '{"doc_id": 2, "text": "world"}\n'
    )
    back = read_jsonl(spark, str(p), documents_schema())
    rows = {r.doc_id: r for r in back.collect()}
    assert rows[1].text == "hello" and not hasattr(rows[1], "extra")
    assert rows[2].lang is None and rows[2].n_chars is None


def test_geojson_mixed_geometry_types_not_corrupted(spark, tmp_path):
    """A FeatureCollection mixing Polygon and MultiPolygon (routine in
    census shapes) must round-trip geometry VERBATIM — schema inference
    + to_json previously unified the coordinate nestings to strings,
    quoting every number."""
    import json as _json

    from map_v2_etl_spark.sources.geojson import read_geojson

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"GEOID": "01"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[1.0, 2.0], [3.0, 4.0],
                                       [1.0, 2.0]]]}},
        {"type": "Feature", "properties": {"GEOID": "02"},
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [[[[5.0, 6.0], [7.0, 8.0],
                                        [5.0, 6.0]]]]}},
        {"type": "Feature", "properties": {"GEOID": "03"},
         "geometry": None},  # RFC 7946 null geometry
    ]}
    p = tmp_path / "mixed.geojson"
    p.write_text(_json.dumps(fc))
    rows = {r["GEOID"]: r["geometry"]
            for r in read_geojson(spark, str(p), ["GEOID"]).collect()}
    g1 = _json.loads(rows["01"])
    assert g1["type"] == "Polygon"
    assert g1["coordinates"][0][0] == [1.0, 2.0]  # numbers, not strings
    g2 = _json.loads(rows["02"])
    assert g2["coordinates"][0][0][1] == [7.0, 8.0]
    assert rows["03"] is None

    # null geometry renders the literal `null`, never a blank line
    from map_v2_etl_spark.sources.geojson import feature_json

    feats = read_geojson(spark, str(p), ["GEOID"])
    lines = {
        _json.loads(r["feature"])["properties"]["GEOID"]: r["feature"]
        for r in feature_json(feats, ["GEOID"]).collect()
    }
    assert _json.loads(lines["03"])["geometry"] is None


def test_geojson_missing_property_becomes_null_column(spark, tmp_path):
    import json as _json

    from map_v2_etl_spark.sources.geojson import read_geojson

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"geoid": "01"},
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}},
    ]}
    p = tmp_path / "miss.geojson"
    p.write_text(_json.dumps(fc))
    rows = read_geojson(spark, str(p), ["GEOID"]).collect()
    assert rows[0]["GEOID"] is None  # null column, not UNRESOLVED_COLUMN
