"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark AND its oracle_sql() in
DuckDB (tables pre-registered as views), then compares:
  * row count
  * sorted column-name list
  * order-insensitive value comparison (rows sorted, exact for
    strings/ints, and exact-then-ulp report for floats so any
    nondeterminism is visible before the real driver sees it)

Usage: python tools/check_oracle.py [--bare] [name ...]

--bare builds a deliberately vanilla SparkSession (no engine confs beyond
master/memory) to replicate the driver's harness, which does NOT run our
session.get_spark — catches hidden session-conf dependencies (timezone,
Arrow, nanosAsLong) before the driver does.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (bytearray, memoryview)):
        # Spark returns binary as bytearray, DuckDB as bytes — they
        # compare equal but STRINGIFY differently, and the row sort
        # keys on str(cell); unnormalized they can misalign the zip
        return bytes(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    proj = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(proj, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(name, spark_df, con) -> list[str]:
    from map_v2_etl_spark.plans.queries import REGISTRY

    problems = []
    sql = REGISTRY[name].oracle
    t0 = time.time()
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    t_spark = time.time() - t0
    t0 = time.time()
    # Type audit BEFORE normalization: the real driver hashes DuckDB's
    # native result types, so an un-cast integer SUM projecting HUGEINT
    # hash-fails there even though our normalized comparison below would
    # pass. Flag any projection type Spark can't produce (r3 verdict:
    # variant_props / split_train_val_test class).
    rel = con.sql(sql)
    widetypes = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER")
    }
    if widetypes:
        problems.append(
            f"ORACLE-TYPE: un-Spark-representable projection types "
            f"{widetypes} — wrap in CAST(... AS BIGINT/DOUBLE/DECIMAL)"
        )
    # DECIMAL finals are the r5 lesson: both engines compute the right
    # value but the driver's hasher canonicalizes DECIMAL result columns
    # differently per engine, so a DECIMAL-typed FINAL projection can
    # never hash-match (all 6 r5 hash failures were exactly this class).
    # House style: exact decimal internally, CAST(... AS DOUBLE) final.
    dectypes = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if str(t).startswith("DECIMAL")
    }
    if dectypes:
        problems.append(
            f"ORACLE-TYPE: DECIMAL final projection {dectypes} — driver "
            f"hasher canonicalizes DECIMAL per-engine; keep sums decimal "
            f"internally but CAST the final projection AS DOUBLE (r5)"
        )
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    t_duck = time.time() - t0

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems, len(s_rows)
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        return problems, len(s_rows)

    a = rows_sorted([tuple(r) for r in s_rows], s_cols)
    b = rows_sorted(d_rows, d_cols)
    n_exact = n_close = n_diff = 0
    example = None
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb or (va is None and vb is None):
                n_exact += 1
            elif (
                isinstance(va, float)
                and isinstance(vb, float)
                and math.isnan(va)
                and math.isnan(vb)
            ):
                # NaN != NaN but the engines AGREE bit-for-bit
                n_exact += 1
            elif (
                isinstance(va, float)
                and isinstance(vb, float)
                and math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12)
            ):
                n_close += 1
                if example is None:
                    example = (va, vb)
            else:
                n_diff += 1
                if example is None:
                    example = (va, vb)
    if n_diff:
        problems.append(f"values: {n_diff} cells differ, e.g. {example}")
    elif n_close:
        problems.append(
            f"FLOAT-ULP: {n_close} cells only float-close (driver hash may "
            f"fail), e.g. {example}"
        )
    print(f"  timings: spark={t_spark:.2f}s duck={t_duck:.3f}s rows={len(s_rows)}")
    return problems, len(s_rows)


def main():
    import __spark_entry__ as e

    args = sys.argv[1:]
    bare = "--bare" in args
    args = [a for a in args if a != "--bare"]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py [--bare] [--json PATH] [name ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-bare")
            # the docstring's "master/memory only": without a heap
            # setting the 1g default makes wide collects report
            # harness OOMs as query failures, which the real driver
            # (with a sized heap) would not show
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        print("session: BARE (driver-harness twin, no engine confs)")
    else:
        from map_v2_etl_spark.session import get_spark

        spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args or list(qs)
    failed = []
    results = {}
    for name in names:
        if name not in oracles:
            try:
                df = qs[name](spark, SF_DIR)
                # The driver's canonicalizer pandas-lexsorts every
                # column, so array/map cells raise "unhashable type"
                # there (r3: media_features). Catch it here first.
                from pyspark.sql.types import ArrayType, MapType

                complex_cols = [
                    f.name
                    for f in df.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType))
                ]
                n = df.count()
                if complex_cols:
                    failed.append(name)
                    print(
                        f"{name}: DRIVER-UNSAFE array/map columns "
                        f"{complex_cols} — to_json or explode them in "
                        f"the registry projection"
                    )
                    err = f"driver_unsafe_columns: {complex_cols}"[:200]
                else:
                    print(f"{name}: rows-only check, {n} rows")
                    err = "no_oracle"
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "oracle_rows": None, "err": err,
                }
            except Exception as exc:  # rows-only query crashed
                failed.append(name)
                print(f"{name}: ERROR {exc}")
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None, "err": str(exc)[:200],
                }
            continue
        print(f"{name}:")
        try:
            probs, n = compare(name, qs[name](spark, SF_DIR), con)
        except Exception as exc:
            # one crashing query must not abort the whole gate with no
            # JSON and every later query unchecked (the no-oracle
            # branch already caught per-query; this one did not)
            failed.append(name)
            print(f"  ERROR {exc}")
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": None,
                "oracle_rows": None, "err": str(exc)[:200],
            }
            spark.catalog.clearCache()
            continue
        ok = not probs
        if probs:
            failed.append(name)
            for p in probs:
                print(f"  MISMATCH {p}")
        else:
            print("  OK")
        # real driver-format fidelity: failures record False (not
        # null, which reads as "unchecked") and row counts are filled
        results[name] = {
            "rows_match": ok, "schema_match": ok,
            "hash_match": ok, "spark_rows": n,
            "oracle_rows": n, "err": None if ok else "; ".join(probs)[:200],
        }
        # release per-query persisted state (see bench.py note)
        spark.catalog.clearCache()
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_out}")
    print()
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print(f"all {len(names)} queries match")


if __name__ == "__main__":
    main()
