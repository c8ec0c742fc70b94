"""Explicit schemas and the reference's rename dictionaries.

The reference infers everything from CSV headers (SURVEY.md §1.4); this
engine declares schemas up front so plans are deterministic and Parquet
scans prune columns. The rename maps are the *data contract* of the
reference's pivot operator (behavior at
/root/reference/scripts/shape-data.js:31-43, dictionaries at
/root/reference/assets/column-map-{raw,modeled}.json) — transcribed here as
configuration, with the long-format source schema they imply.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- rename dictionaries (long column -> short wide prefix) -----------------
# Shared demographic metrics (column-map-raw.json:5-19 == column-map-modeled.json:5-19)
_DEMOGRAPHICS = {
    "population": "p",
    "renter_homes_pct": "pro",
    "median_gross_rent": "mgr",
    "median_household_income": "mhi",
    "median_property_value": "mpv",
    "rent_burden": "rb",
    "white_pct": "pw",
    "black_pct": "paa",
    "latinx_pct": "ph",
    "aian_pct": "pai",
    "asian_pct": "pa",
    "nhpi_pct": "pnp",
    "multiple_pct": "pm",
    "other_pct": "po",
    "poverty_rate": "pr",
}

# Shared outcome metrics (threatened/filings families, both maps)
_OUTCOMES = {
    "threatened": "t",
    "threatened_low": "tl",
    "threatened_high": "th",
    "threatened_rate": "tr",
    "threatened_rate_high": "trh",
    "threatened_rate_low": "trl",
    "filings": "ef",
    "filings_high": "efh",
    "filings_low": "efl",
    "filing_rate": "efr",
    "filing_rate_low": "efrl",
    "filing_rate_high": "efrh",
}

# Year-invariant identity columns (shape-data.js:19: name/parent_location do
# not get a year suffix; keys GEOID,n,pl in the wide output).
ID_COLS = {"id": "GEOID", "name": "n", "parent_location": "pl"}

# raw dataset: court judgements (column-map-raw.json:20-21,34)
COL_MAP_RAW = {
    **ID_COLS,
    **_DEMOGRAPHICS,
    "judgements": "e",
    "judgement_rate": "er",
    "low_flag": "lf",
    **_OUTCOMES,
}

# modeled dataset: modeled evictions (column-map-modeled.json:20-21)
COL_MAP_MODELED = {
    **ID_COLS,
    **_DEMOGRAPHICS,
    "evictions": "e",
    "eviction_rate": "er",
    **_OUTCOMES,
}

COL_MAPS = {"raw": COL_MAP_RAW, "modeled": COL_MAP_MODELED}

# Year range of the reference pipeline (/root/reference/build.sh:35-36) and
# its decade partitioning ("00-09", "10-18") used for tileset column slicing.
YEARS = [str(y) for y in range(2000, 2019)]
YY = [y[-2:] for y in YEARS]
DECADES = {"00-09": YY[:10], "10-18": YY[10:]}

# Variable whitelists per tileset layer and dataset type
# (/root/reference/build.sh:172-176,193-197).
BUBBLE_VARS = {"raw": ["er", "efr", "tr"], "modeled": ["efr", "tr"]}
CHOROPLETH_VARS = {
    "raw": [
        "e", "er", "p", "pro", "mgr", "mhi", "mpv", "rb", "pw", "paa", "ph",
        "pai", "pa", "pnp", "pm", "po", "pr", "t", "tr", "ef", "efr",
    ],
    "modeled": [
        "e", "er", "p", "pro", "mgr", "mhi", "mpv", "rb", "pw", "paa", "ph",
        "pai", "pa", "pnp", "pm", "po", "pr", "t", "tl", "th", "tr", "trl",
        "trh", "ef", "efl", "efh", "efr", "efrl", "efrh",
    ],
}


def long_schema(dataset_type: str = "raw") -> T.StructType:
    """Schema of the long-format source table (FIXTURES.md A1).

    GEOIDs keep leading zeros -> string; year stays a 4-char string; all
    metrics double. CSV empty string -> null on read matches the
    reference's drop-blank-cells behavior at the aggregation edge.
    """
    metric_cols = [
        c for c in COL_MAPS[dataset_type] if c not in ID_COLS
    ]
    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("year", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("parent_location", T.StringType(), True),
        ]
        + [T.StructField(c, T.DoubleType(), True) for c in metric_cols]
    )


def wide_columns(dataset_type: str = "raw", years: list[str] | None = None) -> list[str]:
    """Deterministic wide-table column list: GEOID,n,pl then {short}-{yy}.

    The reference derives this from the first row's keys (shape-data.js:107)
    — a documented quirk this engine fixes by making the schema total.
    """
    yy = [y[-2:] for y in (years or YEARS)]
    shorts = [v for k, v in COL_MAPS[dataset_type].items() if k not in ID_COLS]
    return ["GEOID", "n", "pl"] + [f"{s}-{y}" for s in shorts for y in yy]


EXTENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("q1", T.DoubleType(), True),
        T.StructField("q99", T.DoubleType(), True),
    ]
)

# Driver testdata table names (TESTDATA.md)
TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
