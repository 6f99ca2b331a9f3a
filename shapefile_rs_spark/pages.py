"""Common-Crawl-style page table (BASELINE.json input_hint) + extraction UDFs.

Schema: ``(url string, warc_ts timestamp, html binary, text string,
lang string)``.  Pages are derived deterministically from the driver's
``documents`` parquet (doc_id is the seed — FIXTURES.md §1) so the DuckDB
oracle can recompute every derived value with plain SQL arithmetic:

* ``url``       = ``https://site{doc_id % 1000}.example/page/{doc_id}``
* ``warc_ts``   = ``2025-01-01T00:00:00Z + doc_id * 137 seconds``
* geotag (lat/lon embedded in ``html`` as ``<meta name="geo.position">``):
  80% uniform over the polygon-fixture bbox, 20% zipfian hot clusters
  (``doc_id % 5 == 0``) around three fixed hot centers — plants shuffle skew
  so cell-level salting is exercised (SURVEY §7 risk list);
* ``text``      = the document text verbatim; **byte-identical ``text`` per
  ``url`` after html round-trip is the cross-engine invariant**.

The geotag extraction path (P1 in SURVEY §2.3) is a vectorized regex over
the html bytes — pages whose html lacks a geo tag yield null lat/lon.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType, StringType, StructField, StructType

# Hot-cluster centers: inside polygon 1 (2,2), inside polygon 1 (8,8),
# inside polygon 2 the triangle (25,5).  Cluster spread ±0.02° ⇒ at the
# join resolution each cluster lands in ~1 cell → hot cells.
HOT_CENTERS = [(2.0, 2.0), (8.0, 8.0), (25.0, 5.0)]


def lonlat_sql(id_col: str = "doc_id") -> tuple:
    """(lon_sql, lat_sql) — the EXACT arithmetic the python side replicates;
    valid in both Spark SQL and DuckDB.  Every literal is CAST AS DOUBLE:
    DuckDB parses bare decimal literals as DECIMAL and would otherwise run
    the whole derivation in exact decimal arithmetic — not the IEEE doubles
    the engine computes with."""

    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    hot_lon = (
        f"CASE {id_col} % 3 WHEN 0 THEN {d('2.0')} WHEN 1 THEN {d('8.0')} ELSE {d('25.0')} END"
        f" + ({id_col} % 97) * {d('0.0002')}"
    )
    hot_lat = (
        f"CASE {id_col} % 3 WHEN 0 THEN {d('2.0')} WHEN 1 THEN {d('8.0')} ELSE {d('5.0')} END"
        f" + ({id_col} % 89) * {d('0.0002')}"
    )
    lon = f"CASE WHEN {id_col} % 5 = 0 THEN {hot_lon} ELSE ({id_col} % 4000) * {d('0.01')} END"
    lat = (
        f"CASE WHEN {id_col} % 5 = 0 THEN {hot_lat} "
        f"ELSE (CAST(FLOOR({id_col} / 7) AS BIGINT) % 2000) * {d('0.01')} END"
    )
    return lon, lat


def lonlat_numpy(doc_id: np.ndarray) -> tuple:
    """Vectorized replica of :func:`lonlat_sql` (same op order ⇒ same bits)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    mod3 = doc_id % 3
    hot_lon = np.where(mod3 == 0, 2.0, np.where(mod3 == 1, 8.0, 25.0)) + (doc_id % 97) * 0.0002
    hot_lat = np.where(mod3 == 0, 2.0, np.where(mod3 == 1, 8.0, 5.0)) + (doc_id % 89) * 0.0002
    cold_lon = (doc_id % 4000) * 0.01
    cold_lat = (np.floor(doc_id / 7).astype(np.int64) % 2000) * 0.01
    hot = doc_id % 5 == 0
    return np.where(hot, hot_lon, cold_lon), np.where(hot, hot_lat, cold_lat)


_HTML_SCHEMA = StructType([StructField("html", BinaryType())])


def _build_html_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        lon, lat = lonlat_numpy(pdf["doc_id"].to_numpy())
        htmls = []
        for i in range(len(pdf)):
            # repr() emits the shortest round-tripping decimal — float()
            # parse returns the exact same double, so the extraction path
            # is bit-exact against the SQL oracle's arithmetic.
            head = (
                f'<html><head><meta name="geo.position" '
                f'content="{lat[i]!r};{lon[i]!r}">'
                f'<meta charset="utf-8"></head><body>'
            )
            htmls.append(head.encode("utf-8") + str(pdf["text"].iloc[i]).encode("utf-8") + b"</body></html>")
        yield pd.DataFrame({"html": htmls})


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → the canonical page table (input_hint schema)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon_sql, lat_sql = lonlat_sql("doc_id")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id") * 137)).alias(
            "warc_ts"
        ),
        "text",
        "lang",
    )
    html = docs.select("doc_id", "text").mapInPandas(
        lambda it: _add_doc_id_html(it), schema=StructType(
            [StructField("doc_id", docs.schema["doc_id"].dataType), StructField("html", BinaryType())]
        ),
    )
    return base.join(html, "doc_id").select("url", "warc_ts", "html", "text", "lang", "doc_id")


def _add_doc_id_html(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = next(_build_html_batch(iter([pdf])))
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


# -- extraction UDFs (the engine path: html bytes → text / geotag) ----------

_TEXT_RE = rb"<body>(.*)</body>"
_GEO_RE = r'<meta name="geo\.position" content="([^";]+);([^"]+)"'


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Body text from html bytes — the byte-identity invariant function.
    Vectorized via pandas .str on the bytes decoded as utf-8."""
    s = html.apply(lambda b: None if b is None else bytes(b).decode("utf-8", "strict"))
    return s.str.extract(r"<body>(.*)</body>", expand=False)


_GEO_SCHEMA = StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])


@F.pandas_udf(_GEO_SCHEMA)
def extract_geo(html: pd.Series) -> pd.DataFrame:
    """Parse the geo.position meta tag → (lat, lon); nulls when absent."""
    s = html.apply(lambda b: None if b is None else bytes(b).decode("utf-8", "replace"))
    ext = s.str.extract(_GEO_RE)

    def parse(col: pd.Series) -> pd.Series:
        # .astype is bit-exact (strtod); pd.to_numeric's fast path is NOT
        # (xstrtod loses ulps on long decimals) — only fall back to it when
        # a malformed tag makes astype throw.
        try:
            return col.astype("float64")
        except (ValueError, TypeError):
            return pd.to_numeric(col, errors="coerce")

    return pd.DataFrame({"lat": parse(ext[0]), "lon": parse(ext[1])})


def synth_pages_from_ids(ids: DataFrame, id_col: str = "page_id") -> DataFrame:
    """Any BIGINT id column → a full deterministic page table (bench-scale
    mass: e.g. 600k lineitem keys at sf0.1, 10^12 ids on a real cluster).
    Same derivation rules as :func:`pages_from_documents`, text derived from
    the id so byte-identity stays checkable."""
    df = ids.select(F.col(id_col).cast("long").alias("doc_id")).withColumn(
        "text",
        F.concat(
            F.lit("page "),
            F.col("doc_id").cast("string"),
            F.lit(" body "),
            F.sha1(F.concat(F.lit("salt:"), F.col("doc_id").cast("string"))),
        ),
    )
    base = df.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.lit("2025-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id") % 31536000 * 1.0)
        ).alias("warc_ts"),
        "text",
        (F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zh"), F.lit("es")), (F.col("doc_id") % 5 + 1).cast("int"))).alias("lang"),
    )
    html = df.mapInPandas(
        _add_doc_id_html,
        schema=StructType([StructField("doc_id", df.schema["doc_id"].dataType), StructField("html", BinaryType())]),
    )
    return base.join(html, "doc_id").select("url", "warc_ts", "html", "text", "lang", "doc_id")


def geotag_pages(pages: DataFrame) -> DataFrame:
    """pages → + (lat, lon) columns via the vectorized extraction UDF."""
    tagged = pages.withColumn("_geo", extract_geo(F.col("html")))
    return tagged.withColumn("lat", F.col("_geo.lat")).withColumn("lon", F.col("_geo.lon")).drop("_geo")
