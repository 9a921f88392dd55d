"""Source adapters — SURVEY §2.1 (S1-S4): CSV, nested graph-document
JSON, and Excel-shaped inputs as Spark scans.

The reference's nested document format (SURVEY §1.1:
``{"Asset": {"Instrument": {"Indicator": [component...]}}}`` with
per-component ``connections[].segments[]``) is read with
``spark.read.json(multiLine=True)`` and flattened with ``explode`` —
schema-on-read, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """CSV scan (S1, the Master_data.csv shape). Explicit schema when
    known — inferSchema costs an extra full read at 100 TB."""
    tune(spark)
    reader = spark.read.option("header", True)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_graph_documents(spark: SparkSession, path: str) -> DataFrame:
    """Nested graph-document JSON scan (S3): one document per file,
    multiLine. Returns the raw nested frame."""
    tune(spark)
    return spark.read.option("multiLine", True).json(path)


def flatten_components(docs: DataFrame) -> DataFrame:
    """Flatten Asset.Instrument.Indicator[] into component rows
    (duck-typed extraction analogue of reference app.py:2254-2270):
    one row per component with its scalar fields plus the exploded
    connection targets."""
    comps = docs.select(
        F.explode(F.col("Asset.Instrument.Indicator")).alias("c")
    ).select(
        F.col("c.id").alias("component_id"),
        F.col("c.label").alias("label"),
        F.col("c.score").alias("score"),
        F.col("c.Document_ID").alias("document_id"),
        F.col("c.text_associated").alias("text_associated"),
        F.col("c.connections").alias("connections"),
    )
    return comps


def explode_connections(comps: DataFrame) -> DataFrame:
    """Component rows -> connection edge rows with segment counts."""
    return (
        comps.select(
            "component_id",
            "document_id",
            F.explode_outer("connections").alias("conn"),
        )
        .select(
            "component_id",
            "document_id",
            F.col("conn.asset_key").alias("to_component"),
            F.col("conn.flow_direction").alias("flow_direction"),
            F.coalesce(F.size("conn.segments"), F.lit(0)).alias("n_segments"),
        )
    )


def sheet_frame_to_rows(spark: SparkSession, pdf) -> DataFrame:
    """Normalize a pandas sheet frame (Excel or its CSV interchange)
    into a DataFrame: stripped string headers, Arrow-batched transfer.
    Split from the binary decode so the ingestion semantics are
    testable in environments without an Excel engine."""
    pdf = pdf.copy()
    pdf.columns = [str(c).strip() for c in pdf.columns]
    return spark.createDataFrame(pdf)


def read_excel_rows(spark: SparkSession, path: str) -> DataFrame:
    """Excel scan (S2): pandas.read_excel -> createDataFrame. Gated on
    the engine being available in the environment; CSV is the
    fallback interchange in this container (sheet_frame_to_rows covers
    everything after the binary decode)."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)  # requires openpyxl/xlrd
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(f"Excel engine not available: {exc}") from exc
    return sheet_frame_to_rows(spark, pdf)
