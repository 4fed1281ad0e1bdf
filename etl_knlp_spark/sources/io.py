"""Sinks, bulk loads, and DDL — the staging/warehouse half of the
reference (SURVEY.md §2.1 S4-S8).

Reference behaviors re-expressed:
- JSON-lines staging to object storage (dag-knlp.py:109-111) →
  `df.write.json` (JSON-lines is Spark's native JSON framing; the s3a
  committer replaces boto3 PUTs on a real cluster).
- 10k-row chunked part-files (dag-knlp.py:126, 139-145) →
  `maxRecordsPerFile` — Spark's normal multi-part output.
- `COPY ... JSON 'auto'` schema-on-read name binding
  (dag-knlp.py:202-205) → `spark.read.json` + select to DDL order.
- `CREATE TABLE IF NOT EXISTS` + `INSERT INTO ... SELECT`
  (dag-knlp.py:24-63, 66-71) → saveAsTable / insertInto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_json_lines(df: DataFrame, path: str, max_records_per_file: int = 10_000, mode: str = "overwrite") -> None:
    """S4+S5: JSON-lines sink with bounded part-file size. The
    reference hand-rolls this chunking for memory relief
    (dag-knlp.py:139-145); here it's a writer option and partitioned
    execution does the rest."""
    df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file).json(path)


def read_json_auto(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S6: bulk JSON load with name-based binding — `spark.read.json`
    infers the schema and binds by key name exactly like
    `COPY ... JSON 'auto'` (dag-knlp.py:202-205); a directory path
    loads every part-file (the reference's prefix COPY,
    dag-knlp.py:231-239). Pass `columns` to project to DDL order
    (the explicit column-list COPY variant, dag-knlp.py:202).

    Malformed-record policy (the part Redshift's COPY error table
    handles in the reference): PERMISSIVE (default) nulls bad rows —
    pass `corrupt_col` to quarantine the raw bad line into a column
    instead of dropping it silently; DROPMALFORMED discards;
    FAILFAST raises on the first bad record.
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    df = reader.json(path)
    if columns is not None:
        keep = list(columns) + ([corrupt_col] if corrupt_col in df.columns else [])
        df = df.select(*[F.col(c) for c in keep])
    return df


def create_table_if_not_exists(spark: SparkSession, name: str, ddl_schema: str, location: str | None = None) -> None:
    """S7: `CREATE TABLE IF NOT EXISTS ... USING parquet` — the
    reference's DDL strings (dag-knlp.py:24-63) minus the identity
    column, which is engine-side (`plans.dimension.with_identity`)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({ddl_schema}) USING parquet{loc}")


def insert_into(df: DataFrame, table: str, overwrite: bool = False) -> None:
    """S8: `INSERT INTO ... SELECT` append (dag-knlp.py:66-71)."""
    df.write.insertInto(table, overwrite=overwrite)
