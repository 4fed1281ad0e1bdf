"""Raw-text file readers — the reference's three parsers as distributed
scans (SURVEY.md §2.1 S1-S3; dag-knlp.py:85-188).

The reference reads each file in one Python process with a per-line
loop and O(n²) pandas appends ("waiting for hours", dag-knlp.py:98-99).
Here each reader is `spark.read.text` (input-split parallel scan) plus
codegen'd split/explode expressions — the same parse at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import split_delimited


def read_delimited(
    spark: SparkSession,
    path: str,
    field_names: list[str],
    sep: str = ":",
    sep_regex: str | None = None,
    overflow: str = "join",
    drop_blank: bool = True,
) -> DataFrame:
    """S1/S2: line-per-record files with a field delimiter
    (`hanja.txt` `korean:hanja:examples...`, dag-knlp.py:94-107; wiki
    index `offset:page_id:title`, dag-knlp.py:118-137).

    Ragged lines overflow into the last field ('join') or an honest
    array<string> ('array') — the reference packs overflow into a
    Python list (dag-knlp.py:105). Blank lines drop, mirroring the
    reference's implicit skip of empty parses.
    """
    lines = spark.read.text(path)
    if drop_blank:
        lines = lines.filter(F.length(F.trim(F.col("value"))) > 0)
    import re

    pattern = sep_regex if sep_regex is not None else re.escape(sep)
    return split_delimited(
        lines, "value", pattern, field_names, overflow=overflow, join_sep=sep
    )


def read_tuple_burst(
    spark: SparkSession,
    path: str,
    field_names: list[str],
    tuple_sep_regex: str = r"\),\(",
    field_sep: str = ",",
    overflow: str = "join",
) -> DataFrame:
    """S3: langlink-style files where ONE line holds many
    '),('-separated tuples, each a comma-separated record
    (dag-knlp.py:160-179) — the row-multiplying explode parse.

    Note `F.split` is regex (the literal `),(`  must arrive escaped)
    where the reference's `str.split` is literal — SURVEY.md §2.8 F2.
    """
    lines = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    tuples = lines.select(
        F.explode(F.split(F.col("value"), tuple_sep_regex)).alias("tup")
    ).filter(F.length(F.trim(F.col("tup"))) > 0)
    import re

    return split_delimited(
        tuples, "tup", re.escape(field_sep), field_names, overflow=overflow, join_sep=field_sep
    )
