"""Reference-fidelity end-to-end benchmark at the reference's own scale.

The reference's three pandas parsers each cap at stop_line = 1,500,000
lines (dag-knlp.py:97, 127, 168) and the author describes the
single-process row-append parse as "waiting for hours"
(dag-knlp.py:98-99). This tool generates a fixture at exactly that
scale — 1.5M wiki-index lines, 1.5M hanja lines, 150k langlink lines
of 10 tuples each (1.5M langlink records) — runs the full
`plans.pipeline.run_reference_pipeline` (parse → staged JSON-lines →
bulk load → dimension build → both DQ checks), and prints per-stage
wall time. The measured number goes in BASELINE.md: it is the one
reference-derived figure this repo can beat on the reference's own
terms (same input scale, same declared semantics, distributed scan +
codegen split instead of a pandas append loop).

Usage:  python tools/bench_reference_e2e.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOP_LINE = 1_500_000  # dag-knlp.py:97,127,168
TUPLES_PER_LANGLINK_LINE = 10
LANGS = ["en", "ja", "de", "fr", "zh"]


def generate_fixture(raw_dir: str) -> dict[str, int]:
    """FIXTURES.md-shaped raw files at the reference's stop_line scale.

    Titles reuse a bounded Korean vocabulary so the hanja join hits,
    ~1 in 3 word_ids carries langlinks (several languages — preserving
    the §2.3 fan-out quirk), and every 1000th wiki line is a ragged
    title containing the delimiter (the overflow path stays exercised
    at scale, dag-knlp.py:136-137).
    """
    t0 = time.perf_counter()
    syllables = ["가", "나", "다", "라", "마", "바", "사", "아", "자", "차"]

    def korean_word(i: int) -> str:
        return "".join(syllables[int(d)] for d in str(i % 100_000))

    with open(os.path.join(raw_dir, "wiki_index.txt"), "w", encoding="utf-8") as f:
        for i in range(STOP_LINE):
            title = korean_word(i)
            if i % 1000 == 999:
                title = f"{title}: 부제"  # ragged — delimiter inside the title
            f.write(f"{600 + i}:{i}:{title}\n")

    with open(os.path.join(raw_dir, "hanja.txt"), "w", encoding="utf-8") as f:
        for i in range(STOP_LINE):
            f.write(f"{korean_word(i)}:漢{i % 100_000}:예문{i}, 용례{i}\n")

    n_langlink_lines = STOP_LINE // TUPLES_PER_LANGLINK_LINE
    with open(os.path.join(raw_dir, "langlink.txt"), "w", encoding="utf-8") as f:
        for line_no in range(n_langlink_lines):
            parts = []
            for j in range(TUPLES_PER_LANGLINK_LINE):
                k = line_no * TUPLES_PER_LANGLINK_LINE + j
                word_id = (k * 3) % STOP_LINE  # ~1/3 of word_ids hit
                lang = LANGS[k % len(LANGS)]
                parts.append(f"{word_id},{lang},title_{lang}_{word_id}")
            f.write("),(".join(parts) + "\n")

    return {
        "gen_sec": round(time.perf_counter() - t0, 1),
        "wiki_lines": STOP_LINE,
        "hanja_lines": STOP_LINE,
        "langlink_records": n_langlink_lines * TUPLES_PER_LANGLINK_LINE,
    }


def main() -> None:
    from etl_knlp_spark.plans.pipeline import run_reference_pipeline
    from etl_knlp_spark.session import get_spark

    keep = "--keep" in sys.argv
    work = tempfile.mkdtemp(prefix="etl_knlp_e2e_")
    raw, stage = os.path.join(work, "raw"), os.path.join(work, "stage")
    os.makedirs(raw)

    stats = generate_fixture(raw)

    spark = get_spark(app_name="etl_knlp_e2e_bench")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    result = run_reference_pipeline(spark, raw, stage)
    # run_reference_pipeline already executed the three staged writes
    # and both DQ actions; materialize the dimension through the noop
    # sink so the measured time covers the whole DAG end to end.
    result.dimension.write.mode("overwrite").format("noop").save()
    pipeline_sec = round(time.perf_counter() - t0, 1)

    dim_rows = result.dimension.count()

    # r7 sources at the same 1.5M-record scale (round-7 verdict #4):
    # the pipeline's staging format is JSON-lines (dag-knlp.py:109-111);
    # these time the SAME corpus through the WARC and Avro OCF
    # source/sink pairs so every binary source carries a measured
    # number at the reference's own scale. The frame is checkpointed
    # first so the sink timings don't re-pay the parse DAG.
    from pyspark.sql import functions as F

    from etl_knlp_spark.sources.avro import read_avro, write_avro
    from etl_knlp_spark.sources.warc import read_warc, write_warc

    corpus = result.korean.select(
        F.col("data_id").cast("long").alias("doc_id"),
        F.lit("ko").alias("lang"),
        F.concat_ws(" ", "word_id", "korean").alias("text"),
    ).localCheckpoint()  # eager: isolate source I/O from the parse DAG

    t0 = time.perf_counter()
    n_warc = write_warc(corpus, os.path.join(work, "warc"))
    warc_write_sec = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    warc_read_rows = read_warc(spark, os.path.join(work, "warc")).count()
    warc_read_sec = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_avro = write_avro(corpus, os.path.join(work, "avro"))
    avro_write_sec = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    avro_read_rows = read_avro(
        spark,
        os.path.join(work, "avro"),
        "doc_id bigint, lang string, text string",
    ).count()
    avro_read_sec = round(time.perf_counter() - t0, 1)
    assert n_warc == warc_read_rows and n_avro == avro_read_rows

    print(
        json.dumps(
            {
                "metric": "reference_pipeline_e2e",
                "value": pipeline_sec,
                "unit": "sec",
                "fixture": stats,
                "korean_rows": result.row_count,
                "dimension_rows": dim_rows,
                "max_word_id_len": result.max_word_id_len,
                "sources_stop_line_1_5M": {
                    "rows": n_warc,
                    "warc_write_sec": warc_write_sec,
                    "warc_read_sec": warc_read_sec,
                    "avro_write_sec": avro_write_sec,
                    "avro_read_sec": avro_read_sec,
                },
                "reference_analog": "dag-knlp.py stop_line=1.5M parse, 'hours' single-process",
            }
        )
    )
    if keep:
        print(f"fixture kept at {work}", file=sys.stderr)
    else:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
