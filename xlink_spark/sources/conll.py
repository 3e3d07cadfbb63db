"""AIDA-CoNLL (YAGO2) annotated-dataset source (SURVEY §2.1 S10).

Reference: evaluation/build_dataset/AnnotationFormatter.py:27-86 — a
sequential walk over ``-DOCSTART-`` / token / ``B-I`` lines that rebuilds
each document's text while recording gold mention spans, then resolves each
mention's wiki URL against the KB's URI index (NIL on ``--NME--`` or an
index miss) and reports total/NIL/miss stats.

Spark redesign: a CoNLL file must be parsed sequentially WITHIN a file
(offsets accumulate), but files are independent — so the unit of
parallelism is the file: ``spark.read.text(..., wholetext=True)`` gives one
row per file and an Arrow-batched ``mapInPandas`` rebuilds (docs, mentions)
per file. Entity resolution is NOT done inside the parser (the reference's
per-mention dictionary probe): the parser emits the raw wiki URL and a
single broadcast LEFT join against ``kb_uris`` resolves all mentions at
once — misses become NIL with ``status='nil_miss'`` (the reference's
``xlore_misses``), ``--NME--`` becomes ``status='nil_nme'``.

Reproduced reference quirks (pinned by tests):
  * a ``B`` line appends the FULL mention label + one space; ``I`` lines
    append nothing (the label already covers the span);
  * a bare-punctuation line is glued to the previous token (no space
    before OR after — ``doc.strip(' ') + punct``);
  * an empty line becomes a newline after stripping trailing spaces;
  * a document with no mentions at EOF is dropped (``if len(doc_mentions)
    > 0`` on the final flush).
"""

from __future__ import annotations

import string
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_PARSED = StructType(
    [
        StructField("file", StringType(), False),
        StructField("doc_idx", IntegerType(), False),
        StructField("kind", StringType(), False),  # 'doc' | 'mention'
        StructField("text", StringType(), True),  # doc rows
        StructField("start", IntegerType(), True),  # mention rows
        StructField("end", IntegerType(), True),
        StructField("mention", StringType(), True),
        StructField("gold_url", StringType(), True),  # None ⇒ --NME--
        # 1 ⇒ a B line claimed a yago id but carried no URL column — bad
        # input, kept distinct from genuine --NME-- (the reference raises
        # IndexError there, AnnotationFormatter.py:57)
        StructField("malformed", IntegerType(), True),
    ]
)

_WIKI_PREFIX_LEN = 23  # line_arr[4][23:] — strips 'http://en.wikipedia.org' (AnnotationFormatter.py:57)


def parse_conll(files: DataFrame) -> DataFrame:
    """(file, content) rows → long-form parse rows (one per doc / mention).

    Each input row is one whole CoNLL file; files parse independently in
    parallel (repartition upstream when a directory holds many files). The
    per-file walk lives INSIDE the closure so cloudpickle ships it by value
    — executors never need this module on their import path.
    """
    prefix_len = _WIKI_PREFIX_LEN
    punct = string.punctuation

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _PARSED.fields]

        def parse_file(name: str, content: str) -> list[tuple]:
            # sequential CoNLL walk for ONE file — AnnotationFormatter.py:31-77
            out: list[tuple] = []
            doc = ""
            doc_idx = 0
            doc_mentions: list[tuple] = []

            def flush(final: bool) -> None:
                nonlocal doc, doc_idx, doc_mentions
                text = doc if final else doc.strip()
                # offsets were recorded against the UNstripped buffer; when
                # the flush strips leading whitespace (a doc that starts
                # with a blank line), shift every span so text[start:end]
                # still equals the mention — the reference records shifted
                # offsets in that case (AnnotationFormatter.py:37 strips
                # after recording); we pin the intended self-consistent
                # semantics, same class as the W3/W5 intended-behavior pins
                lead = 0 if final else len(doc) - len(doc.lstrip())
                keep = (len(doc_mentions) > 0) if final else (len(text) > 0)
                if keep:
                    out.append((name, doc_idx, "doc", text, None, None, None, None, None))
                    for s, e, m, url, bad in doc_mentions:
                        out.append(
                            (name, doc_idx, "mention", None, s - lead, e - lead, m, url, bad)
                        )
                    doc_idx += 1
                doc, doc_mentions = "", []

            for line in content.splitlines(keepends=True):
                if line.startswith("-DOCSTART-"):
                    flush(final=False)
                elif len(line.strip()) == 0:
                    doc = doc.strip(" ") + "\n"
                elif line.strip() in punct:
                    doc = doc.strip(" ") + line.strip()
                else:
                    arr = line.strip().split("\t")
                    if len(arr) > 1:
                        # annotation lines are token\tflag\tlabel\tyago[\turl];
                        # SHORT tab lines (2-3 columns — where the reference
                        # raises IndexError, AnnotationFormatter.py:45-57)
                        # degrade to a malformed mention row, same policy as
                        # the missing-URL case below: bad input yields rows,
                        # never task failures
                        flag = arr[1]
                        label = arr[2] if len(arr) > 2 else arr[0]
                        yago_id = arr[3] if len(arr) > 3 else None
                        if flag == "B":
                            url, bad = None, 0
                            if yago_id is None:
                                bad = 1
                            elif yago_id != "--NME--":
                                if len(arr) > 4:
                                    url = arr[4][prefix_len:]
                                else:
                                    # yago id without a URL column: malformed
                                    # input, not a genuine NME annotation
                                    bad = 1
                            doc_mentions.append(
                                (len(doc), len(doc) + len(label), label, url, bad)
                            )
                        if flag != "I":
                            doc += label + " "
                    else:
                        doc += arr[0] + " "
            flush(final=True)
            return out

        for pdf in batches:
            rows: list[tuple] = []
            for name, content in zip(pdf["file"], pdf["content"]):
                rows.extend(parse_file(name, content or ""))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("file", "content").mapInPandas(walk, _PARSED)


def read_aida_conll(
    spark: SparkSession,
    path: str,
    kb_uris: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """AIDA-CoNLL dataset → (docs, gold_mentions).

    docs: (doc_id, text). gold_mentions: (doc_id, start, end, mention,
    gold_url, entity_id, status) with status ∈ {'linked', 'nil_nme',
    'nil_miss', 'malformed'} — entity_id is 'NIL' for the non-linked
    statuses, matching the reference's annotations.json tuples
    (AnnotationFormatter.py:62-70). 'malformed' marks B lines that claim a
    yago id but carry no URL column (the reference raises IndexError there);
    they are kept distinct so NME counters are never inflated by bad input.

    ``kb_uris``: (uri, entity_id) — the dictionary's URI index; when absent
    every non-NME mention is a miss (resolution happens later).
    """
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value").alias("content")
    )
    parsed = parse_conll(files).withColumn(
        "doc_id", F.concat_ws("#", "file", F.col("doc_idx").cast("string"))
    )
    docs = parsed.filter(F.col("kind") == "doc").select("doc_id", "text")
    m = parsed.filter(F.col("kind") == "mention").select(
        "doc_id", "start", "end", "mention", "gold_url", "malformed"
    )
    if kb_uris is not None:
        m = m.join(
            F.broadcast(kb_uris.select(F.col("uri").alias("gold_url"), "entity_id")),
            "gold_url",
            "left",
        )
    else:
        m = m.withColumn("entity_id", F.lit(None).cast("string"))
    gold = m.select(
        "doc_id",
        "start",
        "end",
        "mention",
        "gold_url",
        F.coalesce("entity_id", F.lit("NIL")).alias("entity_id"),
        F.when(F.col("malformed") == 1, F.lit("malformed"))
        .when(F.col("gold_url").isNull(), F.lit("nil_nme"))
        .when(F.col("entity_id").isNull(), F.lit("nil_miss"))
        .otherwise(F.lit("linked"))
        .alias("status"),
    )
    return docs, gold


def conll_stats(gold: DataFrame) -> DataFrame:
    """The reference's report_result counters (AnnotationFormatter.py:88-103)
    as one row: total/unique mentions, NIL, misses, NME — each total+unique.
    """
    return gold.agg(
        F.count(F.lit(1)).alias("total_mentions"),
        F.countDistinct("mention").alias("unique_mentions"),
        F.sum((F.col("status") != "linked").cast("long")).alias("nil_mentions"),
        F.countDistinct(
            F.when(F.col("status") != "linked", F.col("mention"))
        ).alias("unique_nil_mentions"),
        F.sum((F.col("status") == "nil_miss").cast("long")).alias("index_misses"),
        F.sum((F.col("status") == "nil_nme").cast("long")).alias("nme_mentions"),
    )
