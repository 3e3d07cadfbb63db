"""Sources/sinks: corpus standardization (S1/S2/S3), word2vec binary (S6),
gold dataset (S9), in-links (S12)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from xlink_spark.sources import corpus as CS
from xlink_spark.sources import embeddings as EM


@pytest.fixture(scope="module")
def kb(spark):
    kb_entities = spark.createDataFrame(
        [
            ("e1", "Alpha", "", "Alpha"),
            ("e2", "Beta", "（x）", "Beta（x）"),
        ],
        "entity_id string, title string, sub_title string, full_title string",
    )
    kb_uris = spark.createDataFrame(
        [("http://kb/e1", "e1"), ("http://kb/e2", "e2")], "uri string, entity_id string"
    )
    return kb_entities, kb_uris


def test_standardize_corpus(spark, tmp_path, kb):
    kb_entities, kb_uris = kb
    lines = [
        "Alpha\t\t\t\thttp://KB/e1\t\tsome [[e2|beta]] text",      # resolves by uri
        "Beta\t\t（x）\t\tmissing://nowhere\t\tplain text",          # resolves by full_title
        "Gamma\t\t\t\tmissing://x\t\tno resolution here",          # unresolved → quarantine
        "BadShape only two cols",                                   # bad shape → quarantine
        "Alpha\t\t\t\thttp://kb/e1\t\tbroken [[e2|anchor",          # invalid markup → quarantine
    ]
    p = tmp_path / "raw.txt"
    p.write_text("\n".join(lines))
    docs, quarantined = CS.standardize_corpus(spark, str(p), kb_uris, kb_entities)
    got = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(got) == {"e1", "e2"}
    anchors = [s for s in got["e1"] if s["kind"] == "anchor"]
    assert [(a["text"], a["media_ref"]) for a in anchors] == [("beta", "e2")]
    reasons = sorted(r["reason"] for r in quarantined.collect())
    assert reasons == ["bad_shape", "invalid_markup", "unresolved_entity"]


def test_infobox_pre_refine(spark):
    df = spark.createDataFrame([('{"born":"1900","field":"math"}',)], "content string")
    got = CS.infobox_pre_refine(df).collect()[0]["flat_text"]
    assert got == "born 1900 field math"


def test_read_ttl_entities(spark, tmp_path):
    ttl = tmp_path / "dump.ttl"
    ttl.write_text(
        '<http://kb.example/resource/E42> rdfs:label "The Answer"@en .\n'
        '<http://kb.example/resource/E42> property:supplement "(disamb)" .\n'
        '<http://kb.example/resource/E7> rdfs:label "Seven" .\n'
        "# comment line\n"
    )
    got = {r["entity_id"]: (r["label"], r["supplement"]) for r in
           CS.read_ttl_entities(spark.getActiveSession() or spark, str(ttl)).collect()}
    assert got["E42"] == ("The Answer", "(disamb)")
    assert got["E7"] == ("Seven", None)


def test_word2vec_binary_roundtrip(spark, tmp_path):
    rows = [("hello", [1.0, 2.0, 3.0]), ("世界", [0.5, -0.5, 0.25])]
    p = tmp_path / "vectors.bin"
    EM.write_word2vec_binary(rows, str(p))
    got = {r["key"]: r["vec"] for r in EM.read_word2vec_binary(spark, str(p)).collect()}
    assert got["hello"] == [1.0, 2.0, 3.0]
    assert got["世界"] == [0.5, -0.5, 0.25]


def test_gold_dataset_source(spark, tmp_path):
    (tmp_path / "docs.json").write_text(json.dumps(["ab cd", "xy"]))
    (tmp_path / "annotations.json").write_text(
        json.dumps([[[0, 2, "ab", "e1"], [3, 5, "cd", "NIL"]], []])
    )
    got = CS.read_gold_dataset(
        spark, str(tmp_path / "docs.json"), str(tmp_path / "annotations.json")
    ).collect()
    assert [(r["doc_id"], r["start"], r["entity_id"]) for r in got] == [
        ("d000000", 0, "e1"),
        ("d000000", 3, "NIL"),
    ]


def test_in_links(spark, kb):
    kb_entities, _ = kb
    out_links = spark.createDataFrame(
        [("e1", "e2"), ("e2", "e2"), ("e1", "e9")], "doc_id string, entity_id string"
    )
    got = sorted(r["doc_id"] for r in CS.in_links(out_links, "e2", kb_entities).collect())
    assert got == ["e1", "e2"]
