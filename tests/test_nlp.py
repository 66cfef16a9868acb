"""Model-gated NLP stubs: gate behavior + heuristic determinism."""

from __future__ import annotations

import pytest

from mklab_focused_crawler_spark.functions.nlp import extract_entities, pos_tag


def test_model_gates(spark):
    df = spark.createDataFrame([("1", "Alice met Bob Smith")], "doc_id string, text string")
    with pytest.raises(NotImplementedError):
        extract_entities(df).count()
    with pytest.raises(NotImplementedError):
        pos_tag(df).count()


def test_entity_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("1", "Alice met Bob Smith in New York and Alice waved"),
            ("2", "nothing capitalized here"),
        ],
        "doc_id string, text string",
    )
    got = {
        (r["doc_id"], r["entity"]): r["n_mentions"]
        for r in extract_entities(df, heuristic=True).collect()
    }
    assert got[("1", "Alice")] == 2
    assert got[("1", "Bob Smith")] == 1
    assert got[("1", "New York")] == 1
    assert not any(k[0] == "2" for k in got)


def test_pos_heuristic(spark):
    df = spark.createDataFrame(
        [("1", "running jumped quickly cats 42 table")], "doc_id string, text string"
    )
    got = {r["token"]: r["tag"] for r in pos_tag(df, heuristic=True).collect()}
    assert got == {
        "running": "VBG",
        "jumped": "VBD",
        "quickly": "RB",
        "cats": "NNS",
        "42": "CD",
        "table": "NN",
    }


def test_column_query_matches_mapinpandas_shape(spark):
    """The JVM-side column-expression entity query and the model-shaped
    mapInPandas path implement the same heuristic — identical rows."""
    from mklab_focused_crawler_spark.functions.nlp import (
        entity_counts,
        extract_entities,
    )

    df = spark.createDataFrame(
        [
            (1, "Alice Smith met Bob in New York City. Alice Smith waved."),
            (2, "no capitals here"),
            (3, None),
            (4, "Paris Paris and London"),
        ],
        "doc_id long, text string",
    )
    col_rows = {
        (int(r["doc_id"]), r["entity"], r["n_mentions"])
        for r in entity_counts(df).collect()
    }
    udf_rows = {
        (int(r["doc_id"]), r["entity"], r["n_mentions"])
        for r in extract_entities(df, heuristic=True).collect()
    }
    assert col_rows == udf_rows and len(col_rows) > 0
