"""Unit tests for operators/pii.py: detection counts, masking
completeness/idempotence, cross-engine regex-dialect agreement on
hand-picked edge strings, and the zero-shuffle plan contract."""

from __future__ import annotations

import duckdb
import pytest

from mklab_focused_crawler_spark.operators.pii import (
    augment_pii,
    pii_redact,
    pii_redact_sql,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}


CASES = [
    # (text, n_emails, n_ssns, n_phones, n_ips, masked)
    ("mail me at bob@example.com today", 1, 0, 0, 0,
     "mail me at <EMAIL> today"),
    ("two: a@b.co and c.d+x@e-f.org!", 2, 0, 0, 0, "two: <EMAIL> and <EMAIL>!"),
    ("ssn 123-45-6789 on file", 0, 1, 0, 0, "ssn <SSN> on file"),
    ("call 555-867-5309 now", 0, 0, 1, 0, "call <PHONE> now"),
    ("host 192.168.0.1 and 10.0.0.255", 0, 0, 0, 2, "host <IP> and <IP>"),
    # phone is NOT an SSN and vice versa (digit groupings differ)
    ("555-867-5309 123-45-6789", 0, 1, 1, 0, "<PHONE> <SSN>"),
    # an email's numeric-ish domain must not leak an IP match
    ("u5@mail3.example.com", 1, 0, 0, 0, "<EMAIL>"),
    # digits glued to more digits fail the word boundary
    ("9123-45-67890 is not an ssn", 0, 0, 0, 0, "9123-45-67890 is not an ssn"),
    ("no pii here at all", 0, 0, 0, 0, "no pii here at all"),
    ("", 0, 0, 0, 0, ""),
    (None, 0, 0, 0, 0, ""),
]


def test_counts_and_masking(spark):
    got = _run(spark, [c[0] for c in CASES])
    for i, (text, ne, ns, np_, ni, masked) in enumerate(CASES):
        r = got[i]
        assert (r["n_emails"], r["n_ssns"], r["n_phones"], r["n_ips"]) == (
            ne,
            ns,
            np_,
            ni,
        ), (i, text, r)
        assert r["clean_text"] == masked, (i, text, r["clean_text"])


def test_redaction_is_idempotent(spark):
    """Masking already-masked text changes nothing and counts zero."""
    first = _run(spark, [c[0] for c in CASES])
    again = _run(spark, [first[i]["clean_text"] for i in range(len(CASES))])
    for i in range(len(CASES)):
        r = again[i]
        assert r["clean_text"] == first[i]["clean_text"]
        assert r["n_emails"] + r["n_ssns"] + r["n_phones"] + r["n_ips"] == 0


def test_duckdb_dialect_agrees_on_edges(spark):
    """The regex subset must behave identically under Java regex and
    RE2 — run the same edge strings through the SQL twin."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if t is None else repr(t)})"
            for i, (t, *_) in enumerate(CASES)
        )
        + ") AS v(doc_id, text)"
    )
    want = con.execute(pii_redact_sql()).df().set_index("doc_id")
    got = _run(spark, [c[0] for c in CASES])
    for i in range(len(CASES)):
        w = want.loc[i]
        assert got[i]["clean_text"] == w["clean_text"], (i, w["clean_text"])
        for c in ("n_emails", "n_ssns", "n_phones", "n_ips"):
            assert got[i][c] == w[c], (i, c)
    con.close()


def test_augment_plants_expected_categories(spark):
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "'plain words here' AS text"
    )
    got = {r["doc_id"]: r.asDict() for r in pii_redact(augment_pii(df)).collect()}
    for i in range(100):
        r = got[i]
        assert r["n_emails"] == (1 if i % 3 == 0 else 0), (i, r)
        assert r["n_ssns"] == (1 if i % 5 == 0 else 0), (i, r)
        assert r["n_phones"] == (1 if i % 7 == 0 else 0), (i, r)
        assert r["n_ips"] == (1 if i % 11 == 0 else 0), (i, r)


def test_plan_has_no_shuffle_and_prunes_columns(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c", "x", 7)],
        "doc_id long, text string, source string, extra int",
    ).write.parquet(p)
    plan = (
        pii_redact(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "source" not in read_schema[0], plan
