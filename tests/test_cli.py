"""The spark-submit job surface: cli.main() end-to-end + the actual
spark-submit deployment path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from mklab_focused_crawler_spark.cli import main


def test_cli_synthetic_crawl_and_resume(spark, tmp_path, capsys):
    root = str(tmp_path / "crawl")
    argv = [
        "crawl",
        "--root",
        root,
        "--synthetic-pages",
        "300",
        "--hosts",
        "20",
        "--seed-count",
        "10",
        "--iterations",
        "2",
    ]
    main(argv)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "synthetic"
    assert out["completed_iterations"] == 2 and len(out["iterations"]) == 2
    assert out["urls"] > 0

    # resume continues from the committed iteration count
    main(argv + ["--resume", "--iterations", "1"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["start_iteration"] == 2
    assert out2["completed_iterations"] >= 2

    # lineage surface reads the same store
    main(["lineage", "--root", root])
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in lines]
    assert {r["table"] for r in rows} >= {"frontier", "documents"}


def test_cli_page_store_crawl(spark, tmp_path, capsys):
    from mklab_focused_crawler_spark.sources.synthetic_web import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    pages_p = str(tmp_path / "pages.parquet")
    robots_p = str(tmp_path / "robots.parquet")
    seeds_p = str(tmp_path / "seeds.parquet")
    generate_pages(spark, 250).write.parquet(pages_p)
    generate_robots(spark).write.parquet(robots_p)
    generate_seeds(spark, 250, 10).write.parquet(seeds_p)

    main(
        [
            "crawl",
            "--root",
            str(tmp_path / "store"),
            "--pages",
            pages_p,
            "--robots",
            robots_p,
            "--seeds",
            seeds_p,
            "--iterations",
            "2",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "page-store" and out["urls"] > 0


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_deployment(tmp_path):
    """The north-star deployment command verbatim: zip via package.py,
    submit crawl_job.py with --py-files from a cwd OUTSIDE the repo, so
    only the zip provides the package."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "package.py"], cwd=repo, check=True, capture_output=True
    )
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }  # the zip, not the checkout, must supply the package
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            os.path.join(repo, "dist", "mklab_focused_crawler_spark.zip"),
            os.path.join(repo, "crawl_job.py"),
            "crawl",
            "--root",
            str(tmp_path / "store"),
            "--synthetic-pages",
            "200",
            "--hosts",
            "10",
            "--seed-count",
            "5",
            "--iterations",
            "1",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["urls"] > 0 and out["completed_iterations"] == 1


def test_cli_stream_vocab_and_quota(spark, tmp_path, capsys):
    """The stream subcommand drains a parquet dir into the incremental
    store; a second invocation with new files ingests ONLY them (the
    availableNow + checkpoint contract), and totals match batch."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_spark.streaming.vocab import vocab_counts

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb", "bb cc"]}),
            preserve_index=False,
        ),
        str(in_dir / "b0.parquet"),
    )
    argv = [
        "stream",
        "--op",
        "vocab",
        "--in",
        str(in_dir),
        "--store",
        str(tmp_path / "store"),
        "--checkpoint",
        str(tmp_path / "ckpt"),
    ]
    main(argv)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["drained"]
    got = {
        (r["w"], r["c"])
        for r in vocab_counts(spark, str(tmp_path / "store")).collect()
    }
    assert got == {("aa", 1), ("bb", 2), ("cc", 1)}

    # drop a second file; re-run drains just it
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": [3], "text": ["cc cc"]}),
            preserve_index=False,
        ),
        str(in_dir / "b1.parquet"),
    )
    main(argv)
    capsys.readouterr()
    got = {
        (r["w"], r["c"])
        for r in vocab_counts(spark, str(tmp_path / "store")).collect()
    }
    assert got == {("aa", 1), ("bb", 2), ("cc", 3)}

    # quota op over the same shape
    from mklab_focused_crawler_spark.streaming.quota import streaming_quota_kept

    (tmp_path / "qin").mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3], "source": ["s", "s", "t"]}),
            preserve_index=False,
        ),
        str(tmp_path / "qin" / "b0.parquet"),
    )
    main(
        [
            "stream",
            "--op",
            "quota",
            "--in",
            str(tmp_path / "qin"),
            "--store",
            str(tmp_path / "qstore"),
            "--checkpoint",
            str(tmp_path / "qckpt"),
        ]
    )
    capsys.readouterr()
    kept = {
        tuple(r)
        for r in streaming_quota_kept(spark, str(tmp_path / "qstore")).collect()
    }
    assert kept == {(1, "s"), (2, "s"), (3, "t")}


def test_cli_stream_ops_accept_their_maintenance_knob():
    """Every --op's runner must accept the knob the CLI maps
    --compact-every onto (quota folds rewrite touched buckets wholesale,
    so its cadence knob is snapshot expiry instead of compaction)."""
    import importlib
    import inspect

    from mklab_focused_crawler_spark import cli

    for op, (_schema, mod, fn_name) in cli._STREAM_OPS.items():
        fn = getattr(
            importlib.import_module(
                f"mklab_focused_crawler_spark.streaming.{mod}"
            ),
            fn_name,
        )
        knob = "expire_every" if op == "quota" else "compact_every"
        assert knob in inspect.signature(fn).parameters, (op, knob)


def test_cli_ttl_store_lineage_and_resume(spark, tmp_path, capsys):
    """A TTL crawl's documents table is doc_bucket-partitioned; the
    recorded store config must let lineage and --resume reconstruct
    that layout WITHOUT the user re-passing --ttl-iterations (a
    mismatched CrawlLoop would fail the multi-segment partitioned read
    or append an unpartitioned segment)."""
    root = str(tmp_path / "ttl_crawl")
    base = [
        "--synthetic-pages",
        "300",
        "--hosts",
        "20",
        "--seed-count",
        "10",
    ]
    main(["crawl", "--root", root, *base, "--iterations", "3",
          "--ttl-iterations", "5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["completed_iterations"] == 3

    # lineage over >=2 partitioned document segments
    main(["lineage", "--root", root])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    doc_segs = {r["file"] for r in rows if r["table"] == "documents"}
    assert len(doc_segs) >= 2

    # resume with NO ttl flag: stored config wins
    main(["crawl", "--root", root, *base, "--iterations", "1", "--resume"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["start_iteration"] == 3 and out2["completed_iterations"] == 4


def test_cli_bucketed_pages_table(spark, tmp_path, capsys):
    """--fetch-join bucketed goes through a catalog table (the only
    form carrying bucket metadata); a bare --pages path is rejected
    up front instead of silently degrading to a full-web shuffle."""
    from mklab_focused_crawler_spark.sources.synthetic_web import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    with pytest.raises(SystemExit, match="pages-table"):
        main(["crawl", "--root", str(tmp_path / "x"), "--pages", "p.parquet",
              "--robots", "r.parquet", "--seeds", "s.parquet",
              "--fetch-join", "bucketed"])

    (
        generate_pages(spark, 250)
        .repartition(4, "url")
        .write.mode("overwrite")
        .bucketBy(4, "url")
        .option("path", str(tmp_path / "web"))
        .saveAsTable("cli_bucketed_web")
    )
    try:
        robots_p = str(tmp_path / "robots.parquet")
        seeds_p = str(tmp_path / "seeds.parquet")
        generate_robots(spark).write.parquet(robots_p)
        generate_seeds(spark, 250, 10).write.parquet(seeds_p)
        main(
            [
                "crawl",
                "--root",
                str(tmp_path / "store"),
                "--pages-table",
                "cli_bucketed_web",
                "--robots",
                robots_p,
                "--seeds",
                seeds_p,
                "--fetch-join",
                "bucketed",
                "--iterations",
                "2",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mode"] == "page-store" and out["urls"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_bucketed_web")


def test_cli_validation_runs_before_session(tmp_path, monkeypatch):
    """Bad argv must error WITHOUT paying JVM/session startup."""
    from mklab_focused_crawler_spark import cli

    def boom(master):
        raise AssertionError("session started before validation")

    monkeypatch.setattr(cli, "_session", boom)
    for argv in [
        ["crawl", "--root", str(tmp_path)],  # no mode
        ["crawl", "--root", str(tmp_path), "--pages", "p", "--synthetic-pages", "5"],
        ["crawl", "--root", str(tmp_path), "--pages", "p"],  # no robots
        ["crawl", "--root", str(tmp_path / "missing"), "--synthetic-pages", "5",
         "--resume"],
    ]:
        with pytest.raises(SystemExit):
            cli.main(argv)


def test_cli_pipeline_runs_end_to_end(spark, tmp_path, capsys):
    """The pipeline subcommand: documents parquet in → packed chunk map
    out, intermediate tables under --workdir, one JSON result line."""
    import json

    from mklab_focused_crawler_spark.cli import main

    out_dir = str(tmp_path / "pipe_out")
    main(
        [
            "pipeline",
            "--in",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            out_dir,
            "--master",
            "local[4]",
        ]
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["done"] and res["rows"] > 0
    got = spark.read.parquet(out_dir)
    assert {
        "shard_id",
        "chunk_id",
        "pos",
        "doc_id",
        "source",
        "piece_start",
        "piece_len",
    } == set(got.columns)
    assert got.count() == res["rows"]
