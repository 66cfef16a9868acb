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
