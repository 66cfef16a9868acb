"""URL layer unit tests: canonicalization edges, routing set, the 7
platform regexes (MediaExtractionBolt.java:40-46), score formula
closed-form values (RankerBolt.java:78-92)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.functions import scoring, urls


def _one(spark, url, col):
    return spark.createDataFrame([(url,)], "url string").select(
        col("url").alias("v")
    ).head()[0]


CANON_CASES = [
    # lowercase scheme+host, keep path case
    ("HTTP://WWW.Example.COM/Path/A", "http://www.example.com/Path/A"),
    # strip default ports
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # fragment stripped
    ("http://a.com/x#frag", "http://a.com/x"),
    # query sorted
    ("http://a.com/x?b=2&a=1", "http://a.com/x?a=1&b=2"),
    # empty path → '/'
    ("http://a.com", "http://a.com/"),
    # trailing slash trimmed on bare path
    ("http://a.com/x/", "http://a.com/x"),
    # space / pipe encoding (ArticleExtractionBolt.java:238-241)
    ("http://a.com/x y|z", "http://a.com/x%20y%7Cz"),
    # non-absolute left alone
    ("not a url", "not%20a%20url"),
]


def test_canonicalize(spark):
    for raw, want in CANON_CASES:
        got = _one(spark, raw, urls.canonicalize_url)
        assert got == want, f"{raw!r}: {got!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    for raw, want in CANON_CASES:
        got2 = _one(spark, want, urls.canonicalize_url)
        assert got2 == want, f"not idempotent on {want!r}: {got2!r}"


def test_routing(spark):
    # the 6-domain media set, URLExpansionBolt.java:42-47
    assert _one(spark, "https://vimeo.com/123", urls.route) == "media"
    assert _one(spark, "http://www.youtube.com/watch?v=x", urls.route) == "media"
    assert _one(spark, "http://youtube.com/watch?v=x", urls.route) == "webpage"
    assert _one(spark, "http://example.com/a", urls.route) == "webpage"


PLATFORM_CASES = [
    ("https://instagram.com/p/aB_-1/", "instagram", "aB_-1"),
    ("https://www.youtube.com/watch?v=dQw4w9WgXcQ", "youtube", "dQw4w9WgXcQ"),
    ("https://vimeo.com/1234567", "vimeo", "1234567"),
    ("http://twitpic.com/abc123", "twitpic", "abc123"),
    ("http://www.dailymotion.com/video/x2x_foo", "dailymotion", "x2x"),
    ("https://www.facebook.com/photo.php?fbid=999&set=a", "facebook", "999"),
    ("https://flickr.com/photos/user1/555", "flickr", "user1"),
    ("http://example.com/photo.php?fbid=1", "", ""),
]


def test_platform_media_id(spark):
    for url, want_plat, want_id in PLATFORM_CASES:
        df = spark.createDataFrame([(url,)], "url string")
        plat, mid = urls.platform_media_id(F.col("url"))
        row = df.select(plat.alias("p"), mid.alias("m")).head()
        assert (row["p"], row["m"]) == (want_plat, want_id), url


def test_page_score_closed_form(spark):
    # shares=20, pub 5 min before now: sharesScore=(1-e^-1+1)/2,
    # pubTimeScore=(e^-0.5+1)/2  (RankerBolt.java:84-90)
    now = 1_700_000_000_000
    pub = now - 5 * 60 * 1000
    df = spark.createDataFrame([(20, pub)], "shares int, pub long")
    got = df.select(
        scoring.page_score(F.col("shares"), F.col("pub"), now).alias("s")
    ).head()["s"]
    want = ((1 - math.exp(-1.0) + 1) / 2) * ((math.exp(-0.5) + 1) / 2)
    assert abs(got - want) < 1e-12


def test_page_score_null_pub(spark):
    # date==null → publicationTime=0 (RankerBolt.java:81)
    now = 1_700_000_000_000
    df = spark.createDataFrame([(0, None)], "shares int, pub long")
    got = df.select(
        scoring.page_score(F.col("shares"), F.col("pub"), now).alias("s")
    ).head()["s"]
    want = 0.5 * ((math.exp(-now / 600000.0) + 1) / 2)  # = 0.25
    assert abs(got - want) < 1e-12
