"""Unit tests for the S4 ingest projection paths the oracle can't cover:
the F3 place-polygon centroid fallback and F1 date parsing edge cases
(reference tweet_utils.py:107-121, :314-319)."""

from __future__ import annotations

import json

import pytest

from thisishappening_spark.operators.ingest import project_status

PLACE = {
    "id": "p9",
    "name": "Back Bay",
    "full_name": "Back Bay, Boston",
    "country": "United States",
    "country_code": "US",
    "place_type": "neighborhood",
    "bounding_box": {
        "type": "Polygon",
        # non-closed 4-vertex ring (Twitter style): centroid = plain mean
        "coordinates": [[[-71.10, 42.30], [-71.10, 42.40], [-71.00, 42.40], [-71.00, 42.30]]],
    },
}


def _status(**kw):
    s = {
        "id_str": "5001",
        "created_at": "Mon Jan 06 07:08:09 +0000 2020",
        "text": "centroid test",
        "lang": "en",
        "user": {
            "screen_name": "dana",
            "id_str": "44",
            "friends_count": 3,
            "followers_count": 4,
        },
        "coordinates": None,
        "place": PLACE,
    }
    s.update(kw)
    return json.dumps(s)


def test_centroid_fallback(spark):
    """No point coords + place polygon → lon/lat = arithmetic mean of ring
    vertices, has_coords=False (tweet_utils.py:107-121)."""
    df = spark.createDataFrame([(_status(),)], "raw string")
    row = project_status(df).collect()[0]
    assert row.has_coords is False
    assert row.longitude == pytest.approx((-71.10 - 71.10 - 71.00 - 71.00) / 4)
    assert row.latitude == pytest.approx((42.30 + 42.40 + 42.40 + 42.30) / 4)


def test_centroid_includes_duplicated_closing_vertex(spark):
    """The reference averages the raw ring INCLUDING a duplicated closing
    vertex — the mean shifts toward it. Preserved deliberately
    (SURVEY §7.4)."""
    closed = dict(PLACE)
    ring = [[-71.10, 42.30], [-71.10, 42.40], [-71.00, 42.40], [-71.00, 42.30],
            [-71.10, 42.30]]
    closed["bounding_box"] = {"type": "Polygon", "coordinates": [ring]}
    df = spark.createDataFrame([(_status(place=closed),)], "raw string")
    row = project_status(df).collect()[0]
    assert row.longitude == pytest.approx(sum(v[0] for v in ring) / 5)
    assert row.latitude == pytest.approx(sum(v[1] for v in ring) / 5)


def test_point_coords_win_over_place(spark):
    df = spark.createDataFrame(
        [(_status(coordinates={"type": "Point", "coordinates": [-71.03, 42.33]}),)],
        "raw string",
    )
    row = project_status(df).collect()[0]
    assert row.has_coords is True
    assert row.longitude == pytest.approx(-71.03)
    assert row.latitude == pytest.approx(42.33)


def test_no_coords_no_place(spark):
    df = spark.createDataFrame([(_status(place=None),)], "raw string")
    row = project_status(df).collect()[0]
    assert row.has_coords is False
    assert row.longitude is None and row.latitude is None
    assert row.place_type is None


def test_created_at_parse(spark):
    df = spark.createDataFrame([(_status(),)], "raw string")
    row = project_status(df).collect()[0]
    assert row.created_at.isoformat() == "2020-01-06T07:08:09"


def test_body_precedence(spark):
    """F2: extended_tweet.full_text > full_text > text > ''
    (tweet_utils.py:95-104)."""
    cases = [
        (_status(extended_tweet={"full_text": "ext"}, full_text="full"), "ext"),
        (_status(full_text="full"), "full"),
        (_status(), "centroid test"),
        (_status(text=None), ""),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "raw string")
    rows = project_status(df).collect()
    assert [r.tweet_body for r in rows] == [want for _, want in cases]
