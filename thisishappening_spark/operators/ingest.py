"""S4 ingest projection: raw status JSON → 19-field flat tweet record.

The reference walks nested dicts per status (reference tweet_utils.py:
137-178, get_tweet_body :95-104, get_lon_lat :107-121, date parse
:314-319). Here the whole projection is a single typed ``from_json`` plus
column expressions — one pass over the raw column, fully codegen'd, no
Python. At 100 TB the JSON parse is the ingest bottleneck; a typed schema
parses each document once (vs one probe per `get_json_object` call) and
prunes unreferenced fields inside Jackson.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from thisishappening_spark.functions.geo import polygon_ring_centroid

# Twitter created_at format "%a %b %d %H:%M:%S +0000 %Y"
# (reference tweet_utils.py:314-319) — F1. Spark's CORRECTED-policy parser
# rejects 'E' (day-of-week) when parsing, so the leading "EEE " is sliced
# off before to_timestamp (see parse_created_at).
CREATED_AT_FORMAT = "MMM dd HH:mm:ss xx yyyy"


def parse_created_at(col: Column) -> Column:
    """F1: parse "%a %b %d %H:%M:%S +0000 %Y" (reference tweet_utils.py:
    314-319). The day-of-week token is redundant with the date; slicing it
    keeps the parse on Spark's strict parser instead of LEGACY mode."""
    return F.to_timestamp(F.substring(col, 5, 26), CREATED_AT_FORMAT)

# Nested raw-status schema — only the fields any operator reads (SURVEY
# §1.1). The polygon is array<array<array<double>>> (ring of [lon,lat]).
STATUS_SCHEMA = T.StructType(
    [
        T.StructField("id_str", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("full_text", T.StringType()),
        T.StructField(
            "extended_tweet",
            T.StructType([T.StructField("full_text", T.StringType())]),
        ),
        T.StructField("lang", T.StringType()),
        T.StructField("is_quote_status", T.BooleanType()),
        T.StructField("in_reply_to_status_id_str", T.StringType()),
        T.StructField("possibly_sensitive", T.BooleanType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("screen_name", T.StringType()),
                    T.StructField("id_str", T.StringType()),
                    T.StructField("friends_count", T.LongType()),
                    T.StructField("followers_count", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
        T.StructField(
            "quoted_status",
            T.StructType([T.StructField("text", T.StringType())]),
        ),
        T.StructField(
            "place",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("full_name", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("country_code", T.StringType()),
                    T.StructField("place_type", T.StringType()),
                    T.StructField(
                        "bounding_box",
                        T.StructType(
                            [
                                T.StructField("type", T.StringType()),
                                T.StructField(
                                    "coordinates",
                                    T.ArrayType(
                                        T.ArrayType(T.ArrayType(T.DoubleType()))
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def tweet_body(s: Column) -> Column:
    """F2: extended_tweet.full_text → full_text → text → ''
    (reference tweet_utils.py:95-104).

    ACCEPTED DEVIATION: the reference dispatches on KEY PRESENCE — a status
    carrying `"full_text": null` alongside a non-null `"text"` yields
    tweet_body=None there (then rejected by the empty-body check P14),
    whereas coalesce falls through to `text` and admits it. JSON-null
    top-level text fields do not occur in the documented status format;
    coalesce implements the evident intent and is kept deliberately."""
    return F.coalesce(
        s.getField("extended_tweet").getField("full_text"),
        s.getField("full_text"),
        s.getField("text"),
        F.lit(""),
    )


def lon_lat(s: Column) -> tuple[Column, Column, Column]:
    """F3: point coords if present, else arithmetic-mean centroid of the
    place polygon ring (incl. duplicated closing vertex, exactly like the
    reference's sum/len — tweet_utils.py:107-121). Returns (lon, lat,
    has_coords)."""
    point = s.getField("coordinates").getField("coordinates")
    ring = s.getField("place").getField("bounding_box").getField("coordinates").getItem(0)
    c_lon, c_lat = polygon_ring_centroid(ring)
    lon = F.when(point.isNotNull(), point.getItem(0)).otherwise(
        F.when(ring.isNotNull(), c_lon)
    )
    lat = F.when(point.isNotNull(), point.getItem(1)).otherwise(
        F.when(ring.isNotNull(), c_lat)
    )
    return lon, lat, point.isNotNull()


def project_status(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """get_tweet_info as one typed projection (reference tweet_utils.py:
    137-178). Output schema = the 19 TweetInfo fields (deleted_at always
    NULL at ingest, data_base.py:254)."""
    s = F.from_json(F.col(raw_col), STATUS_SCHEMA)
    lon, lat, has_coords = lon_lat(s)
    place = s.getField("place")
    return df.select(
        s.getField("id_str").alias("status_id_str"),
        s.getField("user").getField("screen_name").alias("user_screen_name"),
        s.getField("user").getField("id_str").alias("user_id_str"),
        parse_created_at(s.getField("created_at")).alias("created_at"),
        F.lit(None).cast("timestamp").alias("deleted_at"),
        tweet_body(s).alias("tweet_body"),
        s.getField("lang").alias("tweet_language"),
        s.getField("is_quote_status").alias("is_quote_status"),
        s.getField("in_reply_to_status_id_str").isNotNull().alias("is_reply_status"),
        s.getField("possibly_sensitive").alias("possibly_sensitive"),
        has_coords.alias("has_coords"),
        lon.alias("longitude"),
        lat.alias("latitude"),
        place.getField("id").alias("place_id"),
        place.getField("name").alias("place_name"),
        place.getField("full_name").alias("place_full_name"),
        place.getField("country").alias("place_country"),
        place.getField("country_code").alias("place_country_code"),
        place.getField("place_type").alias("place_type"),
        # admission-only extras (not persisted by the reference's table)
        s.getField("quoted_status").getField("text").alias("quoted_text"),
        s.getField("user").getField("friends_count").alias("friends_count"),
        s.getField("user").getField("followers_count").alias("followers_count"),
        s.getField("truncated").alias("truncated"),
    )
