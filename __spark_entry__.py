"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``       — flagship MVT pipeline smoke (sf0.001-scale synth images).
``queries()``          — one entry per implemented operator from SURVEY.md §2
                         (+ the training-data-pipeline operators: dedup, text,
                         ANN, multimodal).
``oracle_sql()``       — DuckDB-ANSI equivalents for everything SQL-expressible.
                         Non-SQL ops (MVT codec internals, LSH signatures, image
                         kernels) are rows-only checked, but the MVT encode→decode
                         round-trip IS oracled: the oracle recomputes the codec's
                         *input* relationally, so a lossless codec must match.

Engine precision discipline for oracle parity:
- money aggregates go through DECIMAL(18,2) (exact, order-insensitive) and are
  cast to DOUBLE only at the end;
- distances use only +/-/* (bit-identical across engines; no pow/sqrt in
  compared columns);
- timestamps are compared as epoch-microsecond integers or formatted strings,
  never as raw timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synth images → tile assign (D19) → PIP join (J4) → salted
    agg (A6/A7) → MVT encode (S9) → decode-back parity (D1-D8)."""
    from mvtspark.plans.flagship import flagship

    return flagship(spark, n_images=1000, zoom=6)


# ---------------------------------------------------- relational operators

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Scan+filter+hash-agg (A5-shape). Filters push to parquet scan."""
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    dec_price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(dec_price).cast("double").alias("sum_base_price"),
            F.sum(dec_price * disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join (broadcast dim) + agg + top-k (TakeOrderedAndProject)."""
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < F.lit("1997-03-15"))
    l = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > F.lit("1997-03-15"))
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """5-way star join; all dims broadcast; one shuffle (final agg)."""
    r = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = _t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def semi_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (J7 existence check)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def anti_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (J7 — the checkpoint-resume shape, sources/checkpoint.py)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Window top-k per group (W1/O5 shape)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def running_customer_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Running-frame window (W4 shape); exact decimal cumsum."""
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("cum_spend"),
    )


def rollup_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Rollup grouping sets (A9) — tile-pyramid rollup analog."""
    o = _t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
    )


def nations_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operations (§2.7): intersect + union + except over nation sets."""
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    with_cust = n.join(c, n.n_nationkey == c.c_nationkey, "left_semi").select("n_name")
    with_supp = n.join(s, n.n_nationkey == s.s_nationkey, "left_semi").select("n_name")
    r0 = n.where(F.col("n_regionkey") == 0).select("n_name")
    return with_cust.intersect(with_supp).union(r0).exceptAll(
        n.where(F.col("n_regionkey") == 4).select("n_name")
    ).distinct()


def distinct_users_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregate (A10 exact flavor)."""
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling time-window agg (streaming-shape §2.10, run on batch)."""
    e = _t(spark, sf, "events")
    # parquet ts is TIMESTAMP_NTZ; session tz is UTC, so this cast matches
    # DuckDB's epoch_us on the naive value exactly
    hour = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000)
    ).alias("hour_bucket")
    return e.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: gaps-and-islands via lag + cumulative sum (W-ops);
    the batch equivalent of a session_window stream."""
    e = _t(spark, sf, "events").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.when(
        F.col("us") - F.lag("us").over(w) > 1800 * 1_000_000, 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("session_id", F.sum(gap).over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


# -------------------------------------------------- spatial / mercator ops

def _event_points(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic geotags derived from event ids (offsets chosen so no
    point lands within double-ulp of a tile boundary — see tile_assign)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        ((F.col("event_id") % 3600) / 10.0 - 179.947).alias("lng"),
        (((F.col("event_id") * 7) % 1600) / 10.0 - 79.947).alias("lat"),
    )


def tile_assign_events(spark: SparkSession, sf: str) -> DataFrame:
    """D19 forward Web-Mercator tile assignment (native codegen, no UDF)
    + per-tile counts (A6 shape)."""
    from mvtspark.operators.spatial import assign_tiles

    pts = _event_points(spark, sf)
    return (
        assign_tiles(pts, zoom=4)
        .groupBy("zoom", "x", "y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def mercator_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """D10/D19 projection parity: lat/lng → global mercator px → back.
    Round-trips to 4 decimals (~11 m), proving both directions match the
    reference math (Geometry.cs:71-103) in pure SQL."""
    from mvtspark.functions.native import (
        lat_from_tile, lng_from_tile, tile_px, tile_py, tile_x, tile_y,
    )

    zoom = 4
    pts = _event_points(spark, sf)
    lngc, latc = F.col("lng"), F.col("lat")
    px = tile_px(lngc, latc, zoom)
    py = tile_py(lngc, latc, zoom)
    tx = tile_x(lngc, latc, zoom)
    ty = tile_y(lngc, latc, zoom)
    return pts.select(
        "event_id",
        F.round(lng_from_tile(px, tx, zoom), 4).alias("lng_rt"),
        F.round(lat_from_tile(py, ty, zoom), 4).alias("lat_rt"),
    )


def knn_sites(spark: SparkSession, sf: str) -> DataFrame:
    """J5 cell-ring-expansion kNN join: each event point's 3 nearest
    'sites' (nation-derived POIs). At zoom 1 the radius-1 ring covers the
    whole grid, so the grid-kNN result is exact → oracled against a full
    cross-join kNN."""
    from mvtspark.operators.spatial import knn_ring_join

    pts = _event_points(spark, sf).select(
        F.col("event_id").alias("image_id"), "lat", "lng"
    )
    n = _t(spark, sf, "nation")
    sites = n.select(
        F.col("n_nationkey").alias("site_id"),
        ((F.col("n_nationkey") * 37 % 160) - 79.5).cast("double").alias("lat"),
        ((F.col("n_nationkey") * 73 % 360) - 179.5).cast("double").alias("lng"),
    )
    out = knn_ring_join(pts, sites, k=3, zoom=1, max_radius=2)
    return out.select(
        F.col("image_id").alias("event_id"),
        "site_id",
        F.round("dist2", 6).alias("dist2"),
        "knn_rank",
    )


# ------------------------------------------------------ MVT codec pipeline

def mvt_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S9 encode → D1-D8 decode round-trip, ORACLED: per-order synthetic
    point features are encoded into per-tile MVT protobufs (applyInPandas)
    and decoded back (mapInPandas); the oracle recomputes the input
    relationally — a lossless codec must hash-match it exactly.
    Covers varint/zigzag/delta command streams + key/value dictionaries
    (ref DecodeGeometry.cs:31-91, VectorTileReader.cs:148-375)."""
    from mvtspark.sources.tiles import decode_tiles, encode_tiles

    o = _t(spark, sf, "orders")
    feats = o.select(
        F.lit(2).alias("zoom"),
        (F.col("o_orderkey") % 4).cast("int").alias("x"),
        ((F.col("o_orderkey") / 4).cast("long") % 4).cast("int").alias("y"),
        F.lit(4096).alias("extent"),
        F.col("o_orderkey").alias("feature_id"),
        F.lit(1).alias("geom_type"),
        F.array(F.lit(0), F.lit(1)).cast("array<int>").alias("part_offsets"),
        F.array(F.col("o_orderkey") * 7919 % 4096).alias("xs"),
        F.array(F.col("o_orderkey") * 104729 % 4096).alias("ys"),
        F.to_json(F.struct(F.col("o_orderstatus").alias("status"))).alias("props"),
    )
    tiles = encode_tiles(feats, layer_name="orders")
    dec = decode_tiles(tiles.select("zoom", "x", "y", "mvt"))
    return dec.where(F.col("decode_error").isNull()).select(
        "zoom",
        "x",
        "y",
        "feature_id",
        "geom_type",
        F.element_at("xs", 1).alias("px"),
        F.element_at("ys", 1).alias("py"),
        F.get_json_object("props", "$.status").alias("status"),
    )


def flagship_mvt_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Whole north-star loop at test scale (rows-only check; kernel parity
    is covered by mvt_roundtrip + the pytest suite)."""
    from mvtspark.plans.flagship import flagship

    n = 2000 if "0.01" in sf else 500
    return flagship(spark, n_images=n, zoom=6)


def image_roundtrip_invariants(spark: SparkSession, sf: str) -> DataFrame:
    """BASELINE input_hint per-row invariants: decoded-pixel PSNR (≥40dB /
    ∞ for lossless) + caption equality + pHash recompute, aggregated.
    Rows-only (image kernels aren't SQL-expressible)."""
    from mvtspark.operators.multimodal import image_roundtrip_stats
    from mvtspark.sources.images import synth_images

    imgs = synth_images(spark, 300, with_bytes=True)
    stats = image_roundtrip_stats(imgs)
    return stats.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.when(F.col("decode_error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        F.min("psnr").alias("min_psnr"),
        F.min(F.col("caption_ok").cast("int")).alias("all_captions_ok"),
        F.sum(F.when(F.col("phash_check").isNull(), 1).otherwise(0)).alias("n_null_phash"),
    )


# ------------------------------------------------- training-data pipeline

def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text analysis: token counts, quality features, lang-id, fingerprint
    — all native Column expressions (whole-stage codegen)."""
    from mvtspark.operators.text import analyze

    d = _t(spark, sf, "documents")
    return analyze(d).select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe", "n_words",
        "punct_ratio", "stopword_ratio", "avg_word_len", "quality",
        "lang_pred", "fp",
    )


def lang_id_counts(spark: SparkSession, sf: str) -> DataFrame:
    from mvtspark.operators.text import lang_id

    d = _t(spark, sf, "documents")
    return d.select("lang", lang_id(F.col("text")).alias("lang_pred")).groupBy(
        "lang", "lang_pred"
    ).agg(F.count(F.lit(1)).alias("n"))


def exact_dedup_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup (hash-groupBy) keyed on the first-5-token prefix of the
    normalized text."""
    from mvtspark.operators.dedup import exact_dedup, normalized_text

    d = _t(spark, sf, "documents")
    key = F.concat_ws(" ", F.slice(F.split(normalized_text(), " "), 1, 5))
    return exact_dedup(d, key=key)


def ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (the verify stage of any LSH
    pipeline), run over all-pairs candidates at this sf."""
    from mvtspark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents")
    ids = d.select("doc_id")
    cand = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .join(ids.select(F.col("doc_id").alias("doc_b")), F.col("doc_a") < F.col("doc_b"))
    )
    return ngram_jaccard_pairs(d, cand, n=3, threshold=0.5)


def minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle → 64-perm minhash →
    16-band bucket equi-join). Rows-only: the signature hashes aren't
    SQL-expressible; exact-Jaccard parity is covered by ngram_jaccard."""
    from mvtspark.operators.dedup import minhash_lsh_dedup

    d = _t(spark, sf, "documents")
    return minhash_lsh_dedup(d, n=3, threshold=0.7)


def simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 3 (4×16-bit band
    blocking; pigeonhole-exact candidate recall). Rows-only."""
    from mvtspark.operators.dedup import simhash_dedup

    d = _t(spark, sf, "documents")
    return simhash_dedup(d, max_hamming=3)


def embedding_cosine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs: sign-bit LSH blocking + exact cosine."""
    from mvtspark.operators.dedup import embedding_cosine_dups

    e = _t(spark, sf, "embeddings")
    return embedding_cosine_dups(e, threshold=0.42, sign_bits=4)


def ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-k (ANN correctness baseline); query
    side broadcast, similarity native zip_with/aggregate, window top-k."""
    from mvtspark.operators.ann import brute_force_topk

    e = _t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return brute_force_topk(e, q, k=5)


def ann_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-bucketed approximate top-k (the 10^12-scale path: probe nprobe
    of C centroid buckets instead of the full corpus). Rows-only (approx)."""
    from mvtspark.operators.ann import ivf_topk

    e = _t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ivf_topk(e, q, k=5, n_centroids=16, nprobe=4)


# ---------------------------------------------------------------- registry

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "semi_join_customers": semi_join_customers,
        "anti_join_customers": anti_join_customers,
        "top_orders_per_customer": top_orders_per_customer,
        "running_customer_spend": running_customer_spend,
        "rollup_order_priority": rollup_order_priority,
        "nations_set_ops": nations_set_ops,
        "distinct_users_by_type": distinct_users_by_type,
        "events_hourly": events_hourly,
        "sessionize_events": sessionize_events,
        "tile_assign_events": tile_assign_events,
        "mercator_roundtrip": mercator_roundtrip,
        "knn_sites": knn_sites,
        "mvt_roundtrip": mvt_roundtrip,
        "flagship_mvt_pipeline": flagship_mvt_pipeline,
        "image_roundtrip_invariants": image_roundtrip_invariants,
        "text_stats": text_stats,
        "lang_id_counts": lang_id_counts,
        "exact_dedup_prefix": exact_dedup_prefix,
        "ngram_jaccard": ngram_jaccard,
        "minhash_lsh": minhash_lsh,
        "simhash_pairs": simhash_pairs,
        "embedding_cosine_pairs": embedding_cosine_pairs,
        "ann_topk": ann_topk,
        "ann_topk_ivf": ann_topk_ivf,
    }


_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_SHINGLES = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in range(1, greatest(len(toks)-2, 1)+1)])"
)
_STOP = (
    "['the','a','an','and','or','of','to','in','is','are','was','were',"
    "'be','been','it','this','that','with','as','for','on','at','by','from']"
)
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_EVENT_PTS = (
    "SELECT event_id, (event_id % 3600)/10.0 - 179.947 AS lng, "
    "((event_id*7) % 1600)/10.0 - 79.947 AS lat FROM events"
)


def _merc_xy(zoom: int) -> tuple[str, str]:
    size = 4096.0 * (2.0 ** zoom)
    gx = f"((greatest(-180.0, least(180.0, lng)) + 180.0) / 360.0 * {size})"
    s = "sin(radians(greatest(-85.051128779806589, least(85.051128779806589, lat))))"
    gy = f"((0.5 - ln((1.0 + {s}) / (1.0 - {s})) / (4.0 * pi())) * {size})"
    return gx, gy


def oracle_sql() -> dict[str, str]:
    n = (1 << 4) - 1
    gx4, gy4 = _merc_xy(4)
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
              COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-03-15'
              AND l_shipdate > TIMESTAMP '1997-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders) WHERE rank <= 3
        """,
        "running_customer_spend": """
            SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
            FROM orders
        """,
        "rollup_order_priority": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "nations_set_ops": """
            SELECT DISTINCT n_name FROM (
              SELECT n_name FROM (
                SELECT n_name FROM nation WHERE EXISTS
                  (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
                INTERSECT
                SELECT n_name FROM nation WHERE EXISTS
                  (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
                UNION ALL
                SELECT n_name FROM nation WHERE n_regionkey = 0
              )
              EXCEPT ALL
              SELECT n_name FROM nation WHERE n_regionkey = 4
            )
        """,
        "distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "events_hourly": """
            SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
                   event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize_events": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
            g AS (
              SELECT user_id, event_id, us,
                CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                          > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
              FROM e),
            s AS (
              SELECT user_id, us,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM g)
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(us) AS start_us, MAX(us) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "tile_assign_events": f"""
            WITH pts AS ({_EVENT_PTS})
            SELECT 4 AS zoom,
              CAST(GREATEST(0, LEAST({n}, FLOOR({gx4} / 4096))) AS INT) AS x,
              CAST(GREATEST(0, LEAST({n}, FLOOR({gy4} / 4096))) AS INT) AS y,
              COUNT(*) AS n_points
            FROM pts GROUP BY 2, 3
        """,
        "mercator_roundtrip": f"""
            WITH pts AS ({_EVENT_PTS}),
            g AS (SELECT event_id, {gx4} AS gx, {gy4} AS gy FROM pts)
            SELECT event_id,
              ROUND(gx * 360.0 / 65536.0 - 180.0, 4) AS lng_rt,
              ROUND(360.0 / pi() * atan(exp((180.0 - gy * 360.0 / 65536.0)
                    * (pi() / 180.0))) - 90.0, 4) AS lat_rt
            FROM g
        """,
        "knn_sites": f"""
            WITH pts AS ({_EVENT_PTS}),
            sites AS (SELECT n_nationkey AS site_id,
                        CAST((n_nationkey*37 % 160) - 79.5 AS DOUBLE) AS slat,
                        CAST((n_nationkey*73 % 360) - 179.5 AS DOUBLE) AS slng
                      FROM nation),
            d AS (SELECT event_id, site_id,
                    (lat - slat) * (lat - slat) + (lng - slng) * (lng - slng) AS dist2
                  FROM pts, sites)
            SELECT event_id, site_id, ROUND(dist2, 6) AS dist2, knn_rank FROM (
              SELECT event_id, site_id, dist2,
                ROW_NUMBER() OVER (PARTITION BY event_id
                                   ORDER BY dist2, site_id) AS knn_rank
              FROM d) WHERE knn_rank <= 3
        """,
        "mvt_roundtrip": """
            SELECT 2 AS zoom,
              CAST(o_orderkey % 4 AS INT) AS x,
              CAST(CAST(FLOOR(o_orderkey / 4) AS BIGINT) % 4 AS INT) AS y,
              o_orderkey AS feature_id, 1 AS geom_type,
              o_orderkey * 7919 % 4096 AS px,
              o_orderkey * 104729 % 4096 AS py,
              o_orderstatus AS status
            FROM orders
        """,
        "text_stats": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOKS} AS toks,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS ltoks
              FROM documents),
            m AS (
              SELECT doc_id, text, len(toks) AS n_words,
                length(text) AS n_chars,
                length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
                len(list_filter(ltoks, x -> list_contains({_STOP}, x))) AS stop_hits
              FROM t)
            SELECT doc_id,
              n_words AS n_tokens_ws,
              CAST(GREATEST(n_words, CAST(CEIL(n_chars / 4) AS INT)) AS INT) AS n_tokens_bpe,
              n_words,
              ROUND(n_punct / n_chars, 6) AS punct_ratio,
              ROUND(stop_hits / n_words, 6) AS stopword_ratio,
              ROUND((n_chars - n_words + 1) / n_words, 6) AS avg_word_len,
              ROUND(LEAST(1.0, n_words / 100.0) * 0.4
                + GREATEST(0.0, 0.3 - ROUND(n_punct / n_chars, 6)) / 0.3 * 0.3
                + LEAST(1.0, ROUND(stop_hits / n_words, 6) * 4) * 0.3, 6) AS quality,
              CASE WHEN stop_hits / n_words >= 0.05 THEN 'en' ELSE 'und' END AS lang_pred,
              md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
            FROM m
        """,
        "lang_id_counts": f"""
            WITH t AS (SELECT lang,
              CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        x -> list_contains({_STOP}, x)))
                   / len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 0.05
                   THEN 'en' ELSE 'und' END AS lang_pred
              FROM documents)
            SELECT lang, lang_pred, COUNT(*) AS n FROM t GROUP BY 1, 2
        """,
        "exact_dedup_prefix": f"""
            SELECT dup_key, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id
            FROM (SELECT doc_id,
                    array_to_string((string_split({_NORM}, ' '))[1:5], ' ') AS dup_key
                  FROM documents)
            GROUP BY dup_key HAVING COUNT(*) > 1
        """,
        "ngram_jaccard": f"""
            WITH sh AS (
              SELECT doc_id, {_SHINGLES} AS s
              FROM (SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              ROUND(len(list_intersect(a.s, b.s))
                    / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        """,
        "embedding_cosine_pairs": """
            WITH e AS (
              SELECT vec_id, embedding,
                sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * x))) AS nrm,
                list_sum(list_transform(range(1, 5),
                  i -> CAST(POWER(2, 4 - i) AS BIGINT)
                       * CAST(embedding[i] >= 0 AS BIGINT))) AS bucket
              FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                / (a.nrm * b.nrm), 6) AS cosine
            FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                / (a.nrm * b.nrm) >= 0.42
        """,
        "ann_topk": """
            WITH e AS (
              SELECT vec_id, embedding,
                sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * x))) AS nrm
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
                  FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                list_sum(list_transform(range(1, len(q.q_emb) + 1),
                    i -> CAST(q.q_emb[i] AS DOUBLE) * e.embedding[i]))
                  / (q.q_nrm * e.nrm) AS cos
              FROM e, q WHERE e.vec_id != q.query_id)
            SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rank FROM (
              SELECT query_id, vec_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id ASC) AS rank
              FROM scored) WHERE rank <= 5
        """,
    }
