"""Geospatial operators: grid-blocked ε-neighborhood join.

The spatial workhorse of an analytics engine — "find everything within
distance ε of each probe point" (the DBSCAN region query, store-to-
warehouse assignment, geofence matching) — done the way distributed
engines do it (Sedona/Magellan): snap points onto a uniform grid of
ε-sized cells, replicate the BUILD side onto its 3×3 cell neighborhood,
hash-join probes by their exact cell, then verify candidates with the
exact distance predicate. The blocking is LOSSLESS by construction: an
ε-disk around any probe point is covered by the 3×3 neighborhood of
every build cell it can touch, so the DuckDB oracle — the blocking-free
brute-force cross join with the identical predicate — makes the driver's
value hash a recall proof, the same gate design as
``join_fuzzy_levenshtein_block`` and ``dedup_jaccard_prefix_filter``.

Reference parity note: the reference engine (wizgrao/blow) has no join
surface at all (maps/maps.go:8-14 is its entire operator vocabulary);
this is an extension operator in the brief's "operations a large-scale
pipeline needs" layer.

Determinism: coordinates are the repo's no-RNG hash-uniforms (md5 →
52-bit integer, reduced to µ-degree BIGINTs), distances are pure-BIGINT
squared Euclidean in µ-degree space — no trig, no doubles — so both
engines compute bit-identical candidate sets and nearest picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table

# ε = 6° in µ-degrees; cell size = ε so a 3×3 neighborhood covers the
# ε-disk. Chosen for non-vacuity at both gate SFs (7 pairs at sf0.001,
# 381 at sf0.01, with multi-candidate probes at both, so the nearest
# pick is exercised).
_EPS_MU = 6_000_000
_EPS_MU2 = _EPS_MU * _EPS_MU

# Hash→µ-degree coordinate derivation, shared by both engines: the
# md5-13-nibble 52-bit uniform reduced mod the µ-degree span. Latitude
# spans ±60° (the inhabited band), longitude ±180°. Planar degree-space
# metric, documented: no meridian wraparound, no latitude scaling — the
# operator under test is the blocking, not the geodesy.
_LAT_SPAN = 120_000_001
_LON_SPAN = 360_000_001


def _mu_coord(tag: str, key, span: int, shift: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(tag), key.cast("string"))), 1, 13), 16, 10
    ).cast("long")
    return (h % span - shift).cast("long")


def grid_epsilon_pairs(probe: DataFrame, build: DataFrame, eps_mu: int) -> DataFrame:
    """All (probe_id, build_id, d2_mu) pairs with squared µ-degree
    distance ≤ eps_mu² — the lossless grid-blocked candidate core.

    Inputs are (probe_id|build_id, lat, lon) frames with BIGINT µ-degree
    coords in [-60e6, 60e6] × [-180e6, 180e6]. The build side is
    replicated onto its 3×3 cell neighborhood (cell = ε); probes join by
    their exact cell; the exact integer predicate filters. Each
    qualifying pair is emitted exactly once — a build point occupies one
    cell and its nine neighbor entries target nine DISTINCT cells, so at
    most one can equal the probe's cell."""
    eps2 = eps_mu * eps_mu

    # Cell ids via exact integer `div` on nonneg-shifted coords, where
    # truncation IS floor — pure BIGINT, no double rounding anywhere.
    def cell(axis: str, shift: int) -> F.Column:
        return F.expr(f"({axis} + {shift}) div {eps_mu}")

    p = probe.select(
        "probe_id",
        "lat",
        "lon",
        cell("lat", 60_000_000).alias("gx"),
        cell("lon", 180_000_000).alias("gy"),
    )
    off = F.explode(
        F.expr(
            "flatten(transform(sequence(-1,1), dx -> "
            "transform(sequence(-1,1), dy -> struct(dx, dy))))"
        )
    ).alias("o")
    b = (
        build.select(
            "build_id",
            "lat",
            "lon",
            cell("lat", 60_000_000).alias("bx"),
            cell("lon", 180_000_000).alias("by"),
        )
        .select("build_id", "lat", "lon", "bx", "by", off)
        .select(
            "build_id",
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
            (F.col("bx") + F.col("o.dx")).alias("gx"),
            (F.col("by") + F.col("o.dy")).alias("gy"),
        )
    )
    d2 = (F.col("lat") - F.col("blat")) * (F.col("lat") - F.col("blat")) + (
        F.col("lon") - F.col("blon")
    ) * (F.col("lon") - F.col("blon"))
    return (
        p.join(b, ["gx", "gy"])
        .select("probe_id", "build_id", d2.alias("d2_mu"))
        .filter(F.col("d2_mu") <= eps2)
    )


@register(
    "join_spatial_grid_epsilon",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             CAST(('0x' || substring(md5('geo:s:' || CAST(s_suppkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:S:' || CAST(s_suppkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM supplier
    ), pairs AS (
      SELECT c_custkey, s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
               + (c.lon - s.lon) * (c.lon - s.lon) AS d2_mu
      FROM c CROSS JOIN s
      WHERE (c.lat - s.lat) * (c.lat - s.lat)
              + (c.lon - s.lon) * (c.lon - s.lon) <= {_EPS_MU2}
    ), ranked AS (
      SELECT c_custkey, s_suppkey, d2_mu,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY d2_mu, s_suppkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_custkey) AS n_cand
      FROM pairs
    )
    SELECT c_custkey,
           s_suppkey AS nearest_suppkey,
           d2_mu     AS nearest_d2_mu,
           CAST(n_cand AS BIGINT) AS n_within_eps
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "spatial", "blocking"),
)
def join_spatial_grid_epsilon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-neighborhood spatial join: for every customer point, the
    nearest supplier point within ε = 6° plus the count of all
    suppliers inside the disk, via uniform-grid blocking.

    Plan shape: the build (supplier) side — the smaller one — is
    replicated onto its 3×3 grid-cell neighborhood (a constant 9×
    explode of keys+coords only); the probe (customer) side is keyed by
    the single cell it falls in; one hash join on the cell id produces
    each candidate pair EXACTLY once (a supplier occupies one cell, and
    each of its nine neighbor entries targets a distinct cell), so no
    dedup pass is needed; the exact integer predicate then filters, and
    a per-probe window picks the nearest. At 100 TB the cell id is the
    shuffle key — fan-out is 9× the build side regardless of corpus
    size, candidate volume tracks true pair density (cell ≈ ε is the
    textbook sizing; skewed cells fall out of AQE's skew split since
    the join is a plain hash join on a bigint), and the final window
    shuffles only the candidate pairs, not the inputs.

    Cross-engine determinism: coordinates, cells, and distances are all
    BIGINT (md5-hash µ-degrees, truncating div on nonneg-shifted
    coords, integer squared distance) — no trig anywhere, so the
    blocking-free DuckDB cross join (the oracle) must reproduce the
    result bit-for-bit, proving the grid lost no pair."""
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")

    c = cust.select(
        F.col("c_custkey").alias("probe_id"),
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    s = supp.select(
        F.col("s_suppkey").alias("build_id"),
        _mu_coord("geo:s:", F.col("s_suppkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:S:", F.col("s_suppkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    cand = grid_epsilon_pairs(c, s, _EPS_MU).select(
        F.col("probe_id").alias("c_custkey"),
        F.col("build_id").alias("s_suppkey"),
        "d2_mu",
    )
    w = W.partitionBy("c_custkey")
    ranked = cand.select(
        "c_custkey",
        "s_suppkey",
        "d2_mu",
        F.row_number().over(w.orderBy("d2_mu", "s_suppkey")).alias("rn"),
        F.count("*").over(w).alias("n_cand"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "c_custkey",
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.col("d2_mu").alias("nearest_d2_mu"),
        F.col("n_cand").cast("long").alias("n_within_eps"),
    )


# Tile sizes for the 3-level pyramid: 12° → 6° → 3° (each level halves
# the cell edge, so parent ids are child ids div 2 — the map-tile
# invariant that lets a serving layer aggregate any zoom from the next
# finer one).
_TILE_COARSE = 12_000_000
_TILE_MID = 6_000_000
_TILE_FINE = 3_000_000


@register(
    "agg_spatial_tile_pyramid",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
    ), cells AS (
      SELECT (lat + 60000000) // {_TILE_COARSE} AS x12,
             (lon + 180000000) // {_TILE_COARSE} AS y12,
             (lat + 60000000) // {_TILE_MID} AS x6,
             (lon + 180000000) // {_TILE_MID} AS y6,
             (lat + 60000000) // {_TILE_FINE} AS x3,
             (lon + 180000000) // {_TILE_FINE} AS y3,
             bal_cents
      FROM pts
    )
    , tiles AS (
      SELECT GROUPING(x12) AS g12,
             CAST(2 - (GROUPING(x6) + GROUPING(x3)) AS INT) AS level,
             COALESCE(x3, x6, x12) AS cell_x,
             COALESCE(y3, y6, y12) AS cell_y,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
      FROM cells
      GROUP BY ROLLUP ((x12, y12), (x6, y6), (x3, y3))
    )
    SELECT level, cell_x, cell_y, n_points, sum_bal_cents
    FROM tiles WHERE g12 = 0
    """,
    tags=("agg", "spatial", "rollup"),
)
def agg_spatial_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-pyramid spatial rollup: point counts and a value measure
    aggregated at three grid resolutions (12° → 6° → 3°; each level
    halves the cell edge, so a child tile's parent id is its own id
    div 2 — the standard web-map invariant) in ONE pass via
    hierarchical ROLLUP grouping sets — the build step of every
    map-tile/heat-map serving layer, and the spatial-aggregation
    complement of ``join_spatial_grid_epsilon``'s blocking grid.

    Catalyst plans the three-level rollup as a single Expand (3 rows
    per input) feeding one hash aggregate — one corpus scan, one
    shuffle keyed by cell id; output is bounded by occupied cells, not
    points. At 100 TB you'd add levels, not passes: each extra zoom is
    one more Expand projection against the same scan. Coordinates are
    the repo's hash µ-degree BIGINTs (`_mu_coord`), cells are exact
    integer division on nonneg-shifted coords, the measure is
    cents-exact — nothing can diverge between engines, and the
    parent/child sum consistency is pinned in tests/test_spatial.py."""
    cust = read_table(spark, sf_dir, "customer")
    pts = cust.select(
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
        F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)").alias("bal_cents"),
    )
    cells = pts.select(
        F.expr(f"(lat + 60000000) div {_TILE_COARSE}").alias("x12"),
        F.expr(f"(lon + 180000000) div {_TILE_COARSE}").alias("y12"),
        F.expr(f"(lat + 60000000) div {_TILE_MID}").alias("x6"),
        F.expr(f"(lon + 180000000) div {_TILE_MID}").alias("y6"),
        F.expr(f"(lat + 60000000) div {_TILE_FINE}").alias("x3"),
        F.expr(f"(lon + 180000000) div {_TILE_FINE}").alias("y3"),
        "bal_cents",
    )
    cells.createOrReplaceTempView("tile_cells")
    return spark.sql(
        """
        WITH tiles AS (
          SELECT GROUPING(x12) AS g12,
                 CAST(2 - (GROUPING(x6) + GROUPING(x3)) AS INT) AS level,
                 COALESCE(x3, x6, x12) AS cell_x,
                 COALESCE(y3, y6, y12) AS cell_y,
                 CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
          FROM tile_cells
          GROUP BY ROLLUP ((x12, y12), (x6, y6), (x3, y3))
        )
        SELECT level, cell_x, cell_y, n_points, sum_bal_cents
        FROM tiles WHERE g12 = 0
        """
    )


# DBSCAN parameters: ε shared with the ε-join above; a point is CORE if
# at least this many OTHER points sit within ε (minPts counts neighbors
# excluding self — the strict Ester et al. formulation minus the point
# itself, pinned identically in the oracle).
_DBSCAN_MIN_NEIGHBORS = 2


@register(
    "spatial_dbscan_core_points",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), neigh AS (
      SELECT a.c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_neighbors
      FROM c a JOIN c b
        ON a.c_custkey <> b.c_custkey
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_EPS_MU2}
      GROUP BY a.c_custkey
    )
    SELECT c_custkey AS point_id, n_neighbors,
           n_neighbors >= {_DBSCAN_MIN_NEIGHBORS} AS is_core
    FROM neigh
    ORDER BY point_id
    """,
    tags=("spatial", "dbscan", "cluster"),
)
def spatial_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's region-query phase (Ester et al., KDD 1996): count each
    point's ε-neighbors and label CORE points (≥ minPts neighbors,
    self excluded) — the step that determines density clusters; border/
    noise labeling and cluster growth then reduce to the connected-
    components machinery dedup_clusters already provides. Points with
    zero ε-neighbors don't appear (they're noise by definition and the
    pair join never emits them), so the row set itself is data-derived.

    Scale: the self-join runs through the SAME lossless 3×3
    grid-blocked ε-join as join_spatial_grid_epsilon (cell = ε, build
    side replicated onto its neighborhood, exact integer predicate
    verifies) — candidate count is density-bounded per cell, never
    all-pairs; the oracle is the blocking-free brute-force replay, so
    the hash match proves blocking recall. Pure-BIGINT µ-degree
    arithmetic, no doubles anywhere."""
    c = read_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("probe_id"),
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    build = pts.select(
        F.col("probe_id").alias("build_id"), "lat", "lon"
    )
    pairs = grid_epsilon_pairs(pts, build, _EPS_MU).filter(
        F.col("probe_id") != F.col("build_id")
    )
    return (
        pairs.groupBy(F.col("probe_id").alias("point_id"))
        .agg(F.count("*").cast("bigint").alias("n_neighbors"))
        .select(
            "point_id",
            "n_neighbors",
            (F.col("n_neighbors") >= _DBSCAN_MIN_NEIGHBORS).alias("is_core"),
        )
        .orderBy("point_id")
    )


@register(
    "spatial_dbscan_clusters",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), pairs AS (
      SELECT a.c_custkey AS pa, b.c_custkey AS pb
      FROM c a JOIN c b
        ON a.c_custkey <> b.c_custkey
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_EPS_MU2}
    ), core AS (
      SELECT pa AS id FROM pairs GROUP BY pa
      HAVING COUNT(*) >= {_DBSCAN_MIN_NEIGHBORS}
    ), core_edges AS (
      SELECT p.pa AS a, p.pb AS b FROM pairs p
      JOIN core x ON x.id = p.pa JOIN core y ON y.id = p.pb
    ), reach(node, comp) AS (
      SELECT a, a FROM core_edges
      UNION
      SELECT e.a, r.comp FROM core_edges e JOIN reach r ON e.b = r.node
    ), cc AS (
      SELECT node, MIN(comp) AS comp FROM reach GROUP BY node
    ), core_lab AS (
      SELECT core.id, COALESCE(cc.comp, core.id) AS cluster
      FROM core LEFT JOIN cc ON cc.node = core.id
    ), border AS (
      SELECT p.pa AS id, MIN(cl.cluster) AS cluster
      FROM pairs p
      JOIN core_lab cl ON cl.id = p.pb
      LEFT JOIN core x ON x.id = p.pa
      WHERE x.id IS NULL
      GROUP BY p.pa
    )
    SELECT c.c_custkey AS point_id,
           CASE WHEN cl.id IS NOT NULL THEN 'core'
                WHEN bd.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(COALESCE(cl.cluster, bd.cluster) AS BIGINT) AS cluster
    FROM c
    LEFT JOIN core_lab cl ON cl.id = c.c_custkey
    LEFT JOIN border bd ON bd.id = c.c_custkey
    ORDER BY point_id
    """,
    tags=("spatial", "dbscan", "cluster", "iterative"),
)
def spatial_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL deterministic DBSCAN (Ester et al., KDD 1996) — the
    round-12 completion of spatial_dbscan_core_points, which stopped at
    the region-query phase: every customer point is labeled
    core / border / noise with its cluster id.

    * clusters = connected components of the core-core ε-graph,
      resolved by the size-adaptive ``connected_components`` (round 12:
      the distributed path is the alternating large-star/small-star
      algorithm of Kiveris et al. SoCC 2014, O(log² n) rounds
      regardless of diameter — density-ridge clusters ARE the
      long-chain shape that breaks O(diameter) propagation);
    * a singleton core (enough neighbors, none of them core) forms its
      own cluster (label = own id);
    * border points (non-core within ε of ≥ 1 core) take the MINIMUM
      cluster id among their core neighbors — classic DBSCAN leaves
      border assignment scan-order-dependent; the min rule makes it a
      pure function of the data, which is what lets a DuckDB oracle
      exist at all;
    * noise = everything else (cluster NULL).

    Scale: one lossless 3x3 grid-blocked ε-self-join (density-bounded
    candidates, never all-pairs) spilled once and reused by the
    count/core/border phases, then CC over the core-core edge subset —
    the dup-graph-sized input CC is designed for. The oracle replays
    the blocking-free brute-force join plus a recursive-CTE reachability,
    so the hash match proves blocking recall AND cluster equality.
    Reference analog: none."""
    from blow_spark import dedup
    from blow_spark.materialize import spill_to_parquet

    c = read_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("probe_id"),
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    build = pts.select(F.col("probe_id").alias("build_id"), "lat", "lon")
    # the ε-pair table feeds three consumers (counts, core edges,
    # border assignment): spill once, scan thrice
    pairs = spill_to_parquet(
        grid_epsilon_pairs(pts, build, _EPS_MU)
        .filter(F.col("probe_id") != F.col("build_id"))
        .select("probe_id", "build_id"),
        "blow_spark_dbscan_",
    )
    core = (
        pairs.groupBy("probe_id")
        .count()
        .filter(F.col("count") >= _DBSCAN_MIN_NEIGHBORS)
        .select(F.col("probe_id").alias("cid"))
    )
    core_pairs = (
        pairs.join(core.withColumnRenamed("cid", "probe_id"), "probe_id")
        .join(core.withColumnRenamed("cid", "build_id"), "build_id")
        .filter(F.col("probe_id") < F.col("build_id"))
        .select(F.col("probe_id").alias("id_a"), F.col("build_id").alias("id_b"))
    )
    cc = dedup.connected_components(core_pairs)
    core_lab = core.join(cc, core.cid == cc.node, "left").select(
        F.col("cid").alias("id"),
        F.coalesce(F.col("comp"), F.col("cid")).alias("cluster"),
    )
    border = (
        pairs.join(
            core_lab.withColumnRenamed("id", "build_id"), "build_id"
        )
        .join(
            core.withColumnRenamed("cid", "probe_id"),
            "probe_id",
            "left_anti",
        )
        .groupBy(F.col("probe_id").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    return (
        pts.select(F.col("probe_id").alias("point_id"))
        .join(
            core_lab.select(
                F.col("id").alias("point_id"),
                F.col("cluster").alias("core_cluster"),
            ),
            "point_id",
            "left",
        )
        .join(
            border.select(
                F.col("id").alias("point_id"),
                F.col("cluster").alias("border_cluster"),
            ),
            "point_id",
            "left",
        )
        .select(
            "point_id",
            F.when(F.col("core_cluster").isNotNull(), F.lit("core"))
            .when(F.col("border_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("core_cluster", "border_cluster")
            .cast("bigint")
            .alias("cluster"),
        )
        .orderBy("point_id")
    )


# --------------------------------------------------------------------------
# Geohash encoding: pure-integer bit interleave + base32 (round 10)
# --------------------------------------------------------------------------

_GH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_NCHARS = 8  # 40 bits: 20 lon + 20 lat


def _geohash_char_exprs(shift_fmt) -> list[str]:
    """The 8 per-character 5-bit expressions of a 40-bit geohash, as SQL
    text over columns `lonbits`/`latbits` (20-bit integers). The bit
    stream alternates lon,lat,lon,... from the MSB (the geohash spec);
    `shift_fmt(col, n)` renders a right-shift so the SAME generator
    serves Spark SQL (shiftright) and DuckDB (>>)."""
    chars = []
    for k in range(_GH_NCHARS):
        terms = []
        for j in range(5):
            m = 5 * k + j
            if m % 2 == 0:
                src, bit = "lonbits", 19 - m // 2
            else:
                src, bit = "latbits", 19 - (m - 1) // 2
            terms.append(f"(({shift_fmt(src, bit)}) & 1) * {1 << (4 - j)}")
        chars.append(" + ".join(terms))
    return chars


def _geohash_concat(shift_fmt) -> str:
    parts = [
        f"substr('{_GH_CHARS}', CAST({c} AS INT) + 1, 1)"
        for c in _geohash_char_exprs(shift_fmt)
    ]
    return "concat(" + ", ".join(parts) + ")"


_GH_SPARK = _geohash_concat(lambda col, n: f"shiftright({col}, {n})")
_GH_DUCK = _geohash_concat(lambda col, n: f"({col} >> {n})")


@register(
    "scalar_geohash_encode",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), bits AS (
      SELECT c_custkey, lat, lon,
             (lat + 90000000) * 1048576 // 180000000 AS latbits,
             (lon + 180000000) * 1048576 // 360000000 AS lonbits
      FROM pts
    )
    SELECT c_custkey, lat, lon,
           {_GH_DUCK} AS geohash8,
           substr({_GH_DUCK}, 1, 4) AS gh4
    FROM bits
    ORDER BY c_custkey
    """,
    tags=("scalar", "spatial", "exact"),
)
def scalar_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer 2008; the Z-order-curve-with-base32
    spatial key Elasticsearch/Redis/BigQuery expose) of each customer's
    µ-degree point, computed in PURE INTEGER arithmetic: 20-bit lat/lon
    quantizers via integer floor-division over the standard ±90/±180
    domain, the geohash's alternating lon/lat bit interleave unrolled
    into 8 five-bit literal expressions (generated once in Python and
    rendered into BOTH plans — shiftright for Spark, >> for DuckDB), and
    a base32 table lookup. No doubles anywhere, so the driver hash is a
    bit-exactness proof of the full encode path.

    The 4-char prefix column is the cell key a serving layer groups or
    range-scans by — geohash prefixes ARE the hierarchical grid, which
    is why this belongs next to agg_spatial_tile_pyramid's integer tile
    ids. Scale: map-only (one projection, zero shuffles beyond the
    scan); at 100 TB this is the cheapest possible spatial index-key
    materialization. Reference analog: blow's Mapper surface
    (maps/maps.go:12-14) could express a per-record encode but has no
    integer bit ops in its vocabulary."""
    cust = read_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    bits = pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr("(lat + 90000000) * 1048576 div 180000000").alias("latbits"),
        F.expr("(lon + 180000000) * 1048576 div 360000000").alias("lonbits"),
    )
    return bits.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(_GH_SPARK).alias("geohash8"),
        F.expr(f"substr({_GH_SPARK}, 1, 4)").alias("gh4"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Haversine great-circle radius join over the integer-exact candidates
# --------------------------------------------------------------------------

# Shared SQL fragment (Spark SQL and DuckDB agree on radians/sin/cos/
# asin/sqrt names): great-circle km from µ-degree BIGINT columns.
_HAV_KM = (
    "2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians((blat - lat) / 1e6) / 2), 2) "
    "+ cos(radians(lat / 1e6)) * cos(radians(blat / 1e6)) "
    "* pow(sin(radians((blon - lon) / 1e6) / 2), 2)))"
)


@register(
    "join_geo_haversine_radius",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             CAST(('0x' || substring(md5('geo:s:' || CAST(s_suppkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS blat,
             CAST(('0x' || substring(md5('geo:S:' || CAST(s_suppkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS blon
      FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           (lat - blat) * (lat - blat) + (lon - blon) * (lon - blon) AS d2_mu,
           CAST(ROUND(({_HAV_KM}) * 10000) AS BIGINT) AS dist_km_e4
    FROM c CROSS JOIN s
    WHERE (lat - blat) * (lat - blat) + (lon - blon) * (lon - blon)
          <= {_EPS_MU2}
    ORDER BY c_custkey, s_suppkey
    """,
    tags=("join", "spatial"),
)
def join_geo_haversine_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join with GREAT-CIRCLE distance reporting: all
    (customer, supplier) pairs inside the ε = 6° degree-space disk —
    membership decided by the same pure-BIGINT squared-µ-degree
    predicate as join_spatial_grid_epsilon, so the row SET is exact and
    the grid blocking is recall-lossless against the oracle's
    brute-force cross join — each annotated with the haversine
    great-circle distance (R⊕ = 6371.0088 km), the real-world
    measure a geofence/logistics user wants. The trig evaluates from
    IDENTICAL integer µ-degree inputs through the IDENTICAL formula
    text in both engines and is reported at e4 fixed point
    (~0.1 m granularity; libm-vs-JVM sin/cos agree to ~1 ulp, eleven
    orders of magnitude below the rounding quantum) — membership never
    depends on a double.

    Scale: the 3×3-cell grid join bounds candidates by local density
    (SCALE.md documents the ε-join density story); the haversine is a
    map-side expression over qualifying pairs only."""
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    c = cust.select(
        F.col("c_custkey").alias("probe_id"),
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    s = supp.select(
        F.col("s_suppkey").alias("build_id"),
        _mu_coord("geo:s:", F.col("s_suppkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:S:", F.col("s_suppkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    # grid_epsilon_pairs drops coordinates; rejoin the (tiny) supplier
    # side and the probe coords for the distance expression. The probe
    # side re-derives its coords map-side (md5 is cheaper than a
    # shuffle); the build side broadcasts.
    pairs = grid_epsilon_pairs(c, s, _EPS_MU)
    with_c = pairs.join(c.select(F.col("probe_id"), "lat", "lon"), "probe_id")
    with_both = with_c.join(
        F.broadcast(
            s.select(
                "build_id",
                F.col("lat").alias("blat"),
                F.col("lon").alias("blon"),
            )
        ),
        "build_id",
    )
    return with_both.select(
        F.col("probe_id").alias("c_custkey"),
        F.col("build_id").alias("s_suppkey"),
        "d2_mu",
        F.expr(f"CAST(ROUND(({_HAV_KM}) * 10000) AS BIGINT)").alias("dist_km_e4"),
    ).orderBy("c_custkey", "s_suppkey")


# --------------------------------------------------------------------------
# Geohash-ladder k-anonymity coarsening (round 10)
# --------------------------------------------------------------------------

_GHK_K = 10  # k-anonymity threshold per released cell


@register(
    "privacy_geohash_coarsen",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(('0x' || substring(md5('geo:c:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LAT_SPAN} - 60000000 AS lat,
             CAST(('0x' || substring(md5('geo:C:' || CAST(c_custkey AS VARCHAR)), 1, 13))
                  AS BIGINT) % {_LON_SPAN} - 180000000 AS lon
      FROM customer
    ), bits AS (
      SELECT c_custkey,
             (lat + 90000000) * 1048576 // 180000000 AS latbits,
             (lon + 180000000) * 1048576 // 360000000 AS lonbits
      FROM pts
    ), gh AS (
      SELECT c_custkey, {_GH_DUCK} AS gh8 FROM bits
    ), lv AS (
      SELECT c_custkey, gh8, substr(gh8, 1, 4) AS gh4, substr(gh8, 1, 2)
               AS gh2
      FROM gh
    ), c8 AS (SELECT gh8, COUNT(*) AS n FROM lv GROUP BY gh8),
       c4 AS (SELECT gh4, COUNT(*) AS n FROM lv GROUP BY gh4),
       c2 AS (SELECT gh2, COUNT(*) AS n FROM lv GROUP BY gh2),
    chosen AS (
      SELECT l.c_custkey,
             CASE WHEN c8.n >= {_GHK_K} THEN 'gh8'
                  WHEN c4.n >= {_GHK_K} THEN 'gh4'
                  WHEN c2.n >= {_GHK_K} THEN 'gh2'
                  ELSE 'suppressed' END AS level,
             CASE WHEN c8.n >= {_GHK_K} THEN l.gh8
                  WHEN c4.n >= {_GHK_K} THEN l.gh4
                  WHEN c2.n >= {_GHK_K} THEN l.gh2 END AS released_cell
      FROM lv l
      JOIN c8 USING (gh8) JOIN c4 USING (gh4) JOIN c2 USING (gh2)
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT released_cell) AS BIGINT) AS n_cells
    FROM chosen
    GROUP BY level
    ORDER BY level
    """,
    tags=("privacy", "spatial", "governance"),
)
def privacy_geohash_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location k-anonymization by geohash-prefix generalization: each
    point is released at the FINEST geohash level (8 → 4 → 2 chars)
    whose cell still holds ≥ {_GHK_K} people, else suppressed — the
    spatial instance of the generalization-ladder release decision
    (privacy_k_anonymize_generalize's ladder, on geohash cells instead
    of attribute bands; geohash prefixes nest, which is exactly why
    serving layers anonymize on them). The whole decision is integer
    counting over the pure-integer geohash of scalar_geohash_encode —
    no doubles anywhere.

    Scale: three prefix-keyed counts (each strictly coarser — the
    re-aggregation is cell-grain, not point-grain) + equi-joins back
    on the cell keys; output is the 4-row release-level census.
    Reference analog: none — blow has no aggregation surface."""
    cust = read_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    bits = pts.select(
        "c_custkey",
        F.expr("(lat + 90000000) * 1048576 div 180000000").alias("latbits"),
        F.expr("(lon + 180000000) * 1048576 div 360000000").alias("lonbits"),
    )
    from blow_spark.materialize import spill_to_parquet

    lv = spill_to_parquet(
        bits.select(
            "c_custkey",
            F.expr(_GH_SPARK).alias("gh8"),
        ).select(
            "c_custkey",
            "gh8",
            F.expr("substr(gh8, 1, 4)").alias("gh4"),
            F.expr("substr(gh8, 1, 2)").alias("gh2"),
        ),
        "blow_spark_ghk_lv_",
    )
    c8 = lv.groupBy("gh8").agg(F.count("*").alias("n8"))
    c4 = lv.groupBy("gh4").agg(F.count("*").alias("n4"))
    c2 = lv.groupBy("gh2").agg(F.count("*").alias("n2"))
    chosen = (
        lv.join(c8, "gh8")
        .join(c4, "gh4")
        .join(c2, "gh2")
        .select(
            F.when(F.col("n8") >= _GHK_K, F.lit("gh8"))
            .when(F.col("n4") >= _GHK_K, F.lit("gh4"))
            .when(F.col("n2") >= _GHK_K, F.lit("gh2"))
            .otherwise(F.lit("suppressed"))
            .alias("level"),
            F.when(F.col("n8") >= _GHK_K, F.col("gh8"))
            .when(F.col("n4") >= _GHK_K, F.col("gh4"))
            .when(F.col("n2") >= _GHK_K, F.col("gh2"))
            .alias("released_cell"),
        )
    )
    return (
        chosen.groupBy("level")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.countDistinct("released_cell").cast("bigint").alias("n_cells"),
        )
        .orderBy("level")
    )
