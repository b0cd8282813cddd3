"""Spatial operators: grid-bucketed neighbor self-join and cell
density — the spatial-join family (SURVEY §7 extension scope).

Coordinates are synthesized deterministically from integer keys
(two-decimal degrees), so both engines hold bit-identical doubles.
The metric is squared euclidean over degrees (flat): mul/add only —
no trig, because libm sin/cos/asin are not correctly rounded and
would diverge across engines in the last bits.

100 TB shape: the classic spatial-join discipline — points shuffle
keyed on grid cells sized to the query radius; one side explodes to
its 3×3 cell neighborhood so every qualifying pair meets in exactly
one cell (the probe side's exploded cell list is distinct, and the
build side sits only in its own cell). Shuffle carries candidates,
never the all-pairs space — the same bucketing story as LSH/IVF, in
geometry. Density is one partial-combined groupBy on the cell key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# two-decimal synthetic degrees from the customer key — exact in
# double on both engines (integer/100.0 is a single correctly-rounded
# division of exactly representable operands)
_LAT = "(CAST(c_custkey * 37 % 18000 AS DOUBLE) / 100.0 - 90.0)"
_LON = "(CAST(c_custkey * 91 % 36000 AS DOUBLE) / 100.0 - 180.0)"
_CELL = 3.0  # grid pitch == radius: neighbors live within one ring
_R2 = 9.0  # radius 3 degrees, squared (sized to the fixture density)


def _coords(cust: DataFrame) -> DataFrame:
    lat = (
        (F.col("c_custkey") * 37 % 18000).cast("double") / 100.0 - 90.0
    ).alias("lat")
    lon = (
        (F.col("c_custkey") * 91 % 36000).cast("double") / 100.0 - 180.0
    ).alias("lon")
    return cust.select(F.col("c_custkey").alias("id"), lat, lon)


# ---------------------------------------------------------------------------
# Radius self-join: every customer pair within 3° (flat metric),
# found via the 3×3 grid-neighborhood join — never an all-pairs
# cross. The oracle runs the identical cell construction in SQL.
@query(
    "spatial_neighbor_pairs_customers",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon
        FROM customer
    ),
    cells AS (
        SELECT id, lat, lon,
               CAST(FLOOR(lat / {_CELL}) AS BIGINT) AS cx,
               CAST(FLOOR(lon / {_CELL}) AS BIGINT) AS cy
        FROM pts
    ),
    probe AS (
        SELECT id, lat, lon, cx + dx.d AS cx, cy + dy.d AS cy
        FROM cells,
             (VALUES (-1), (0), (1)) AS dx(d),
             (VALUES (-1), (0), (1)) AS dy(d)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
    FROM cells a JOIN probe b ON a.cx = b.cx AND a.cy = b.cy
    WHERE a.id < b.id
      AND (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= {_R2}
    ORDER BY id_a, id_b
    """,
)
def spatial_neighbor_pairs_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _coords(_t(spark, sf_dir, "customer"))
    cells = pts.select(
        "id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL).cast("bigint").alias("cx"),
        F.floor(F.col("lon") / _CELL).cast("bigint").alias("cy"),
    )
    d = F.array([F.lit(-1), F.lit(0), F.lit(1)])
    probe = (
        cells.withColumn("dx", F.explode(d))
        .withColumn("dy", F.explode(d))
        .select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    dlat = F.col("lat") - F.col("lat_b")
    dlon = F.col("lon") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    return (
        cells.join(probe, ["cx", "cy"])
        .filter((F.col("id") < F.col("id_b")) & (dist2 <= F.lit(_R2)))
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            dist2.alias("dist2"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Grid density: points per occupied cell with the cell's bounding
# box — the heatmap/level-0 index read-out; one partial-combined
# groupBy on the cell key.
@query(
    "spatial_density_cells",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon
        FROM customer
    )
    SELECT CAST(FLOOR(lat / {_CELL}) AS BIGINT) AS cx,
           CAST(FLOOR(lon / {_CELL}) AS BIGINT) AS cy,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(lat) AS lat_min, MAX(lat) AS lat_max,
           MIN(lon) AS lon_min, MAX(lon) AS lon_max
    FROM pts
    GROUP BY 1, 2
    ORDER BY cx, cy
    """,
)
def spatial_density_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _coords(_t(spark, sf_dir, "customer"))
    return (
        pts.groupBy(
            F.floor(F.col("lat") / _CELL).cast("bigint").alias("cx"),
            F.floor(F.col("lon") / _CELL).cast("bigint").alias("cy"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("lat").alias("lat_min"),
            F.max("lat").alias("lat_max"),
            F.min("lon").alias("lon_min"),
            F.max("lon").alias("lon_max"),
        )
        .orderBy("cx", "cy")
    )


# ---------------------------------------------------------------------------
# Grid DBSCAN (r8, Ester et al. 1996 — public): density-based
# clustering over the synthetic customer coordinates. eps = the grid
# radius (eps² = 9.0), minPts = 7 (incl. the point itself — the
# fixture's neighborhood counts span 4..7, so cores, borders AND
# noise all occur). Pipeline: grid-bucketed eps-neighbor pairs (the
# spatial_neighbor_pairs join — candidates-only shuffle, never
# all-pairs) → per-point neighbor counts → core points → connected
# components over core-core edges (min-id labels) → borders adopt the
# MINIMUM neighboring core's cluster (the deterministic tie rule;
# textbook DBSCAN is first-come order-dependent) → everything else is
# noise (cluster NULL). The oracle replays the identical grid join,
# closure (recursive CTE), and tie rule.
_MINPTS = 7


@query(
    "dbscan_customers",
    oracle=f"""
    WITH RECURSIVE pts AS (
        SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon
        FROM customer
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM pts a JOIN pts b
          ON a.id <> b.id
         AND (a.lat - b.lat) * (a.lat - b.lat)
               + (a.lon - b.lon) * (a.lon - b.lon) <= {_R2}
    ),
    cnt AS (
        SELECT id, CAST(COUNT(*) + 1 AS BIGINT) AS n_eps
        FROM (SELECT id_a AS id FROM pairs) GROUP BY id
    ),
    roles AS (
        SELECT p.id, COALESCE(c.n_eps, 1) AS n_eps,
               COALESCE(c.n_eps, 1) >= {_MINPTS} AS is_core
        FROM pts p LEFT JOIN cnt c ON p.id = c.id
    ),
    core_edges AS (
        SELECT pr.id_a AS u, pr.id_b AS v
        FROM pairs pr
        JOIN roles ra ON ra.id = pr.id_a AND ra.is_core
        JOIN roles rb ON rb.id = pr.id_b AND rb.is_core
    ),
    reach AS (
        SELECT id AS node, id AS lbl FROM roles WHERE is_core
        UNION
        SELECT e.v AS node, reach.lbl
        FROM reach JOIN core_edges e ON e.u = reach.node
    ),
    core_cluster AS (
        SELECT node AS id, CAST(MIN(lbl) AS BIGINT) AS cluster
        FROM reach GROUP BY node
    ),
    border AS (
        SELECT pr.id_a AS id, CAST(MIN(cc.cluster) AS BIGINT) AS cluster
        FROM pairs pr
        JOIN roles ra ON ra.id = pr.id_a AND NOT ra.is_core
        JOIN roles rb ON rb.id = pr.id_b AND rb.is_core
        JOIN core_cluster cc ON cc.id = pr.id_b
        GROUP BY pr.id_a
    )
    SELECT r.id, r.n_eps,
           CASE WHEN r.is_core THEN 'core'
                WHEN b.cluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           COALESCE(cc.cluster, b.cluster) AS cluster
    FROM roles r
    LEFT JOIN core_cluster cc ON cc.id = r.id
    LEFT JOIN border b ON b.id = r.id AND NOT r.is_core
    ORDER BY r.id
    """,
)
def dbscan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_star

    pts = _coords(_t(spark, sf_dir, "customer"))
    cells = pts.select(
        "id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL).cast("bigint").alias("cx"),
        F.floor(F.col("lon") / _CELL).cast("bigint").alias("cy"),
    )
    d = F.array([F.lit(-1), F.lit(0), F.lit(1)])
    probe = (
        cells.withColumn("dx", F.explode(d))
        .withColumn("dy", F.explode(d))
        .select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    dlat = F.col("lat") - F.col("lat_b")
    dlon = F.col("lon") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    pairs = (
        cells.join(probe, ["cx", "cy"])
        .filter((F.col("id") != F.col("id_b")) & (dist2 <= F.lit(_R2)))
        .select(F.col("id").alias("id_a"), "id_b")
    )
    pairs = pairs.persist()
    cnt = pairs.groupBy(F.col("id_a").alias("id")).agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_eps")
    )
    roles = pts.select("id").join(cnt, "id", "left").select(
        "id",
        F.coalesce(F.col("n_eps"), F.lit(1).cast("bigint")).alias("n_eps"),
        (
            F.coalesce(F.col("n_eps"), F.lit(1).cast("bigint"))
            >= F.lit(_MINPTS)
        ).alias("is_core"),
    )
    roles = roles.persist()
    cores = roles.filter("is_core").select("id")
    core_edges = (
        pairs.join(cores.withColumnRenamed("id", "id_a"), "id_a")
        .join(cores.withColumnRenamed("id", "id_b"), "id_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # star contraction, not min-label: a grid eps-graph is exactly the
    # high-diameter lattice where label propagation needs O(diameter)
    # rounds (measured at sf0.1: one giant component, per-round cost
    # compounding 0.6 s → 278 s before convergence — the r8 bench
    # caught it). Large-star/small-star converges in O(log² n) rounds
    # regardless of diameter and computes the SAME min-id fixpoint.
    core_cluster = connected_components_star(
        core_edges, src="id_a", dst="id_b"
    ).select(
        F.col("node").alias("id"), F.col("component").alias("cluster")
    )
    # isolated cores (no core neighbor) are their own cluster
    core_cluster = (
        cores.join(core_cluster, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster"), F.col("id")).cast("bigint").alias(
                "cluster"
            ),
        )
    )
    border = (
        pairs.join(
            roles.filter(~F.col("is_core")).select(
                F.col("id").alias("id_a")
            ),
            "id_a",
        )
        .join(
            core_cluster.select(
                F.col("id").alias("id_b"), F.col("cluster")
            ),
            "id_b",
        )
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("cluster").cast("bigint").alias("b_cluster"))
    )
    out = (
        roles.join(core_cluster.withColumnRenamed("cluster", "c_cluster"), "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            "n_eps",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("c_cluster"), F.col("b_cluster")).alias("cluster"),
        )
        .orderBy("id")
    )
    return out


# ---------------------------------------------------------------------------
# Nearest-neighbor JOIN against a broadcastable reference set (r8):
# assign every customer its nearest supplier — the facility-
# assignment / nearest-service-point op. When the target set is a
# DIMENSION (suppliers, stores, centroids), the 100 TB plan is a
# broadcast map-side argmin: each partition scans its points once
# against the in-memory reference, emits one row per point, ZERO
# shuffles for the assignment itself (the same shape as the IVF cell
# assign in operators/similarity.py). Grid machinery
# (spatial_neighbor_pairs) is for big×big; this is the other half.
# argmin is an exact struct-min — (d², supplier id) lexicographic,
# so ties break on the smaller id identically in both engines.
@query(
    "nearest_supplier_customers",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon
        FROM customer
    ), s AS (
        SELECT s_suppkey AS sid,
               (CAST(s_suppkey * 53 % 18000 AS DOUBLE) / 100.0 - 90.0)
                 AS slat,
               (CAST(s_suppkey * 97 % 36000 AS DOUBLE) / 100.0 - 180.0)
                 AS slon
        FROM supplier
    ), best AS (
        SELECT c.id,
               MIN(struct_pack(
                   d2 := (c.lat - s.slat) * (c.lat - s.slat)
                         + (c.lon - s.slon) * (c.lon - s.slon),
                   sid := s.sid)) AS m
        FROM c CROSS JOIN s
        GROUP BY c.id
    )
    SELECT CAST(id AS BIGINT) AS id,
           CAST(m.sid AS BIGINT) AS nearest_supplier,
           ROUND(sqrt(m.d2) * 1000000.0) / 1000000.0 AS dist_deg
    FROM best ORDER BY id
    """,
)
def nearest_supplier_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _coords(_t(spark, sf_dir, "customer"))
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sid"),
        ((F.col("s_suppkey") * 53 % 18000).cast("double") / 100.0 - 90.0)
        .alias("slat"),
        ((F.col("s_suppkey") * 97 % 36000).cast("double") / 100.0 - 180.0)
        .alias("slon"),
    )
    dlat = F.col("lat") - F.col("slat")
    dlon = F.col("lon") - F.col("slon")
    d2 = dlat * dlat + dlon * dlon
    best = (
        cust.crossJoin(F.broadcast(sup))
        .groupBy("id")
        .agg(F.min(F.struct(d2.alias("d2"), F.col("sid"))).alias("m"))
    )
    return best.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("m.sid").cast("bigint").alias("nearest_supplier"),
        (
            F.round(F.sqrt(F.col("m.d2")) * F.lit(1000000.0))
            / F.lit(1000000.0)
        ).alias("dist_deg"),
    ).orderBy("id")


# ---------------------------------------------------------------------------
# Point-in-polygon (ray casting / crossing number — Shimrat 1962,
# public) against a literal convex pentagon in (lon, lat) space:
# count ray crossings per edge (a horizontal ray to +lon), odd =
# inside. Pure mul/add/compare doubles over exact two-decimal
# literals — the per-edge crossing terms are integers added in
# literal order, so both engines agree bit-for-bit. Scale shape:
# map-only expression work per point + one partial-combined count;
# a polygon SET would broadcast and a bounding-box grid key would
# prune candidates first (same cell discipline as the radius join).
_PENTAGON = [
    (-150.0, -80.0),
    (-60.0, -85.0),
    (30.0, -55.0),
    (-40.0, -45.0),
    (-120.0, -50.0),
]  # (lon, lat) vertices — southern band, where the synthetic
#    coordinates land at EVERY fixture scale (lat = 0.37*key - 90
#    clusters near the south pole for small key ranges)


def _crossing_terms_sql(px: str, py: str) -> str:
    terms = []
    n = len(_PENTAGON)
    for i in range(n):
        x1, y1 = _PENTAGON[i]
        x2, y2 = _PENTAGON[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({y1} > {py}) <> ({y2} > {py})) AND "
            f"{px} < ({x2} - {x1}) * ({py} - {y1}) / ({y2} - {y1}) + {x1} "
            f"THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


def _crossing_terms_spark(px, py):
    total = None
    n = len(_PENTAGON)
    for i in range(n):
        x1, y1 = _PENTAGON[i]
        x2, y2 = _PENTAGON[(i + 1) % n]
        cond = ((F.lit(y1) > py) != (F.lit(y2) > py)) & (
            px < (F.lit(x2) - F.lit(x1)) * (py - F.lit(y1)) / (F.lit(y2) - F.lit(y1)) + F.lit(x1)
        )
        t = F.when(cond, 1).otherwise(0)
        total = t if total is None else total + t
    return total


@query(
    "points_in_polygon_customers",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon
        FROM customer
    ),
    flagged AS (
        SELECT id, ({_crossing_terms_sql('lon', 'lat')}) % 2 = 1 AS inside
        FROM pts
    )
    SELECT inside,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(id) AS BIGINT) AS id_checksum
    FROM flagged
    GROUP BY inside
    ORDER BY inside
    """,
)
def points_in_polygon_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _coords(_t(spark, sf_dir, "customer"))
    crossings = _crossing_terms_spark(F.col("lon"), F.col("lat"))
    flagged = pts.select(
        "id", (crossings % 2 == 1).alias("inside")
    )
    return (
        flagged.groupBy("inside")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("inside")
    )
