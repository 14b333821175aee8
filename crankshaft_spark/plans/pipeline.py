"""Flagship north-rule pipeline: crawl table -> Gi* hotspot tiles.

Stages (each checkpointable via plans.checkpoint.StageRunner):

  pages     Common-Crawl-style table (url, warc_ts, html, text, lang)
  features  byte-identical text extraction from html + quality features
            (JVM-side regexp/string math, whole-stage codegen)
  pip       point-in-polygon tile assignment (broadcast cell->polygon index
            + Arrow ray-cast refine; operators.pip)
  cellagg   per-grid-cell rollup: page count, distinct hosts (two-level
            "salted" aggregation: cell x host partial first, so one hot host
            cannot skew a single reducer), mean quality
  gistar    queen-contiguity weights on the occupied-cell grid (8-neighbor
            ring join, no Python) -> analytic Gi* z-score per cell ->
            hot/cold classification

Everything except the boundary-cell ray-cast stays in the JVM.  The whole
pipeline is also expressed as one DuckDB SQL oracle (``hotspot_oracle_sql``)
so the driver's correctness harness can value-hash the END-TO-END result,
not just the stages.

Reference analogue: this is the distributed re-expression of the
CDB_GetisOrdsG call chain (/root/reference/src/pg/sql/16_getis.sql ->
src/py/crankshaft/crankshaft/clustering/getis.py:22-50) with the geometry
front-end the north star specifies (geocode -> H3-style cell -> PIP join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import CELL_M, cell_expr, cell_sql
from crankshaft_spark.operators.getis import getis_gstar
from crankshaft_spark.operators.pip import pip_join
from crankshaft_spark.plans.checkpoint import StageRunner
from crankshaft_spark.sources.admin import admin_polygons, pip_oracle_sql
from crankshaft_spark.sources.webpages import (
    WEBPAGES_SQL,
    extract_text,
    synth_webpages,
)

PIP_CELL = 4.0     # resolution of the cell->polygon index
AGG_CELL = 2.0     # resolution of the hotspot rollup grid
Z_HOT = 1.959963984540054  # two-sided 5% normal critical value

_QUEEN_OFFSETS = [
    dx * CELL_M + dy
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dx, dy) != (0, 0)
]


def queen_cell_edges(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """(id, nbr) queen-contiguity edges between *occupied* grid cells.

    Pure built-ins: explode a constant 8-offset array, semi-join back to the
    cell set.  Replaces the reference's ``ST_Touches`` polygon contiguity
    (pysal_utils.py:164-190) for the regular-grid case.
    """
    occupied = cells.select(F.col(cell_col).alias("nbr")).distinct()
    cand = (
        cells.select(F.col(cell_col).alias("id"))
        .distinct()
        .withColumn(
            "nbr",
            F.explode(F.array(*[F.col("id") + F.lit(o) for o in _QUEEN_OFFSETS])),
        )
    )
    return cand.join(occupied, "nbr").select("id", "nbr")


def quality_features(pages: DataFrame) -> DataFrame:
    """Language-model-style quality screen as pure column math (alpha
    ratio), kept in codegen.  Deliberately minimal: nothing downstream
    consumes a token count, and the full token/quality scoring surface
    (no split materialization, oracle-mirrored) lives in
    operators/text.py — don't re-derive it here.
    """
    txt = F.col("extracted_text")
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    return pages.withColumn(
        "quality",
        (n_alpha.cast("double") / F.greatest(F.length(txt), F.lit(1))),
    )


def hotspot_pipeline(
    spark: SparkSession,
    sf_dir: str,
    runner: StageRunner | None = None,
    pages: DataFrame | None = None,
    pages_token: str = "",
) -> DataFrame:
    """End-to-end: crawl table -> per-cell Gi* hotspot classification.

    Returns (cell, n_pages, n_hosts, avg_quality, z_score, p_value, label)
    with label in {hot, cold, none} at the 5% two-sided level.  An
    occupied cell with NO occupied queen-neighbor (isolated cluster)
    still gets its rollup row, with NULL z_score/p_value and label
    'none' — Gi* is undefined at zero neighbors, but dropping the cell
    (the pre-r3-final behavior) silently lost its page counts.
    ``pages`` overrides the input table (e.g. a multiplied bench table
    or a real Iceberg scan); default is the sf_dir synthesis.
    """
    r = runner or StageRunner(spark, None)
    # pages_token identifies any `pages` override (input path, multiplier);
    # without it a checkpointed rerun with different input would silently
    # resume the stale materialized pages stage
    token = f"{sf_dir}:{PIP_CELL}:{AGG_CELL}:{pages_token}"

    src = pages
    pages = r.stage(
        "pages",
        (lambda: src) if src is not None
        else (lambda: synth_webpages(spark, sf_dir)),
        token,
    )
    feats = r.stage(
        "features",
        lambda: quality_features(extract_text(pages)).select(
            "page_id", "host_id", "lon", "lat", "quality"
        ),
        token,
    )
    assigned = r.stage(
        "pip",
        lambda: pip_join(feats, admin_polygons(), cell_size=PIP_CELL),
        token,
    )

    def _cellagg() -> DataFrame:
        c = assigned.withColumn(
            "agg_cell", cell_expr(F.col("lon"), F.col("lat"), AGG_CELL)
        )
        # two-level aggregation: the (cell, host) partial bounds the work any
        # single reducer does on a Zipf-hot host before the final per-cell agg
        per_host = c.groupBy("agg_cell", "host_id").agg(
            F.count(F.lit(1)).alias("np"),
            F.sum("quality").alias("qs"),
        )
        return per_host.groupBy("agg_cell").agg(
            F.sum("np").alias("n_pages"),
            F.count(F.lit(1)).alias("n_hosts"),
            (F.sum("qs") / F.sum("np")).alias("avg_quality"),
        )

    cells = r.stage("cellagg", _cellagg, token)

    def _gistar() -> DataFrame:
        # binary queen adjacency straight into Gi*: getis_gstar applies
        # its own (deg+1) standardization and ignores any weight column,
        # so a row_standardize here would be a misleading no-op
        edges = queen_cell_edges(cells, "agg_cell")
        vals = cells.select(
            F.col("agg_cell").alias("id"), F.col("n_pages").cast("double").alias("value")
        )
        g = getis_gstar(vals, edges)
        return (
            cells.join(g, cells.agg_cell == g.id, "left")
            .select(
                F.col("agg_cell").alias("cell"),
                "n_pages", "n_hosts",
                F.round("avg_quality", 6).alias("avg_quality"),
                F.round("z_score", 6).alias("z_score"),
                F.round("p_value", 6).alias("p_value"),
                F.when(F.col("z_score") > Z_HOT, "hot")
                .when(F.col("z_score") < -Z_HOT, "cold")
                .otherwise("none")
                .alias("label"),
            )
        )

    return r.stage("gistar", _gistar, token)


def hotspot_oracle_sql() -> str:
    """The entire pipeline as one DuckDB query (driver correctness oracle)."""
    cell = cell_sql("p.lon", "p.lat", AGG_CELL)
    offs = ", ".join(str(o) for o in _QUEEN_OFFSETS)
    return f"""
    WITH pages AS ({WEBPAGES_SQL}),
    feats AS (
      SELECT page_id, host_id, lon, lat,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS quality
      FROM pages
    ),
    pip AS ({pip_oracle_sql("SELECT * FROM pages")}),
    assigned AS (SELECT f.* FROM feats f JOIN pip USING (page_id)),
    cells AS (
      SELECT {cell} AS cell, count(*) AS n_pages,
             count(DISTINCT host_id) AS n_hosts,
             sum(quality) / count(*) AS avg_quality
      FROM assigned p GROUP BY 1
    ),
    edges AS (
      SELECT a.cell AS id, a.cell + o.o AS nbr
      FROM cells a JOIN (SELECT unnest([{offs}]) AS o) o ON true
      JOIN cells b ON b.cell = a.cell + o.o
    ),
    deg AS (SELECT id, count(*) AS deg FROM edges GROUP BY id),
    nbrsum AS (
      SELECT e.id, sum(c.n_pages) AS s
      FROM edges e JOIN cells c ON e.nbr = c.cell GROUP BY e.id
    ),
    tot AS (
      SELECT sum(CAST(n_pages AS DOUBLE)) AS ysum,
             sum(CAST(n_pages AS DOUBLE) * n_pages) AS y2sum,
             count(*) AS n
      FROM cells
    ),
    z AS (
      SELECT c.cell, c.n_pages, c.n_hosts, c.avg_quality,
             ((ns.s + c.n_pages) / ((d.deg + 1) * t.ysum)
              - (d.deg * ((t.ysum - c.n_pages) / (t.n - 1)) + c.n_pages)
                / ((d.deg + 1) * t.ysum))
             / sqrt(
                 d.deg
                 * ((t.y2sum - CAST(c.n_pages AS DOUBLE) * c.n_pages) / (t.n - 1)
                    - ((t.ysum - c.n_pages) / (t.n - 1))
                      * ((t.ysum - c.n_pages) / (t.n - 1)))
                 * (t.n - 1 - d.deg) / (t.n - 2)
                 / (((d.deg + 1) * t.ysum) * ((d.deg + 1) * t.ysum))
               ) AS zs
      FROM cells c LEFT JOIN deg d ON c.cell = d.id
      LEFT JOIN nbrsum ns ON c.cell = ns.id, tot t
    )
    SELECT cell, n_pages, n_hosts, round(avg_quality, 6) AS avg_quality,
           round(zs, 6) AS z_score,
           CASE WHEN zs > {Z_HOT!r} THEN 'hot'
                WHEN zs < -{Z_HOT!r} THEN 'cold'
                ELSE 'none' END AS label
    FROM z
    """
