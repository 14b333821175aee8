"""Web-page pipeline tests: byte-identity, PIP vs brute force, resume,
and cross-parallelism determinism (the sandbox stand-in for the north
rule's N vs 4N executor row-identity requirement)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators.pip import _ray_cast, pip_join
from crankshaft_spark.plans.checkpoint import StageRunner
from crankshaft_spark.plans.pipeline import hotspot_pipeline, queen_cell_edges
from crankshaft_spark.sources.admin import admin_polygons
from crankshaft_spark.sources.webpages import extract_text, synth_webpages

SF = "/root/testdata/sf0.001"


def test_extract_text_byte_identical(spark):
    pages = synth_webpages(spark, SF)
    bad = (
        extract_text(pages)
        .filter(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert bad == 0
    # html really is escaped markup, not the raw text
    row = pages.select("html", "text").first()
    assert b"<article>" in row["html"]


def test_webpages_deterministic_across_parallelism(spark):
    a = synth_webpages(spark, SF).repartition(16)
    b = synth_webpages(spark, SF).coalesce(1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_webpages_zipf_skew_profile(spark):
    """skew='zipf' is geometric (host 0 ≈ 50%, host 1 ≈ 25%) and stays
    closed-form deterministic across parallelism — the scalebench skew
    stress path (BASELINE.md §4 Zipf row)."""
    a = synth_webpages(spark, SF, skew="zipf").repartition(16)
    b = synth_webpages(spark, SF, skew="zipf").coalesce(1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    tot = a.count()
    top = {r["host_id"]: r["count"]
           for r in a.groupBy("host_id").count().collect()}
    assert top[0] / tot == pytest.approx(0.5, abs=0.08)
    assert top[1] / tot == pytest.approx(0.25, abs=0.06)
    with pytest.raises(ValueError):
        synth_webpages(spark, SF, skew="nope")


def test_pip_join_matches_brute_force(spark):
    polys = admin_polygons()
    pages = synth_webpages(spark, SF).select("page_id", "lon", "lat")
    got = {
        (r.page_id, r.poly_id)
        for r in pip_join(pages, polys).select("page_id", "poly_id").collect()
    }
    pts = pages.collect()
    lon = np.array([p.lon for p in pts])
    lat = np.array([p.lat for p in pts])
    expect = set()
    for pid, ring in polys:
        inside = _ray_cast(lon, lat, np.asarray(ring))
        for i in np.nonzero(inside)[0]:
            expect.add((pts[int(i)].page_id, pid))
    assert got == expect
    # plane partition: every page in exactly one polygon
    assert len(got) == len(pts)


def test_queen_cell_edges_symmetric(spark):
    cells = spark.createDataFrame(
        [(0,), (1,), (4294967296,), (99 * 4294967296 + 5,)], "cell long"
    )
    e = {(r.id, r.nbr) for r in queen_cell_edges(cells).collect()}
    assert (0, 1) in e and (1, 0) in e
    assert (0, 4294967296) in e and (4294967296, 1) in e
    assert all((b, a) in e for a, b in e)
    assert not any((99 * 4294967296 + 5) in p for p in e)


def test_hotspot_pipeline_resume(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    r1 = StageRunner(spark, base)
    out1 = hotspot_pipeline(spark, SF, runner=r1).collect()
    assert all(not m["resumed"] for m in r1.metrics.values())
    assert all(m["total_rows"] > 0 for m in r1.metrics.values())
    assert all("partitions" in m for m in r1.metrics.values())
    r2 = StageRunner(spark, base)
    out2 = hotspot_pipeline(spark, SF, runner=r2).collect()
    assert all(m["resumed"] for m in r2.metrics.values())
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


@pytest.mark.parametrize("parts", [1, 16])
def test_hotspot_labels_stable(spark, parts):
    pages = synth_webpages(spark, SF).repartition(parts)
    res = hotspot_pipeline(spark, SF, pages=pages)
    rows = {r.cell: (r.n_pages, r.label) for r in res.collect()}
    assert len(rows) > 50
    assert any(v[1] == "hot" for v in rows.values())


def _has_iceberg_catalog(spark):
    """True when the session has an Iceberg catalog configured (the
    in-sandbox container ships no iceberg-spark runtime, so the writeTo
    path only runs where a deployment provides one)."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.")
               and "iceberg" in str(v).lower() for k, v in confs)


def test_stage_runner_iceberg_flag(spark, tmp_path):
    """table_format='iceberg' selects the writeTo code path (config-gated:
    executes only under a configured Iceberg catalog); bad formats are
    rejected up front; the parquet default is untouched."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="table_format"):
        StageRunner(spark, str(tmp_path), table_format="delta")

    # parquet default still materializes + resumes
    r = StageRunner(spark, str(tmp_path / "pq"))
    df = r.stage("s1", lambda: spark.range(5).toDF("id"), token="t")
    assert df.count() == 5
    assert r.metrics["s1"]["resumed"] is False

    if not _has_iceberg_catalog(spark):
        _pytest.skip("no Iceberg catalog configured in this session "
                     "(sandbox has no iceberg-spark runtime)")
    ri = StageRunner(spark, "local.db", table_format="iceberg")
    out = ri.stage("s1", lambda: spark.range(5).toDF("id"), token="t")
    assert out.count() == 5
    ri2 = StageRunner(spark, "local.db", table_format="iceberg")
    out2 = ri2.stage("s1", lambda: spark.range(99).toDF("id"), token="t")
    assert out2.count() == 5  # resumed, not recomputed
    assert ri2.metrics["s1"]["resumed"] is True
