"""As-of dated grid catalog: bracket selection + linear blend
(pj_gridcatalog.c semantics)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from proj_spark.operators.gridcatalog import (
    CatalogEntry,
    GridCatalog,
    apply_catalog_shift,
    catalog_shift_udf,
    parse_date,
)
from proj_spark.operators.gridshift import apply_gridshift, make_synthetic_grid


@pytest.fixture()
def catalog():
    g1 = make_synthetic_grid("g1990", amp_arcsec=1.0)
    g2 = make_synthetic_grid("g2000", amp_arcsec=3.0)
    return GridCatalog("syn", [CatalogEntry(2000.0, g2), CatalogEntry(1990.0, g1)])


def test_entries_sorted_and_dates(catalog):
    assert [e.date for e in catalog.entries] == [1990.0, 2000.0]


def test_parse_date():
    assert parse_date("1998.25") == 1998.25
    assert 1998.4 < parse_date("1998-06-15") < 1998.5


def test_before_first_and_after_last_use_edge_grids(catalog):
    lam = np.radians(np.array([-100.0]))
    phi = np.radians(np.array([40.0]))
    early = apply_catalog_shift(catalog, lam, phi, 1980.0)
    g1 = apply_gridshift([catalog.entries[0].grid], False, lam, phi)
    assert early[0][0] == g1[0][0] and early[1][0] == g1[1][0]
    late = apply_catalog_shift(catalog, lam, phi, 2015.0)
    g2 = apply_gridshift([catalog.entries[1].grid], False, lam, phi)
    assert late[0][0] == g2[0][0] and late[1][0] == g2[1][0]


def test_midpoint_blends_linearly(catalog):
    lam = np.radians(np.array([-100.0, -90.0]))
    phi = np.radians(np.array([40.0, 35.0]))
    mid = apply_catalog_shift(catalog, lam, phi, 1995.0)
    b = apply_gridshift([catalog.entries[0].grid], False, lam, phi)
    a = apply_gridshift([catalog.entries[1].grid], False, lam, phi)
    np.testing.assert_allclose(mid[0], 0.5 * (b[0] + a[0]), rtol=0, atol=1e-15)
    np.testing.assert_allclose(mid[1], 0.5 * (b[1] + a[1]), rtol=0, atol=1e-15)


def test_catalog_udf_on_spark(spark, catalog):
    df = spark.createDataFrame(
        [
            Row(lon=-100.0, lat=40.0, epoch=1990.0),
            Row(lon=-100.0, lat=40.0, epoch=1995.0),
            Row(lon=-100.0, lat=40.0, epoch=2000.0),
        ]
    )
    udf = catalog_shift_udf(catalog)
    out = df.withColumn("s", udf("lon", "lat", "epoch")).select(
        "epoch", F.col("s.lon").alias("slon")
    ).orderBy("epoch").collect()
    # shift magnitude grows with amp (1" grid at 1990, 3" at 2000):
    d = [abs(r.slon + 100.0) for r in out]
    assert d[0] < d[1] < d[2]
    # 1995 is the exact midpoint of the two shifts
    assert d[1] == pytest.approx(0.5 * (d[0] + d[2]), rel=1e-9)


def test_read_catalog_csv(tmp_path):
    from proj_spark.operators.gridcatalog import read_catalog_csv
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid
    from proj_spark.sources.grids import write_ctable2

    register_grid("csvcat_mem", make_synthetic_grid("csvcat_mem", amp_arcsec=1.0))
    gfile = str(tmp_path / "epoch2000.ct2")
    write_ctable2(make_synthetic_grid("epoch2000", amp_arcsec=3.0), gfile)
    cat_file = tmp_path / "cat.csv"
    cat_file.write_text(f"# dated grids\ncsvcat_mem,1990.0\n{gfile},2000-01-01\n")
    cat = read_catalog_csv(str(cat_file))
    assert [round(e.date, 2) for e in cat.entries] == [1990.0, 2000.0]
    assert cat.entries[0].grid.grid_id == "csvcat_mem"
    assert cat.entries[1].grid.grid_id == "epoch2000"
