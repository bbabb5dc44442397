"""Time-dependent (as-of) datum shift via a dated grid catalog.

Behavioral reference: pj_gc_apply_gridshift
(/root/reference/src/pj_gridcatalog.c:99-281): for a point with an
observation date, find the last grid dated <= date ("before") and the
first dated > date ("after"); shift with each and blend linearly by
the date fraction (:121-167).  Catalog entries also carry a region
bbox; the first containing entry per side wins (catalog order).

Spark mapping (SURVEY.md §2.3 last row): catalogs are tiny ->
resolved driver-side into (date, grid) lists and closed over by the
pandas UDF; the as-of selection is a per-row numpy searchsorted, the
blend a vectorized lerp.  Dates are fractional years like the
reference's datum_date (pj_gc_parsedate).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from .gridshift import ShiftGrid, apply_gridshift


@dataclass
class CatalogEntry:
    date: float  # fractional year, e.g. 1998.25
    grid: ShiftGrid


@dataclass
class GridCatalog:
    name: str
    entries: list[CatalogEntry] = field(default_factory=list)

    def __post_init__(self):
        self.entries.sort(key=lambda en: en.date)

    def dates(self) -> np.ndarray:
        return np.array([en.date for en in self.entries])


def parse_date(s: str) -> float:
    """'1998.365' | '1998-07-01' -> fractional year (pj_gc_parsedate
    semantics: year + day_fraction)."""
    if "-" in s:
        y, mo, d = (int(t) for t in s.split("-"))
        day_of_year = (mo - 1) * 30.5 + d  # reference uses coarse months
        return y + day_of_year / 365.25
    return float(s)


def apply_catalog_shift(
    catalog: GridCatalog,
    lam,
    phi,
    date,
    inverse: bool = False,
):
    """Apply the dated shift for per-point dates (fractional years).

    Points dated before the first entry use the first grid alone;
    after the last, the last grid alone; otherwise the two bracketing
    grids blended by (date - d0)/(d1 - d0) — the mix logic of
    pj_gridcatalog.c:121-167.
    """
    lam = np.asarray(lam, np.float64)
    phi = np.asarray(phi, np.float64)
    date = np.asarray(date, np.float64)
    if date.shape == ():
        date = np.full_like(lam, float(date))
    ds = catalog.dates()
    if len(ds) == 0:
        return lam, phi

    # shift through every entry once (catalogs are tiny; vectorized
    # over points) then gather per point by bracket index
    shifted = [apply_gridshift([en.grid], inverse, lam, phi) for en in catalog.entries]
    lams = np.stack([s[0] for s in shifted])  # [n_entries, n_pts]
    phis = np.stack([s[1] for s in shifted])

    idx_after = np.searchsorted(ds, date, side="right")
    idx_before = np.clip(idx_after - 1, 0, len(ds) - 1)
    idx_after = np.clip(idx_after, 0, len(ds) - 1)
    cols = np.arange(lam.shape[0])
    lam_b = lams[idx_before, cols]
    phi_b = phis[idx_before, cols]
    lam_a = lams[idx_after, cols]
    phi_a = phis[idx_after, cols]
    d0 = ds[idx_before]
    d1 = ds[idx_after]
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(d1 > d0, (date - d0) / np.where(d1 == d0, 1.0, d1 - d0), 0.0)
    w = np.clip(w, 0.0, 1.0)
    return lam_b + (lam_a - lam_b) * w, phi_b + (phi_a - phi_b) * w


def catalog_shift_udf(catalog: GridCatalog, inverse: bool = False):
    """pandas UDF ``(lon_deg, lat_deg, date_fyear) -> struct<lon,lat>``
    applying the as-of catalog shift (degrees at the API boundary)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([StructField("lon", DoubleType()), StructField("lat", DoubleType())])
    d2r = np.pi / 180.0

    @F.pandas_udf(schema)
    def _udf(it: Iterator[Tuple[pd.Series, ...]]) -> Iterator[pd.DataFrame]:
        for b in it:
            lam = b[0].to_numpy(np.float64) * d2r
            phi = b[1].to_numpy(np.float64) * d2r
            date = b[2].to_numpy(np.float64)
            lo, la = apply_catalog_shift(catalog, lam, phi, date, inverse)
            yield pd.DataFrame({"lon": lo / d2r, "lat": la / d2r})

    return _udf


def read_catalog_csv(path: str, grids_by_name: dict | None = None) -> GridCatalog:
    """Load a dated catalog from CSV (pj_gc_reader.c semantics):
    ``grid_name,date[,priority]`` rows, one per entry; grid payloads
    resolve by name against ``grids_by_name`` or the registered-grid
    table, loading grid FILES via sources.grids.open_grid when the
    name looks like a path."""
    import csv
    import os

    from ..operators.gridshift import _GRID_REGISTRY as _GRIDS

    entries = []
    with open(path, newline="") as f:
        name = os.path.splitext(os.path.basename(path))[0]
        for row in csv.reader(f):
            if not row or row[0].lstrip().startswith("#"):
                continue
            gname = row[0].strip()
            date = parse_date(row[1].strip())
            grid = None
            if grids_by_name and gname in grids_by_name:
                grid = grids_by_name[gname]
            elif gname in _GRIDS:
                g = _GRIDS[gname]
                grid = g[0] if isinstance(g, list) else g
            elif os.path.exists(gname):
                from ..sources.grids import open_grid

                loaded = open_grid(gname)
                grid = loaded[0] if isinstance(loaded, list) else None
            if grid is None:
                raise KeyError(f"catalog grid {gname!r} not found")
            entries.append(CatalogEntry(date, grid))
    return GridCatalog(name, entries)
