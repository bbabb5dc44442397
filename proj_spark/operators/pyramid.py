"""Raster tile pyramid (COG/overview build): reduce-resolution rollup
of a tile set from zoom z down to z_stop — the standard map-serving /
training-mosaic stage that turns per-image thumbnails into a browsable
raster stack.

Physical shape per level (the 100 TB plan):
- one shuffle keyed on the PARENT tile id; every group holds at most 4
  child tiles (the 2x2 quadrant), so group size is a hard constant —
  no skew is possible regardless of the data distribution;
- the shuffled payload is the (small, fixed-size) tile raster, and each
  level's row count shrinks 4x, so the total bytes moved across ALL
  levels is bounded by 4/3 of the base level;
- each built level is persisted before the next consumes it (at real
  scale each level is a table write; `persist` is the local analog) so
  a k-level pyramid scans the base exactly once.

Downsampling is the exact integer mean of each 2x2 block
(``(a+b+c+d) // 4`` in uint16), so results are bit-reproducible across
engines and partitionings — the property the DuckDB oracle relies on.
Missing children leave their quadrant zero (documented empty-tile
convention, matching slippy-map transparent tiles).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_LEVEL_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("bytes", BinaryType()),
    ]
)

_PYRAMID_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("bytes", BinaryType()),
    ]
)


def downsample2x(canvas: np.ndarray) -> np.ndarray:
    """Exact integer 2x2 box filter: uint8 HxWx3 -> (H/2)x(W/2)x3.

    uint16 accumulate -> floor-divide by 4; bit-reproducible anywhere.
    """
    c = canvas.astype(np.uint16)
    return (
        (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2]) // 4
    ).astype(np.uint8)


def reduce_level(tiles: DataFrame, tile_px: int, fmt: str = "png") -> DataFrame:
    """One pyramid step: (x, y, bytes) at zoom z -> (x, y, bytes) at
    z-1.  Groups by parent id (x>>1, y>>1); each group is <= 4 rows."""
    from proj_spark.sources.images import decode_image, encode_image

    tp = tile_px

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        px_, py_ = int(key[0]), int(key[1])
        canvas = np.zeros((2 * tp, 2 * tp, 3), np.uint8)
        for x, y, raw in zip(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(), pdf["bytes"].to_numpy()
        ):
            qx, qy = int(x) & 1, int(y) & 1
            canvas[qy * tp : (qy + 1) * tp, qx * tp : (qx + 1) * tp] = decode_image(
                bytes(raw), fmt
            )
        small = downsample2x(canvas)
        return pd.DataFrame(
            [[px_, py_, encode_image(small, fmt)]], columns=["x", "y", "bytes"]
        )

    keyed = tiles.groupBy(
        F.shiftright(F.col("x"), 1).alias("_px"),
        F.shiftright(F.col("y"), 1).alias("_py"),
    )
    return keyed.applyInPandas(build, _LEVEL_SCHEMA)


def build_pyramid(
    tiles: DataFrame,
    z_from: int,
    z_to: int,
    tile_px: int,
    fmt: str = "png",
) -> DataFrame:
    """All levels z_from (the input) down to z_to inclusive, as one
    DataFrame (z, x, y, bytes).  Each intermediate level is persisted
    so the base is scanned once (at real scale: one table per level).
    """
    if z_to > z_from:
        raise ValueError(f"z_to ({z_to}) must be <= z_from ({z_from})")
    if z_from - z_to > 24:
        raise ValueError("pyramid deeper than 24 levels — tile ids would overflow")
    cur = tiles.select("x", "y", "bytes")
    out = cur.select(F.lit(z_from).cast("int").alias("z"), "x", "y", "bytes")
    for z in range(z_from - 1, z_to - 1, -1):
        cur = reduce_level(cur, tile_px, fmt).persist()
        out = out.unionByName(
            cur.select(F.lit(z).cast("int").alias("z"), "x", "y", "bytes")
        )
    return out


def pyramid_checksums(pyr: DataFrame, fmt: str = "png") -> DataFrame:
    """(z, x, y, bytes) -> (z, x, y, checksum): exact integer pixel sum
    per tile — the cross-engine-comparable fingerprint of the raster."""
    from proj_spark.sources.images import decode_image

    schema = StructType(
        [
            StructField("z", IntegerType()),
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("checksum", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for z, x, y, raw in zip(
                b["z"].to_numpy(),
                b["x"].to_numpy(),
                b["y"].to_numpy(),
                b["bytes"].to_numpy(),
            ):
                px = decode_image(bytes(raw), fmt)
                out.append((int(z), int(x), int(y), int(px.astype(np.int64).sum())))
            yield pd.DataFrame(out, columns=["z", "x", "y", "checksum"])

    return pyr.mapInPandas(run, schema)
