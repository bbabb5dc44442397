"""Example north-star job for ``spark-submit --py-files``.

    spark-submit --master local[2] \
        --py-files dist/proj_spark.zip \
        tools/example_job.py <sf_dir> <out_path>

Reads the events table, reprojects WGS84 lon/lat to web-mercator,
rolls up z8 tile counts, and writes one JSON line with the row and
tile counts to <out_path>.  ``proj_spark`` is imported from the
--py-files zip (this script deliberately never touches the repo
checkout), proving the deployment artifact is self-contained.
"""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str, out_path: str) -> None:
    spark = SparkSession.builder.appName("proj-spark-example").getOrCreate()
    from proj_spark.functions import expressions as E
    from proj_spark.functions.transform import transform

    # events carry no coordinates; derive a deterministic centroid per
    # event (same synthesis rule as __spark_entry__'s event_tiles query)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        ((F.col("event_id") % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("event_id") % 1600) / 10.0 - 80.0).alias("lat"),
    )
    merc = transform(
        ev, "+proj=latlong +datum=WGS84", "+proj=merc +a=6378137 +es=0", "lon", "lat"
    )
    tiles = (
        ev.select(
            E.tile_x("lon", F.lit(8)).alias("tx"),
            E.tile_y("lat", F.lit(8)).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # +init catalog resolution must work from inside the --py-files zip
    # (bundled proj_spark/data/init/demo, read via importlib.resources)
    merc2 = transform(
        ev, "+proj=latlong +datum=WGS84", "+init=demo:webmerc", "lon", "lat"
    )
    out = {
        "rows": merc.count(),
        "tiles": tiles.count(),
        "x_sum": round(merc.agg(F.sum("x")).collect()[0][0], 3),
        "x_sum_init": round(merc2.agg(F.sum("x")).collect()[0][0], 3),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
