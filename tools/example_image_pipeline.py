"""End-to-end IMAGE curation pipeline — the multimodal funnel.

The image-side twin of tools/example_pipeline.py, composing the image
lane's operators the way a 10^12-row ingest run would:

  images: payload verification (decode + PSNR>=40 + caption equality)
          -> quality gate (blur variance / entropy / contrast floors)
          -> phash near-dup pairs -> connected components
          -> canonical-image selection
          -> per-tile WebDataset thumbnail export (+ manifest)

Every stage is the scale-shaped operator (banded pair generation,
id-only shuffles, payload attached last), not a toy.

Usage:  python tools/example_image_pipeline.py [n_images] [out_dir]
Prints one JSON summary line; exits nonzero on any invariant breach.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, n_images: int, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from proj_spark.operators.components import dedup_groups
    from proj_spark.operators.multimodal import exact_phash_pairs, image_quality
    from proj_spark.operators.tilesink import tile_thumbnails
    from proj_spark.sources.images import (
        generate_images,
        verify_payloads,
        with_centroids,
    )

    t0 = time.time()
    funnel: dict[str, int] = {}
    imgs = with_centroids(generate_images(spark, n_images)).cache()
    funnel["ingest"] = imgs.count()

    # 1. payload invariants: decode, PSNR gate, caption equality
    ok_ids = (
        verify_payloads(imgs)
        .where(F.col("caption_ok") & F.col("pixels_ok"))
        .select("image_id")
    )
    verified = imgs.join(ok_ids, "image_id")
    funnel["payload_verified"] = verified.count()

    # 2. quality gate (floors tuned to the synthetic fixture's range)
    q = image_quality(verified)
    keep_ids = q.where(
        (F.col("blur_var") > 100.0)
        & (F.col("entropy_bits") > 4.0)
        & (F.col("contrast") > 10.0)
    ).select("image_id")
    gated = verified.join(keep_ids, "image_id").cache()
    funnel["quality_gated"] = gated.count()

    # 3. near-dup clustering on the perceptual hash (ids only shuffle).
    # The synthetic fixture shares one gradient base across all images
    # (only the seeded noise differs), so it is a PERCEPTUAL near-dup
    # corpus by construction — ~19 distinct phashes per 400 images, and
    # any hamming radius >= 1 collapses everything into one component
    # (the thumbnail-farm degenerate case the pair_cap guards against).
    # Cluster at hamming 0 (exact perceptual duplicates) so the funnel
    # stays readable; a diverse production corpus would use 2-6 via
    # phash_dedup_pairs.  At radius 0 the star generator is exact and
    # O(n): the fixture's shared gradient base makes phash groups
    # thousands strong at 20k+ images, and clique pairs within capped
    # buckets (pair_cap^2/2 per bucket) OOM'd the 20k run.
    pairs = exact_phash_pairs(gated.select("image_id", "phash"))
    groups = dedup_groups(
        gated.select("image_id"), pairs, id_col="image_id", a="id_a", b="id_b"
    )
    canonical = gated.join(
        groups.where(F.col("is_canonical")).select("image_id"), "image_id"
    )
    funnel["canonical"] = canonical.count()

    # 4. per-tile thumbnail export + manifest
    manifest = tile_thumbnails(canonical, out_dir, zoom=6, thumb=8).cache()
    funnel["tiles_written"] = manifest.count()
    exported = manifest.agg(F.sum("n")).collect()[0][0]
    funnel["thumbnails_exported"] = int(exported or 0)

    # invariants: monotone funnel; export count == canonical count;
    # shards exist on disk for every manifest row
    assert (
        funnel["ingest"]
        >= funnel["payload_verified"]
        >= funnel["quality_gated"]
        >= funnel["canonical"]
        == funnel["thumbnails_exported"]
    ), funnel
    for r in manifest.collect():
        assert any(
            f.endswith(".tar") for f in os.listdir(r.shard_dir)
        ), r.shard_dir
    return {"funnel": funnel, "wall_sec": round(time.time() - t0, 3)}


def main() -> None:
    from pyspark.sql import SparkSession

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="img_funnel_")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # local mode: driver heap IS the executor heap; the fixture's
        # degenerate phash groups (one shared gradient base) make the
        # pair join clique-shaped, so give it real memory
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .appName("proj-spark-image-funnel")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_line = run(spark, n, out)
    out_line["out_dir"] = out
    print(json.dumps(out_line))
    spark.stop()


if __name__ == "__main__":
    main()
