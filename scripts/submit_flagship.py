"""Cluster-submittable flagship driver — the ``ray job submit`` entry
point the north rule names:

    ray job submit --working-dir . -- \
        python scripts/submit_flagship.py \
            --images-dir /data/images --out /data/flagship_out

On a cluster the Ray job runtime provides RAY_ADDRESS and the script
attaches to it; standalone it falls back to a local session, so the
same file is the single-node smoke test:

    PYTHONPATH=. python scripts/submit_flagship.py --synthetic 40000

The pipeline (georay.pipeline.run_flagship) is checkpoint-resumable:
each input shard writes its own ``assign/shard=<name>/`` partition and
a lineage record (rows, bytes, wall time) in the manifest — re-running
after a failure skips finished shards. Output histograms are exact, so
two runs at different cluster sizes must produce identical checksums
(how the N vs 4N scaling run is validated)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", default=None,
                    help="directory of image+caption parquet shards")
    ap.add_argument("--out", default="/tmp/georay_flagship_out")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic image rows when no "
                         "--images-dir is given")
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone the preset is "local"
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from georay import generate, pipeline

    images_dir = args.images_dir
    if images_dir is None:
        n = args.synthetic or 40_000
        images_dir = f"/tmp/georay_submit_images_{n}"
        marker = os.path.join(images_dir, "_DONE")
        if not os.path.exists(marker):
            generate.write_images_dataset(
                images_dir, n, seed=42, rows_per_file=max(1000, n // 16)
            )
            open(marker, "w").write("ok")

    polygons = generate.make_polygons_table(500, seed=43)
    t0 = time.perf_counter()
    metrics = pipeline.run_flagship(
        images_dir, args.out, polygons,
        zoom=args.zoom, resume=not args.no_resume,
    )
    metrics["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
