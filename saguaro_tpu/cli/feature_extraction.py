"""CLI: classical feature extraction over a (plate x time) job grid —
the EC2-fleet replacement (reference Feature_extraction_opt.py).

The reference hardcodes its fleet/job config in module constants
(:50-67); here the same job grid is driven by flags, and each job runs on
the local TPU controller (segmentation + CP-equivalent measurements)
instead of a CellProfiler Docker container.
"""

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Run CP-equivalent feature extraction for each "
        "(plate, time) job, writing Image/Nuclei/Cells/Cytoplasm.csv "
        "under <output>/<plate>/<time>/."
    )
    parser.add_argument("--bucket_name", required=True, help="Bucket with images + LoadData CSVs.")
    parser.add_argument("--base_output_path", required=True, help="Output bucket/prefix.")
    parser.add_argument("--plates", nargs="+", required=True, help="Plate tokens, e.g. P01 P02.")
    parser.add_argument("--times", nargs="+", default=["6", "12", "24", "48"],
                        help="Timepoints (hours).")
    parser.add_argument("--channels", nargs="+", required=True, help="Channel names.")
    parser.add_argument("--image_path_template", required=True,
                        help="Per-job image dir, e.g. '{folder}/{time}h_{plate}/Image'.")
    parser.add_argument("--load_data_template", required=True,
                        help="Per-job LoadData key, e.g. 'load_data_{plate}_{time}_illum.csv'.")
    parser.add_argument("--diameter", type=float, default=100.0)
    parser.add_argument("--max_cells", type=int, default=512)
    parser.add_argument("--devices", type=int, default=None,
                        help="Mesh size: shard segmentation + measurement batches "
                        "over this many chips (default: every visible device; "
                        "1 = single-device).")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from saguaro_tpu.parallel.mesh import default_mesh
    from saguaro_tpu.pipeline.feature_extraction import run_batch_processing
    from saguaro_tpu.pipeline.features import FeatureConfig
    from saguaro_tpu.pipeline.segment_embed import SegmentEmbedConfig, SegmentEmbedEngine

    mesh = default_mesh(args.devices)
    engine = SegmentEmbedEngine(
        SegmentEmbedConfig(channels=list(args.channels), diameter=args.diameter,
                           max_cells=args.max_cells),
        mesh=mesh,
    )
    run_batch_processing(
        bucket_name=args.bucket_name,
        base_output_path=args.base_output_path,
        plates=args.plates,
        times=args.times,
        channels=list(args.channels),
        image_path_for_job=lambda p, t: args.image_path_template.format(plate=p, time=t),
        load_data_key_for_job=lambda p, t: args.load_data_template.format(plate=p, time=t),
        segmenter=engine,  # exposes segment_batch: chunks segment as ONE program
        feature_cfg=FeatureConfig(channels=tuple(args.channels), max_cells=args.max_cells),
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
