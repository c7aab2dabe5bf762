"""CLI — the reference's Gradio tabs as commands.

    python -m dataset_batch_processor_spark prepare  IN OUT [--tile-size N] [--overlap R]
    python -m dataset_batch_processor_spark tile     IN OUT [--tile-size N] [--overlap R]
                                                     [--padding N] [--num-tiles N]
                                                     [--pad-option OPT] [--caption C]
                                                     [--sidecars] [--zip]
    python -m dataset_batch_processor_spark convert  IN OUT [--to FMT]
    python -m dataset_batch_processor_spark merge    IN OUT_FILE
    python -m dataset_batch_processor_spark split    IN OUT [--records-per-file N]
    python -m dataset_batch_processor_spark dedup    IN OUT_FILE
    python -m dataset_batch_processor_spark report   SF_DIR

Each command prints one JSON metrics line (the structured status
string). Exit code 0 on success.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dataset_batch_processor_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    prep = sub.add_parser("prepare", help="route incompatible images + crop reports")
    prep.add_argument("in_dir")
    prep.add_argument("out_dir")
    prep.add_argument("--tile-size", type=int, default=1024)
    prep.add_argument("--overlap", type=float, default=0.5)

    tile = sub.add_parser("tile", help="tile a folder of images")
    tile.add_argument("in_dir")
    tile.add_argument("out_dir")
    tile.add_argument("--tile-size", type=int, default=1024)
    tile.add_argument("--overlap", type=float, default=0.5)
    tile.add_argument("--padding", type=int, default=0)
    tile.add_argument("--num-tiles", type=int, default=0)
    tile.add_argument(
        "--pad-option",
        choices=["None", "Auto Adjust", "Extend Edges", "Pad to Square"],
        default="None",
    )
    tile.add_argument("--save-format", choices=["PNG", "JPG", "NONE"], default="PNG")
    tile.add_argument("--caption", default=None)
    tile.add_argument("--sidecars", action="store_true")
    tile.add_argument("--zip", action="store_true", dest="make_zip")

    conv = sub.add_parser("convert", help="convert image formats")
    conv.add_argument("in_dir")
    conv.add_argument("out_dir")
    conv.add_argument("--to", dest="target_fmt", default="rawrgb")

    merge = sub.add_parser("merge", help="merge text files (ordered)")
    merge.add_argument("in_dir")
    merge.add_argument("out_file")

    split = sub.add_parser("split", help="split text into chunks")
    split.add_argument("in_path")
    split.add_argument("out_dir")
    split.add_argument("--records-per-file", type=int, default=50)

    dedup = sub.add_parser("dedup", help="order-preserving line dedup")
    dedup.add_argument("in_path")
    dedup.add_argument("out_file")

    exp = sub.add_parser("export", help="score/filter/pack + atomic publish")
    exp.add_argument("sf_dir")
    exp.add_argument("out_dir")
    exp.add_argument("--drop-worst-pct", type=int, default=10)

    rep = sub.add_parser(
        "report", help="corpus curation funnel (per-stage attrition)"
    )
    rep.add_argument("sf_dir")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from . import pipeline
    from .operators.tiling import TileSpec
    from .session import get_spark

    spark = get_spark("dbp-cli")
    if args.cmd == "prepare":
        res = pipeline.prepare_images(
            spark, args.in_dir, args.out_dir, args.tile_size, args.overlap
        )
    elif args.cmd == "tile":
        spec = TileSpec(
            tile_size=args.tile_size,
            overlap_ratio=args.overlap,
            padding=args.padding,
            num_tiles=args.num_tiles,
            pad_option=args.pad_option,
            save_format=args.save_format,
            caption=args.caption,
        )
        res = pipeline.tile_folder(
            spark, args.in_dir, args.out_dir, spec,
            export_sidecars=args.sidecars, make_zip=args.make_zip,
        )
    elif args.cmd == "convert":
        res = pipeline.convert_images(
            spark, args.in_dir, args.out_dir, args.target_fmt
        )
    elif args.cmd == "merge":
        res = pipeline.merge_text_folder(spark, args.in_dir, args.out_file)
    elif args.cmd == "split":
        res = pipeline.split_text_file(
            spark, args.in_path, args.out_dir, args.records_per_file
        )
    elif args.cmd == "dedup":
        res = pipeline.dedup_text_file(spark, args.in_path, args.out_file)
    elif args.cmd == "export":
        res = pipeline.export_training_data(
            spark, args.sf_dir, args.out_dir,
            drop_worst_pct=args.drop_worst_pct,
        )
    elif args.cmd == "report":
        from .operators import curationfunnel

        rows = [
            r.asDict()
            for r in curationfunnel._q_funnel(spark, args.sf_dir).collect()
        ]
        print(json.dumps({"cmd": "report", "funnel": rows}))
        return 0
    else:  # pragma: no cover
        raise SystemExit(2)
    print(json.dumps({"cmd": args.cmd, "metrics": res.metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
