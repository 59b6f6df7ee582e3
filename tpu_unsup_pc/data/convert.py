"""Dataset conversion CLI: npz shards / synthetic -> the native TUB format.

    python -m tpu_unsup_pc.data.convert --from-synthetic --out train.tub \
        --num-models 512 --preset c1_synth
    python -m tpu_unsup_pc.data.convert --from-npz data/shapenet \
        --split train --out train.tub --preset c1_chairs_gt
"""

from __future__ import annotations

import argparse

import numpy as np

from tpu_unsup_pc.configs import presets
from tpu_unsup_pc.data.native_loader import write_tub_dataset
from tpu_unsup_pc.data.shapenet import ShapeNetViews
from tpu_unsup_pc.data.synthetic import SyntheticShapes


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="c1_synth", choices=presets.names())
    p.add_argument("--out", required=True)
    p.add_argument("--from-synthetic", action="store_true")
    p.add_argument("--from-npz", default=None, help="npz data_dir")
    p.add_argument("--split", default="train")
    p.add_argument("--num-models", type=int, default=256)
    args = p.parse_args(argv)
    cfg = presets.get(args.preset)

    if args.from_synthetic:
        ds = SyntheticShapes(cfg, split=args.split,
                             num_models=args.num_models)
        write_tub_dataset(args.out, ds.images, ds.masks, ds.azimuth,
                          ds.elevation,
                          distance=ds.distance if ds.has_distance else None)
        # keep GT clouds alongside for chamfer eval
        np.savez_compressed(args.out + ".gt.npz", gt_points=ds.gt_points)
    elif args.from_npz:
        cfg = cfg.replace(dataset="shapenet", data_dir=args.from_npz)
        loader = ShapeNetViews(cfg, split=args.split)
        n = min(len(loader), args.num_models) if args.num_models else \
            len(loader)
        models = [loader._load_model(loader.models[i]) for i in range(n)]
        write_tub_dataset(
            args.out,
            np.stack([m["image"] for m in models]),
            np.stack([m["mask"] for m in models]),
            np.stack([m["azimuth"] for m in models]),
            np.stack([m["elevation"] for m in models]))
    else:
        raise SystemExit("pass --from-synthetic or --from-npz DIR")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
