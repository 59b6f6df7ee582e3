from tpu_unsup_pc.data.synthetic import SyntheticShapes  # noqa: F401
from tpu_unsup_pc.data.shapenet import (  # noqa: F401
    ShapeNetViews, write_npz_dataset,
)


def make_dataset(cfg, split: str = "train", **kw):
    """Dataset factory behind the common Iterator[Batch] protocol
    (SURVEY.md §7.1 item 6)."""
    if cfg.dataset == "synthetic":
        return SyntheticShapes(cfg, split=split, **kw)
    if cfg.dataset == "shapenet":
        return ShapeNetViews(cfg, split=split, **kw)
    if cfg.dataset == "tub":  # native mmap loader (data/native_loader.py)
        from tpu_unsup_pc.data.native_loader import TubDataset
        import os
        path = cfg.data_dir if cfg.data_dir.endswith(".tub") else \
            os.path.join(cfg.data_dir, f"{split}.tub")
        return TubDataset(cfg, path, split=split, **kw)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")
