"""LMDB corpus creation (port of utils/lmdb_util.py + create_lmdb.py).

Packs an image folder into an LMDB shard with the BasicSR meta layout:
keys are basenames (no extension), values are encoded image bytes, plus a
``meta_info.txt`` of "key (HxWxC) compression_level" lines. Uses the
``lmdb`` package when importable, else the bundled dependency-free codec
(data/lmdb_codec.py) writing the same on-disk format."""

from __future__ import annotations

import os
import os.path as osp

from ..utils.image_io import list_images


def make_lmdb_from_folder(folder: str, lmdb_path: str, batch: int = 100,
                          compress_level: int = 1,
                          map_size: int | None = None) -> int:
    import cv2

    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'")
    paths = list_images(folder)
    if not paths:
        raise ValueError(f"no images in {folder}")

    items = []
    lines = []
    for path in paths:
        key = osp.splitext(osp.basename(path))[0]
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        _, buf = cv2.imencode(".png", img,
                              [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        items.append((key.encode("ascii"), buf.tobytes()))
        lines.append(f"{key}.png ({h},{w},{c}) {compress_level}")

    try:
        import lmdb

        if map_size is None:
            map_size = sum(len(v) for _, v in items) * 10 + (1 << 20)
        env = lmdb.open(lmdb_path, map_size=map_size)
        with env.begin(write=True) as txn:
            for k, v in items:
                txn.put(k, v)
        env.close()
    except ImportError:
        from .lmdb_codec import write_lmdb

        write_lmdb(lmdb_path, items)
    with open(osp.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(paths)


def paths_from_lmdb(lmdb_path: str) -> list[str]:
    """Keys listed in the shard's meta_info.txt (data_util.py lmdb pairing)."""
    with open(osp.join(lmdb_path, "meta_info.txt")) as f:
        return [line.split(".")[0] for line in f if line.strip()]
