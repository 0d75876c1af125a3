"""Dataset/checkpoint download helpers (ref: src/scripts/download_*.py, 10
files of hf-hub/wget fetchers).

One CLI covering the same artifacts. This image is zero-egress, so the
commands are also printed for offline execution; with network access they
run directly (urllib, no extra deps).

    python -m gigapose_tpu.scripts.download what=<target> root_dir=<root>

targets: test (BOP'23 test sets), templates (pre-rendered GigaPose templates),
cnos (default detections), cad, gigapose_ckpt, megapose_ckpt,
train_metadata, train_cad, train_images.
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import urllib.request

BOP_ROOT = "https://bop.felk.cvut.cz/media/data/bop_datasets/"
BOP_EXTRA = "https://bop.felk.cvut.cz/media/data/bop_datasets_extra/"
HF_GIGAPOSE = "https://huggingface.co/datasets/nv-nguyen/gigaPose/resolve/main/"
MEGAPOSE_CKPT = (
    "https://www.paris.inria.fr/archive_ylabbeprojectsdata/megapose/megapose-models/"
)

MEGAPOSE_TARS = (
    "https://www.paris.inria.fr/archive_ylabbeprojectsdata/megapose/tars/"
)

TARGETS = {
    "test": [BOP_ROOT + "{ds}_test_bop19.zip"],
    "cad": [BOP_ROOT + "{ds}_base.zip", BOP_ROOT + "{ds}_models.zip"],
    "cnos": [BOP_EXTRA + "bop23_default_detections_for_task4.zip"],
    "templates": [HF_GIGAPOSE + "templates/{ds}.zip"],
    "gigapose_ckpt": [HF_GIGAPOSE + "checkpoints/gigaPose_v1.ckpt"],
    "megapose_ckpt": [
        MEGAPOSE_CKPT + "coarse-rgb-906902141/checkpoint.pth.tar",
        MEGAPOSE_CKPT + "refiner-rgb-653307694/checkpoint.pth.tar",
    ],
    # MegaPose-GSO / MegaPose-ShapeNet training webdatasets
    # (ref: src/scripts/download_train_metaData.py / _cad.py / _train.py)
    "train_metadata": [
        BOP_ROOT + "bop23_datasets/megapose-{tds}/{tds}_models.json",
        BOP_ROOT + "bop23_datasets/megapose-{tds}/train_pbr_web/key_to_shard.json",
    ],
    "train_cad": [
        MEGAPOSE_TARS + "google_scanned_objects.zip",
        MEGAPOSE_TARS + "shapenetcorev2.zip",
    ],
    # per-shard tars; shard range selected with shards=<start>-<end>
    # (reference fetches 0..1039, download_train.py:12)
    "train_images": [
        BOP_ROOT + "bop23_datasets/megapose-{tds}/train_pbr_web/shard-{shard:06d}.tar",
    ],
}
BOP23 = ["lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv"]
TRAIN_DATASETS = ["gso", "shapenet"]


def fetch(url: str, out_path: str, dry_run: bool = False):
    print(f"{'DRY ' if dry_run else ''}GET {url} -> {out_path}")
    if dry_run:
        return
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    urllib.request.urlretrieve(url, out_path)


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv if argv is not None else sys.argv[1:]))
    what = kv.get("what", "test")
    root = kv.get("root_dir", "./gigapose_datasets")
    datasets = kv.get("datasets", ",".join(BOP23)).split(",")
    train_datasets = kv.get("train_datasets", ",".join(TRAIN_DATASETS)).split(",")
    dry = kv.get("dry_run", "false").lower() == "true"
    lo, _, hi = kv.get("shards", "0-1039").partition("-")
    shards = range(int(lo), int(hi or lo) + 1)
    urls = TARGETS[what]
    for url in urls:
        if "{shard" in url:
            for tds in train_datasets:
                for shard in shards:
                    u = url.format(tds=tds, shard=shard)
                    fetch(u, osp.join(root, "downloads", tds, osp.basename(u)), dry)
        elif "{tds}" in url:
            for tds in train_datasets:
                u = url.format(tds=tds)
                fetch(u, osp.join(root, "downloads", tds, osp.basename(u)), dry)
        elif "{ds}" in url:
            for ds in datasets:
                u = url.format(ds=ds)
                fetch(u, osp.join(root, "downloads", osp.basename(u)), dry)
        else:
            fetch(url, osp.join(root, "downloads", osp.basename(url)), dry)


if __name__ == "__main__":
    main()
