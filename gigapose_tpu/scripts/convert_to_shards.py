"""Convert BOP scenewise directory layout -> webdataset-style tar shards.

Rebuild of the reference's two-stage conversion (src/scripts/
convert_scenewise_to_imagewise.py:13 + convert_imagewise_to_webdataset.py:111)
as one pass: each image's files become members
{scene:06d}_{im:06d}.{rgb.png,depth.png,camera.json,gt.json,gt_info.json,
mask_visib.json} in fixed-size .tar shards, plus key_to_shard.json — the exact
contract TarSceneSource (dataloader/scene.py) reads back.

Usage:
    python -m gigapose_tpu.scripts.convert_to_shards \
        split_dir=<bop split dir> out_dir=<shards dir> [shard_size=1000]
"""

from __future__ import annotations

import io
import json
import os
import os.path as osp
import sys
import tarfile

import numpy as np
from PIL import Image


def _add_bytes(tar: tarfile.TarFile, name: str, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


def convert(split_dir: str, out_dir: str, shard_size: int = 1000) -> int:
    os.makedirs(out_dir, exist_ok=True)
    scenes = sorted(
        d for d in os.listdir(split_dir)
        if d.isdigit() and osp.isdir(osp.join(split_dir, d))
    )
    key_to_shard = {}
    shard_idx, n_in_shard = 0, 0
    tar = tarfile.open(osp.join(out_dir, f"shard-{shard_idx:06d}.tar"), "w")
    n_total = 0
    for scene in scenes:
        sdir = osp.join(split_dir, scene)
        cams = json.load(open(osp.join(sdir, "scene_camera.json")))
        gts_path = osp.join(sdir, "scene_gt.json")
        gts = json.load(open(gts_path)) if osp.exists(gts_path) else {}
        infos_path = osp.join(sdir, "scene_gt_info.json")
        gt_infos = json.load(open(infos_path)) if osp.exists(infos_path) else {}
        for im_id_s, cam in sorted(cams.items(), key=lambda kv: int(kv[0])):
            im_id = int(im_id_s)
            key = f"{int(scene):06d}_{im_id:06d}"
            if n_in_shard >= shard_size:
                tar.close()
                shard_idx += 1
                n_in_shard = 0
                tar = tarfile.open(
                    osp.join(out_dir, f"shard-{shard_idx:06d}.tar"), "w"
                )
            for ext in ("png", "jpg"):
                p = osp.join(sdir, "rgb", f"{im_id:06d}.{ext}")
                if osp.exists(p):
                    _add_bytes(tar, f"{key}.rgb.{ext}", open(p, "rb").read())
                    break
            dp = osp.join(sdir, "depth", f"{im_id:06d}.png")
            if osp.exists(dp):
                _add_bytes(tar, f"{key}.depth.png", open(dp, "rb").read())
            _add_bytes(tar, f"{key}.camera.json", json.dumps(cam).encode())
            if im_id_s in gts:
                _add_bytes(tar, f"{key}.gt.json", json.dumps(gts[im_id_s]).encode())
            if im_id_s in gt_infos:
                _add_bytes(
                    tar, f"{key}.gt_info.json", json.dumps(gt_infos[im_id_s]).encode()
                )
            # masks as RLE json (smaller + self-contained)
            if im_id_s in gts:
                from gigapose_tpu.dataloader.bop_io import rle_encode

                rles = []
                complete = True
                for i in range(len(gts[im_id_s])):
                    mp = osp.join(sdir, "mask_visib", f"{im_id:06d}_{i:06d}.png")
                    if not osp.exists(mp):
                        complete = False
                        break
                    rles.append(
                        rle_encode((np.asarray(Image.open(mp)) > 0).astype(np.uint8))
                    )
                if complete and rles:
                    _add_bytes(tar, f"{key}.mask_visib.json", json.dumps(rles).encode())
            key_to_shard[key] = shard_idx
            n_in_shard += 1
            n_total += 1
    tar.close()
    with open(osp.join(out_dir, "key_to_shard.json"), "w") as f:
        json.dump(key_to_shard, f)
    return n_total


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv if argv is not None else sys.argv[1:]))
    n = convert(kv["split_dir"], kv["out_dir"], int(kv.get("shard_size", 1000)))
    print(f"converted {n} images -> {kv['out_dir']}")


if __name__ == "__main__":
    main()
