"""BOP I/O: RLE codec roundtrip (+ pycocotools-format compatibility on a
handcrafted string), csv roundtrip, runtime protocol, npz merge."""

import json
import os

import numpy as np
import pytest

from gigapose_tpu.dataloader import bop_io


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = (rng.uniform(size=(37, 23)) > 0.6).astype(np.uint8)
        rle = bop_io.rle_encode(mask)
        back = bop_io.rle_decode(rle)
        np.testing.assert_array_equal(back, mask)


def test_rle_uncompressed_counts():
    # column-major: 1 zero, 2 ones, 3 zeros -> col0 [0,1,1], col1 [0,0,0]
    mask = bop_io.rle_decode({"size": [3, 2], "counts": [1, 2, 3]})
    want = np.array([[0, 0], [1, 0], [1, 0]], np.uint8)
    np.testing.assert_array_equal(mask, want)


def test_group_and_test_list():
    dets = [
        {"scene_id": 1, "image_id": 3, "category_id": 5, "score": 0.9},
        {"scene_id": 1, "image_id": 3, "category_id": 5, "score": 0.7},
        {"scene_id": 1, "image_id": 3, "category_id": 8, "score": 0.8},
        {"scene_id": 2, "image_id": 1, "category_id": 5, "score": 0.6},
    ]
    grouped = bop_io.group_by_image(dets)
    assert set(grouped) == {"000001_000003", "000002_000001"}
    tl = bop_io.generate_test_list(grouped)
    entry = {e["obj_id"]: e["inst_count"] for e in tl["000001_000003"]}
    assert entry == {5: 2, 8: 1}


def test_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    results = [
        dict(
            scene_id=1, im_id=2, obj_id=5, score=0.5,
            R=rng.normal(size=(3, 3)), t=rng.normal(size=(3, 1)), time=1.5,
        )
    ]
    p = str(tmp_path / "res.csv")
    bop_io.save_bop_csv(p, results)
    back = bop_io.load_bop_csv(p)
    np.testing.assert_allclose(back[0]["R"], results[0]["R"], rtol=1e-12)
    np.testing.assert_allclose(back[0]["t"], results[0]["t"], rtol=1e-12)
    assert back[0]["time"] == 1.5


def test_runtime_protocol_coarse():
    # two batches for one image: time = detection_time (once) + t1 + t2
    mk = lambda b, t: dict(
        scene_id=1, im_id=1, obj_id=1, score=1.0, R=np.eye(3), t=np.zeros(3),
        time=t, additional_time=0.5, batch_id=b,
    )
    rs = [mk(0, 1.0), mk(0, 1.0), mk(1, 2.0)]
    out = bop_io.apply_runtime_protocol(rs, is_refined=False)
    assert all(r["time"] == 0.5 + 1.0 + 2.0 for r in out)
    assert "batch_id" not in out[0]


def test_merge_batched_predictions(tmp_path):
    rng = np.random.default_rng(2)
    d = str(tmp_path)
    k = 3
    for b in range(2):
        poses = np.tile(np.eye(4), (2, k, 1, 1))
        poses[:, :, :3, 3] = rng.normal(size=(2, k, 3)) * 100
        np.savez(
            os.path.join(d, f"{b}.npz"),
            scene_id=np.array([1, 1]),
            im_id=np.array([7, 7]),
            object_id=np.array([1, 2]),  # internal labels
            poses=poses,
            scores=rng.uniform(size=(2, k)),
            time=np.array([0.2, 0.2]),
            detection_time=np.array([0.1, 0.1]),
        )
    paths = bop_io.merge_batched_predictions(d, "lmo", "large", "run0")
    assert len(paths) == 2
    top1 = bop_io.load_bop_csv(paths[0])
    topk = bop_io.load_bop_csv(paths[1], extra_column="instance_id")
    assert len(top1) == 4 and len(topk) == 4 * k
    # lmo label remap: internal 1 -> obj 1, internal 2 -> obj 5
    assert sorted({r["obj_id"] for r in top1}) == [1, 5]
    # runtime: detection once + both batch times
    assert all(abs(r["time"] - (0.1 + 0.2 + 0.2)) < 1e-9 for r in top1)
    # instance ids group the k hypotheses
    ids = [r["instance_id"] for r in topk]
    assert len(set(ids)) == 4


def test_load_cnos_detections_localization(tmp_path):
    root = tmp_path
    ds = "lmo"
    det_dir = root / "default_detections" / "core19_model_based_unseen" / "cnos-fastsam"
    det_dir.mkdir(parents=True)
    dets = [
        {"scene_id": 2, "image_id": 3, "category_id": 1, "score": 0.9,
         "bbox": [0, 0, 10, 10]},
        {"scene_id": 2, "image_id": 3, "category_id": 1, "score": 0.5,
         "bbox": [1, 1, 10, 10]},
        {"scene_id": 2, "image_id": 3, "category_id": 9, "score": 0.8,
         "bbox": [2, 2, 10, 10]},
    ]
    with open(det_dir / "cnos-fastsam_lmo-test_x.json", "w") as f:
        json.dump(dets, f)
    (root / ds).mkdir()
    targets = [
        {"scene_id": 2, "im_id": 3, "obj_id": 1, "inst_count": 1},
        {"scene_id": 2, "im_id": 3, "obj_id": 5, "inst_count": 1},  # no dets!
    ]
    with open(root / ds / "test_targets_bop19.json", "w") as f:
        json.dump(targets, f)

    test_list, sel = bop_io.load_cnos_detections(str(root), ds, "localization")
    key = "000002_000003"
    assert len(test_list[key]) == 2
    sel_dets = sel[key]
    # obj 1: top-scoring detection only (inst_count=1)
    obj1 = [d for d in sel_dets if d["category_id"] == 1]
    assert len(obj1) == 1 and obj1[0]["score"] == 0.9
    # obj 5: megapose fallback relabels the best image detection
    obj5 = [d for d in sel_dets if d["category_id"] == 5]
    assert len(obj5) == 1 and obj5[0]["score"] == 0.9


def test_filter_localization_multi_instance():
    """Top inst_count detections per target object by top-1 score (the
    reference's filter_and_save, gigaPose.py:400-449)."""
    import numpy as np

    from gigapose_tpu.dataloader.test_set import ImageDetections
    from gigapose_tpu.pipeline.runner import CoarseRunner

    image = ImageDetections(
        scene_id=1, im_id=0, rgb=np.zeros((4, 4, 3), np.uint8), K=np.eye(3),
        labels=np.array([1, 1, 1, 2], np.int32),
        obj_ids=np.array([5, 5, 5, 9], np.int32),
        boxes_xyxy=np.zeros((4, 4), np.int32),
        masks=np.zeros((4, 4, 4), np.uint8),
        scores=np.ones(4, np.float32),
        detection_time=0.1,
        test_list=[
            {"obj_id": 5, "inst_count": 2},
            {"obj_id": 9, "inst_count": 1},
        ],
    )
    runner = CoarseRunner.__new__(CoarseRunner)  # only need the method
    scores = np.array([0.2, 0.9, 0.5, 0.7])
    sel, det_times = runner.filter_localization(image, scores)
    # obj 5: best two by score -> indices 1, 2; obj 9 -> index 3
    assert sel.tolist() == [1, 2, 3]
    assert np.allclose(det_times, 0.1)


def test_load_cnos_detections_bop24_hope(tmp_path):
    """BOP'24 datasets use core24 + cnos-sam + test_targets_bop24.json
    (ref: inout.py:414-423)."""
    root = tmp_path
    det_dir = root / "default_detections" / "core24_model_based_unseen" / "cnos-sam"
    det_dir.mkdir(parents=True)
    dets = [{"scene_id": 1, "image_id": 2, "category_id": 3, "score": 0.9,
             "bbox": [0, 0, 5, 5]}]
    with open(det_dir / "cnos-sam_hope-test_x.json", "w") as f:
        json.dump(dets, f)
    (root / "hope").mkdir()
    with open(root / "hope" / "test_targets_bop24.json", "w") as f:
        json.dump([{"scene_id": 1, "im_id": 2, "obj_id": 3, "inst_count": 1}], f)
    test_list, sel = bop_io.load_cnos_detections(str(root), "hope", "localization")
    assert "000001_000002" in test_list
    assert sel["000001_000002"][0]["category_id"] == 3
