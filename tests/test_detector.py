"""Detector wrapper: BOP-format post-processing round-trip.

Pins the surface of gigapose_tpu/detector.py against the reference's
Detector.get_detections semantics (src/megapose/inference/detector.py:
66-140: mask_th binarization, detection_th strict >, one-instance-per-
class keeps the top score, instance ids per (image, object)) and checks
the emitted dicts survive the same ingestion path CNOS files take
(rle_decode + bbox xywh -> xyxy)."""

import numpy as np

from gigapose_tpu.dataloader.bop_io import rle_decode
from gigapose_tpu.detector import (
    Detector,
    add_instance_ids,
    filter_one_instance_per_class,
    postprocess_image_detections,
    save_detections_json,
)


def _fake_output(H=32, W=40):
    masks = np.zeros((3, H, W), np.float32)
    masks[0, 2:10, 4:12] = 0.9
    masks[1, 12:20, 4:12] = 0.95
    masks[2, 2:10, 20:30] = 0.85
    return {
        "boxes": np.array(
            [[4, 2, 12, 10], [4, 12, 12, 20], [20, 2, 30, 10]], np.float32
        ),
        "scores": np.array([0.9, 0.4, 0.8], np.float32),
        "labels": np.array([5, 5, 7], np.int64),
        "masks": masks,
    }


def test_postprocess_bop_schema_and_rle_roundtrip():
    dets = postprocess_image_detections(_fake_output(), scene_id=3, im_id=11)
    assert len(dets) == 3
    d = dets[0]
    assert d["scene_id"] == 3 and d["image_id"] == 11 and d["category_id"] == 5
    # bbox is BOP xywh
    assert d["bbox"] == [4.0, 2.0, 8.0, 8.0]
    # segmentation decodes back to the binarized mask
    m = rle_decode(d["segmentation"])
    assert m.shape == (32, 40)
    ref = _fake_output()["masks"][0] > 0.8
    np.testing.assert_array_equal(m.astype(bool), ref)


def test_threshold_is_strict_greater():
    dets = postprocess_image_detections(
        _fake_output(), 0, 0, detection_th=0.45
    )
    np.testing.assert_allclose(
        [d["score"] for d in dets], [0.9, 0.8], atol=1e-6
    )  # 0.4 dropped (keep iff score > th, reference detector.py:131-133)


def test_one_instance_per_class_and_instance_ids():
    dets = postprocess_image_detections(_fake_output(), 0, 0)
    kept = filter_one_instance_per_class(dets)
    assert len(kept) == 2
    assert {(d["category_id"], round(d["score"], 3)) for d in kept} == {
        (5, 0.9), (7, 0.8)
    }

    ids = add_instance_ids(postprocess_image_detections(_fake_output(), 0, 0))
    per_cat5 = [d["instance_id"] for d in ids if d["category_id"] == 5]
    assert per_cat5 == [0, 1]
    assert [d["instance_id"] for d in ids if d["category_id"] == 7] == [0]
    # idempotent
    assert add_instance_ids(ids) == ids


def test_detector_wrapper_and_json(tmp_path):
    det = Detector(
        model_fn=lambda rgbs: [_fake_output() for _ in rgbs],
        detection_th=0.5,
        one_instance_per_class=True,
    )
    rgb = np.zeros((32, 40, 3), np.uint8)
    out = det([rgb, rgb], scene_ids=[1, 1], im_ids=[0, 1], detection_time=0.07)
    assert {(d["image_id"], d["category_id"]) for d in out} == {
        (0, 5), (0, 7), (1, 5), (1, 7)
    }
    assert all(d["time"] == 0.07 for d in out)
    p = tmp_path / "dets.json"
    save_detections_json(out, str(p))
    import json

    loaded = json.loads(p.read_text())
    assert loaded == out
