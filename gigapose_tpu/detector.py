"""Instance-detector wrapper producing BOP-format detections.

Rebuilds the reference's detector surface (src/megapose/inference/
detector.py: Detector.get_detections, plus filter_detections /
add_instance_id from src/megapose/inference/utils.py:153-196) without the
torchvision dependency: the model is any callable returning per-image
dicts of boxes/scores/labels/masks, and all post-processing — score
threshold, mask binarization, one-instance-per-class, instance ids, BOP
json serialization — is native and testable. A torchvision-backed
MaskRCNN constructor is provided behind an optional import, mirroring how
the reference gates TEASER++ (and how its own detector is optional: the
GigaPose pipeline consumes CNOS detections from json, never this model).

Output dicts use the BOP detection-json schema consumed by
`dataloader.bop_io.load_cnos_detections` / `dataloader.test_set`:
{scene_id, image_id, category_id, bbox [x, y, w, h], score, time,
segmentation (compressed RLE)} — so a detector run can be saved with
`save_detections_json` and used exactly like a CNOS detection file.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from gigapose_tpu.dataloader.bop_io import rle_encode


def postprocess_image_detections(
    output: Dict[str, np.ndarray],
    scene_id: int,
    im_id: int,
    detection_th: Optional[float] = None,
    mask_th: float = 0.8,
    detection_time: float = -1.0,
    category_id_map: Optional[Dict[int, int]] = None,
) -> List[Dict]:
    """One image's raw model output -> BOP-format detection dicts.

    `output` carries boxes (N, 4) xyxy, scores (N,), labels (N,) int
    category ids, and optionally masks (N, H, W) float in [0, 1] (soft
    masks are binarized at `mask_th`, the reference's default 0.8).
    """
    boxes = np.asarray(output["boxes"], np.float64).reshape(-1, 4)
    scores = np.asarray(output["scores"], np.float64).reshape(-1)
    labels = np.asarray(output["labels"]).reshape(-1)
    masks = output.get("masks")
    dets: List[Dict] = []
    for i in range(len(boxes)):
        if detection_th is not None and scores[i] <= detection_th:
            continue
        cat = int(labels[i])
        if category_id_map is not None:
            cat = int(category_id_map[cat])
        x0, y0, x1, y1 = boxes[i]
        det = {
            "scene_id": int(scene_id),
            "image_id": int(im_id),
            "category_id": cat,
            "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
            "score": float(scores[i]),
            "time": float(detection_time),
        }
        if masks is not None:
            m = np.asarray(masks[i])
            det["segmentation"] = rle_encode(m > mask_th)
        dets.append(det)
    return dets


def filter_one_instance_per_class(dets: List[Dict]) -> List[Dict]:
    """Keep only the highest-scoring detection per (image, category) —
    the reference's one_instance_per_class (inference/utils.py:188-194)."""
    best: Dict[tuple, Dict] = {}
    for d in dets:
        key = (d["scene_id"], d["image_id"], d["category_id"])
        if key not in best or d["score"] > best[key]["score"]:
            best[key] = d
    # stable order: original appearance of the winners
    winners = set(map(id, best.values()))
    return [d for d in dets if id(d) in winners]


def add_instance_ids(dets: List[Dict]) -> List[Dict]:
    """Number multiple instances of the same object within an image
    0..n-1 in appearance order (inference/utils.py:153-173); idempotent."""
    counters: Dict[tuple, int] = {}
    for d in dets:
        if "instance_id" in d:
            continue
        key = (d["scene_id"], d["image_id"], d["category_id"])
        d["instance_id"] = counters.get(key, 0)
        counters[key] = d["instance_id"] + 1
    return dets


def save_detections_json(dets: List[Dict], path: str) -> None:
    """BOP detection json (the CNOS file format load_cnos_detections reads)."""
    with open(path, "w") as f:
        json.dump(dets, f)


@dataclass
class Detector:
    """Wraps any per-image detection model into the BOP detection pipeline.

    `model_fn` maps a list of (H, W, 3) uint8 images to a list of output
    dicts (boxes xyxy / scores / labels / masks) — the torchvision MaskRCNN
    contract the reference's Detector assumes (detector.py:95-110).
    """

    model_fn: Callable[[Sequence[np.ndarray]], List[Dict[str, np.ndarray]]]
    detection_th: Optional[float] = None
    mask_th: float = 0.8
    one_instance_per_class: bool = False
    category_id_map: Optional[Dict[int, int]] = None

    def get_detections(
        self,
        rgbs: Sequence[np.ndarray],
        scene_ids: Sequence[int],
        im_ids: Sequence[int],
        detection_time: float = -1.0,
    ) -> List[Dict]:
        outputs = self.model_fn(list(rgbs))
        dets: List[Dict] = []
        for out, sid, iid in zip(outputs, scene_ids, im_ids):
            dets += postprocess_image_detections(
                out, sid, iid,
                detection_th=self.detection_th,
                mask_th=self.mask_th,
                detection_time=detection_time,
                category_id_map=self.category_id_map,
            )
        if self.one_instance_per_class:
            dets = filter_one_instance_per_class(dets)
        return add_instance_ids(dets)

    __call__ = get_detections

    @classmethod
    def from_torchvision_maskrcnn(
        cls, n_classes: int, checkpoint_path: Optional[str] = None, **kwargs
    ) -> "Detector":
        """MaskRCNN-backed detector (reference DetectorMaskRCNN,
        src/megapose/models/mask_rcnn.py). torchvision is an optional
        dependency, handled like the reference's TEASER++ import."""
        try:
            import torch
            import torchvision
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "Detector.from_torchvision_maskrcnn needs torchvision "
                "(optional dependency, absent from this image); supply any "
                "model_fn with the boxes/scores/labels/masks contract instead"
            ) from e
        model = torchvision.models.detection.maskrcnn_resnet50_fpn(
            num_classes=n_classes, weights=None
        )
        if checkpoint_path:
            sd = torch.load(checkpoint_path, map_location="cpu")
            model.load_state_dict(sd.get("state_dict", sd))
        model.eval()

        def model_fn(rgbs: Sequence[np.ndarray]) -> List[Dict[str, np.ndarray]]:
            with torch.no_grad():
                inp = [
                    torch.as_tensor(r).float().permute(2, 0, 1) / 255.0
                    for r in rgbs
                ]
                outs = model(inp)
            return [
                {k: v.cpu().numpy() for k, v in o.items() if k in
                 ("boxes", "scores", "labels", "masks")}
                | ({"masks": o["masks"][:, 0].cpu().numpy()}
                   if "masks" in o else {})
                for o in outs
            ]

        return cls(model_fn=model_fn, **kwargs)
