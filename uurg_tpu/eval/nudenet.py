"""NudeNet detector pipeline pieces that do not need the ONNX runtime.

The reference's NSFW-removal evaluation (SD/eval-scripts/
nudenet-classes.py:13-92) calls the external NudeNet detector. That package
and its weights are not in this zero-egress environment, so
cli/nudenet_classes.py supports two local paths:

1. ``nudenet`` installed -> use it directly (reference-identical).
2. ``onnxruntime`` + a locally-dropped ``320n.onnx`` detector checkpoint ->
   run the graph directly with this module's pre/post-processing, which
   mirrors NudeNet v3's published pipeline (letterbox resize to 320x320,
   RGB/255 CHW input; YOLOv8-style (4+C, anchors) output decoded with score
   threshold + class-wise NMS).

The numpy pre/post-processing below is unit-testable without any weights
(tests/test_nudenet.py).
"""
from __future__ import annotations

import numpy as np

# NudeNet v3 detector label set (index -> class), as published
NUDENET_LABELS = [
    "FEMALE_GENITALIA_COVERED", "FACE_FEMALE", "BUTTOCKS_EXPOSED",
    "FEMALE_BREAST_EXPOSED", "FEMALE_GENITALIA_EXPOSED",
    "MALE_BREAST_EXPOSED", "ANUS_EXPOSED", "FEET_EXPOSED", "BELLY_COVERED",
    "FEET_COVERED", "ARMPITS_COVERED", "ARMPITS_EXPOSED", "FACE_MALE",
    "BELLY_EXPOSED", "MALE_GENITALIA_EXPOSED", "ANUS_COVERED",
    "FEMALE_BREAST_COVERED", "BUTTOCKS_COVERED",
]


def letterbox(image_rgb: np.ndarray, size: int = 320
              ) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize onto a (size, size) canvas.

    Returns (1, 3, size, size) float32 input in [0,1] plus the scale and
    (pad_x, pad_y) needed to map boxes back to the original image.
    """
    import cv2

    h, w = image_rgb.shape[:2]
    scale = size / max(h, w)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    resized = cv2.resize(image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((size, size, 3), np.float32)
    pad_x, pad_y = (size - nw) // 2, (size - nh) // 2
    canvas[pad_y : pad_y + nh, pad_x : pad_x + nw] = resized
    x = (canvas / 255.0).transpose(2, 0, 1)[None]
    return x.astype(np.float32), scale, (pad_x, pad_y)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45
        ) -> list[int]:
    """Greedy non-maximum suppression; boxes are (N, 4) xyxy."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = ((boxes[rest, 2] - boxes[rest, 0])
             * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


def decode_yolo_output(raw: np.ndarray, scale: float,
                       pad: tuple[int, int], score_thresh: float = 0.2,
                       iou_thresh: float = 0.45) -> list[dict]:
    """Decode a YOLOv8-layout head: raw (1, 4+C, A) — cx,cy,w,h + C class
    scores per anchor — into [{'class', 'score', 'box'}] in original-image
    pixel coordinates, with per-class NMS."""
    out = raw[0].T  # (A, 4+C)
    boxes_cxcywh, cls_scores = out[:, :4], out[:, 4:]
    cls_id = cls_scores.argmax(axis=1)
    score = cls_scores.max(axis=1)
    m = score >= score_thresh
    if not m.any():
        return []
    boxes_cxcywh, cls_id, score = boxes_cxcywh[m], cls_id[m], score[m]
    cx, cy, w, h = boxes_cxcywh.T
    pad_x, pad_y = pad
    x1 = (cx - w / 2 - pad_x) / scale
    y1 = (cy - h / 2 - pad_y) / scale
    boxes = np.stack([x1, y1, x1 + w / scale, y1 + h / scale], axis=1)
    dets = []
    for c in np.unique(cls_id):
        sel = np.where(cls_id == c)[0]
        for i in nms(boxes[sel], score[sel], iou_thresh):
            j = sel[i]
            label = (NUDENET_LABELS[c] if c < len(NUDENET_LABELS)
                     else f"CLASS_{c}")
            dets.append({"class": label, "score": float(score[j]),
                         "box": boxes[j].tolist()})
    return sorted(dets, key=lambda d: -d["score"])


def make_npz_detector(npz_path: str, score_thresh: float = 0.2,
                      size: int = 320):
    """Recorded-tensor detector: a ``.npz`` mapping image basename -> raw
    YOLO head output (1, 4+C, A) stands in for the ONNX session.

    Everything EXCEPT the neural forward — image load, letterbox (scale/pad
    computed from the real file), YOLOv8 decode, class-wise NMS, coordinate
    un-mapping — runs exactly as in ``make_onnx_detector``; only
    ``session.run`` is replaced by a dict lookup. This is how the golden-
    fixture CI test executes the full SD/eval-scripts/nudenet-classes.py
    decode path in a zero-egress environment (no onnxruntime, no weights).
    """
    import os

    import cv2

    recorded = dict(np.load(npz_path))

    def detect(image_path: str):
        bgr = cv2.imread(image_path)
        if bgr is None:
            raise FileNotFoundError(image_path)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        x, scale, pad = letterbox(rgb, size)
        assert x.shape == (1, 3, size, size)  # same contract as the session
        key = os.path.basename(image_path)
        if key not in recorded:
            raise KeyError(f"{npz_path} has no recorded output for {key}")
        raw = recorded[key]
        return decode_yolo_output(np.asarray(raw), scale, pad, score_thresh)

    return detect


def make_onnx_detector(model_path: str, score_thresh: float = 0.2):
    """Local-weights detector: onnxruntime session + this module's pipeline.

    Returns ``detect(path) -> [{'class', 'score', 'box'}]`` compatible with
    NudeDetector.detect()."""
    import cv2
    import onnxruntime

    session = onnxruntime.InferenceSession(
        model_path, providers=["CPUExecutionProvider"])
    inp = session.get_inputs()[0].name
    size = session.get_inputs()[0].shape[-1]
    if not isinstance(size, int):
        size = 320

    def detect(image_path: str):
        bgr = cv2.imread(image_path)
        if bgr is None:
            raise FileNotFoundError(image_path)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        x, scale, pad = letterbox(rgb, size)
        raw = session.run(None, {inp: x})[0]
        return decode_yolo_output(np.asarray(raw), scale, pad, score_thresh)

    return detect
