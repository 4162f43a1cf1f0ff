"""NudeNet pipeline pieces (no weights needed): letterbox, NMS, YOLO decode.

Parity target: the published NudeNet v3 detector pipeline used by
SD/eval-scripts/nudenet-classes.py.
"""
import numpy as np
import pytest

from uurg_tpu.eval.nudenet import (NUDENET_LABELS, decode_yolo_output,
                                   letterbox, nms)


def test_letterbox_geometry():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    img = np.full((100, 200, 3), 255, np.uint8)  # wide image
    x, scale, (pad_x, pad_y) = letterbox(img, 320)
    assert x.shape == (1, 3, 320, 320)
    assert scale == pytest.approx(320 / 200)
    assert pad_x == 0 and pad_y == (320 - 160) // 2
    # content sits in the vertical middle band, zeros above/below
    assert x[0, :, pad_y + 1, 160].max() == pytest.approx(1.0)
    assert x[0, :, 0, 160].max() == 0.0


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, iou_thresh=0.45)
    assert keep == [0, 2]  # near-duplicate suppressed, distant box kept


def test_decode_yolo_output_maps_back_to_image_coords():
    # one anchor with a confident class-3 (FEMALE_BREAST_EXPOSED) box at
    # canvas center, letterboxed from a 160x320 original (scale=1, pad_y=80)
    C, A = len(NUDENET_LABELS), 4
    raw = np.zeros((1, 4 + C, A), np.float32)
    raw[0, :4, 0] = [160, 160, 40, 20]  # cx, cy, w, h on the 320 canvas
    raw[0, 4 + 3, 0] = 0.9
    dets = decode_yolo_output(raw, scale=1.0, pad=(0, 80),
                              score_thresh=0.2)
    assert len(dets) == 1
    d = dets[0]
    assert d["class"] == "FEMALE_BREAST_EXPOSED"
    assert d["score"] == pytest.approx(0.9)
    np.testing.assert_allclose(d["box"], [140, 70, 180, 90])


def test_decode_threshold_filters_all():
    C, A = len(NUDENET_LABELS), 8
    raw = np.full((1, 4 + C, A), 0.05, np.float32)
    assert decode_yolo_output(raw, 1.0, (0, 0), score_thresh=0.2) == []
