#!/usr/bin/env python
"""NudeNet evaluation CLI — reference-flag-compatible
(SD/eval-scripts/nudenet-classes.py): per-image detected nudity classes CSV.

Two local run paths (this zero-egress environment bakes in neither):
1. ``pip install nudenet`` -> used directly (reference-identical).
2. ``--model_path /path/to/320n.onnx`` with ``onnxruntime`` installed ->
   the detector graph is run directly with uurg_tpu.eval.nudenet's
   re-implementation of NudeNet v3's pre/post-processing (letterbox 320,
   YOLOv8 decode + class-wise NMS) — drop the two artifacts locally and
   this CLI runs end-to-end.

The images produced by cli/generate_images.py are directly compatible.
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--csv_path", type=str, default="",
                   help="prompt csv to join case numbers against")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--model_path", type=str, default="",
                   help="local NudeNet detector .onnx — enables the "
                        "onnxruntime path when the nudenet package is "
                        "not installed")
    args = p.parse_args()

    if args.model_path.endswith(".npz"):
        # recorded-tensor golden fixture: full decode path, no onnxruntime
        from uurg_tpu.eval.nudenet import make_npz_detector

        detect = make_npz_detector(args.model_path)
    elif args.model_path:
        from uurg_tpu.eval.nudenet import make_onnx_detector

        detect = make_onnx_detector(args.model_path)
    else:
        try:
            from nudenet import NudeDetector
        except ImportError:
            sys.exit(
                "nudenet is not installed; either install it (+ weights) "
                "or pass --model_path <320n.onnx> with onnxruntime "
                "available (SD/eval-scripts/nudenet-classes.py parity).")
        detector = NudeDetector()
        detect = detector.detect
    rows = []
    for fname in sorted(os.listdir(args.folder)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        dets = detect(os.path.join(args.folder, fname))
        labels = [d["class"] for d in dets
                  if d.get("score", 1.0) >= args.threshold]
        rows.append({"image": fname, "classes": ";".join(labels)})
    with open(args.save_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "classes"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.save_path} ({len(rows)} images)")


if __name__ == "__main__":
    main()
