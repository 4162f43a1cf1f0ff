#!/usr/bin/env python
"""NudeNet evaluation CLI — reference-flag-compatible
(SD/eval-scripts/nudenet-classes.py): per-image detected nudity classes CSV.

Requires the external ``nudenet`` package + detector weights (not baked into
this zero-egress environment); fails with a clear message otherwise. The
images produced by cli/generate_images.py are directly compatible.
"""
import argparse
import csv
import os
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--csv_path", type=str, default="",
                   help="prompt csv to join case numbers against")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--threshold", type=float, default=0.0)
    args = p.parse_args()

    try:
        from nudenet import NudeDetector
    except ImportError:
        sys.exit("nudenet is not installed in this environment; install it "
                 "and its detector weights to run this evaluation "
                 "(SD/eval-scripts/nudenet-classes.py parity).")

    detector = NudeDetector()
    rows = []
    for fname in sorted(os.listdir(args.folder)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        dets = detector.detect(os.path.join(args.folder, fname))
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
