#!/usr/bin/env python
"""Render the README performance table from measured bench JSON.

The perf table in README.md is GENERATED, never hand-typed (round-2
post-mortem: a hand-maintained "633 it/s" timing artifact survived a whole
round because prose doesn't re-measure itself). This script reads the most
recent bench record — a driver ``BENCH_r*.json`` (whose ``parsed`` field
holds bench.py's combined line) or a raw bench.py stdout line /
``BENCH_partial.json`` — and rewrites the block between the
``<!-- BENCH_TABLE:BEGIN -->`` / ``<!-- BENCH_TABLE:END -->`` markers.

Usage:
    python scripts/render_bench_table.py              # newest record, in place
    python scripts/render_bench_table.py --json BENCH_r04.json
    python scripts/render_bench_table.py --check      # fail if README stale
"""
import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN = "<!-- BENCH_TABLE:BEGIN -->"
END = "<!-- BENCH_TABLE:END -->"

# metric -> what the row measures (workload context lives here, numbers in
# the JSON). Keys match bench.py metric names.
DESCRIPTIONS = {
    "ddpm_cifar10_sfron_two_phase_step_b128":
        "SFR-on two-phase step (adaga fwd+bwd, saliency mask, clip, "
        "Adam x2, EMA; 35.7M cond-UNet, batch 128, bf16)",
    "classification_sfron_b256":
        "ResNet-18 classification SFR-on iteration, batch 256 "
        "(device-resident scan, in-jit flip+pad-crop augmentation, bf16)",
    "ddim50_cfg_sampling_b128":
        "DDIM-50 sampling with CFG double-forward, batch 128",
    "evaluator_inception_features_b256":
        "InceptionV3 FID/sFID/IS feature extraction, batch 256 "
        "(end-to-end: host batches in, features downloaded through the "
        "TPU tunnel)",
    "evaluator_inception_features_device_b256":
        "InceptionV3 feature extraction, batch 256 — device compute only "
        "(the e2e/device gap is this box's tunnel bound)",
    "dit_xl2_sfron_step_b16":
        "DiT-XL/2 (675M) SFR-on two-phase step, batch 16 latents "
        "(bf16 Adam mu+nu, bf16 EMA, bit-packed mask, attn+dots remat; "
        "one 16GB chip)",
    "sd_unet_nsfw_step_b4_xattn":
        "SD-v1 UNet (860M) nsfw_removal two-phase step, batch 4, "
        "train_method=xattn (Pallas flash attention fwd+bwd)",
    "sd_unet_nsfw_step_b4_full":
        "SD-v1 UNet (860M) nsfw_removal two-phase step, batch 4, "
        "train_method=full (Adam over all params, bf16 second moments)",
    "sd_unet_nsfw_step_b8_xattn":
        "SD-v1 UNet (860M) nsfw_removal two-phase step, batch 8, "
        "train_method=xattn — the occupancy sweet spot (+18% per-image "
        "over b4)",
    "sd_unet_nsfw_step_b8_full":
        "SD-v1 UNet (860M) nsfw_removal two-phase step, batch 8, "
        "train_method=full",
}


def load_record(path: str):
    """Return (combined_dict, source_label) from any supported file."""
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and "parsed" in data:  # driver BENCH_rNN.json
        if data["parsed"] is None:
            return None, os.path.basename(path)
        return data["parsed"], os.path.basename(path)
    return data, os.path.basename(path)


def newest_record():
    """The curated full-suite record if present, else the latest driver
    record with a parsed payload, else the partial file.

    BENCH_measured.json is the intentionally-committed full run (all six
    metrics); driver BENCH_rNN.json records can be partial (budget-skipped
    benches) or empty (parsed=null), so they rank below it."""
    measured = os.path.join(ROOT, "BENCH_measured.json")
    if os.path.exists(measured):
        rec, label = load_record(measured)
        if rec is not None and rec.get("all"):
            return rec, label
    candidates = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                        reverse=True)
    for p in candidates:
        rec, label = load_record(p)
        if rec is not None and rec.get("all"):
            return rec, label
    partial = os.path.join(ROOT, "BENCH_partial.json")
    if os.path.exists(partial):
        return load_record(partial)
    raise SystemExit("no bench record found (run bench.py first)")


REL_TOL = 0.25  # run-to-run jitter allowance: the tunnel-bound e2e
# evaluator row alone swings ~20% between runs (README "under ~20%
# tunnel noise"); real regressions this check exists for are larger


def records_consistent(cur, drv, tol=REL_TOL):
    """True if ``drv`` (a driver record) is explainable as a re-run of the
    adopted record ``cur``: every driver metric that carries a value exists
    in the curated record and agrees within ``tol`` relative. Driver error
    rows (budget skips, transient failures) contradict nothing — partial
    driver records are by-design (bench.py --budget). A metric the driver
    measured that curated never adopted, or a value drifted more than
    ``tol`` (a regression — or an improvement worth adopting), makes the
    records inconsistent."""
    cur_by = {m["metric"]: m for m in cur.get("all", []) if "value" in m}
    for m in drv.get("all", []):
        if "value" not in m:
            continue
        c = cur_by.get(m.get("metric"))
        if c is None:
            return False
        if abs(m["value"] - c["value"]) > tol * max(abs(c["value"]), 1e-9):
            return False
    return True


def curated_lags_driver():
    """Return the offending driver filename if BENCH_measured.json exists
    but a NEWER driver record (mtime) with a parsed payload is
    INCONSISTENT with it — i.e. a bench round ran after the last adoption
    and measured something the curated record doesn't reflect. Consistency
    is value-wise within REL_TOL (records_consistent): a driver re-run of
    the adopted configuration jitters a few percent and must stay green
    (the end-of-round driver bench would otherwise fail this check
    unconditionally — there is no record to adopt before it exists), while
    a >REL_TOL drift or a never-adopted metric still fails CI as real
    staleness. The mtime guard keeps a freshly-adopted direct bench run
    (curated ahead of the last driver round) green."""
    measured = os.path.join(ROOT, "BENCH_measured.json")
    if not os.path.exists(measured):
        return None
    cur, _ = load_record(measured)
    m_mtime = os.path.getmtime(measured)
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                    reverse=True):
        rec, label = load_record(p)
        if rec is not None and rec.get("all"):
            if os.path.getmtime(p) <= m_mtime:
                return None  # curated is as new as the newest driver round
            return label if not records_consistent(cur, rec) else None
    return None


def fmt_flops(f):
    return f"{f / 1e12:.2f} TF" if f else "—"


def render(rec, label: str) -> str:
    rows = rec.get("all", [rec])
    lines = [
        BEGIN,
        f"*Generated by `scripts/render_bench_table.py` from `{label}` — "
        "do not edit numbers by hand.*",
        "",
        "| Workload | Measured | vs est. torch/A100 | FLOP/step | MFU |",
        "|---|---|---|---|---|",
    ]
    for m in rows:
        name = m.get("metric", "?")
        desc = DESCRIPTIONS.get(name, name)
        if "value" in m:
            val = f"**{m['value']:g} {m.get('unit', '')}**"
            vsb = f"{m['vs_baseline']:g}x" if "vs_baseline" in m else "—"
            fl = fmt_flops(m.get("flops_per_step"))
            mfu = f"{m['mfu'] * 100:.1f}%" if m.get("mfu") else "—"
        else:
            val = f"*not run ({m.get('error', 'unknown')})*"
            vsb = fl = mfu = "—"
        lines.append(f"| {desc} | {val} | {vsb} | {fl} | {mfu} |")
    lines.append("")
    lines.append(
        "MFU = cost-analysis FLOPs x measured rate / chip peak bf16 "
        "(197 TF/s on v5e). `vs est. torch/A100` divides by the estimated "
        "reference throughputs in `bench.py::_EST` (the reference publishes "
        "no wall-clock numbers — BASELINE.md).")
    lines.append(END)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default="",
                    help="bench record to render (default: newest)")
    ap.add_argument("--readme", type=str,
                    default=os.path.join(ROOT, "README.md"))
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if the README block is stale")
    ap.add_argument("--adopt", action="store_true",
                    help="copy the newest driver BENCH_rNN.json payload "
                         "into BENCH_measured.json before rendering")
    args = ap.parse_args()

    if args.adopt:
        for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                        reverse=True):
            drec, dlabel = load_record(p)
            if drec is not None and drec.get("all"):
                with open(os.path.join(ROOT, "BENCH_measured.json"),
                          "w") as f:
                    json.dump(drec, f, indent=1)
                print(f"adopted {dlabel} as BENCH_measured.json")
                break

    if args.json:
        rec, label = load_record(args.json)
        if rec is None:
            raise SystemExit(f"{args.json}: parsed=null, nothing to render")
    else:
        rec, label = newest_record()

    block = render(rec, label)
    with open(args.readme) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"{args.readme} lacks {BEGIN}/{END} markers")
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block, text,
                 flags=re.S)
    if args.check:
        if new != text:
            print("README bench table is STALE — run "
                  "scripts/render_bench_table.py", file=sys.stderr)
            return 1
        if not args.json:
            lag = curated_lags_driver()
            if lag:
                print(f"BENCH_measured.json lags {lag} — adopt the newer "
                      "driver record (copy its 'parsed' payload) and "
                      "re-render", file=sys.stderr)
                return 1
        print("README bench table is up to date")
        return 0
    if new != text:
        with open(args.readme, "w") as f:
            f.write(new)
        print(f"rendered {len(rec.get('all', []))} rows from {label} "
              f"into {args.readme}")
    else:
        print("README already up to date")
    return 0


if __name__ == "__main__":
    sys.exit(main())
