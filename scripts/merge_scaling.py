#!/usr/bin/env python
"""Merge one round's scaling-campaign JSONs into BENCH_SCALING_r{N}.json.

Each input is one `bench.py --scaling*` output (a campaign: interleaved
repeats, best-of per level). Campaigns from the same protocol+levels pool
their runs — best-of across ALL quiet-gated legs is the machine-capability
estimate (the sandbox's wall-clock noise is strictly additive, see
BENCH_SCALING.md) — while different protocols/levels are reported side by
side, never merged.

Usage:
  python scripts/merge_scaling.py OUT.json LABEL1=a.json LABEL2=b.json ...

LABEL encodes protocol+levels, e.g. xheavy_8_32, heavy_8_32, xheavy_6_24.
Inputs with the same LABEL are pooled.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def pool(campaigns: list[dict]) -> dict:
    runs: dict[str, list[dict]] = defaultdict(list)
    paired: list[float] = []
    for c in campaigns:
        for lvl, lst in c["all_runs"].items():
            runs[lvl].extend(lst)
        lv = sorted(c["all_runs"], key=int)
        clo, chi = lv[0], lv[-1]
        r = int(chi) / int(clo)
        # within-repeat pairing: the two legs of repeat i ran back-to-back
        # in the same host window — the closest single-box analog of
        # measuring one cluster at two sizes under equal conditions
        for a, b in zip(c["all_runs"][clo], c["all_runs"][chi]):
            paired.append(round((b["urls_per_sec"] / a["urls_per_sec"]) / r, 3))
    levels = sorted(runs, key=int)
    lo, hi = levels[0], levels[-1]
    best = {l: max(r, key=lambda x: x["urls_per_sec"]) for l, r in runs.items()}
    ratio = int(hi) / int(lo)
    eff = (best[hi]["urls_per_sec"] / best[lo]["urls_per_sec"]) / ratio
    return {
        "value": round(eff, 3),
        "paired_values": paired,
        "paired_best": max(paired) if paired else None,
        "n_cores": {lo: best[lo], hi: best[hi]},
        "all_runs": dict(runs),
        "n_runs": {l: len(r) for l, r in runs.items()},
    }


def main() -> None:
    args = sys.argv[1:]
    headline_label = None
    for a in list(args):
        if a.startswith("--headline="):
            headline_label = a.split("=", 1)[1]
            args.remove(a)
    out_path = args[0]
    by_label: dict[str, list[dict]] = defaultdict(list)
    for arg in args[1:]:
        label, path = arg.split("=", 1)
        with open(path) as fh:
            text = fh.read()
        # bench.py prints the JSON as the last stdout line
        line = [l for l in text.strip().splitlines() if l.startswith("{")][-1]
        by_label[label].append(json.loads(line))
    protocols = {label: pool(cs) for label, cs in by_label.items()}
    # Headline value: PINNED to a pre-declared protocol via --headline=LABEL
    # (round-5 ADVICE: choosing max() over protocols after the fact is a
    # selection-bias risk). The legacy preference order remains only as the
    # fallback when no label is declared.
    if headline_label is not None:
        headline = protocols[headline_label]
    else:
        cluster = [k for k in protocols if k.startswith("cluster")]
        headline = (
            protocols[max(cluster, key=lambda k: protocols[k]["value"])]
            if cluster
            else protocols.get("heavy_8_32") or protocols[sorted(protocols)[0]]
        )
    doc = {
        "metric": "crawl_scaling_efficiency",
        "value": headline["value"],
        "unit": "ratio",
        "target": ">=0.8",
        "headline_protocol": headline_label,
        "protocols": protocols,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    for label, p in sorted(protocols.items()):
        print(label, p["value"], {l: r["urls_per_sec"] for l, r in p["n_cores"].items()})


if __name__ == "__main__":
    main()
