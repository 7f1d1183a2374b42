#!/usr/bin/env python3
"""Adjudicate one bench run against another from their detail records.

Usage: python3 dev/attrib.py <bench_detail_A.json> <bench_detail_B.json>
       [--top N]

NOT part of the shipped library — developer tooling only.

Reads the attribution telemetry Bench writes since round 17 (per-pass
raw times, warm-memo markers, eviction/partial-cache flags, labeled
per-group box axes) and prints, for the N largest min-time regressions
of B over A, everything a cross-round adjudication needs:

  - both runs' per-pass raw times (did ONE pass drag the min, or both?)
  - the warm-memo state before each timed run (cold rebuild vs warm)
  - eviction / partial-cache flags (did the block manager drop blocks
    mid-query?)
  - the box axes of the query's group window in each pass (was the
    WINDOW hot, whatever the run-level median says?)

The round-16 d05/d06 driver-box flags took a full manual re-bench to
adjudicate; this reads the verdict off the two JSON files instead.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def group_of(name):
    g = ""
    for ch in name.split("_")[0]:
        if ch.isdigit():
            break
        g += ch
    return "d" if g == "x" else g


def axes_for(d, name):
    out = {}
    for a in d.get("axes", []):
        if a["group"] == group_of(name):
            out[a["pass"]] = (a["sent"], a["floor"])
    return out


def fmt_rec(rec):
    t = "/".join(f"{x:.2f}" for x in rec["t"])
    flags = []
    if rec.get("ev"):
        flags.append("EVICT")
    if rec.get("pp"):
        flags.append("PARTIAL")
    w2 = rec.get("w2") or "-"
    return f"t={t}s warm2=[{w2}]" + (f" {' '.join(flags)}" if flags else "")


def fmt_prof(rec):
    """The execution profile (since round 19): per timed run, completed
    stages / task-time sum / GC / shuffle read+write — the WHERE behind
    a regression. 'same stages+bytes, task-time Nx' reads as a box tax;
    'stage count grew' reads as a plan or memo change."""
    ps = rec.get("prof")
    if not ps:
        return None
    return "  ".join(
        f"run{i + 1}: st={p['st']} task={p['task']:.1f}s gc={p['gc']:.1f}s"
        f" shuf={p['sr']:.0f}/{p['sw']:.0f}MB"
        for i, p in enumerate(ps))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    a, b = load(args[0]), load(args[1])
    print(f"A: {args[0]}  contention={a.get('contention')} "
          f"floor={a.get('floor')} total={a.get('total_sec')}")
    print(f"B: {args[1]}  contention={b.get('contention')} "
          f"floor={b.get('floor')} total={b.get('total_sec')}")
    shared = set(a["queries"]) & set(b["queries"])
    # failed queries record min = -1.0; they are the WORST regressions
    # and must never sort out of sight (nor produce nonsense ratios)
    broke = sorted(n for n in shared
                   if b["queries"][n] < 0 <= a["queries"][n])
    fixed = sorted(n for n in shared
                   if a["queries"][n] < 0 <= b["queries"][n])
    failing = sorted(n for n in shared
                     if a["queries"][n] < 0 and b["queries"][n] < 0)
    for label, names in (("BROKE in B (ran in A)", broke),
                         ("fixed in B (failed in A)", fixed),
                         ("failing in BOTH", failing)):
        if names:
            print(f"\n{label}: {', '.join(names)}")
    common = sorted((n for n in shared
                     if a["queries"][n] >= 0 and b["queries"][n] >= 0),
                    key=lambda n: b["queries"][n] - a["queries"][n],
                    reverse=True)
    print(f"\n{len(common)} shared passing queries; top {top} min-time"
          " regressions of B over A:\n")
    for name in common[:top]:
        da, db = a["queries"][name], b["queries"][name]
        if db <= da:
            break
        # the JSON stores 4-decimal times, so a sub-0.05 ms min can
        # round to 0.0 — print x(inf) instead of aborting the printout
        ratio = f"x{db / da:.2f}" if da > 0 else "x(inf)"
        print(f"{name}: min {da:.3f} -> {db:.3f}  (+{db - da:.3f}s,"
              f" {ratio})")
        for tag, d in (("A", a), ("B", b)):
            recs = d.get("attrib", {}).get(name)
            ax = axes_for(d, name)
            if not recs:
                print(f"  {tag}: (no attribution record — pre-r17 run)")
                continue
            for i, rec in enumerate(recs, start=1):
                s, f = ax.get(i, (None, None))
                win = (f"window sent={s:.2f} floor={f:.2f}"
                       if s is not None else "window n/a")
                print(f"  {tag} pass{i}: {fmt_rec(rec)}  {win}")
                prof = fmt_prof(rec)
                if prof:
                    print(f"           {prof}")
        wa = a.get("attrib", {}).get(name)
        wb = b.get("attrib", {}).get(name)
        if wa and wb:
            cold = [f"pass{i+1}" for i in range(min(len(wa), len(wb)))
                    if wa[i].get("w2") != wb[i].get("w2")]
            if cold:
                print(f"  -> warm-memo state DIFFERS in {', '.join(cold)}"
                      " (cold rebuild suspected)")
            if any(r.get("ev") for r in wb):
                print("  -> B saw mid-query eviction: memo rebuilt inside"
                      " the timing")
        print()


if __name__ == "__main__":
    main()
