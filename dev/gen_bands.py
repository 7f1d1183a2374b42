#!/usr/bin/env python3
"""Regenerate BenchBands.refs from a full bench_detail json.

Usage: python3 dev/gen_bands.py bench_detail_sf0.1.json

Prints the Scala `refs` map body plus the RefContention/RefFloor
constants of the recording run. Paste into BenchBands.scala after a
DELIBERATE plan change; never to absorb an unexplained regression.
"""
import json
import sys

d = json.load(open(sys.argv[1]))
qs = d["queries"]
print(f"  val RefContention = {d['contention']}")
print(f"  val RefFloor = {d['floor']}")
print()
print("  val refs: Map[String, Double] = Map(")
for name in sorted(qs):
    v = qs[name]
    if v < 0:
        print(f"    // {name} FAILED in the recording run -- no reference")
        continue
    print(f'    "{name}" -> {v},')
print("  )")
