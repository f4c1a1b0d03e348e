#!/usr/bin/env python3
"""Summarize a SCALE_BENCH artifact: per-query time ratio vs corpus
ratio, spill onset, recall columns, build cells. Usage:
ladder_summary.py SCALE_BENCH_SF100.json"""
import sys, json

d = json.load(open(sys.argv[1]))
sfs = d["sfs"]
print(f"sfs={sfs} corpus_ratio={d.get('corpus_ratio')} reps={d.get('reps')} "
      f"heap={d.get('heap')} gen={d.get('gen_sec')} note={d.get('note','')!r}")
print(f"gen_version={d.get('gen_version')}")
for sf, b in (d.get("builds") or {}).items():
    cells = {k: (round(v,2) if isinstance(v,(int,float)) else v) for k,v in b.items()}
    print(f"builds {sf}: {cells}")
print(f"{'query':28s} {'sec-per-rung':30s} {'ratio':>7s} {'span':>6s} "
      f"{'diskspill-last':>14s} {'recall':>8s}")
for q, v in sorted(d.get("queries", {}).items()):
    secs = v.get("sec", [])
    ratio = v.get("ratio"); span = v.get("ratio_sf_span")
    ds = (v.get("disk_spill_mb") or [None])[-1]
    rec = v.get("planted_recall") or v.get("recall")
    print(f"{q:28s} {str([round(s,1) for s in secs]):30s} "
          f"{ratio if ratio is not None else '-':>7} {span if span is not None else '-':>6} "
          f"{ds if ds is not None else '-':>14} {str(rec)[:24]:>8s}")
st = d.get("streaming")
if st: print("streaming:", json.dumps(st)[:400])
cb = d.get("codebook_residency")
if cb: print("codebook_residency:", json.dumps(cb)[:400])
