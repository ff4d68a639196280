#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs per query.

Usage: python3 tools/bench_compare.py A.txt B.txt [threshold]
Each file: the bench stdout (first line = full per-query JSON).
Prints queries where B/A exceeds the threshold (default 1.5) plus
family and total summaries — the shared-vs-fresh / round-vs-round
drift analysis in one place.
"""
import json, sys


def load(path):
    for line in open(path):
        line = line.strip()
        if '"queries"' in line:
            # bench lines may arrive wrapped in sbt's [info] prefix
            return json.loads(line[line.index('{'):])
    raise SystemExit(f"no bench JSON in {path}")


def fam(q):
    for p in ("q_stream", "q_dedup", "q_sim", "q_window"):
        if q.startswith(p):
            return p
    return "core"


def main(a_path, b_path, thresh=1.5):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"A={a_path} total={a['value']:.1f}s n={len(qa)} mode={a.get('mode','?')}")
    print(f"B={b_path} total={b['value']:.1f}s n={len(qb)} mode={b.get('mode','?')}")
    only_a, only_b = set(qa) - set(qb), set(qb) - set(qa)
    if only_a:
        print(f"only in A ({sum(qa[q] for q in only_a):.1f}s): {sorted(only_a)}")
    if only_b:
        print(f"only in B ({sum(qb[q] for q in only_b):.1f}s): {sorted(only_b)}")
    ca = sum(qa[q] for q in common)
    cb = sum(qb[q] for q in common)
    print(f"common {len(common)} queries: A {ca:.1f}s -> B {cb:.1f}s ({cb/ca:.2f}x)")
    fams = {}
    for q in common:
        fa = fams.setdefault(fam(q), [0.0, 0.0])
        fa[0] += qa[q]
        fa[1] += qb[q]
    for f, (sa, sb) in sorted(fams.items()):
        print(f"  {f:10s} A {sa:6.1f}s  B {sb:6.1f}s  ({sb/sa:.2f}x)")
    print(f"\nqueries with B/A > {thresh} (or < 1/{thresh}):")
    rows = [(qb[q] / qa[q], q) for q in common if qa[q] > 0.05]
    for r, q in sorted(rows, reverse=True):
        if r > thresh or r < 1 / thresh:
            sa = a.get("spread_max_over_min", a.get("spread", {})).get(q, "")
            sb = b.get("spread_max_over_min", b.get("spread", {})).get(q, "")
            print(f"  {q:28s} A {qa[q]:6.2f}s (sp {sa})  B {qb[q]:6.2f}s (sp {sb})  {r:.2f}x")


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    main(sys.argv[1], sys.argv[2], t)
