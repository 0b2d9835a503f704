"""Compile independent_check.py shard logs into a markdown table.

Usage: python experiments/slsqp_table.py /tmp/slsqp_shard*.log
Parses the per-instance lines and prints the cross-solver comparison table
(the reference's IPOPT-vs-IPDDP2 protocol, experiments/ipopt/concar.jl,
applied to OUR randomized instances with scipy SLSQP as the independent
solver).
"""

import re
import sys

ROW = re.compile(
    r"(\w+) seed (\d+): ours=([\d.e+-]+)\s+slsqp\(cold\)=([\d.e+-]+) "
    r"\[(same basin|different local opt); (\d+) its, (\d+)s\]\s+"
    r"warm-start improvement=([\d.e+-]+)")
# contact problems run warm-start-only (cold dense NLP too large)
ROW_WARM = re.compile(
    r"(\w+) seed (\d+): ours=([\d.e+-]+)\s+"
    r"\(cold start skipped[^)]*\)\s+warm-start improvement=([\d.e+-]+)")


def main(paths):
    rows = []
    for p in paths:
        for line in open(p):
            m = ROW.search(line)
            if m:
                rows.append({
                    "problem": m.group(1), "seed": int(m.group(2)),
                    "ours": float(m.group(3)), "cold": float(m.group(4)),
                    "same": m.group(5) == "same basin",
                    "its": int(m.group(6)), "wall_s": int(m.group(7)),
                    "improve": float(m.group(8)), "shard": p,
                })
                continue
            m = ROW_WARM.search(line)
            if m:
                rows.append({
                    "problem": m.group(1), "seed": int(m.group(2)),
                    "ours": float(m.group(3)), "cold": None, "same": None,
                    "improve": float(m.group(4)), "shard": p,
                })
    if not rows:
        print("no instances parsed")
        return
    print("| problem | shard/seed | ours | SLSQP cold | basin | "
          "ours better? | stationarity held |")
    print("|---|---|---|---|---|---|---|")
    held = same = better = ncold = 0
    for r in rows:
        h = r["improve"] <= 1e-4 + 1e-8
        held += h
        tag = r["shard"].split("shard")[-1].split(".")[0]
        if r["cold"] is None:
            print(f"| {r['problem']} | {tag}/{r['seed']} | {r['ours']:.6e} | "
                  f"(warm-only) | — | — | {'yes' if h else 'NO'} |")
            continue
        ncold += 1
        same += r["same"]
        better += r["ours"] <= r["cold"] + 1e-6
        print(f"| {r['problem']} | {tag}/{r['seed']} | {r['ours']:.6e} | "
              f"{r['cold']:.6e} | {'same' if r['same'] else 'different'} | "
              f"{'yes' if r['ours'] <= r['cold'] + 1e-6 else 'no'} | "
              f"{'yes' if h else 'NO'} |")
    n = len(rows)
    print(f"\n{n} instances ({ncold} cold): {held}/{n} stationarity "
          f"certificates held, {same}/{ncold} same basin, "
          f"ours <= SLSQP on {better}/{ncold}.")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/slsqp_shard11.log", "/tmp/slsqp_shard12.log"])
