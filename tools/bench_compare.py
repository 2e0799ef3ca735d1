"""Round-over-round bench guardrail: diff two bench JSON lines per query
and fail on regressions beyond a noise threshold.

Usage::

    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [--max-ratio 1.5]

Exit 1 if any query (or the total) regressed by more than ``--max-ratio``.
The threshold defaults to 1.5× because this VM's co-tenant noise routinely
inflates single timings (see BENCH.md); compare best-of-N solo runs for
decisions, but let this catch step-function regressions (a lost broadcast,
a new shuffle, a Python fallback) that no noise model explains away.
Queries present in only one file are reported but never fail the gate
(new queries appear every round by design).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accepts either bench.py's raw one-line JSON or the driver's
    BENCH_r{N}.json wrapper (whole-file JSON whose 'tail' string embeds the
    bench line amid progress-bar noise)."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        # bench_corpus_scale.py record: nested {"name": {"sec": ...}} blocks
        nested = {
            k: v["sec"]
            for k, v in obj.items()
            if isinstance(v, dict) and isinstance(v.get("sec"), (int, float))
        }
        if nested:
            return {"queries": nested, "value": round(sum(nested.values()), 2)}
        blobs = [v for v in obj.values() if isinstance(v, str) and '{"metric"' in v]
        text = blobs[0] if blobs else text
    except json.JSONDecodeError:
        pass
    for line in text.replace("\r", "\n").splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no bench JSON object found in {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--normalize", action="store_true",
                    help="divide out host drift using the host_probe_mips_all "
                         "calibration each bench line carries: normalized "
                         "current_sec = raw_sec * cur_mips / base_mips, so the "
                         "verdict grades the code, not the VM epoch")
    args = ap.parse_args()
    base, cur = load(args.baseline), load(args.current)
    bq, cq = base.get("queries", {}), cur.get("queries", {})
    norm = 1.0
    if args.normalize:
        bp, cp = base.get("host_probe_mips_all"), cur.get("host_probe_mips_all")
        if bp and cp:
            norm = cp / bp
            print(f"host probe: {bp} -> {cp} M iters/s; normalizing current "
                  f"timings by x{norm:.3f}")
        else:
            print("host probe missing from one side; comparing raw timings")
    cq = {k: v * norm for k, v in cq.items()}
    failures = []
    rows = []
    for name in sorted(set(bq) | set(cq)):
        if name not in bq:
            rows.append(f"  new      {name}: {cq[name]:.2f}s")
            continue
        if name not in cq:
            rows.append(f"  dropped  {name}: was {bq[name]:.2f}s")
            continue
        ratio = cq[name] / bq[name] if bq[name] > 0 else float("inf")
        mark = "REGRESSED" if ratio > args.max_ratio else ("faster " if ratio < 1 / args.max_ratio else "ok     ")
        rows.append(f"  {mark}  {name}: {bq[name]:.2f}s -> {cq[name]:.2f}s ({ratio:.2f}x)")
        if ratio > args.max_ratio:
            failures.append(name)
    # the total gate must compare like with like: new rounds ADD queries, so
    # gate on the sum over queries present in BOTH files (raw totals shown
    # for context only)
    shared = set(bq) & set(cq)
    tot_b, tot_c = sum(bq[n] for n in shared), sum(cq[n] for n in shared)
    tot_ratio = tot_c / tot_b if tot_b else float("inf")
    print(
        f"shared-query total ({len(shared)} queries): {tot_b:.2f}s -> "
        f"{tot_c:.2f}s ({tot_ratio:.2f}x)   "
        f"[raw totals: {base.get('value')}s -> {cur.get('value')}s"
        + (f"; host-normalized x{norm:.3f}]" if norm != 1.0 else "]")
    )
    print("\n".join(rows))
    if tot_ratio > args.max_ratio:
        failures.append("<total>")
    if failures:
        print(f"FAIL: {len(failures)} regression(s) > {args.max_ratio}x: {failures}")
        return 1
    print("ok: no regression beyond threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
