"""Quiet-gated boundary-code worktree A/B (VERDICT r13 Next #2).

The standing instrument (SCALING.md "Round-12"/"Round-13"): check out the
previous round's HEAD in a git worktree, run each side's own bench.py
back-to-back on the same box, compare per-query. r12's run was decisive;
r13's crossed a violent burst and needed a three-observation essay to
adjudicate three x3 flags. The fix ordered for r14: do not START a side
while the box is loud — run the same warm-probe quiet gate bench.py now
uses, sleep-and-retry bounded, and record the trail either way.

    python tools/ab_boundary.py <base_ref> [out_prefix]

Runs: quiet gate -> base-side bench (worktree's own bench.py) -> quiet
gate -> HEAD-side bench, writing <out_prefix>_<base|head>side.json with
each side's LAST output line (the compact record) plus the gate trail.
The HEAD side's bench.py also runs its own internal gate; the base
side's (pre-r14) bench.py has none, which is why the gate lives here.

Env: SPARK_GRAFT_BENCH_RUNS forwards to both sides (default 5). The
carried set is always measured by both sides' bench.py by construction —
there is deliberately no query-subset knob (ADVICE r14 #4: a documented
knob that reads nothing only confuses operators).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def quiet_gate_once() -> dict:
    """Run bench.quiet_gate with a fresh session in a CHILD process (so
    the gate's JVM does not warm either side's bench JVM)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, bench\n"
        "from docling_api_spark.session import get_spark\n"
        "spark = get_spark(app_name='ab-quiet-gate')\n"
        "gate = bench.quiet_gate({\n"
        "    'probe_spark': lambda: bench._spark_probe(spark),\n"
        "    'probe_shuffle': lambda: bench._spark_shuffle_probe(spark),\n"
        "    'probe_window': lambda: bench._spark_window_probe(spark),\n"
        "})\n"
        "print('GATE ' + json.dumps(gate))\n" % REPO
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/tmp",
    )
    for line in out.stdout.splitlines():
        if line.startswith("GATE "):
            return json.loads(line[5:])
    raise RuntimeError(f"quiet gate child failed:\n{out.stderr[-2000:]}")


def run_side(side_dir: str, label: str, out_path: str, gate: dict) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "5")
    print(f"[{label}] bench starting in {side_dir}", file=sys.stderr)
    res = subprocess.run(
        [sys.executable, os.path.join(side_dir, "bench.py")],
        capture_output=True, text=True, cwd=side_dir, env=env,
    )
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    if res.returncode != 0 or not lines:
        raise RuntimeError(
            f"{label} bench failed rc={res.returncode}:\n{res.stderr[-2000:]}"
        )
    detailed = json.loads(lines[0])
    compact = json.loads(lines[-1])
    record = {
        "label": label,
        "pre_gate": gate,
        "parsed": compact,
        "detailed": detailed,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(record, f)
        f.write("\n")
    print(
        f"[{label}] carried_total={compact.get('carried_total')} "
        f"regime={compact.get('regime')} gate_quiet={gate.get('quiet')} "
        f"-> {out_path}",
        file=sys.stderr,
    )
    return record


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    base_ref = sys.argv[1]
    prefix = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "AB_r14")
    wt = "/tmp/ab_base_side"
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt],
        cwd=REPO, capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--force", wt, base_ref],
        cwd=REPO, check=True,
    )
    try:
        gate_b = quiet_gate_once()
        base = run_side(wt, f"base({base_ref})", f"{prefix}_baseside.json", gate_b)
        gate_h = quiet_gate_once()
        head = run_side(REPO, "head", f"{prefix}_headside.json", gate_h)
        bq, hq = base["parsed"]["queries"], head["parsed"]["queries"]
        shared = sorted(set(bq) & set(hq))
        ratios = sorted(
            ((hq[n] / bq[n] if bq[n] else float("inf")), n) for n in shared
        )
        med = ratios[len(ratios) // 2]
        print(f"\nshared queries: {len(shared)}; median head/base ratio "
              f"x{med[0]:.3f} ({med[1]})")
        for r, n in ratios[-5:]:
            print(f"  slowest movers: {n} x{r:.2f} "
                  f"({bq[n]:.2f}s -> {hq[n]:.2f}s)")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
