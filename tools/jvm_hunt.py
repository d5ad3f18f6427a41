"""JVM-ceiling-gated hunt for a raw >=0.8 scaling round.

The third probe-gated hunt (BENCH/BASELINE.md) identified a systematic
gap: the cheap Python multiprocessing probe reads 0.88-0.95 in windows
where the pure-JVM xxhash ceiling is only 0.49-0.79 — so Python-probe
gating fires into windows where raw >= 0.8 is physically impossible for
a JVM workload. This hunt gates on the JVM ceiling itself:

1. every cycle, run `bench.py --jvmceil` (one JVM, local[2] then
   local[8] SparkContexts, timed pure-JVM max(xxhash64) sweep per
   level, ~60-90 s) → the ceiling the JVM is ACTUALLY getting now;
2. when ceil >= FIRE_CEIL and 1-min load < 4, fire ONE
   `bench.py --pairchild` round (3 interleaved pairs, best-of-3 runs
   per visit, per-pair JVM calibration, abort-on-dead-window);
3. append EVERY probe and EVERY fired round to BENCH/hunt_r5.jsonl
   (type "jvmceil" / "round", mode tag "jvmgated") — no selection;
4. a PASS is a pair with eff >= GATE, its own cpu_eff >= CRED_CEIL, and
   eff <= 1.05 (super-linear pairs mean the lo visit absorbed a host
   stall and are rejected as evidence — no-selection rule still logs
   them). Exit after MAX_PASSES passes, MAX_FIRES fires, or budget.

Run from the repo root:  python tools/jvm_hunt.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_BENCH_PAGES", "12800000")

LOG = os.path.join(REPO, "BENCH", "hunt_r5.jsonl")

FIRE_CEIL = float(os.environ.get("HUNT_FIRE_CEIL", "0.82"))
GATE = float(os.environ.get("HUNT_GATE", "0.80"))
CRED_CEIL = float(os.environ.get("HUNT_CRED_CEIL", "0.75"))
MAX_PASSES = int(os.environ.get("HUNT_MAX_PASSES", "1"))
MAX_FIRES = int(os.environ.get("HUNT_MAX_FIRES", "5"))
BUDGET_SEC = float(os.environ.get("HUNT_BUDGET_SEC", "10800"))
PROBE_COOLDOWN = float(os.environ.get("HUNT_PROBE_COOLDOWN", "90"))
PAIR_TIMEOUT = float(os.environ.get("HUNT_PAIR_TIMEOUT", "1500"))


def _log(obj: dict) -> None:
    obj["t"] = round(time.time(), 1)
    obj["mode"] = "jvmgated"
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")


def jvm_ceil() -> float | None:
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--jvmceil"],
            capture_output=True, text=True, timeout=300)
        d = json.loads(p.stdout.strip().splitlines()[-1])
    except Exception:
        return None
    _log({"type": "jvmceil", **d, "load1": round(os.getloadavg()[0], 2)})
    return d["ceil"]


def fire() -> list[dict]:
    env = dict(os.environ)
    env["SPARK_GRAFT_PAIR_ABORT_CEIL"] = str(CRED_CEIL)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--pairchild"],
            capture_output=True, text=True, timeout=PAIR_TIMEOUT, env=env)
        d = json.loads(p.stdout.strip().splitlines()[-1])
    except Exception as e:
        _log({"type": "round", "error": str(e)[:200]})
        return []
    out = []
    for rec in d.get("pairs", []):
        if "lo" not in rec or "hi" not in rec:
            continue
        eff = (rec["hi"]["pages_per_sec"] / rec["lo"]["pages_per_sec"]) / 4.0
        cpu_eff = (rec["lo"]["cpu_sec"] / rec["hi"]["cpu_sec"]) / 4.0
        out.append({"eff": round(eff, 3), "cpu_eff": round(cpu_eff, 3),
                    "norm": round(min(eff / cpu_eff, 1.0), 3)
                    if cpu_eff > 0 else 0.0,
                    "lo": rec["lo"], "hi": rec["hi"]})
    _log({"type": "round", "n_pages": d.get("n_pages"),
          "aborted_low_ceiling": d.get("aborted_low_ceiling"),
          "effs": [p["eff"] for p in out],
          "cpu_effs": [p["cpu_eff"] for p in out],
          "norms": [p["norm"] for p in out],
          "pairs": out})
    return out


def main() -> None:
    t0 = time.time()
    fires = passes = 0
    while time.time() - t0 < BUDGET_SEC and fires < MAX_FIRES:
        c = jvm_ceil()
        load = os.getloadavg()[0]
        if c is not None and c >= FIRE_CEIL and load < 4:
            fires += 1
            for p in fire():
                credible = (p["eff"] >= GATE and p["cpu_eff"] >= CRED_CEIL
                            and p["eff"] <= 1.05)
                if credible:
                    passes += 1
                    print(f"PASS: eff={p['eff']} cpu_eff={p['cpu_eff']}")
            if passes >= MAX_PASSES:
                break
        time.sleep(PROBE_COOLDOWN)
    print(f"done: fires={fires} passes={passes} "
          f"elapsed={time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
