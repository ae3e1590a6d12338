"""Re-run bench.py until one run's mean 1-min loadavg is inside the
engine's own steady-state band (r17 VERDICT item 2: eight loaded runs
and hand adjudication — the protocol should produce its own clean
evidence).

Each attempt is a fresh ``python bench.py`` subprocess (fresh JVM, same
contract as the driver's invocation).  An attempt COUNTS as quiet when
its detail artifact's ``loadavg_mean`` <= ``$SPARK_GRAFT_QUIET_MEAN``
(default 11.0, the top of the engine's local[32] self band; r16's
canonical run sat at 9.1).  Stops at the first quiet run or after
``$SPARK_GRAFT_QUIET_ATTEMPTS`` (default 6) attempts, printing one JSON
line naming every attempt's detail file + mean so BENCH_NOTES can cite
the chosen run.

Usage: python tools/quiet_bench.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    target = float(os.environ.get("SPARK_GRAFT_QUIET_MEAN", "11.0"))
    attempts = int(os.environ.get("SPARK_GRAFT_QUIET_ATTEMPTS", "6"))
    pause = float(os.environ.get("SPARK_GRAFT_QUIET_PAUSE", "60"))
    runs = []
    quiet = None
    for i in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        tail = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
        line = next(
            (ln for ln in reversed(tail) if ln.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            runs.append({"attempt": i + 1, "error": proc.stderr[-300:]})
            continue
        head = json.loads(line)
        m = re.search(r"BENCH_DETAIL_\S+\.json", head.get("detail_file", ""))
        detail_file = m.group(0) if m else head.get("detail_file")
        row = {
            "attempt": i + 1,
            "detail_file": detail_file,
            "loadavg_mean": head.get("loadavg_mean"),
            "total_sec": head.get("value"),
        }
        runs.append(row)
        if (
            head.get("loadavg_mean") is not None
            and head["loadavg_mean"] <= target
        ):
            quiet = row
            break
        time.sleep(pause)
    print(
        json.dumps(
            {
                "quiet_target_mean": target,
                "quiet_run": quiet,
                "attempts": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
