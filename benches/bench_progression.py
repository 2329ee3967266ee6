"""Course-progression benchmark: fresh process per variant.

Parity: /root/reference/benches/bench_course_progression.py — run each
optimization stage in its own process (clean compile caches, no cross-
variant state) and report medians. Our ladder mirrors the reference's
week2/week3 checkpoints:

  xla        — everything through XLA (the 'readable' baseline)
  pallas     — Pallas quantized matmul + flash attention (week-2 end)
  serving    — paged KV + continuous batching (week-3 end)
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

VARIANTS = [
    ("xla_decode", ["--mode", "decode", "--impl", "xla"]),
    ("pallas_decode", ["--mode", "decode", "--impl", "pallas"]),
    ("paged_serving", ["--mode", "serving"]),
]


def run_variant(name: str, extra: list[str], model: str, repeats: int) -> dict:
    values = []
    payload = None
    for _ in range(repeats):
        cmd = [sys.executable, "bench.py", "--model", model, *extra]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600
        )
        line = None
        for ln in out.stdout.splitlines()[::-1]:
            if ln.startswith("{"):
                line = ln
                break
        if line is None:
            return {"variant": name, "error": out.stderr[-500:]}
        payload = json.loads(line)
        values.append(payload["value"])
    payload["variant"] = name
    payload["value"] = statistics.median(values)
    payload["samples"] = values
    return payload


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--repeats", type=int, default=1)
    p.add_argument("--variants", nargs="*", default=[v for v, _ in VARIANTS])
    args = p.parse_args()

    rows = []
    for name, extra in VARIANTS:
        if name not in args.variants:
            continue
        row = run_variant(name, extra, args.model, args.repeats)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "course_progression", "rows": rows}))


if __name__ == "__main__":
    main()
