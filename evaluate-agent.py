"""Agent evaluation CLI: inspect / grade sealed task packages.

Parity: /root/reference/evaluate-agent.py — `inspect` prints the manifest
and checks; `grade` stages + freezes + grades the untouched package (all
checks against the pristine workspace); `run` evaluates a model-driven
agent on the package.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("inspect")
    pi.add_argument("package")

    pg = sub.add_parser("grade")
    pg.add_argument("package")

    pr = sub.add_parser("run")
    pr.add_argument("package")
    pr.add_argument("--model", default="qwen3-0.6b")
    pr.add_argument("--checkpoint-path", default=None)
    pr.add_argument("--max-steps", type=int, default=8)

    args = p.parse_args()
    from tiny_llm_tpu.agent import TaskPackage

    package = TaskPackage.load(args.package)

    if args.cmd == "inspect":
        print(json.dumps({
            "id": package.task_id,
            "instructions": package.instructions,
            "editable_paths": list(package.editable_paths),
            "checks": list(package.checks),
        }, indent=2))
        return

    if args.cmd == "grade":
        from tiny_llm_tpu.agent.evaluation import StagedTask, StaticHeldOutGrader

        staged = StagedTask.stage(package)
        results = StaticHeldOutGrader(package, staged.original).grade(
            staged.freeze()
        )
        for r in results:
            mark = "PASS" if r.passed else "FAIL"
            print(f"{mark} {r.check['type']} {r.check.get('path', '')} {r.detail}")
        print(f"{sum(r.passed for r in results)}/{len(results)} checks pass "
              "on the pristine workspace")
        return

    if args.cmd == "run":
        from main import build_model
        from tiny_llm_tpu.agent import AgentLimits, GenerationSession, evaluate_task

        model, tok = build_model(
            args.model, args.checkpoint_path, max_seq_len=4096, paged=False,
            impl=None,
        )
        gen = GenerationSession(model, tok)
        report = evaluate_task(
            package, lambda messages: gen(messages),
            limits=AgentLimits(max_steps=args.max_steps),
        )
        print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
