"""Public-API stability check.

Parity: /root/reference/scripts/diff_api.py (which asserts student/ref
signature parity via inspect). Here the contract is a recorded manifest:
`--record` snapshots every public callable's signature under
docs/api-manifest.json; the default mode verifies the live package still
matches — catching accidental API breaks in review.
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import json
import os
import sys

MODULES = [
    "tiny_llm_tpu.ops",
    "tiny_llm_tpu.kernels",
    "tiny_llm_tpu.kv",
    "tiny_llm_tpu.models",
    "tiny_llm_tpu.serving",
    "tiny_llm_tpu.parallel",
    "tiny_llm_tpu.generate",
    "tiny_llm_tpu.speculative",
    "tiny_llm_tpu.agent",
]

_HERE = os.path.dirname(os.path.abspath(globals().get("__file__", "scripts/x")))
sys.path.insert(0, os.path.join(_HERE, ".."))  # repo root (PYTHONPATH-free runs)
MANIFEST = os.path.join(_HERE, "..", "docs", "api-manifest.json")


def _sig(obj) -> str:
    sig = inspect.signature(obj)
    parts = []
    for name, prm in sig.parameters.items():
        s = name
        if prm.annotation is not inspect.Parameter.empty:
            s += f": {prm.annotation}"
        if prm.default is not inspect.Parameter.empty:
            d = repr(prm.default)
            if "{" in d or "object at" in d:
                d = "<default>"  # set/dict reprs are order-unstable
            s += f"={d}"
        parts.append(s)
    return "(" + ", ".join(parts) + ")"


def snapshot() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod_name in MODULES:
        mod = importlib.import_module(mod_name)
        names = getattr(mod, "__all__", None) or [
            n for n in dir(mod) if not n.startswith("_")
        ]
        for name in sorted(names):
            obj = getattr(mod, name, None)
            key = f"{mod_name}.{name}"
            if inspect.isclass(obj):
                try:
                    out[key] = "class" + _sig(obj)
                except (ValueError, TypeError):
                    out[key] = "class(...)"
                for m_name, m in sorted(inspect.getmembers(obj)):
                    if m_name.startswith("_") or not callable(m):
                        continue
                    try:
                        out[f"{key}.{m_name}"] = _sig(m)
                    except (ValueError, TypeError):
                        pass
            elif callable(obj):
                try:
                    out[key] = _sig(obj)
                except (ValueError, TypeError):
                    out[key] = "(...)"
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--record", action="store_true", help="rewrite the manifest")
    args = p.parse_args()
    live = snapshot()
    if args.record:
        os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
        with open(MANIFEST, "w") as f:
            json.dump(live, f, indent=1, sort_keys=True)
        print(f"recorded {len(live)} symbols")
        return
    with open(MANIFEST) as f:
        recorded = json.load(f)
    missing = sorted(set(recorded) - set(live))
    changed = sorted(
        k for k in set(recorded) & set(live) if recorded[k] != live[k]
    )
    added = sorted(set(live) - set(recorded))
    for k in missing:
        print(f"MISSING  {k}")
    for k in changed:
        print(f"CHANGED  {k}: {recorded[k]} -> {live[k]}")
    for k in added:
        print(f"added    {k}")
    if missing or changed:
        sys.exit(1)
    print(f"API matches manifest ({len(recorded)} symbols; {len(added)} new)")


if __name__ == "__main__":
    main()
