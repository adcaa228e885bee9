#!/usr/bin/env python
"""Interleaved env-flag A/B probe (tools/ab_probe.py's discipline, for a
SAME-CODE feature gated by an environment variable — round 9's
``SPARK_GRAFT_BUCKETED_EDGES=1`` bucketed edge derivation).

Usage:
    python tools/ab_env_probe.py VAR=VALUE <key> [key ...] [--rounds N]

Alternates flag-ON / flag-OFF arms (fresh JVM per arm per round,
idle-gated, ARM ORDER ALTERNATING per round — the round-9 E3 lesson),
each arm running every key against the published ×10 blown corpus with
a noop sink. Since round 10 any flag-gated layout is built INSIDE the
arm's own process (cross-run layouts are banned), so an ON arm's first
key honestly pays the build; put a second key in the list to see the
amortized steady state. The untimed warmup only warms the page cache /
JIT symmetrically.

Verdict discipline: only claim a code-attributed delta when the arms
separate beyond their own within-arm spread.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_probe import _ARM_BODY, _wait_idle  # noqa: E402


def _run_arm(env_kv: tuple[str, str] | None, keys: list[str]) -> str:
    env = dict(os.environ)
    if env_kv:
        env[env_kv[0]] = env_kv[1]
    else:
        env.pop("SPARK_GRAFT_BUCKETED_EDGES", None)
    out = subprocess.run(
        [sys.executable, "-c", _ARM_BODY, REPO, *keys],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),
        env=env,
    )
    parts = [out.stdout.strip()]
    if out.returncode != 0:
        parts.append(f"ARM FAILED (exit {out.returncode})")
    if out.returncode != 0 or not out.stdout.strip():
        parts.append(out.stderr.strip()[-400:])
    return "\n".join(p for p in parts if p)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("flag", help="VAR=VALUE for the ON arm")
    p.add_argument("keys", nargs="+", help="registry keys to probe")
    p.add_argument("--rounds", type=int, default=2)
    ns = p.parse_args()
    var, _, val = ns.flag.partition("=")
    kv = (var, val or "1")
    print("warmup (untimed, flag OFF): page cache / JIT", flush=True)
    _run_arm(None, ns.keys[:1])
    for r in range(1, ns.rounds + 1):
        arms = ((f"{var}={kv[1]}", kv), ("OFF", None))
        if r % 2 == 0:  # alternate order to cancel first-arm bias
            arms = arms[::-1]
        for label, env_kv in arms:
            _wait_idle()
            with open("/proc/loadavg") as f:
                load = f.read().split()[0]
            print(f"--- round {r} arm {label} (load {load}):", flush=True)
            print(_run_arm(env_kv, ns.keys), flush=True)


if __name__ == "__main__":
    main()
