#!/usr/bin/env python
"""Attestation ledger — which official CORRECTNESS_r{N}.json artifact (if
any) attested each registry key, plus the rotation state for future rounds.

The driver records only the first 50 registration-ordered keys per round,
so registry order is rotated each round to push never-attested keys into
the window (VERDICT r2 "Next round" #1/#8). This tool regenerates the
ledger README section from the artifacts so judges and future rounds can
see the rotation state at a glance:

    python tools/attestation_ledger.py            # print markdown
    python tools/attestation_ledger.py --update   # rewrite README section
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- ATTESTATION-LEDGER:BEGIN -->"
END = "<!-- ATTESTATION-LEDGER:END -->"


def build_ledger() -> str:
    from flink_streaming_gnn_spark import registry

    rounds: dict[str, int] = {}  # key -> first round attested
    artifacts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in artifacts:
        rnum = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for key in json.load(open(path)):
            rounds.setdefault(key, rnum)

    queries = registry.all_queries()
    oracle = registry.all_oracle_sql()
    keys = list(queries)
    attested = [k for k in keys if k in rounds]
    pending = [k for k in keys if k not in rounds]
    window = keys[:50]

    lines = [
        "## Attestation ledger",
        "",
        "The driver's CORRECTNESS artifact records the first 50",
        "registration-ordered keys per round; `registry._PRIORITY_KEYS`",
        "rotates never-attested keys into that window each round. Generated",
        "by `tools/attestation_ledger.py --update` from the artifacts.",
        "",
        f"- registry keys: **{len(keys)}** "
        f"({len(oracle)} exact-oracle, {len(keys) - len(oracle)} rows-only)",
        f"- officially attested so far: **{len(attested)}** "
        f"(artifacts: {', '.join(os.path.basename(a) for a in artifacts)})",
        f"- never attested yet: **{len(pending)}**",
        f"- current round's 50-key window, all unattested: "
        f"**{sum(1 for k in window if k not in rounds)}/50**",
        "",
        "| key | attested in round |",
        "|---|---|",
    ]
    for k in keys:
        mark = f"r{rounds[k]}" if k in rounds else "— (pending)"
        lines.append(f"| `{k}` | {mark} |")
    nxt = [k for k in pending if k not in window]
    lines += [
        "",
        f"**Next rotation plan** ({len(nxt)} keys remaining after the current",
        "window lands): move these to the front of `_PRIORITY_KEYS` next round:",
        "",
        ", ".join(f"`{k}`" for k in nxt) or "(none)",
    ]
    return "\n".join(lines)


def main() -> None:
    md = build_ledger()
    if "--update" in sys.argv:
        readme = os.path.join(REPO, "README.md")
        text = open(readme).read()
        block = f"{BEGIN}\n{md}\n{END}"
        if BEGIN in text:
            text = re.sub(
                re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S
            )
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        open(readme, "w").write(text)
        print(f"README.md ledger section updated ({len(md.splitlines())} lines)")
    else:
        print(md)


if __name__ == "__main__":
    main()
