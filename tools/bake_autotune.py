#!/usr/bin/env python
"""Bake measured flash-block autotune results into the kernel's chooser.

Reads the autotune_* phase records from a hardware-session JSONL (default
HW_SESSION_r04.jsonl, each written by tools/hw_session.py as
{"phase": "autotune_<res|sample>", "ok": true, "env": {...},
 "result": {"results": [{"point": B, "value": img_s}, ...], "best": ...}})
and rewrites the _TUNED_BLOCK_N table between the AUTOTUNE TABLE markers in
ops/flash_attention.py, keyed by the program's largest self-attention q
length ((res/8)^2 latent tokens). The runtime chooser prefers this measured
table over DEFAULT_BLOCK_N when SD_FLASH_BLOCK_N is unset; the VMEM-fit
clamp still applies after it (the 16MB scoped-VMEM cliff documented in the
kernel).

Usage: python tools/bake_autotune.py [session.jsonl] [--dry-run]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KERNEL = os.path.join(
    REPO, "stable_diffusion_pytorch_tpu", "ops", "flash_attention.py"
)
BEGIN = "# --- BEGIN AUTOTUNE TABLE (rewritten by tools/bake_autotune.py) ---"
END = "# --- END AUTOTUNE TABLE ---"


def collect(path: str) -> dict:
    """{q_tokens: (best_block, best_img_s, res)} from autotune phase records."""
    table = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not rec.get("ok") or not rec.get("phase", "").startswith("autotune"):
                continue
            res = int(rec.get("env", {}).get("BENCH_RES", 512))
            points = [
                r
                for r in rec["result"].get("results", [])
                if isinstance(r.get("value"), (int, float))
            ]
            if not points:
                continue
            best = max(points, key=lambda r: r["value"])
            n_tokens = (res // 8) ** 2
            # later records for the same bucket win (re-runs supersede)
            table[n_tokens] = (int(best["point"]), float(best["value"]), res)
    return table


def render(table: dict) -> str:
    lines = [
        BEGIN,
        "# Measured best q-block by self-attention token count (v5e-1, bf16,",
        "# end-to-end bench.py sweep; HW_SESSION_r04.jsonl autotune_* phases).",
        "# Keys are the LARGEST self-attention q length in the swept program",
        "# ((res/8)^2 latent tokens); empty until a hardware sweep is baked.",
    ]
    if not table:
        lines.append("_TUNED_BLOCK_N: dict = {}")
    else:
        lines.append("_TUNED_BLOCK_N: dict = {")
        for n_tokens in sorted(table):
            block, img_s, res = table[n_tokens]
            lines.append(
                f"    {n_tokens}: {block},  # {res}px bench: {img_s} img/s"
            )
        lines.append("}")
    lines.append(END)
    return "\n".join(lines)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    dry = "--dry-run" in sys.argv[1:]
    path = args[0] if args else os.path.join(REPO, "HW_SESSION_r04.jsonl")
    table = collect(path)
    block = render(table)
    if dry:
        print(block)
        return
    with open(KERNEL) as f:
        src = f.read()
    i, j = src.index(BEGIN), src.index(END) + len(END)
    with open(KERNEL, "w") as f:
        f.write(src[:i] + block + src[j:])
    print(
        f"baked {len(table)} bucket(s) into {os.path.relpath(KERNEL, REPO)}: "
        + json.dumps({k: v[0] for k, v in sorted(table.items())})
    )


if __name__ == "__main__":
    main()
