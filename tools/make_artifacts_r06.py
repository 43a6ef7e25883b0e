#!/usr/bin/env python
"""Fold this round's measurement logs into the committed artifacts.

Inputs (bench.py output logs, one JSON line each):
  /tmp/pscale_r6_8m_clean.log   HEAD 4->16 @ 8M  (quiet machine)
  /tmp/pscale_r5_8m_clean.log   round-start worktree, same session
  /tmp/pscale_r6_32m.log        HEAD 4->16 @ 32M (done criterion)
  /tmp/scaling64.log            bench.py --scaling-only @ 64M (optional)

Writes PRODUCT_SCALING_r06.json and, when the 64M log exists, updates
SCALING_RESULT.json's regime pairs in place (history preserved under
regimes_default_emission_r5).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def read_json_line(path: str):
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        txt = f.read().replace(b"\x00", b"").decode("utf-8", "replace")
    for ln in reversed(txt.strip().splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    return None


def main():
    r6_8m = read_json_line("/tmp/pscale_r6_8m_clean.log")
    r6_8m_final = read_json_line("/tmp/pscale_r6_8m_final.log")
    r5_8m = read_json_line("/tmp/pscale_r5_8m_clean.log")
    r6_32m = read_json_line("/tmp/pscale_r6_32m.log")

    out = {
        "what": ("CrawlDriver.run_round (full product round) at two "
                 "pinned parallelism levels — VERDICT r5 Wrong #1 "
                 "re-measurement after the candidate-path narrowing"),
        "protocol": ("fresh taskset-pinned JVMs, levels interleaved "
                     "best-of-2, setup untimed, bit_xor schedule "
                     "checksum asserted identical across levels "
                     "(bench.py --product-scaling, unchanged)"),
        "date": "2026-08-21",
        "baseline_same_session": ("the round-start tree (62aff64) was "
                                  "re-measured in the same session on "
                                  "the same machine — cross-day "
                                  "efficiency comparisons vs "
                                  "PRODUCT_SCALING_r05.json conflate "
                                  "host-load drift"),
        "pairs": {},
    }
    if r6_8m:
        out["pairs"]["r6-mid-round 4->16@8M"] = r6_8m["product_scaling"]
    if r6_8m_final:
        out["pairs"]["r6 4->16@8M"] = r6_8m_final["product_scaling"]
    if r5_8m:
        out["pairs"]["r5-same-session 4->16@8M"] = \
            r5_8m["product_scaling"]
    if r6_32m:
        out["pairs"]["r6 4->16@32M"] = r6_32m["product_scaling"]
    p = os.path.join(REPO, "PRODUCT_SCALING_r06.json")
    with open(p, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", p)

    s64 = read_json_line("/tmp/scaling64.log")
    if s64 and "scaling" in s64:
        sp = os.path.join(REPO, "SCALING_RESULT.json")
        with open(sp) as f:
            art = json.load(f)
        old = art.pop("regimes_default_emission", None)
        if old is not None:
            art["regimes_default_emission_r5"] = old
        art["regimes_64M_r6"] = {
            "note": ("round 6: full-size two-regime refresh "
                     "(VERDICT r5 Next #4) — bench.py --scaling-only "
                     "with OSSE_SCALING_FRONTIER=64000000; frontier "
                     "bench code unchanged this round"),
            "rows": s64["scaling"]["scaling_rows"],
            "pairs": s64["scaling"]["pairs"],
            "inner": s64["scaling"].get("inner"),
            "date": "2026-08-21",
        }
        with open(sp, "w") as f:
            json.dump(art, f, indent=1)
        print("updated", sp)
    else:
        print("no 64M scaling log yet — SCALING_RESULT.json untouched")


if __name__ == "__main__":
    main()
