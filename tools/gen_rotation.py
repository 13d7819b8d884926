"""Regenerate the driver-rotation bookkeeping in __spark_entry__.py.

The driver verifies ~50 registry queries per round (CORRECTNESS_r*.json);
``queries()`` orders the registry so never-verified entries run first and
verified ones stalest-first, landing each round's budget on the
least-recently-green rows. This tool recomputes ``_DRIVER_CHECKED`` (union
of all green rows across every CORRECTNESS_r*.json) and
``_LAST_GREEN_ROUND`` (max green round per query) and splices them into
__spark_entry__.py between the GEN markers. Run after each round:

    python tools/gen_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")

#: queries whose IMPLEMENTATION was materially rewritten (r14 review):
#: a green stamp earned by the OLD code must not push the rewritten
#: path to the back of the verification queue. Maps name -> the round
#: the rewrite landed in; a green stamp from an EARLIER round is
#: discarded (the entry then sorts with the never-verified, first), and
#: the override expires automatically once the driver re-greens the
#: new code at or after the rewrite round.
REWRITTEN: dict[str, int] = {
    # r14 rewrites: fused multi-branch imaging plan; interval-union
    # span coverage fold (shared by the whole substring-span family)
    "imaging_pipeline_e2e": 14,
    "dedup_substring_spans": 14,
    "dedup_substring_spans_stream": 14,
    "decontaminate_train_spans": 14,
}


def green_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, v in json.load(open(path)).items():
            if not isinstance(v, dict):
                continue
            if v.get("err") == "no_oracle":
                # rows-only entries (no SQL analogue): the driver's
                # weaker check is spark_rows > 0
                ok = bool(v.get("spark_rows"))
            elif v.get("err"):
                ok = False
            else:
                ok = bool(
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match") in (True, None)
                )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _wrap(body: str, indent: str = "    ") -> str:
    return "\n".join(
        textwrap.wrap(
            body, width=76, initial_indent=indent, subsequent_indent=indent,
            break_long_words=False, break_on_hyphens=False,
        )
    )


def render(last: dict[str, int]) -> str:
    rounds = sorted(set(last.values()))
    header = (
        f"# Union of queries any past driver CORRECTNESS run has verified "
        f"green\n# (r{rounds[0]:02d} ∪ ... ∪ r{rounds[-1]:02d}). "
        "Listing checked queries LAST (stalest-\n"
        "# verified first among them) rotates the driver's ~50-query "
        "budget onto\n# the least-recently-verified entries. Regenerate "
        "with tools/gen_rotation.py.\n"
    )
    checked = _wrap(
        ", ".join(f'"{n}"' for n in sorted(last))
    )
    lgr = _wrap(
        ", ".join(f'"{n}": {r}' for n, r in sorted(last.items()))
    )
    return (
        header
        + "_DRIVER_CHECKED = {\n" + checked + "\n}\n\n\n"
        + "#: last driver round each query was verified green in (stalest\n"
        + "#: sort FIRST so the ~50-query budget always lands on the least-\n"
        + "#: recently-verified rows). Regenerated each round from the\n"
        + "#: CORRECTNESS_r*.json green rows by tools/gen_rotation.py.\n"
        + "_LAST_GREEN_ROUND = {\n" + lgr + "\n}"
    )


def main() -> None:
    last = green_rounds()
    dropped = [
        n for n, rewrite_rnd in REWRITTEN.items()
        if last.get(n, 0) < rewrite_rnd and last.pop(n, None) is not None
    ]
    if dropped:
        print(f"forcing re-verification (rewritten): {sorted(dropped)}")
    src = open(ENTRY).read()
    begin, end = "# --- GEN:rotation begin ---", "# --- GEN:rotation end ---"
    block = f"{begin}\n{render(last)}\n{end}"
    if begin in src:
        src = re.sub(
            re.escape(begin) + r".*?" + re.escape(end), block, src, flags=re.S
        )
    else:
        raise SystemExit("GEN markers not found in __spark_entry__.py")
    open(ENTRY, "w").write(src)
    by_round: dict[int, int] = {}
    for r in last.values():
        by_round[r] = by_round.get(r, 0) + 1
    print(f"{len(last)} checked; per-round {sorted(by_round.items())}")


if __name__ == "__main__":
    main()
