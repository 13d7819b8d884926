"""Committed golden-value oracles for registry entries the DuckDB
oracle cannot value-check (tensor-valued pipelines — reference analogue:
the determinism oracle in SCIP's own suite, test/test_main.py:52).

A golden file pins the EXACT output of a deterministic query at a given
scale factor: row dicts of the query's own result (already a grid-
quantized ``floor(x*2^20)`` rollup, so every cell is an exact int or
string — no float-tolerance question). ``tools/check_oracle.py`` and
the pytest suite compare against these with the same canonical-rows
machinery as the SQL oracle, which turns cross-round kernel drift into
a hard failure instead of per-rewrite diligence.

Regenerate (ONLY after an intentional semantic change, never to make a
red gate green — the diff is the review artifact):

    python tools/regen_golden.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pandas as pd

GOLDEN_DIR = Path(__file__).parent


def sf_tag(sf_dir: str) -> str | None:
    """The literal scale-factor token of a testdata dir ('0.01'), used
    verbatim in golden filenames so 0.1/0.10 never alias."""
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return m.group(1).rstrip(".") if m else None


def golden_path(name: str, sf_dir: str) -> Path | None:
    tag = sf_tag(sf_dir)
    return GOLDEN_DIR / f"{name}_sf{tag}.json" if tag else None


def load_golden(name: str, sf_dir: str) -> pd.DataFrame | None:
    """The pinned expected output as a DataFrame, or None if this
    (query, sf) pair has no committed golden."""
    p = golden_path(name, sf_dir)
    if p is None or not p.exists():
        return None
    return pd.DataFrame(json.loads(p.read_text())["rows"])


def save_golden(name: str, sf_dir: str, df: pd.DataFrame) -> Path:
    p = golden_path(name, sf_dir)
    if p is None:
        raise ValueError(f"no sf tag in {sf_dir!r}")
    # double_precision=15 (pandas max): goldens pin EXACT values, and the
    # default 10 would silently truncate any future float column.
    rows = json.loads(df.to_json(orient="records", double_precision=15))
    p.write_text(
        json.dumps({"query": name, "sf": sf_tag(sf_dir), "rows": rows}, indent=1)
        + "\n"
    )
    return p
