#!/usr/bin/env python
"""Interleaved A/B of the bitmask broadcast gate (guide §1: same
session, alternating arms) for setsim/containment at sf0.1.

A = gate off (_BITMASK_BCAST_BYTES=0, the shuffled plan)
B = gate on (default, broadcast hints)

Both arms bypass the per-relation vocab/mask memos (monkeypatched to
rebuild every call), so the printed ratio isolates the broadcast gate
alone — with the memos live, the B arm's persisted mask relation would
be served to the A arm too and contaminate it.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from scip_spark.session import get_spark

    spark = get_spark(
        "ab-bitmask-bcast",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions import dedup
    from scip_spark.functions.dedup_queries import _shared_doc_tokens
    from scip_spark.queries import tbl

    docs = tbl(spark, sf_dir, "documents")
    tok = _shared_doc_tokens(spark, sf_dir)
    tok.count()
    default_gate = dedup._BITMASK_BCAST_BYTES

    # neutralize the memo layers in BOTH arms (see module docstring)
    dedup._shared_mask_relation = lambda tok, tok2, n_words, persist_ok: (
        dedup._mask_relation(tok2.select("sid", "bit"), n_words)
    )
    orig_small_vocab = dedup._small_vocab

    def _vocab_nomemo(t, cap):
        if hasattr(t, "_scip_vocab_memo"):
            del t._scip_vocab_memo
        return orig_small_vocab(t, cap)

    dedup._small_vocab = _vocab_nomemo

    def run(fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for label, build in (
        ("setsim", lambda: dedup.setsim_prefix_join(
            docs, threshold=0.95, tok=tok)),
        ("containment", lambda: dedup.containment_join(
            docs, threshold=1.0, tok=tok)),
    ):
        # warm both arms once
        for gate in (0, default_gate):
            dedup._BITMASK_BCAST_BYTES = gate
            run(build)
        aa, bb = [], []
        for _ in range(pairs):
            dedup._BITMASK_BCAST_BYTES = 0
            aa.append(run(build))
            dedup._BITMASK_BCAST_BYTES = default_gate
            bb.append(run(build))
        print(f"{label}: A(shuffled)={aa} min={min(aa)}  "
              f"B(broadcast)={bb} min={min(bb)}  "
              f"ratio(minB/minA)={min(bb)/min(aa):.3f}")
    dedup._BITMASK_BCAST_BYTES = default_gate
    spark.stop()


if __name__ == "__main__":
    main()
