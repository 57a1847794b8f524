"""Stage-trace helpers for the parity harness (tools/parity_report.py).

The reference debugs real-checkpoint mismatches by printing intermediate
streams (e.g. parler/model.cpp:734-760 un-weave, orpheus/model.cpp:371-387
redistribution).  Runners here capture the same information when
`runner.capture_trace` is set: prompt ids, step-0 logit statistics, the
generated token stream head, and per-head codec code streams — enough to
localize a mismatch to front-end / prefill / decode / codec without
re-running anything.
"""

from __future__ import annotations

import numpy as np


def logit_stats(row: np.ndarray, top: int = 5) -> dict:
    """Summary statistics of one logits row [V] (finite entries only —
    models mask invalid ids to -inf)."""
    row = np.asarray(row, np.float64)
    finite = row[np.isfinite(row)]
    order = np.argsort(row)[::-1][:top]
    return {
        "min": float(finite.min()) if len(finite) else 0.0,
        "max": float(finite.max()) if len(finite) else 0.0,
        "mean": float(finite.mean()) if len(finite) else 0.0,
        "argmax": int(row.argmax()),
        "top_ids": [int(i) for i in order],
        "top_logits": [round(float(row[i]), 4) for i in order],
    }


def multihead_logit_stats(mat: np.ndarray) -> dict:
    """Per-head argmax + head-0 detail for [H, V] logits (Dia/Parler's
    parallel codebook heads)."""
    mat = np.asarray(mat, np.float64)
    return {
        "per_head_argmax": [int(i) for i in mat.argmax(axis=-1)],
        "head0": logit_stats(mat[0]),
    }
