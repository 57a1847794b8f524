"""Shared speculative-decode utilities for the multi-head AR models
(parler/dia).  Orpheus keeps its scalar-token drafter in models/orpheus.py
(_ngram_drafts); this module holds the 9-head ROW analog and the spec-path
gating shared by the runners.

Speculative decode here is GREEDY-only: the r4 on-TPU A/B measured the exact
rejection-scheme speculative SAMPLER slower than the sequential sampled loop
(150 vs 209 tok/s on orpheus) and it was deleted; the greedy path ignores
PRNG and penalty state (ops/sampling.py argmaxes raw logits), so emitted
tokens are bit-identical to the sequential loop by construction.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# drafts per verify forward (greedy path only)
SPEC_K = 7


def spec_enabled(config) -> bool:
    """Greedy decode takes the speculative loop unless TTS_TPU_NO_SPEC=1;
    sampled decode stays sequential (PRNG-consumption contract: stream ==
    generate for the same seed would not survive draft windows)."""
    return not os.environ.get("TTS_TPU_NO_SPEC") and not config.sample


def ngram_draft_rows(out, i, k: int):
    """Prompt-lookup drafting over emitted multi-head rows (the row analog
    of orpheus._ngram_drafts): find the most recent EARLIER row equal to the
    last emitted row — a 9-token match is already strong context, so one row
    replaces orpheus' 2-gram — and propose the k rows that followed it; fall
    back to repeating the last row (steady sounds/silence repeat frames).
    out[j] for j < i are emitted rows; rows >= i are fill."""
    n, H = out.shape
    j = jnp.arange(n, dtype=jnp.int32)
    prev = out[jnp.maximum(i - 1, 0)]                              # [H]
    match = jnp.all(out == prev[None, :], axis=1)                  # [n]
    usable = j + 1 < jnp.maximum(i - 1, 0)
    score = jnp.where(match & usable, j + 1, 0)
    best = jnp.argmax(score).astype(jnp.int32)
    found = score[best] > 0
    src = jnp.where(found, best + 1, jnp.maximum(i - 1, 0))
    drafts = jax.lax.dynamic_slice(out, (src, 0), (k, H))
    return jnp.where(found, drafts, jnp.broadcast_to(prev, (k, H)))
