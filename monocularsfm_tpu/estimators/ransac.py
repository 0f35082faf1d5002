"""Hypothesis-parallel RANSAC machinery.

Instead of OpenCV's sequential adaptive loop, every hypothesis lives in one
batch: sample M minimal sets -> solve M models (vmapped batched linear
algebra) -> score M x N residuals in one einsum-shaped pass -> argmax inlier
count.  Fixed shapes everywhere; masked candidates contribute nothing.

Minimal-set sampling uses the Gumbel top-k trick: draw one uniform key per
(hypothesis, candidate), push invalid candidates to -inf, take the k largest
keys per hypothesis — uniform sampling without replacement, no rejection
loops, fully shaped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_minimal_sets(
    key: jax.Array, num_hyps: int, num_candidates: int, k: int, valid: jnp.ndarray
) -> jnp.ndarray:
    """Sample `num_hyps` index sets of size k from valid candidates.

    valid: bool[N].  Returns int32[num_hyps, k].  If fewer than k candidates
    are valid the sets repeat indices; callers gate on num_valid >= k.
    """
    keys = jax.random.uniform(key, (num_hyps, num_candidates))
    keys = jnp.where(valid[None, :], keys, -jnp.inf)
    _, idx = jax.lax.top_k(keys, k)
    return idx.astype(jnp.int32)


def score_hypotheses(
    residuals: jnp.ndarray, valid: jnp.ndarray, threshold: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MSAC-style scoring. residuals: (M, N) >= 0, valid: (N,).

    Returns (best_index, inlier_mask_of_best (N,), inlier_counts (M,)).
    The winner maximises inlier count with the truncated-residual sum as a
    tie-break (matches OpenCV's support ordering closely enough for parity).
    """
    inl = (residuals <= threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    trunc = jnp.where(inl, residuals, threshold)
    msac = jnp.sum(jnp.where(valid[None, :], trunc, 0.0), axis=1)
    # Lexicographic (count desc, msac asc) via a combined score.
    score = counts.astype(jnp.float32) - msac / (
        threshold * jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    )
    best = jnp.argmax(score)
    return best, inl[best], counts


def num_ransac_iterations(confidence: float, inlier_ratio: float, sample_size: int,
                          max_iterations: int = 10000) -> int:
    """Classic adaptive-iteration formula (host-side, for reporting only —
    the device always runs the full fixed batch)."""
    eps = 1e-9
    w = max(min(inlier_ratio, 1 - eps), eps)
    denom = math.log(max(1 - w ** sample_size, eps))
    if denom >= 0:
        return max_iterations
    return int(min(max_iterations, math.ceil(math.log(1 - confidence) / denom)))


def rounds_to_confidence(
    confidence: float,
    inlier_count: int,
    num_valid: int,
    sample_size: int,
    hyps_per_round: int,
    max_rounds: int | None = None,
) -> int:
    """Total hypothesis ROUNDS the classic termination bound demands.

    OpenCV's RANSAC adapts by *stopping early* once 1-(1-w^m)^k >= confidence
    (w = best inlier ratio so far).  Batch hardware inverts the direction:
    one fixed `hyps_per_round`-wide dispatch runs first, and if the observed
    best model leaves the confidence bound unmet, the caller runs further
    identically-shaped rounds (same compiled program) and keeps the best.
    Returns the number of rounds (>= 1) needed given the best model so far,
    capped at `max_rounds`.  The default cap is derived so the total
    hypothesis budget reaches the reference's 10000-iteration ceiling
    (Initializer.cpp:103-159, Registrant.h:22-27) — the confidence bound is
    then always honored, never silently truncated."""
    if max_rounds is None:
        max_rounds = max(1, math.ceil(10000 / max(hyps_per_round, 1)))
    need = num_ransac_iterations(
        confidence,
        inlier_count / max(num_valid, 1),
        sample_size,
    )
    return min(max_rounds, max(1, math.ceil(need / hyps_per_round)))
