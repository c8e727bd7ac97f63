"""Deterministic soft-404 scoring shaped like the ``soft404`` library
(reference: warc_metadata_sidecar.py:129-131 ``determine_soft404`` — a float
probability; gated to html + HTTP 200 at :262-265).

A fixed logistic model over phrase features of the utf-8-replace-decoded
payload.  Weights are constants; the score is a pure function of the text, so
it is reproducible bit-for-bit (IEEE-754 double, same op order everywhere).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (lowercase phrase, weight) — ordered; evaluation order is fixed.
_FEATURES: tuple[tuple[str, float], ...] = (
    ("page not found", 3.0),
    ("not found", 1.5),
    ("404", 2.0),
    ("does not exist", 2.5),
    ("no longer available", 2.5),
    ("cannot be found", 2.0),
    ("nothing here", 1.5),
    ("error", 0.75),
    ("sorry", 0.5),
)
_BIAS = -3.0


def soft404_probability(payload: bytes | str) -> float:
    """Scalar probability ∈ (0,1); same shape as soft404.probability()."""
    text = (payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload).lower()
    z = _BIAS
    for phrase, w in _FEATURES:
        if phrase in text:
            z += w
    return 1.0 / (1.0 + math.exp(-z))


def soft404_batch(texts: pa.Array, mask: np.ndarray | None = None) -> np.ndarray:
    """Vectorized scorer → float64 ndarray (nan where masked out).

    Uses ``pc.match_substring`` per phrase (C-level scan) and a single
    logistic at the end; identical arithmetic to the scalar path.
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(arr)
    out = np.full(n, np.nan, dtype=np.float64)
    if n == 0:
        return out
    arr = arr.fill_null("") if arr.null_count else arr
    # blank out non-applicable rows BEFORE the lowercase copy and the 9
    # substring scans: the mask (html+200 rows) typically covers a small
    # fraction of an image-heavy batch, and scanning every payload for
    # results that are discarded as NaN wastes the dominant share of work
    if mask is not None:
        arr = pc.if_else(pa.array(mask), arr, "")
    lower = pc.utf8_lower(arr)
    z = np.full(n, _BIAS, dtype=np.float64)
    for phrase, w in _FEATURES:
        hit = pc.match_substring(lower, phrase).to_numpy(zero_copy_only=False)
        z = z + np.where(hit, w, 0.0)
    # z takes values from a small finite set (subset-sums of fixed weights);
    # evaluate the logistic with math.exp per distinct z so the batch path is
    # bit-identical to the scalar path (numpy's SIMD exp can differ by 1 ulp).
    uniq, inv = np.unique(z, return_inverse=True)
    probs_u = np.array([1.0 / (1.0 + math.exp(-u)) for u in uniq], dtype=np.float64)
    prob = probs_u[inv]
    todo = np.ones(n, dtype=bool) if mask is None else mask
    out[todo] = prob[todo]
    return out
