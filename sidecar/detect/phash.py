"""64-bit DCT perceptual hash (ST8 in SURVEY.md §2.3 — new, mandated by
BASELINE.json:north_star's ``phash`` sidecar field; no reference analog, the
reference treats image payloads as opaque bytes).

Classic pHash recipe, fully deterministic:
  grayscale → 32×32 area-mean resize → 2-D DCT-II (precomputed float64
  cosine matrix) → top-left 8×8 block excluding DC → bit i = coef > median.

Integer-exact inputs + fixed float64 op order ⇒ identical hash on every
platform/parallelism level.
"""

from __future__ import annotations

import numpy as np

_N = 32
_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT = _dct_matrix(_N)


def _resize_area(gray: np.ndarray, n: int) -> np.ndarray:
    """Deterministic area-ish resize via index-mapped block mean.

    Block sums via ``np.add.reduceat`` (row pass collapses H→n immediately,
    then W→n) — integer-exact and bit-identical to the integral-image
    formulation it replaced (verified over random shapes incl. h,w < n;
    reduceat's duplicate-index rule — a[idx[i]] when idx[i]==idx[i+1] —
    coincides with the [y0, y0+1) degenerate block), at roughly half the
    memory traffic of a full 2-D cumsum.
    """
    h, w = gray.shape
    ys = (np.arange(n + 1, dtype=np.int64) * h) // n
    xs = (np.arange(n + 1, dtype=np.int64) * w) // n
    y0 = ys[:-1].clip(max=h - 1)
    x0 = xs[:-1].clip(max=w - 1)
    y1 = np.maximum(ys[1:], ys[:-1] + 1).clip(max=h)
    x1 = np.maximum(xs[1:], xs[:-1] + 1).clip(max=w)
    rows = np.add.reduceat(gray, y0, axis=0)
    s = np.add.reduceat(rows, x0, axis=1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return s.astype(np.float64) / area.astype(np.float64)


def phash64(pixels: np.ndarray) -> int:
    """HxWx3 uint8 → unsigned 64-bit perceptual hash."""
    gray = (
        pixels[..., 0].astype(np.int64) * 299
        + pixels[..., 1].astype(np.int64) * 587
        + pixels[..., 2].astype(np.int64) * 114
    )  # x1000 luma, integer-exact
    small = _resize_area(gray, _N)
    coef = _DCT @ small @ _DCT.T
    block = coef[:_K, :_K].flatten()
    vals = block[1:]  # exclude DC
    # odd count (63) ⇒ median is the exact middle order statistic; partition
    # returns the identical element without np.median's dispatch overhead
    med = np.partition(vals, 31)[31]
    bits = block > med
    bits[0] = coef[0, 0] > 0
    out = 0
    for b in bits:  # 64 iterations, negligible
        out = (out << 1) | int(b)
    return out
