"""Deterministic charset detection shaped like chardet's output
(reference: warc_metadata_sidecar.py:91-102 ``find_character_set`` →
``{'encoding': ..., 'confidence': ...}``).

Rules (applied in order, all deterministic):
  1. BOM           → utf-8-sig / utf-16 (confidence 1.0)
  2. all bytes<128 → ascii   (1.0)
  3. valid UTF-8   → utf-8   (0.99)
  4. otherwise     → ISO-8859-1 (0.73, chardet's usual latin-1 fallback score)

Vectorization: the ASCII test runs as one ``np.maximum.reduceat`` over the
Arrow binary buffer; only the (rare) non-ASCII rows hit the per-row UTF-8
validity check.
"""

from __future__ import annotations

import codecs

import numpy as np
import pyarrow as pa

_BOMS: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF8, "UTF-8-SIG"),
    (codecs.BOM_UTF16_LE, "UTF-16"),
    (codecs.BOM_UTF16_BE, "UTF-16"),
]


def find_character_set(payload: bytes) -> dict:
    """Scalar detector with the reference's return shape."""
    if not payload:
        return {"encoding": None, "confidence": 0.0}
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return {"encoding": name, "confidence": 1.0}
    arr = np.frombuffer(payload, dtype=np.uint8)
    if (arr < 128).all():
        return {"encoding": "ascii", "confidence": 1.0}
    try:
        payload.decode("utf-8")
        return {"encoding": "utf-8", "confidence": 0.99}
    except UnicodeDecodeError:
        return {"encoding": "ISO-8859-1", "confidence": 0.73}


def find_character_set_batch(
    binary: pa.Array, mask: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized over an Arrow binary array → (encoding[obj], confidence[f8]).

    ``mask`` limits work to text-gated rows (reference gate at
    warc_metadata_sidecar.py:255); unmasked rows get (None, nan).
    """
    arr = binary.combine_chunks() if isinstance(binary, pa.ChunkedArray) else binary
    if arr.null_count:
        arr = arr.fill_null(b"")
    from sidecar.detect.mime import _binary_offsets

    # element-offset-aware buffer view (shared with mime.py — a sliced
    # array's offset indexes the OFFSETS buffer, it is not a byte delta)
    offsets, data = _binary_offsets(arr)
    n = len(arr)
    lengths = offsets[1:] - offsets[:-1]
    enc = np.full(n, None, dtype=object)
    conf = np.full(n, np.nan, dtype=np.float64)
    todo = lengths > 0
    if mask is not None:
        todo &= mask
    if not todo.any():
        return enc, conf
    # vectorized per-row max byte over the MASKED rows only — scanning the
    # whole buffer would touch every unmasked (typically image) payload's
    # bytes, the dominant share of batch data
    maxima = np.zeros(n, dtype=np.uint8)
    todo_idx = np.flatnonzero(todo)
    if len(data) and len(todo_idx):
        seg_starts = offsets[todo_idx]
        seg_ends = offsets[todo_idx + 1]
        bounds = np.stack([seg_starts, seg_ends]).T.reshape(-1)
        # reduceat over [start, end) pairs: even positions are the segments
        red = np.maximum.reduceat(data, np.minimum(bounds[:-1], len(data) - 1))
        maxima[todo_idx] = red[::2][: len(todo_idx)]
    is_ascii = todo & (maxima < 128)
    enc[is_ascii] = "ascii"
    conf[is_ascii] = 1.0
    rest = np.flatnonzero(todo & ~is_ascii)
    for i in rest:  # rare path: non-ASCII rows only
        r = find_character_set(data[offsets[i] : offsets[i + 1]].tobytes())
        enc[i] = r["encoding"]
        conf[i] = r["confidence"]
    return enc, conf
