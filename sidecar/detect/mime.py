"""MIME + PRONOM-PUID sniffing over magic bytes — the engine's deterministic
replacement for fido + python-magic (reference: warc_metadata_sidecar.py:42-88,
``ExtendFido.identify_stream`` + ``find_mime_and_puid``).

The reference returns ``({'fido': mime?, 'python-magic': mime?}, puid)``;
we reproduce that shape as three nullable columns (mime_fido, mime_magic,
puid).  The format set is closed (the formats our synthetic corpus and the
reference's test corpus contain); PUIDs follow the public PRONOM registry.

Vectorization: prefix matching via a single numpy view over the Arrow binary
buffer — no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# reference: warc_metadata_sidecar.py:33 — gates charset/language extraction
TEXT_FORMAT_MIMES = re.compile(r"(text|html|xml)")

# (prefix, fido_mime, magic_mime, puid, ci) — first match wins, like fido's
# ordered signature table (warc_metadata_sidecar.py:69 "matches[0]").
# ``ci=True`` case-folds ASCII letters before comparing: HTML markup is
# case-insensitive in the wild ('<!doctype html>' is ubiquitous) and the
# reference's fido/libmagic HTML detection is case-insensitive too; every
# other signature is exact bytes (the XML decl is lowercase per spec).
_SIGNATURES: list[tuple[bytes, str | None, str | None, str | None, bool]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png", "image/png", "fmt/11", False),
    (b"GIF87a", "image/gif", "image/gif", "fmt/3", False),
    (b"GIF89a", "image/gif", "image/gif", "fmt/4", False),
    (b"\xff\xd8\xff", "image/jpeg", "image/jpeg", "fmt/43", False),
    (b"P6\n", "image/x-portable-pixmap", "image/x-portable-pixmap", "fmt/409", False),
    (b"B16\n", None, "application/octet-stream", None, False),
    (b"%PDF-", "application/pdf", "application/pdf", "fmt/18", False),
    (b"<?xml", "text/xml", "text/xml", "fmt/101", False),
    # HTML5 doctype → fmt/471, matching the reference's own golden
    # (tests/test_warc_metadata_sidecar.py:55-58 asserts fido fmt/471 for
    # a '<!DOCTYPE html>' payload); bare <html> stays the generic fmt/96
    (b"<!doctype html", "text/html", "text/html", "fmt/471", True),
    (b"<html", "text/html", "text/html", "fmt/96", True),
    (b"{", None, "application/json", None, False),
    # UTF-16 BOMs: python-magic reports such payloads as text (the
    # reference's golden carries Charset-Detected UTF-16); fido has no
    # signature for them
    (b"\xff\xfe", None, "text/plain", None, False),
    (b"\xfe\xff", None, "text/plain", None, False),
]
_MAX_PREFIX = max(len(s[0]) for s in _SIGNATURES)
_N_SIGS = len(_SIGNATURES)
# plain text: real fido has NO signature match (returns nothing) and libmagic
# says text/plain with no PUID — the reference's sidecar therefore carries
# only the python-magic key and no Preservation-Identifier line
# (reference tests :220-221 mock exactly ({'python-magic': ...}, None))
_TEXT_PLAIN = (_N_SIGS, None, "text/plain", None)
_OCTET = (_N_SIGS + 1, None, "application/octet-stream", None)

_FIDO = np.array([s[1] for s in _SIGNATURES] + [_TEXT_PLAIN[1], _OCTET[1]], dtype=object)
_MAGIC = np.array([s[2] for s in _SIGNATURES] + [_TEXT_PLAIN[2], _OCTET[2]], dtype=object)
_PUID = np.array([s[3] for s in _SIGNATURES] + [_TEXT_PLAIN[3], _OCTET[3]], dtype=object)


# printable-heuristic window: wider than the signature prefix so random
# binary without an early control byte is unlikely to pass (p ≈ (193/256)^64)
_PRINT_CHECK = 64


def _binary_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte_offsets[n+1], data[uint8]) for a (possibly SLICED) binary
    array.  ``arr.offset`` is an ELEMENT offset into the offsets buffer —
    the offsets are read starting at that element, never added to the byte
    values (adding corrupts every position for sliced arrays)."""
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                            count=len(arr) + 1 + arr.offset)[arr.offset:] \
        .astype(np.int64)
    databuf = arr.buffers()[2]
    data = (
        np.frombuffer(databuf, dtype=np.uint8)
        if databuf is not None and len(databuf)
        else np.zeros(1, dtype=np.uint8)
    )
    return offsets, data


def _prefix_matrix(binary: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (prefix_bytes[n, MAX], lengths[n], ascii_ok[n]) from an Arrow
    binary array without per-row Python."""
    arr = binary.combine_chunks() if isinstance(binary, pa.ChunkedArray) else binary
    if arr.null_count:
        arr = arr.fill_null(b"")
    offsets, data = _binary_offsets(arr)
    n = len(arr)
    lengths = offsets[1:] - offsets[:-1]
    width = max(_MAX_PREFIX, _PRINT_CHECK)
    prefix = np.zeros((n, width), dtype=np.uint8)
    take = np.minimum(lengths, width)
    # gather: index matrix clipped to valid range; rows shorter than MAX padded 0
    idx = offsets[:-1, None] + np.arange(width)[None, :]
    valid = np.arange(width)[None, :] < take[:, None]
    prefix[valid] = data[np.minimum(idx, len(data) - 1)][valid]
    # "mostly printable" heuristic for text/plain fallback over the first
    # _PRINT_CHECK bytes: no NUL and no non-whitespace control chars
    body = np.where(valid, prefix, ord(" "))
    ctrl = ((body < 9) | ((body > 13) & (body < 32))).sum(axis=1)
    ascii_ok = (ctrl == 0) & (lengths > 0)
    return prefix[:, :_MAX_PREFIX], lengths, ascii_ok


def sniff_batch(binary: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized sniff of an Arrow binary array →
    (mime_fido, mime_magic, puid) object ndarrays (None where undetected)."""
    prefix, lengths, ascii_ok = _prefix_matrix(binary)
    n = prefix.shape[0]
    # ASCII-case-folded view for the ci signatures (A-Z → a-z, bytes only)
    folded = np.where((prefix >= 65) & (prefix <= 90), prefix + 32, prefix)
    sig_idx = np.full(n, _N_SIGS + 1, dtype=np.int64)  # default: octet-stream
    sig_idx[ascii_ok] = _N_SIGS  # printable → text/plain
    for i in range(_N_SIGS - 1, -1, -1):  # reverse so earlier sigs win
        sig, _, _, _, ci = _SIGNATURES[i]
        view = folded if ci else prefix
        m = (view[:, : len(sig)] == np.frombuffer(sig, dtype=np.uint8)).all(axis=1)
        m &= lengths >= len(sig)
        sig_idx[m] = i
    empty = lengths == 0
    fido = _FIDO[sig_idx]
    magic = _MAGIC[sig_idx]
    puid = _PUID[sig_idx]
    fido[empty] = None
    magic[empty] = None
    puid[empty] = None
    return fido, magic, puid


def sniff(payload: bytes) -> tuple[dict[str, str], str | None]:
    """Scalar convenience with the reference's exact return shape
    ``(mime_dict, puid)`` (warc_metadata_sidecar.py:76-88)."""
    fido, magic, puid = sniff_batch(pa.array([payload], type=pa.binary()))
    mime_dict: dict[str, str] = {}
    if fido[0]:
        mime_dict["fido"] = fido[0]
    if magic[0]:
        mime_dict["python-magic"] = magic[0]
    return mime_dict, puid[0]
