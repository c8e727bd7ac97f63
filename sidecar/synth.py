"""Deterministic synthetic corpus: image+caption rows (the ``input_hint``
table shape), a crawl link graph, and robots rules.  Everything is a pure
function of (seed, key) via blake2b — order-independent and process-stable,
which is what makes the bit-for-bit crawl-reproducibility contract testable
(FIXTURES.md §1-2).

No external data, no wall clock, no ``random`` module state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from sidecar import codecs
from sidecar.detect.phash import phash64

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_SIZES = (16, 32, 64, 128)
_IMG_FMTS = ("png", "ppm", "b16")

_CAPTION_WORDS = {
    "en": "the quick brown fox jumps over a lazy dog and they run from this page with what will be there when we said that".split(),
    "es": "el perro la casa de que y en un ser se no por con su para como este pero más hacer si me ya los las del".split(),
    "de": "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus".split(),
    "fr": "le chat de un être et à il avoir ne je son que se qui ce dans en du elle au pour pas vous par sur les des".split(),
}
_LANG_KEYS = sorted(_CAPTION_WORDS)
_SOFT404_PHRASES = (
    "page not found sorry this page does not exist",
    "error 404 the page you requested cannot be found",
    "sorry nothing here the content is no longer available",
)


def _h(*parts: object) -> int:
    """Stable 64-bit hash of the argument tuple."""
    b = hashlib.blake2b("\x1f".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(b.digest(), "big")


def _h_md5(*parts: object) -> int:
    """SQL-reproducible 64-bit hash: DuckDB's ``md5_number_upper(s)`` is the
    LITTLE-endian read of the first 8 digest bytes, so an oracle query can
    recompute this exactly as
    ``md5_number_upper(p0 || chr(31) || p1 || ...)``.  Used by the
    ``graph="md5"`` crawl graph whose whole 3-epoch crawl is replayed in
    pure SQL by the driver's correctness gate (crawl_sql_exact)."""
    b = hashlib.md5("\x1f".join(str(p) for p in parts).encode())
    return int.from_bytes(b.digest()[:8], "little")


def _priority_md5(url: str, seed: int) -> float:
    """md5-graph priorities are a function of the URL ALONE (unlike the
    blake2b graph's per-link-instance priorities): duplicate candidates for
    one URL then always TIE on priority, so the frontier's total order
    ``(-priority, depth, url_hash, seed_id, url)`` degrades to the
    SQL-computable ``(depth, seed_id)`` inside a URL group, and distinct
    URLs get 1-in-1e9 priorities (verified collision-free per host per
    epoch for the shipped config by tests/test_crawl.py)."""
    return float(_h_md5(seed, "prio", url) % 1_000_000_000) / 1e9


def make_pixels(key: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Seeded gradient + noise pattern, HxWx3 uint8 (FIXTURES.md §1)."""
    rng = np.random.Generator(np.random.PCG64(_h(seed, "pixels", key) & 0x7FFFFFFFFFFFFFFF))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255) // max(1, w - 1),
            (yy * 255) // max(1, h - 1),
            ((xx + yy) * 255) // max(1, w + h - 2),
        ],
        axis=-1,
    ).astype(np.int64)
    noise = rng.integers(-24, 25, size=(h, w, 3))
    return (base + noise).clip(0, 255).astype(np.uint8)


def make_caption(key: str, seed: int = 42) -> tuple[str, str]:
    """Deterministic caption → (caption, lang).  ~5% empty, ~3% soft-404
    phrases, one control-char-polluted variant class (FIXTURES.md §1)."""
    r = _h(seed, "caption", key)
    if r % 100 < 5:
        return "", ""
    if r % 100 < 8:
        return _SOFT404_PHRASES[r % len(_SOFT404_PHRASES)], "en"
    lang = _LANG_KEYS[(r >> 8) % len(_LANG_KEYS)]
    words = _CAPTION_WORDS[lang]
    n = 6 + (r >> 16) % 18
    cap = " ".join(words[_h(seed, "w", key, i) % len(words)] for i in range(n))
    if r % 100 < 12:  # control-char-polluted variant
        cap = cap[: len(cap) // 2] + "\x02" + cap[len(cap) // 2 :]
    return cap, lang


def make_row(key: str, seed: int = 42, caption: str | None = None) -> dict:
    """One IMAGES row as a dict; pure function of (seed, key[, caption])."""
    r = _h(seed, "row", key)
    if caption is None:
        caption, _ = make_caption(key, seed)
    kind = r % 10
    if kind == 0:  # html payload row (text path incl. soft-404 gate)
        body = "<!DOCTYPE html>\n<html><body><p>%s</p></body></html>" % caption
        return {
            "image_id": key, "bytes": body.encode(), "w": 0, "h": 0,
            "fmt": "html", "caption": caption, "phash": 0,
        }
    if kind == 1:  # plain-text payload row
        return {
            "image_id": key, "bytes": ("caption: %s\n" % caption).encode(), "w": 0,
            "h": 0, "fmt": "text", "caption": caption, "phash": 0,
        }
    w = _SIZES[(r >> 4) % len(_SIZES)]
    h = _SIZES[(r >> 6) % len(_SIZES)]
    fmt = _IMG_FMTS[(r >> 2) % len(_IMG_FMTS)]
    pixels = make_pixels(key, w, h, seed)
    data = codecs.encode(pixels, fmt)
    # phash is computed over the *decoded* pixels so lossy fmts round-trip.
    # The decode result is analytically known (lossless: the input pixels;
    # b16: the 7-bit quantization), so the zlib round-trip is skipped —
    # bit-identical phash, ~25% less compute per fetched image.
    if fmt in codecs.LOSSLESS:
        ph = phash64(pixels)
    else:
        ph = phash64(((pixels >> 1) << 1 | 1).astype(pixels.dtype))
    return {
        "image_id": key, "bytes": data, "w": w, "h": h,
        "fmt": fmt, "caption": caption, "phash": np.int64(np.uint64(ph)).item(),
    }


def make_images_table(n: int, seed: int = 42, prefix: str = "img") -> pa.Table:
    rows = [make_row(f"{prefix}-{i:08d}", seed) for i in range(n)]
    return pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Crawl graph (FIXTURES.md §2): hosts, seeds, deterministic out-links, robots.
# ---------------------------------------------------------------------------

HOT_HOST = "hot.example.com"


def hosts(n_hosts: int = 20) -> list[str]:
    return [HOT_HOST] + [f"host{i:02d}.example.com" for i in range(1, n_hosts)]


def make_seeds(n_seeds: int = 100, n_hosts: int = 20, seed: int = 42,
               graph: str = "b2") -> list[dict]:
    """Seed list: ~100 rows over ~n_hosts hosts with priorities.
    ``graph="md5"`` switches to the SQL-reproducible hash family (see
    ``_h_md5``) with URL-determined priorities."""
    hs = hosts(n_hosts)
    hf = _h_md5 if graph == "md5" else _h
    out = []
    for i in range(n_seeds):
        r = hf(seed, "seed", i)
        host = hs[r % len(hs)]
        url = f"https://{host}/seed/{i}"
        prio = (_priority_md5(url, seed) if graph == "md5"
                else float((r >> 8) % 1000) / 1000.0)
        out.append({"seed_id": i, "url": url, "priority": prio})
    return out


def out_links(url_canon: str, n_hosts: int = 20, seed: int = 42,
              graph: str = "b2", hot_frac: int = 4) -> list[tuple[str, float]]:
    """Deterministic link discovery: fan-out 0–8 links per page, ~30%
    duplicate targets, the hot host receives ~``hot_frac``/10 of all links
    (skew; default 40% — the frozen graphs).  ``graph="md5"`` is the
    SQL-reproducible variant (same structure, md5 hashes, URL-determined
    priorities)."""
    hf = _h_md5 if graph == "md5" else _h
    r = hf(seed, "links", url_canon)
    fan = r % 9
    hs = hosts(n_hosts)
    links = []
    for j in range(fan):
        rj = hf(seed, "link", url_canon, j)
        if rj % 10 < hot_frac or len(hs) == 1:  # 1-host graphs degrade to it
            host = HOT_HOST
        else:
            host = hs[rj % (len(hs) - 1) + 1]
        # ~30% of links point at a small shared id space (duplicates); the
        # md5 graph reads a DIFFERENT bit range than the hot-host rule above
        # (the frozen b2 graph reuses rj % 10 — preserved exactly)
        dup = (rj >> 8) % 10 < 3 if graph == "md5" else rj % 10 < 3
        page_id = rj % 40 if dup else rj % 100000
        url = f"https://{host}/page/{page_id}"
        prio = (_priority_md5(url, seed) if graph == "md5"
                else float((rj >> 16) % 1000) / 1000.0)
        links.append((url, prio))
    return links


def robots_txt(host: str, seed: int = 42, graph: str = "b2") -> str:
    """Deterministic robots.txt TEXT per host (parsed by sidecar.robots):
    ~25% of hosts disallow a path prefix; of those, half carry an Allow
    override and some a wildcard/$-anchored rule — exercising the RFC 9309
    longest-match + allow-wins-ties semantics."""
    r = (_h_md5 if graph == "md5" else _h)(seed, "robots", host)
    if r % 4 != 0:
        return "User-agent: *\nDisallow:\n"
    d = r % 10
    lines = ["User-agent: *", f"Disallow: /page/{d}"]
    if (r >> 4) % 2 == 0:
        # allow-override: the exact page id {d}0 is re-allowed (longer match)
        lines.append(f"Allow: /page/{d}0")
    if (r >> 5) % 4 == 0:
        # $-anchored rule: the bare id {d} only (not its decade)
        lines = ["User-agent: *", f"Disallow: /page/{d}$"]
    return "\n".join(lines) + "\n"


def robots_rules(n_hosts: int = 20, seed: int = 42,
                 graph: str = "b2") -> dict[str, list]:
    """Parsed robots rules per host (sidecar.robots rule lists)."""
    from sidecar.robots import parse_robots

    return {host: parse_robots(robots_txt(host, seed, graph))
            for host in hosts(n_hosts)}


def fetch_url(url_canon: str, seed: int = 42) -> dict:
    """The deterministic 'fetcher' (ST7): resolve a canonical URL to an
    IMAGES-shaped row. Stands in for network fetch + decode (no network in
    the sandbox; at scale this is the only stage that touches bytes)."""
    return make_row(url_canon, seed)
