"""CDXJ projection + left-outer enrichment merge.

Ray-Data-native restatement of sidecar2cdxj.py and merge_cdxj.py:

- :func:`cdxj_from_sidecar` — SIDECAR Dataset → CDXJ Dataset
  (sidecar2cdxj.py:32-61: SURT url + 14-digit timestamp + JSON payload).
- :func:`merge_cdxj` — left-outer hash join, probe = original CDXJ
  (order-preserving via a line-number sort key), build = meta CDXJ
  (merge_cdxj.py:59-93).  The build side is broadcast once via ``ray.put``
  and probed inside ``map_batches`` — no shuffle (SURVEY.md §2.4 J1).
  For large build sides use ``broadcast=False`` → hash-partitioned
  groupby join on the key.

Reference quirks reproduced exactly (SURVEY.md §7 watch-list #5):
- python-magic mime preferred over fido (merge_cdxj.py:36-40)
- soft-404 dropped at merge when falsy — 0.0 included (merge_cdxj.py:53-55)
- languages only added when alpha-3 conversion yields non-empty CSV (:50-52)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from sidecar.canon import cdxj_key, surt
from sidecar.pipeline import _lang_struct_to_ref

# Full ISO-639-1 → ISO-639-2/T (alpha-3) table, statically embedded (the
# reference uses langcodes.Language.get(code).to_alpha3(), merge_cdxj.py:18,
# which yields the terminology codes below; codes with no 3-letter form are
# skipped by get_alpha3_language_codes, :22-24).  The merge CLI accepts
# arbitrary CDXJ input, so every 639-1 code must convert — not just the five
# the in-repo detector emits.
ALPHA3 = {
    "aa": "aar", "ab": "abk", "ae": "ave", "af": "afr", "ak": "aka",
    "am": "amh", "an": "arg", "ar": "ara", "as": "asm", "av": "ava",
    "ay": "aym", "az": "aze", "ba": "bak", "be": "bel", "bg": "bul",
    "bh": "bih", "bi": "bis", "bm": "bam", "bn": "ben", "bo": "bod", "br": "bre",
    "bs": "bos", "ca": "cat", "ce": "che", "ch": "cha", "co": "cos",
    "cr": "cre", "cs": "ces", "cu": "chu", "cv": "chv", "cy": "cym",
    "da": "dan", "de": "deu", "dv": "div", "dz": "dzo", "ee": "ewe",
    "el": "ell", "en": "eng", "eo": "epo", "es": "spa", "et": "est",
    "eu": "eus", "fa": "fas", "ff": "ful", "fi": "fin", "fj": "fij",
    "fo": "fao", "fr": "fra", "fy": "fry", "ga": "gle", "gd": "gla",
    "gl": "glg", "gn": "grn", "gu": "guj", "gv": "glv", "ha": "hau",
    "he": "heb", "hi": "hin", "ho": "hmo", "hr": "hrv", "ht": "hat",
    "hu": "hun", "hy": "hye", "hz": "her", "ia": "ina", "id": "ind",
    "ie": "ile", "ig": "ibo", "ii": "iii", "ik": "ipk", "io": "ido",
    "is": "isl", "it": "ita", "iu": "iku", "ja": "jpn", "jv": "jav",
    "ka": "kat", "kg": "kon", "ki": "kik", "kj": "kua", "kk": "kaz",
    "kl": "kal", "km": "khm", "kn": "kan", "ko": "kor", "kr": "kau",
    "ks": "kas", "ku": "kur", "kv": "kom", "kw": "cor", "ky": "kir",
    "la": "lat", "lb": "ltz", "lg": "lug", "li": "lim", "ln": "lin",
    "lo": "lao", "lt": "lit", "lu": "lub", "lv": "lav", "mg": "mlg",
    "mh": "mah", "mi": "mri", "mk": "mkd", "ml": "mal", "mn": "mon",
    "mr": "mar", "ms": "msa", "mt": "mlt", "my": "mya", "na": "nau",
    "nb": "nob", "nd": "nde", "ne": "nep", "ng": "ndo", "nl": "nld",
    "nn": "nno", "no": "nor", "nr": "nbl", "nv": "nav", "ny": "nya",
    "oc": "oci", "oj": "oji", "om": "orm", "or": "ori", "os": "oss",
    "pa": "pan", "pi": "pli", "pl": "pol", "ps": "pus", "pt": "por",
    "qu": "que", "rm": "roh", "rn": "run", "ro": "ron", "ru": "rus",
    "rw": "kin", "sa": "san", "sc": "srd", "sd": "snd", "se": "sme",
    "sg": "sag", "si": "sin", "sk": "slk", "sl": "slv", "sm": "smo",
    "sn": "sna", "so": "som", "sq": "sqi", "sr": "srp", "ss": "ssw",
    "st": "sot", "su": "sun", "sv": "swe", "sw": "swa", "ta": "tam",
    "te": "tel", "tg": "tgk", "th": "tha", "ti": "tir", "tk": "tuk",
    "tl": "tgl", "tn": "tsn", "to": "ton", "tr": "tur", "ts": "tso",
    "tt": "tat", "tw": "twi", "ty": "tah", "ug": "uig", "uk": "ukr",
    "ur": "urd", "uz": "uzb", "ve": "ven", "vi": "vie", "vo": "vol",
    "wa": "wln", "wo": "wol", "xh": "xho", "yi": "yid", "yo": "yor",
    "za": "zha", "zh": "zho", "zu": "zul",
}


def get_alpha3_language_codes(lang_list: list[dict]) -> str:
    """Comma-joined alpha-3 codes (merge_cdxj.py:12-27 semantics)."""
    codes = []
    for lang_dict in lang_list:
        new_code = ALPHA3.get(lang_dict.get("code", ""), "")
        if len(new_code) == 3:
            codes.append(new_code)
    return ",".join(codes)


def sidecar_row_to_cdxj_json(row: dict) -> str:
    """SIDECAR row → the CDXJ JSON payload (the columnar equivalent of
    convert_payload_to_json over the serialized Title lines,
    sidecar2cdxj.py:18-29 — keys present-if-found)."""
    d: dict = {}
    mime_dict = {}
    if row.get("mime_fido"):
        mime_dict["fido"] = row["mime_fido"]
    if row.get("mime_magic"):
        mime_dict["python-magic"] = row["mime_magic"]
    if mime_dict:
        d["Identified-Payload-Type"] = mime_dict
    if row.get("puid"):
        d["Preservation-Identifier"] = row["puid"]
    cs = row.get("charset")
    if cs and cs.get("encoding"):
        d["Charset-Detected"] = {"encoding": cs["encoding"], "confidence": cs["confidence"]}
    lang = _lang_struct_to_ref(row.get("languages"))
    if lang:
        d["Languages-cld2"] = lang
    if row.get("soft404") is not None:
        d["Soft-404-Detected"] = row["soft404"]
    return json.dumps(d)


def _sidecar_batch_to_cdxj(batch: pa.Table) -> pa.Table:
    rows = batch.to_pylist()
    return pa.table(
        {
            "surt": pa.array([surt(r["url"] or "") for r in rows], pa.string()),
            "ts": pa.array([r["ts"] or "" for r in rows], pa.string()),
            "json": pa.array([sidecar_row_to_cdxj_json(r) for r in rows], pa.string()),
        }
    )


def cdxj_from_sidecar(sidecar_ds) -> "rd.Dataset":
    """SIDECAR Dataset → CDXJ Dataset (S5/S6 + F13)."""
    return sidecar_ds.map_batches(
        _sidecar_batch_to_cdxj, batch_format="pyarrow", zero_copy_batch=True
    )


def cdxj_line(surt_url: str, ts: str, json_str: str) -> str:
    """One CDXJ text line (sidecar2cdxj.py:37)."""
    return surt_url + " " + ts + " " + json_str + "\n"


def get_sidecar_fields(original_obj: dict, meta_obj: dict) -> dict:
    """Field enrichment (merge_cdxj.py:30-56) with the quirks intact."""
    if meta_obj.get("Identified-Payload-Type"):
        ipt = meta_obj["Identified-Payload-Type"]
        # python-magic preferred over fido (merge_cdxj.py:36-40).  The bare
        # ipt["fido"] KeyError on a typed-but-fido-less object is DELIBERATE
        # parity: the reference indexes ['fido'] the same way at :40
        original_obj["mime-detected"] = ipt.get("python-magic") or ipt["fido"]
    if meta_obj.get("Preservation-Identifier"):
        original_obj["puid"] = meta_obj["Preservation-Identifier"]
    if meta_obj.get("Charset-Detected"):
        original_obj["charset"] = meta_obj["Charset-Detected"]["encoding"]
    if meta_obj.get("Languages-cld2"):
        new_codes = get_alpha3_language_codes(meta_obj["Languages-cld2"]["languages"])
        if new_codes:
            original_obj["languages"] = new_codes
    if meta_obj.get("Soft-404-Detected"):  # truthiness: 0.0 dropped (merge_cdxj.py:53)
        original_obj["soft-404-detected"] = meta_obj["Soft-404-Detected"]
    return original_obj


def parse_cdxj_lines(lines_ds) -> "rd.Dataset":
    """read_text lines → (surt, ts, json) CDXJ table (F14).  No order
    column: output order is whatever the merge sorts by (callers that need
    input-line order attach their own lineno — see cli.cmd_merge)."""

    def parse(batch: pa.Table) -> pa.Table:
        surts, tss, js = [], [], []
        for line in batch.column(batch.column_names[0]).to_pylist():
            urlkey, timestamp, obj = line.split(" ", 2)
            surts.append(urlkey)
            tss.append(timestamp)
            js.append(obj)
        return pa.table({"surt": surts, "ts": tss, "json": js})

    return lines_ds.map_batches(parse, batch_format="pyarrow")


# broadcast="auto" falls back to the hash-partitioned plan once the build
# side outgrows this many keys — decided during the single build pass, so
# the small-side case pays no extra execution of meta_ds
MERGE_AUTO_BUILD_ROWS = 500_000


def merge_cdxj(meta_ds, original_ds, *,
               broadcast: "bool | str" = "auto") -> "rd.Dataset":
    """Left-outer enrich join of ``original_ds`` (CDXJ columns surt/ts/json,
    plus optional ``lineno``) against ``meta_ds`` (J1).

    Broadcast plan: the meta side — one sidecar's index, small relative to
    the probe — is collected once to a dict, put in the object store once,
    and read by every map task (not re-shipped per batch).  Output adds a
    ``matched`` flag (edited/non-edited counters = a Sum over it,
    merge_cdxj.py:61-62).

    ``broadcast="auto"`` (default) starts the broadcast build and falls
    back to the hash-partitioned plan (``_merge_cdxj_partitioned``) the
    moment the build dict passes MERGE_AUTO_BUILD_ROWS keys — one pass
    either way; only the over-limit case re-executes meta_ds.
    """
    # any falsy value (False / None / 0 — the pre-auto contract) means the
    # partitioned plan; only True means an unbounded broadcast build
    if broadcast != "auto" and broadcast is not True:
        return _merge_cdxj_partitioned(meta_ds, original_ds)
    limit = MERGE_AUTO_BUILD_ROWS if broadcast == "auto" else None

    meta_dict: dict[str, dict] = {}
    for b in meta_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        tbl = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for s, t, j in zip(
            tbl.column("surt").to_pylist(),
            tbl.column("ts").to_pylist(),
            tbl.column("json").to_pylist(),
        ):
            meta_dict[cdxj_key(s, t)] = json.loads(j)
        if limit is not None and len(meta_dict) > limit:
            return _merge_cdxj_partitioned(meta_ds, original_ds)
    meta_ref = ray.put(meta_dict)

    def enrich(batch: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref)
        out_json, matched = [], []
        surts = batch.column("surt").to_pylist()
        tss = batch.column("ts").to_pylist()
        js = batch.column("json").to_pylist()
        for s, t, j in zip(surts, tss, js):
            m = meta.get(cdxj_key(s, t))
            if m:  # TRUTHINESS, not None-ness: an empty meta object {} is
                # no match in the reference (merge_cdxj.py:72 'if ...get(key):')
                # and its original line passes through byte-identical
                out_json.append(json.dumps(get_sidecar_fields(json.loads(j), m)))
                matched.append(True)
            else:
                out_json.append(j)  # pass-through unchanged (merge_cdxj.py:79-81)
                matched.append(False)
        cols = {
            "surt": batch.column("surt"),
            "ts": batch.column("ts"),
            "json": pa.array(out_json, pa.string()),
            "matched": pa.array(matched),
        }
        if "lineno" in batch.column_names:
            cols["lineno"] = batch.column("lineno")
        return pa.table(cols)

    return original_ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)


def _merge_cdxj_partitioned(meta_ds, original_ds) -> "rd.Dataset":
    """Large-build-side plan: hash-partition both sides on the join key and
    merge per group (SURVEY.md §2.4 J1 'large build side')."""
    import pandas as pd

    # union sides must agree on schema (names, ORDER, and dtypes): the meta
    # side has no lineno column, and letting pandas NaN-fill it inside
    # merge_partition coerced every partition containing meta rows to
    # float64 linenos (0.0 vs 1 mixed dtypes downstream) — so tag() emits a
    # canonical column order and an int64 -1 sentinel lineno for meta rows
    # (meta rows never survive the merge, so the sentinel never escapes)
    has_lineno = "lineno" in original_ds.schema().base_schema.names

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"surt": batch.column("surt"), "ts": batch.column("ts"),
                    "json": batch.column("json")}
            if has_lineno:
                cols["lineno"] = (batch.column("lineno")
                                  if "lineno" in batch.column_names
                                  else pa.array(np.full(n, -1, np.int64),
                                                pa.int64()))
            cols["side"] = pa.array([side] * n, pa.string())
            return pa.table(cols)
        return f

    both = meta_ds.map_batches(tag("meta"), batch_format="pyarrow").union(
        original_ds.map_batches(tag("orig"), batch_format="pyarrow")
    )

    from zlib import crc32

    def add_key(batch: pa.Table) -> pa.Table:
        key = [cdxj_key(s, t) for s, t in zip(batch.column("surt").to_pylist(),
                                              batch.column("ts").to_pylist())]
        part = [crc32(k.encode()) % 64 for k in key]
        t = batch.append_column("key", pa.array(key, pa.string()))
        return t.append_column("part", pa.array(part, pa.int64()))

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Within one coarse hash partition: build a dict of the meta side,
        probe the orig side — the Ray groupby key is the 64-way partition
        (per-join-key map_groups dispatch doesn't scale; SURVEY.md J1)."""
        metas = g[g["side"] == "meta"]
        origs = g[g["side"] == "orig"].copy()
        if len(origs) == 0:
            return origs.drop(columns=["side", "key", "part"])
        build = {k: j for k, j in zip(metas["key"], metas["json"])}
        out_json, matched = [], []
        for k, j in zip(origs["key"], origs["json"]):
            mj = build.get(k)
            if mj is not None and json.loads(mj):  # {} = no match (merge_cdxj.py:72)
                out_json.append(json.dumps(
                    get_sidecar_fields(json.loads(j), json.loads(mj))))
                matched.append(True)
            else:
                out_json.append(j)
                matched.append(False)
        origs["json"] = out_json
        origs["matched"] = matched
        return origs.drop(columns=["side", "key", "part"])

    return (
        both.map_batches(add_key, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pandas")
    )
