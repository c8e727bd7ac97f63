"""WARC-text conformance: serialize → file → read back → field round-trip
(S1/S2/S4/F12 of SURVEY.md §2)."""

from __future__ import annotations

import ray.data as rd

from sidecar import pipeline, synth, warc


def _sidecar(images):
    return pipeline.sidecar_dataset(rd.from_arrow(images))


def test_warc_roundtrip(tmp_path, images_table):
    path = str(tmp_path / "out.warc")
    ds = _sidecar(images_table.slice(0, 64))
    n = warc.write_sidecar_warc(ds, path, operator="ops", publisher="pub")
    assert n > 0

    records = warc.read_warc_text(path).take_all()
    assert records[0]["rec_type"] == "warcinfo"
    metas = [r for r in records if r["rec_type"] == "metadata"]
    assert len(metas) == n

    # payload text round-trips exactly against the serializer
    rows = {r["url"]: r for r in _sidecar(images_table.slice(0, 64)).take_all()}
    for m in metas[:20]:
        src = rows.get(m["url"])
        if src is not None:
            assert m["payload"] == pipeline.sidecar_row_to_payload(src)
            assert m["ts"] == (src["ts"] or "20210101000000")


def test_warc_warcinfo_fields():
    text = warc.warcinfo_record_text("x.warc.meta.gz", operator="op", publisher="p")
    recs = warc.parse_warc_text(text)
    assert len(recs) == 1 and recs[0]["rec_type"] == "warcinfo"
    assert "software" in recs[0]["payload"]
    assert "operator: op" in recs[0]["payload"]


def test_warc_zero_record_rewrite(tmp_path):
    """S4: a run that writes no metadata records leaves a warcinfo whose
    description carries the zero-record marker."""
    import pyarrow as pa

    empty = pa.Table.from_pylist([
        {"image_id": "e", "bytes": b"", "w": 0, "h": 0, "fmt": "",
         "caption": "", "phash": 0},
    ], schema=synth.IMAGES_SCHEMA)
    path = str(tmp_path / "empty.warc")
    n = warc.write_sidecar_warc(_sidecar(empty), path)
    assert n == 0
    recs = warc.parse_warc_text(open(path, "rb").read().decode())
    assert len(recs) == 1
    assert "0 metadata sidecar records" in recs[0]["payload"]


def test_filename_derivation():
    """S3/S8 path conventions match the reference's regex semantics."""
    from sidecar.warc import (cdxj_name_from_sidecar, is_arc_name,
                              merged_cdxj_name, sidecar_name)

    assert sidecar_name("a.warc") == "a.warc.meta.gz"
    assert sidecar_name("a.warc.gz") == "a.warc.meta.gz"
    assert sidecar_name("a.arc") == "a.warc.meta.gz"
    assert sidecar_name("a.arc.gz") == "a.warc.meta.gz"
    assert cdxj_name_from_sidecar("/dir/a.warc.meta.gz") == "a.cdxj"
    assert merged_cdxj_name("/dir/a.cdxj") == "a_merged.cdxj"
    assert is_arc_name("a.arc") and is_arc_name("a.arc.gz")
    assert not is_arc_name("a.warc") and not is_arc_name("a.warc.gz")


def test_arc_source_header_absence(images_table):
    """F4 parity: ARC-sourced sidecar records carry no WARC-Concurrent-ID /
    WARC-Warcinfo-ID; WARC-sourced ones do (reference tests :188-197)."""
    ds = _sidecar(images_table.slice(0, 4))
    warc_recs = warc.parse_warc_text(
        "".join(r["record"] for r in warc.sidecar_to_warc_text(
            ds, source_is_warc=True, warcinfo_id="<urn:uuid:w1>").take_all()))
    arc_recs = warc.parse_warc_text(
        "".join(r["record"] for r in warc.sidecar_to_warc_text(
            _sidecar(images_table.slice(0, 4)), source_is_warc=False).take_all()))
    assert warc_recs and arc_recs
    for r in warc_recs:
        assert "WARC-Concurrent-ID" in r["headers"]
        assert r["headers"]["WARC-Warcinfo-ID"] == "<urn:uuid:w1>"
    for r in arc_recs:
        assert "WARC-Concurrent-ID" not in r["headers"]
        assert "WARC-Warcinfo-ID" not in r["headers"]
