"""Unit contracts ported from the reference's detector tests
(tests/test_warc_metadata_sidecar.py:55-106) — table-level asserts on our
deterministic detectors, same shapes as fido/chardet/pycld2/soft404 output."""

import numpy as np
import pyarrow as pa
import pytest

from sidecar import codecs, synth
from sidecar.detect import (
    find_character_set,
    find_character_set_batch,
    find_language,
    find_language_batch,
    phash64,
    sniff,
    sniff_batch,
    soft404_probability,
)
from sidecar.detect.soft404 import soft404_batch


def test_mime_and_puid_shapes():
    # reference contract (:55-58): (mime_dict, puid) with fido + python-magic keys
    mime_dict, puid = sniff(b"<!DOCTYPE html><html><body>x</body></html>")
    assert mime_dict == {"fido": "text/html", "python-magic": "text/html"}
    assert puid == "fmt/471"  # reference golden: HTML5 doctype -> fmt/471
    mime_dict, puid = sniff(codecs.encode_png(np.zeros((4, 4, 3), np.uint8)))
    assert mime_dict["fido"] == "image/png" and puid == "fmt/11"


def test_mime_batch_matches_scalar():
    payloads = [
        b"GIF89a....",
        b"\xff\xd8\xff\xe0jpeg",
        b"P6\n2 2\n255\n" + b"\x00" * 12,
        b"%PDF-1.4",
        b"plain words here",
        b"",
        b"\x00\x01\x02\x03",
        b"{\"a\": 1}",
    ]
    fido, magic, puid = sniff_batch(pa.array(payloads, type=pa.binary()))
    for i, p in enumerate(payloads):
        md, pu = sniff(p)
        assert md.get("fido") == fido[i]
        assert md.get("python-magic") == magic[i]
        assert pu == puid[i]


def test_charset_shapes_and_batch_parity():
    # reference contract (:61-64): {'encoding', 'confidence'}
    assert find_character_set(b"pure ascii") == {"encoding": "ascii", "confidence": 1.0}
    assert find_character_set("héllo".encode())["encoding"] == "utf-8"
    assert find_character_set(b"\xff\x00bad\xff")["encoding"] == "ISO-8859-1"
    payloads = [b"ascii", "héllo".encode(), b"\xff\x00x\xff", b""]
    enc, conf = find_character_set_batch(pa.array(payloads, type=pa.binary()))
    for i, p in enumerate(payloads):
        ref = find_character_set(p)
        if p:
            assert enc[i] == ref["encoding"] and conf[i] == ref["confidence"]
        else:
            assert enc[i] is None


def test_language_shape_and_unknown_none():
    # reference contracts (:67-77): cld2 dict shape; all-Unknown → None
    r = find_language(b"the cat and the dog went to the page and said this was that")
    assert r["reliable"] is True
    assert set(r.keys()) == {"reliable", "text-bytes", "languages"}
    assert r["languages"][0]["code"] == "en"
    assert set(r["languages"][0]) == {"name", "code", "text-covered", "score"}
    assert find_language(b"zzz qqq kkk 123") is None  # Unknown-only → None (:112-126)
    assert find_language(b"") is None


def test_language_batch_bit_identical_to_scalar():
    texts = [
        "the cat and the dog on the page",
        "el perro y la casa de que no se",
        "der hund und die katze in dem haus",
        "le chat et le chien dans la maison du parc",
        "你好世界 中文 测试 文本 这是 一个 好 的",
        "mixed the dog el perro und die le chat",
        "\x02control\x02 the and of to a in is it",
        "",
        "zzz",
    ]
    batch = find_language_batch(pa.array(texts))
    for i, t in enumerate(texts):
        assert find_language(t) == batch[i], t


def test_soft404_gate_values_and_parity():
    hit = soft404_probability("sorry, page not found — error 404")
    miss = soft404_probability("welcome to our homepage full of content")
    assert hit > 0.9 > 0.1 > miss
    b = soft404_batch(pa.array(["sorry, page not found — error 404", "welcome"]))
    assert b[0] == hit  # bit-identical scalar/batch


def test_phash_properties():
    px = synth.make_pixels("p", 64, 48)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    noisy = px.astype(np.int16)
    noisy[::7, ::5] += 2
    near = phash64(noisy.clip(0, 255).astype(np.uint8))
    assert bin(h1 ^ near).count("1") <= 8  # near-dup stays near
    other = phash64(synth.make_pixels("different", 64, 48))
    assert bin(h1 ^ other).count("1") >= 10  # distinct images far apart


@pytest.mark.parametrize("fmt", ["png", "ppm", "b16"])
def test_codec_roundtrip(fmt):
    px = synth.make_pixels("rt", 31, 19)
    back = codecs.decode(codecs.encode(px, fmt), fmt)
    if fmt in codecs.LOSSLESS:
        assert np.array_equal(px, back)
    else:
        assert codecs.psnr(px, back) >= 40.0  # input_hint PSNR bound


class TestDetectorProtocol:
    def test_builtins_registered(self):
        from sidecar.detect import protocol as proto

        for name in proto.BUILTIN_NAMES:
            assert isinstance(proto.get(name), proto.Detector)

    def test_register_toy_detector_without_editing_pipeline(self):
        """SURVEY §2.9: a user detector registers through the protocol and
        its column appears in the extraction output — no pipeline.py edit."""
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from sidecar import pipeline, synth
        from sidecar.detect import protocol as proto

        class ByteLenDetector:
            name = "byte_len"

            def applies_to(self, ctx):
                return ctx.nonempty

            def run(self, ctx, mask):
                import pyarrow.compute as pc

                ln = pc.binary_length(ctx.payload).to_numpy(
                    zero_copy_only=False)
                return {"byte_len": pa.array(
                    np.where(mask, ln, 0).astype(np.int64), pa.int64())}

        proto.register(ByteLenDetector())
        try:
            imgs = pa.Table.from_pylist([
                {"image_id": "a", "bytes": b"hello world of words here",
                 "w": 0, "h": 0, "fmt": "", "caption": "", "phash": 0},
            ], schema=synth.IMAGES_SCHEMA)
            out = pipeline.sidecar_dataset(rd.from_arrow(imgs)).take_all()
            assert out[0]["byte_len"] == 25
        finally:
            proto.unregister("byte_len")
        # after unregister the column is gone
        imgs = pa.Table.from_pylist([
            {"image_id": "a", "bytes": b"hello", "w": 0, "h": 0,
             "fmt": "", "caption": "", "phash": 0},
        ], schema=synth.IMAGES_SCHEMA)
        out = pipeline.sidecar_dataset(rd.from_arrow(imgs)).take_all()
        assert "byte_len" not in out[0]

    def test_replace_builtin_detector(self):
        """Replacing a built-in (here: charset) changes the pipeline's
        output without editing pipeline.py, and restores cleanly."""
        import pyarrow as pa

        import ray.data as rd

        from sidecar import pipeline, schemas, synth
        from sidecar.detect import protocol as proto

        class FixedCharset:
            name = "charset"

            def applies_to(self, ctx):
                return ctx.is_text

            def run(self, ctx, mask):
                return {"charset": pa.array(
                    [{"encoding": "x-custom", "confidence": 1.0}
                     if m else None for m in mask],
                    type=schemas.CHARSET_T)}

        original = proto.get("charset")
        proto.register(FixedCharset())
        try:
            imgs = pa.Table.from_pylist([
                {"image_id": "a",
                 "bytes": b"plain text content with several words",
                 "w": 0, "h": 0, "fmt": "", "caption": "", "phash": 0},
            ], schema=synth.IMAGES_SCHEMA)
            out = pipeline.sidecar_dataset(rd.from_arrow(imgs)).take_all()
            assert out[0]["charset"]["encoding"] == "x-custom"
        finally:
            proto.register(original)


def test_sniff_batch_sliced_array_offsets():
    """A SLICED binary array must decode at the right byte positions:
    arr.offset indexes the offsets buffer (elements), it is not a byte
    delta — adding it corrupted every detection on sliced inputs."""
    import numpy as np
    import pyarrow as pa

    from sidecar.detect.charset import find_character_set_batch
    from sidecar.detect.mime import sniff_batch

    arr = pa.array([b"GARBAGEGARBAGE", b"\x89PNG\r\n\x1a\nxxxx",
                    b"<!DOCTYPE html><p>hi</p>"], type=pa.binary()).slice(1)
    fido, magic, puid = sniff_batch(arr)
    assert list(magic) == ["image/png", "text/html"]
    assert list(puid) == ["fmt/11", "fmt/471"]
    enc, conf = find_character_set_batch(
        pa.array([b"\xffbinary", b"plain ascii text here"]).slice(1))
    assert enc[0] == "ascii" and conf[0] == 1.0


def test_plain_text_has_no_fido_and_no_puid():
    """Reference parity: real fido has no plain-text signature, so the
    sidecar carries only the python-magic key and NO
    Preservation-Identifier line (reference tests :220-221)."""
    from sidecar.detect.mime import sniff

    mime_dict, puid = sniff(b"just some plain ascii words")
    assert mime_dict == {"python-magic": "text/plain"}
    assert puid is None


def test_utf16_bom_payload_is_text_with_charset():
    """UTF-16 payloads are text to python-magic; the charset stage's BOM
    branch must be reachable for them (it was dead code behind an
    octet-stream classification)."""
    from sidecar.detect.charset import find_character_set
    from sidecar.detect.mime import sniff

    payload = "hello world".encode("utf-16")  # BOM-prefixed
    mime_dict, puid = sniff(payload)
    assert mime_dict.get("python-magic") == "text/plain"
    assert find_character_set(payload) == {"encoding": "UTF-16", "confidence": 1.0}


def test_binary_without_early_control_bytes_is_not_text():
    """The printable heuristic checks a 64-byte window: binary whose first
    14 bytes happen to be printable must not classify as text/plain."""
    from sidecar.detect.mime import sniff

    blob = bytes(range(0x20, 0x7F))[:20] + b"\x01\x02\x03" + b"x" * 40
    mime_dict, _ = sniff(blob)
    assert mime_dict.get("python-magic") == "application/octet-stream"


def test_registry_swapped_mime_detector_keeps_pipeline_working():
    """SURVEY 2.9: a custom 'mime' detector that fulfills the protocol by
    RETURNING columns (without mutating ctx) must not crash the text gate."""
    import numpy as np
    import pyarrow as pa

    from sidecar.detect import protocol
    from sidecar.pipeline import extract_sidecar_batch

    class ConstMime:
        name = "mime"

        def applies_to(self, ctx):
            return np.ones(ctx.num_rows, dtype=bool)

        def run(self, ctx, mask):
            n = ctx.num_rows
            return {
                "mime_fido": pa.array(["text/plain"] * n, pa.string()),
                "mime_magic": pa.array(["text/plain"] * n, pa.string()),
                "puid": pa.array([None] * n, pa.string()),
            }

    reg = dict(protocol.snapshot())
    reg["mime"] = ConstMime()
    batch = pa.Table.from_pylist([{
        "image_id": "x", "url": "http://x/", "ts": "20210101000000",
        "bytes": b"some words here", "caption": "",
    }])
    out = extract_sidecar_batch(batch, registry=reg)
    assert out.num_rows == 1
    assert out.column("mime_magic").to_pylist() == ["text/plain"]
