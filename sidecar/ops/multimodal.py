"""Multimodal column operators: image decode / resize / feature-extract and
audio/video stubs, as actor-pool ``map_batches`` stages over IMAGES-shaped
rows (opaque ``binary`` payload + typed metadata — the data model from
BASELINE.json:input_hint).

The image path is REAL end-to-end: png/ppm/b16 codecs are implemented
in-repo (sidecar/codecs.py), so decode, nearest-neighbor resize, phash and
pixel stats run on actual pixels.  Audio/video decode is STUBBED (the
container ships no av libraries): ``AudioFeatureStage``/``VideoFrameSample``
raise ``NotImplementedError`` for real payloads but the Ray-side plumbing —
schema, actor signature, batch sizing, output layout — is real and tested
with the deterministic fake (`fake=True`).

Scale notes: payload-carrying batches are kept SMALL (batch_size≈64) so
batch × concurrency fits worker heaps; stages are callable CLASSES so any
model/codec state loads once per actor in ``__init__``, not per batch; the
binary column never enters a shuffle — aggregations happen on the extracted
scalar columns only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from sidecar import codecs
from sidecar.detect.phash import phash64


class ImageDecodeStats:
    """Actor-pool stage: decode bytes per fmt → (w, h, phash, channel sums).

    Sums are exact int64 (deterministic across runs/engines); means are left
    to consumers so no float drift enters the hashable output.
    """

    def __init__(self) -> None:
        self.decode = codecs.decode  # codec table bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, fmts, ph, sr, sg, sb = [], [], [], [], [], [], [], []
        for image_id, data, fmt in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
        ):
            px = self.decode(data, fmt)
            ids.append(image_id)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            fmts.append(fmt)
            ph.append(np.int64(np.uint64(phash64(px))).item())  # 2s-complement, matches synth
            s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            sr.append(int(s[0])); sg.append(int(s[1])); sb.append(int(s[2]))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "phash": pa.array(ph, pa.int64()),
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64()),
        })


class ImageResize:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode.

    Output keeps the IMAGES shape (bytes/w/h/fmt swapped for the resized
    payload) so resize stages compose with the sidecar pipeline.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32, out_fmt: str = "png") -> None:
        self.out_w, self.out_h, self.out_fmt = out_w, out_h, out_fmt

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape[:2]
        yi = (np.arange(self.out_h) * h) // self.out_h
        xi = (np.arange(self.out_w) * w) // self.out_w
        return px[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs, caps = [], [], []
        for image_id, data, fmt, cap in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("caption").to_pylist(),
        ):
            small = self._resize(codecs.decode(data, fmt))
            ids.append(image_id)
            blobs.append(codecs.encode(small, self.out_fmt))
            caps.append(cap)
        n = len(ids)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([self.out_w] * n, pa.int32()),
            "h": pa.array([self.out_h] * n, pa.int32()),
            "fmt": pa.array([self.out_fmt] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
        })


class AudioFeatureStage:
    """STUB actor-pool stage for audio payloads (no audio libs in this
    container).  With ``fake=True`` it emits a deterministic per-payload
    feature vector (blake2b-seeded), exercising the real Ray plumbing; with
    ``fake=False`` it raises NotImplementedError as a clearly-marked gap."""

    def __init__(self, fake: bool = True, n_mfcc: int = 8) -> None:
        self.fake = fake
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires an audio library not present in "
                "this environment; run with fake=True for plumbing tests")
        import hashlib

        ids, feats = [], []
        for pid, data in zip(batch.column("image_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            h = hashlib.blake2b(data or b"", digest_size=self.n_mfcc)
            feats.append([b / 255.0 for b in h.digest()])
            ids.append(pid)
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "mfcc": pa.array(feats, pa.list_(pa.float64())),
        })


class VideoFrameSample:
    """STUB actor-pool stage for video payloads: deterministic frame-index
    sampling of a notional n_frames-long clip (metadata-only; no real
    decode).  Real decode path raises NotImplementedError."""

    def __init__(self, every_n: int = 30, fake: bool = True) -> None:
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real video decode requires an av library not present here")
        ids, frames = [], []
        for pid, data in zip(batch.column("image_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            n_frames = max(1, len(data or b"") // 64)  # notional clip length
            ids.append(pid)
            frames.append(list(range(0, n_frames, self.every_n)))
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "frame_indices": pa.array(frames, pa.list_(pa.int64())),
        })


def _pool_size(requested: "int | tuple | None") -> "int | tuple":
    """Default actor-pool size capped BELOW cluster CPUs — a pool holding
    every slot starves upstream read/filter tasks (deadlocks at num_cpus=4)."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(4, cpus - 2))


def image_decode_stats(images_ds: "rd.Dataset", *, batch_size: int = 64,
                       concurrency: "int | tuple | None" = None) -> "rd.Dataset":
    """IMAGES Dataset → decode-stats Dataset via the actor pool."""
    return images_ds.map_batches(
        ImageDecodeStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=_pool_size(concurrency),
    )


def image_resize(images_ds: "rd.Dataset", out_w: int = 32, out_h: int = 32,
                 *, batch_size: int = 64,
                 concurrency: "int | tuple | None" = None) -> "rd.Dataset":
    return images_ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=_pool_size(concurrency),
    )
