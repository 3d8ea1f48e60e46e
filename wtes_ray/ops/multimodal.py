"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages sized for large rows (small ``batch_size``,
``batch_format="pyarrow"`` so binary columns never round-trip through pandas
object dtype).

The image/audio codecs are NOT in this container, so the decode step is
STUBBED (SURVEY.md §7.0 pattern): ``DecodeStub`` parses a deterministic fake
header (the synthetic payloads carry one) and raises ``NotImplementedError``
for real formats unless PIL/soundfile import succeeds. The Ray-side plumbing
— schema, batch sizing, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# media rows: (doc_id passthrough dtype, media_ref string, media_type
# string, payload binary) — doc_id keeps the caller's type (int64 for the sf
# benchmark table, string URLs for the extraction corpus)
_MAGIC = b"WTESIMG1"


def synth_media_batch(batch: pa.Table, *, seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads derived from doc ids: an 8-byte
    magic, a 12-byte header (width, height, channels) and seeded pixel
    bytes. Stands in for real image bytes so the decode/feature stages have
    realistic payload sizes."""
    import zlib

    doc_ids = batch.column("doc_id").to_pylist()
    refs, types_, payloads = [], [], []
    for d in doc_ids:
        # string-safe seeding: doc ids may be URLs, not ints
        rng = np.random.RandomState(
            (seed + zlib.crc32(str(d).encode("utf-8"))) % (2 ** 31))
        w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
        pixels = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8)
        header = (int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
                  + (3).to_bytes(4, "little"))
        payloads.append(_MAGIC + header + pixels.tobytes())
        refs.append(f"img://{d}.fake")
        types_.append("image")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "media_ref": pa.array(refs, pa.string()),
        "media_type": pa.array(types_, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


_CHANNELS_OF = {"1": 1, "L": 1, "P": 1, "I": 1, "F": 1, "LA": 2,
                "RGB": 3, "YCbCr": 3, "RGBA": 4, "CMYK": 4}


class DecodeStub:
    """Actor-pool decode stage. Real codecs are gated behind import-try
    (resolved ONCE per actor in ``__init__``); the deterministic fake
    format always decodes; any other payload goes through PIL when it is
    importable, else raises. Use with a SMALL batch_size — payloads are
    large rows."""

    def __init__(self):
        try:  # PIL absent in this container; wired + tested where present
            from PIL import Image
            self._image_open = Image.open
        except ImportError:
            self._image_open = None

    def _decode_pil(self, payload: bytes) -> tuple[int, int, int]:
        import io
        img = self._image_open(io.BytesIO(payload))
        # identify-only: PIL reads the header lazily — w/h/mode cost no
        # full pixel decode, which is what a metadata stage wants
        channels = _CHANNELS_OF.get(img.mode)
        if channels is None:
            channels = len(img.getbands())
        return int(img.width), int(img.height), channels

    def decode_meta(self, payload: bytes) -> tuple[int, int, int]:
        if payload is None:
            raise NotImplementedError("null payload")
        if payload[:8] == _MAGIC:
            w = int.from_bytes(payload[8:12], "little")
            h = int.from_bytes(payload[12:16], "little")
            c = int.from_bytes(payload[16:20], "little")
            return w, h, c
        if self._image_open is not None:
            try:
                return self._decode_pil(payload)
            except Exception as e:   # undecodable bytes → quarantined row
                raise NotImplementedError(f"PIL could not decode: {e}")
        raise NotImplementedError(
            "no codec available for non-synthetic payload (PIL absent)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        w, h, c, ok = [], [], [], []
        for p in payloads:
            try:
                wi, hi, ci = self.decode_meta(p)
                w.append(wi)
                h.append(hi)
                c.append(ci)
                ok.append(True)
            except NotImplementedError:
                w.append(0)
                h.append(0)
                c.append(0)
                ok.append(False)
        return (batch
                .append_column("width", pa.array(w, pa.int32()))
                .append_column("height", pa.array(h, pa.int32()))
                .append_column("channels", pa.array(c, pa.int32()))
                .append_column("decoded", pa.array(ok, pa.bool_())))


class ByteHistogramFeatures:
    """Feature extraction that is REAL compute (vectorized byte histogram →
    16-bin density vector) — the stand-in for model-based image features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch.column("payload").to_pylist():
            # only the synthetic format's 20-byte header is understood;
            # other/null payloads get a zero feature vector, never a
            # histogram over misinterpreted bytes
            if p is None or p[:8] != _MAGIC:
                feats.append([0.0] * 16)
                continue
            arr = np.frombuffer(p[20:], dtype=np.uint8)
            if arr.size == 0:
                feats.append([0.0] * 16)
                continue
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            feats.append((hist / hist.sum()).round(6).tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64())))


def media_feature_pipeline(docs: ray.data.Dataset, *,
                           concurrency=2,
                           batch_size: int = 64) -> ray.data.Dataset:
    """docs (with doc_id) → synth payloads → decode (actor pool) → features.
    Output: doc_id, media_ref, width, height, channels, decoded, features."""
    media = docs.map_batches(synth_media_batch, batch_format="pyarrow")
    decoded = media.map_batches(DecodeStub, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)
    feats = decoded.map_batches(ByteHistogramFeatures, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)
    return feats.drop_columns(["payload"])
