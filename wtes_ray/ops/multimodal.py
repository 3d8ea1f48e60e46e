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

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .runtime import stateless, task_concurrency


def _md5_u64(key: str) -> int:
    """uint64 drawn from md5 — byte-for-byte equal to DuckDB's
    ``md5_number_lower(key)`` (digest bytes 8..16, little-endian; verified
    against duckdb 1.x). The synthetic generators derive their HEADER
    fields (width/height, frame count) from this so the media pipelines'
    structural output is reproducible in oracle SQL; pixel/PCM bodies stay
    RandomState-seeded (realistic payload sizes, never oracle-checked)."""
    return int.from_bytes(
        hashlib.md5(key.encode("utf-8")).digest()[8:16], "little")

# media rows: (doc_id passthrough dtype, media_ref string, media_type
# string, payload binary) — doc_id keeps the caller's type (int64 for the sf
# benchmark table, string URLs for the extraction corpus)
_MAGIC = b"WTESIMG1"


def _pack_img(w: int, h: int, c: int, pixels: bytes) -> bytes:
    """Synthetic image payload: magic + little-endian (w, h, c) + pixels.
    The ONE place the byte layout lives — synth/resize/frame-sample all
    build through here and decode through :func:`_unpack_img_header`."""
    return (_MAGIC + int(w).to_bytes(4, "little")
            + int(h).to_bytes(4, "little") + int(c).to_bytes(4, "little")
            + pixels)


def _unpack_img_header(payload: bytes) -> tuple[int, int, int]:
    w = int.from_bytes(payload[8:12], "little")
    h = int.from_bytes(payload[12:16], "little")
    c = int.from_bytes(payload[16:20], "little")
    return w, h, c


def synth_media_batch(batch: pa.Table, *, seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads derived from doc ids: an 8-byte
    magic, a 12-byte header (width, height, channels) and seeded pixel
    bytes. Stands in for real image bytes so the decode/feature stages have
    realistic payload sizes. Width/height come from :func:`_md5_u64` so the
    oracle SQL reproduces them (queries.MEDIA_FEATURES_SQL)."""
    doc_ids = batch.column("doc_id").to_pylist()
    refs, types_, payloads = [], [], []
    for d in doc_ids:
        # string-safe seeding: doc ids may be URLs, not ints
        u = _md5_u64(f"{seed}:img:{d}")
        w, h = 16 + u % 48, 16 + (u // 48) % 48
        rng = np.random.RandomState(u % (2 ** 31))
        pixels = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8)
        payloads.append(_pack_img(w, h, 3, pixels.tobytes()))
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
            return _unpack_img_header(payload)
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


class ResizeStub:
    """Actor-pool resize stage: nearest-neighbor downscale of the synthetic
    format's pixel buffer (REAL vectorized numpy compute — the stand-in
    for a codec-backed resize); PIL-gated path for real images when the
    library exists. Non-decodable payloads pass through untouched with
    ``resized=False`` (quarantine-style, never an exception)."""

    def __init__(self, target_w: int = 16, target_h: int = 16):
        self.tw, self.th = target_w, target_h
        try:
            from PIL import Image
            self._image_open = Image.open
        except ImportError:
            self._image_open = None

    def _resize_synth(self, payload: bytes) -> bytes:
        w, h, c = _unpack_img_header(payload)
        px = np.frombuffer(payload[20:20 + w * h * c], dtype=np.uint8)
        if px.size != w * h * c:
            raise ValueError("truncated pixel buffer")
        img = px.reshape(h, w, c)
        # nearest-neighbor index maps (vectorized gather)
        yi = (np.arange(self.th) * h // self.th)
        xi = (np.arange(self.tw) * w // self.tw)
        small = img[yi][:, xi]
        return _pack_img(self.tw, self.th, c, small.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, ok = [], []
        for p in batch.column("payload").to_pylist():
            try:
                if p is not None and p[:8] == _MAGIC:
                    out.append(self._resize_synth(p))
                    ok.append(True)
                    continue
                if p is not None and self._image_open is not None:
                    import io
                    img = self._image_open(io.BytesIO(p))
                    img = img.resize((self.tw, self.th))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                    ok.append(True)
                    continue
            except Exception:  # noqa: BLE001 — quarantine, don't kill batch
                pass
            out.append(p)
            ok.append(False)
        cols = {n: batch.column(n) for n in batch.column_names
                if n != "payload"}
        cols["payload"] = pa.array(out, pa.binary())
        cols["resized"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


# synthetic audio: magic + (sample_rate, n_samples) header + int16 PCM
_AMAGIC = b"WTESAUD1"


def _pack_audio(sr: int, samples: bytes) -> bytes:
    """Synthetic audio payload layout in ONE place (mirrors _pack_img)."""
    n = len(samples) // 2
    return (_AMAGIC + int(sr).to_bytes(4, "little")
            + int(n).to_bytes(4, "little") + samples)


def _unpack_audio_header(payload: bytes) -> tuple[int, int]:
    sr = int.from_bytes(payload[8:12], "little")
    n = int.from_bytes(payload[12:16], "little")
    return sr, n


def synth_audio_batch(batch: pa.Table, *, seed: int = 42) -> pa.Table:
    """Deterministic fake audio payloads (seeded per doc id): a sample-rate
    header and an int16 PCM buffer — realistic row sizes for the audio
    feature stage. The HEADER fields (sample rate, sample count) derive
    from :func:`_md5_u64` so the pipeline's structural output is
    reproducible in oracle SQL (the image/video convention); the PCM
    body stays RandomState-seeded (realistic waveform, never
    oracle-checked)."""
    import zlib

    doc_ids = batch.column("doc_id").to_pylist()
    refs, types_, payloads = [], [], []
    for d in doc_ids:
        rng = np.random.RandomState(
            (seed + zlib.crc32(f"a{d}".encode("utf-8"))) % (2 ** 31))
        sr = 16000
        u = _md5_u64(f"{seed}:aud:{d}")
        n = sr // 4 + int(u % (sr - sr // 4))  # 0.25–1 s clips
        t = np.arange(n, dtype=np.float64)
        tone = np.sin(2 * np.pi * rng.uniform(100, 2000) * t / sr)
        noise = 0.1 * rng.standard_normal(n)
        pcm = np.clip((tone + noise) * 0.5, -1, 1)
        samples = (pcm * 32767).astype("<i2")
        payloads.append(_pack_audio(sr, samples.tobytes()))
        refs.append(f"aud://{d}.fake")
        types_.append("audio")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "media_ref": pa.array(refs, pa.string()),
        "media_type": pa.array(types_, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class AudioFeatures:
    """Actor-pool audio feature stage (REAL vectorized numpy compute over
    the synthetic PCM format — the stand-in for model-backed audio
    embeddings): duration, RMS level, zero-crossing rate. Real containers
    (wav/flac/...) route through soundfile when importable (absent here);
    undecodable payloads quarantine with ``decoded=false``."""

    def __init__(self):
        try:
            import soundfile
            self._sf_read = soundfile.read
        except ImportError:
            self._sf_read = None

    def _features(self, payload: bytes) -> tuple[float, float, float]:
        if payload[:8] == _AMAGIC:
            sr, n = _unpack_audio_header(payload)
            # a header claiming sr<=0 or n<=0 is corruption, not a valid
            # silent clip — quarantine instead of emitting zero features
            if sr <= 0 or n <= 0:
                raise ValueError("corrupt audio header (sr/n <= 0)")
            pcm = np.frombuffer(payload[16:16 + 2 * n], dtype="<i2")
            if pcm.size != n:
                raise ValueError("truncated PCM buffer")
            x = pcm.astype(np.float64) / 32767.0
        elif self._sf_read is not None:
            import io
            data, sr = self._sf_read(io.BytesIO(payload))
            x = np.asarray(data, dtype=np.float64)
            if x.ndim > 1:
                x = x.mean(axis=1)
        else:
            raise ValueError("no audio codec (soundfile absent)")
        dur = len(x) / sr if sr else 0.0
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zcr = (float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
               if len(x) > 1 else 0.0)
        return round(dur, 6), round(rms, 6), round(zcr, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, ok = [], [], [], []
        for p in batch.column("payload").to_pylist():
            try:
                if p is None:
                    raise ValueError("null payload")
                d, r, z = self._features(p)
                dur.append(d)
                rms.append(r)
                zcr.append(z)
                ok.append(True)
            except Exception:  # noqa: BLE001 — quarantine row
                dur.append(0.0)
                rms.append(0.0)
                zcr.append(0.0)
                ok.append(False)
        return (batch
                .append_column("duration_s", pa.array(dur, pa.float64()))
                .append_column("rms", pa.array(rms, pa.float64()))
                .append_column("zcr", pa.array(zcr, pa.float64()))
                .append_column("decoded", pa.array(ok, pa.bool_())))


def audio_feature_pipeline(docs: ray.data.Dataset, *, concurrency=2,
                           batch_size: int = 64) -> ray.data.Dataset:
    """docs → synth audio payloads → features (actor pool). Output:
    doc_id, media_ref, duration_s, rms, zcr, decoded."""
    media = docs.map_batches(synth_audio_batch, batch_format="pyarrow")
    feats = media.map_batches(stateless(AudioFeatures),
                              batch_format="pyarrow",
                              batch_size=batch_size,
                              **task_concurrency(concurrency))
    return feats.drop_columns(["payload", "media_type"])


# synthetic video: magic + (n_frames, w, h, c) header + frame pixel planes
_VMAGIC = b"WTESVID1"


def synth_video_batch(batch: pa.Table, *, seed: int = 42) -> pa.Table:
    """Deterministic fake video payloads (seeded per doc id): a frame count
    and per-frame pixel planes in the synthetic format — realistic row
    sizes for the frame-sampling stage. Frame count and dimensions come
    from :func:`_md5_u64` so the frame-sampling pipeline's structural
    output is oracle-checkable (queries.MEDIA_VIDEO_FRAMES_SQL)."""
    doc_ids = batch.column("doc_id").to_pylist()
    refs, types_, payloads = [], [], []
    for d in doc_ids:
        u = _md5_u64(f"{seed}:vid:{d}")
        n_frames = 4 + u % 13                      # 4..16
        w, h = 8 + (u // 13) % 16, 8 + (u // 208) % 16   # 8..23
        rng = np.random.RandomState(u % (2 ** 31))
        frames = rng.randint(0, 256, size=n_frames * w * h * 3,
                             dtype=np.uint8)
        header = (n_frames.to_bytes(4, "little") + w.to_bytes(4, "little")
                  + h.to_bytes(4, "little") + (3).to_bytes(4, "little"))
        payloads.append(_VMAGIC + header + frames.tobytes())
        refs.append(f"vid://{d}.fake")
        types_.append("video")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "media_ref": pa.array(refs, pa.string()),
        "media_type": pa.array(types_, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class FrameSampler:
    """Actor-pool frame sampling: every ``stride``-th frame of a video
    payload becomes its OWN output row carrying a single-image synthetic
    payload — the flat-map shape a real decoder (ffmpeg/pyav, absent
    here) would use. Non-video payloads yield zero rows."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "media_ref": [], "frame_index": [],
               "payload": []}
        for doc_id, ref, p in zip(batch.column("doc_id").to_pylist(),
                                  batch.column("media_ref").to_pylist(),
                                  batch.column("payload").to_pylist()):
            if p is None or p[:8] != _VMAGIC:
                continue
            n = int.from_bytes(p[8:12], "little")
            w = int.from_bytes(p[12:16], "little")
            h = int.from_bytes(p[16:20], "little")
            c = int.from_bytes(p[20:24], "little")
            frame_bytes = w * h * c
            body = p[24:]
            for i in range(0, n, self.stride):
                px = body[i * frame_bytes:(i + 1) * frame_bytes]
                if len(px) != frame_bytes:
                    break   # truncated payload — stop, don't mis-slice
                out["doc_id"].append(doc_id)
                out["media_ref"].append(f"{ref}#f{i}")
                out["frame_index"].append(i)
                out["payload"].append(_pack_img(w, h, c, px))
        return pa.table({
            "doc_id": pa.array(out["doc_id"],
                               batch.column("doc_id").type),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "frame_index": pa.array(out["frame_index"], pa.int32()),
            "payload": pa.array(out["payload"], pa.binary()),
        })


def video_frame_pipeline(docs: ray.data.Dataset, *, stride: int = 4,
                         target: int = 8, concurrency=2,
                         batch_size: int = 32) -> ray.data.Dataset:
    """docs → synth video payloads → frame sample (actor pool, flat-map) →
    resize → decode metadata. Output: one row per sampled frame with
    (doc_id, media_ref, frame_index, width, height, channels, decoded,
    resized)."""
    media = docs.map_batches(synth_video_batch, batch_format="pyarrow")
    frames = media.map_batches(stateless(FrameSampler, stride=stride),
                               batch_format="pyarrow",
                               batch_size=batch_size,
                               **task_concurrency(concurrency))
    resized = frames.map_batches(
        stateless(ResizeStub, target_w=target, target_h=target),
        batch_format="pyarrow", batch_size=batch_size,
        **task_concurrency(concurrency))
    decoded = resized.map_batches(stateless(DecodeStub),
                                  batch_format="pyarrow",
                                  batch_size=batch_size,
                                  **task_concurrency(concurrency))
    return decoded.drop_columns(["payload"])


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


def binary_exact_dedup(ds: ray.data.Dataset, *, bytes_col: str = "payload",
                       id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup of opaque BINARY payloads (images/audio/video blobs) by
    content digest — the multimodal sibling of ops/dedup.exact_dedup_ids:
    each block hashes its payloads locally, so only (digest, id) pairs ride
    the exchange and the blobs themselves never move. Returns one row per
    distinct payload: (digest hex, keeper = min id, n_copies).

    NULL payloads are digested under a distinct ``null:`` sentinel so they
    never merge with genuinely empty (``b""``) payloads — NULL means "no
    media fetched", empty means "zero-byte media", and a dedup pass must
    not conflate the two."""
    from ray.data.aggregate import Count, Min

    def hash_batch(t: pa.Table) -> pa.Table:
        dig = ["null:" + "0" * 27 if p is None else hashlib.md5(p).hexdigest()
               for p in t.column(bytes_col).to_pylist()]
        return pa.table({id_col: t.column(id_col),
                         "digest": pa.array(dig, pa.string())})

    return ds.map_batches(hash_batch, batch_format="pyarrow") \
        .groupby("digest") \
        .aggregate(Min(id_col, alias_name="keeper"),
                   Count(alias_name="n_copies"))


def media_feature_pipeline(docs: ray.data.Dataset, *,
                           concurrency=2,
                           batch_size: int = 64) -> ray.data.Dataset:
    """docs (with doc_id) → synth payloads → decode (actor pool) → features.
    Output: doc_id, media_ref, width, height, channels, decoded, features."""
    media = docs.map_batches(synth_media_batch, batch_format="pyarrow")
    decoded = media.map_batches(stateless(DecodeStub),
                                batch_format="pyarrow",
                                batch_size=batch_size,
                                **task_concurrency(concurrency))
    feats = decoded.map_batches(stateless(ByteHistogramFeatures),
                                batch_format="pyarrow",
                                batch_size=batch_size,
                                **task_concurrency(concurrency))
    return feats.drop_columns(["payload"])
