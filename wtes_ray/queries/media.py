from ._common import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .ann import *  # noqa: F401,F403
from .extraction import *  # noqa: F401,F403



def media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: synthetic payloads → cached-state decode →
    features. SQL-checkable: the synthetic header fields derive from
    md5 (ops.multimodal._md5_u64 ≡ DuckDB md5_number_lower), so the
    decode stage's structural output — per-doc width/height, ref naming,
    decode success — has a value-hash oracle; only the pixel bodies (and
    the histogram features computed from them) stay non-SQL."""
    from ..ops.multimodal import media_feature_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = media_feature_pipeline(ds, concurrency=(1, 4))
    df = out.select_columns(["doc_id", "media_ref", "width", "height",
                             "channels", "decoded"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



MEDIA_FEATURES_SQL = """
SELECT doc_id,
       'img://' || doc_id || '.fake' AS media_ref,
       CAST(16 + md5_number_lower('42:img:' || doc_id) % 48 AS INTEGER)
         AS width,
       CAST(16 + (md5_number_lower('42:img:' || doc_id) // 48) % 48
            AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       TRUE AS decoded
FROM documents ORDER BY doc_id
"""



def media_video_frames(sf_dir: str) -> pd.DataFrame:
    """Multimodal frame pipeline: synthetic video → frame-sample → resize →
    decode. One row per sampled frame; all frames resized to 8×8 and
    decodable. SQL-checkable: the md5-derived frame counts make the
    sampler's structural output (which frames exist per doc, their refs
    and post-resize metadata) reproducible as a range() unnest."""
    from ..ops.multimodal import video_frame_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = video_frame_pipeline(ds, stride=4, target=8, concurrency=(1, 4))
    df = out.to_pandas()
    return df.sort_values(["doc_id", "frame_index"]).reset_index(drop=True)



MEDIA_VIDEO_FRAMES_SQL = """
WITH v AS (
  SELECT doc_id,
         CAST(4 + md5_number_lower('42:vid:' || doc_id) % 13 AS BIGINT)
           AS n_frames
  FROM documents)
SELECT doc_id,
       'vid://' || doc_id || '.fake#f' || i AS media_ref,
       CAST(i AS INTEGER) AS frame_index,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       TRUE AS decoded,
       TRUE AS resized
FROM v, UNNEST(range(0, n_frames, 4)) AS t(i)
ORDER BY doc_id, frame_index
"""



def media_audio_features(sf_dir: str) -> pd.DataFrame:
    """Audio modality plumbing: synthetic PCM payloads → actor-pool
    features (rows-only: RMS/ZCR depend on the seeded PCM bodies; the
    STRUCTURAL headers are pinned by ``media_audio_headers``)."""
    from ..ops.multimodal import audio_feature_pipeline
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    out = audio_feature_pipeline(ds, concurrency=(1, 4))
    df = out.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)



def media_audio_headers(sf_dir: str) -> pd.DataFrame:
    """Audio synth→parse structural round-trip: sample rate and count
    recovered from the packed payload headers. SQL-checkable because the
    header fields are md5-derived (the image/video convention); duration
    floats stay in the rows-only query (n/16000 rounds differently
    across engines at the 7th decimal — ints don't)."""
    from ..ops.multimodal import _unpack_audio_header, synth_audio_batch
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])

    def headers(t: pa.Table) -> pa.Table:
        srs, ns = zip(*(_unpack_audio_header(p)
                        for p in t.column("payload").to_pylist()))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sr": pa.array(srs, pa.int64()),
            "n_samples": pa.array(ns, pa.int64())})

    out = ds.map_batches(synth_audio_batch, batch_format="pyarrow") \
            .map_batches(headers, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



MEDIA_AUDIO_HEADERS_SQL = """
SELECT doc_id,
       CAST(16000 AS BIGINT) AS sr,
       CAST(4000 + md5_number_lower('42:aud:' || doc_id) % 12000
            AS BIGINT) AS n_samples
FROM documents ORDER BY doc_id
"""



def media_binary_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup of binary media payloads (ops/multimodal.
    binary_exact_dedup): payloads are planted so doc_id % 50 share bytes;
    each block digests locally and only (digest, id) pairs shuffle. The
    planted payload is the UTF-8 bytes of a derivable string, so DuckDB's
    md5() over the same varchar is a full-value oracle for the digest,
    keeper and copy count."""
    from ..ops.multimodal import binary_exact_dedup
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [f"payload:{int(d) % 50}".encode() for d in ids]
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(payloads, pa.binary())})

    out = binary_exact_dedup(ds.map_batches(plant, batch_format="pyarrow"))
    df = out.to_pandas()
    df["keeper"] = df["keeper"].astype("int64")
    df["n_copies"] = df["n_copies"].astype("int64")
    return df.sort_values("digest").reset_index(drop=True)



MEDIA_BINARY_DEDUP_SQL = """
SELECT md5('payload:' || (doc_id % 50)) AS digest,
       MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1 ORDER BY digest
"""


__all__ = [_n for _n in globals() if not _n.startswith("__")]  # star-export incl. _helpers
