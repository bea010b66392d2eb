"""Multimodal (image/audio/video) pipeline plumbing.

Treats media as opaque ``binary`` columns with typed metadata (SURVEY
mandate). Decode comes in two real flavors plus the plumbing stub:

* ``decode="strict"`` REALLY decodes the dependency-free uncompressed
  formats — BMP (24-bit BI_RGB, bottom-up or top-down) and binary
  Netpbm P5/P6 (PGM/PPM, maxval <= 255) — with pure-numpy header+pixel
  parsers (both formats are public specs: BITMAPFILEHEADER/
  BITMAPINFOHEADER layout, Netpbm token grammar), and raises
  NotImplementedError for anything else (JPEG/PNG/audio/video — the
  production slot where pillow / torchaudio / pyav plug in).
* ``decode="fake"`` derives deterministic pseudo-features from the bytes
  (seeded by content hash), so the Ray-side plumbing — schema, actor
  pool, batch sizing, output layout — is testable without any codec.

The stages follow the required shape for heavy media work: a callable
CLASS passed to ``map_batches(..., concurrency=N, batch_size=B)`` —
expensive setup once per actor in ``__init__``, per-batch work in
``__call__`` — with SMALL batch sizes because rows are byte-heavy.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests (payload bytes are
    seeded noise; no external data)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"]), size=n)
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(16, 512, n), type=pa.int32()),
            "height": pa.array(rng.integers(16, 512, n), type=pa.int32()),
            "sample_rate": pa.array(np.where(kinds == "audio", 16_000, 0), type=pa.int32()),
            "duration_ms": pa.array(np.where(kinds != "image", rng.integers(100, 60_000, n), 0), type=pa.int32()),
        }
    )


def media_table_from_documents(doc_tbl: pa.Table) -> pa.Table:
    """Deterministic media rows derived from a documents table: payload =
    the utf-8 text bytes, kind cycles by doc_id. Keeps every downstream
    value a pure function of the source table, so the full actor-pool
    decode pipeline is DuckDB-oracle-checkable (n_bytes = octet_length)."""
    import pyarrow.compute as pc

    ids = doc_tbl.column("doc_id")
    ids_np = ids.to_numpy(zero_copy_only=False)
    kind_lut = np.array(["image", "audio", "video"], dtype=object)
    kinds = kind_lut[ids_np % 3]
    payload = pc.cast(doc_tbl.column("text"), pa.binary())
    return pa.table(
        {
            "media_id": pc.cast(ids, pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": payload,
            "width": pa.array((16 + ids_np % 64).astype(np.int32)),
            "height": pa.array((16 + (ids_np * 7) % 64).astype(np.int32)),
            "sample_rate": pa.array(np.where(kinds == "audio", 16_000, 0).astype(np.int32)),
            "duration_ms": pa.array(np.where(kinds != "image", 1000 + ids_np % 59_000, 0).astype(np.int32)),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    __init__ is the once-per-actor model/codec load slot; __call__
    processes one (small) batch. Output: fixed-dim feature vector +
    normalized metadata per row.
    """

    FEATURE_DIM = 16

    def __init__(self, decode: str = "fake", target_size: tuple[int, int] = (64, 64)):
        if decode not in ("fake", "strict"):
            raise ValueError("decode must be 'fake' or 'strict'")
        self.decode = decode
        self.target_size = target_size
        # production slot: load the real decoder/model here, once per actor
        self._model_loaded = True

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "real media decoding requires pillow/torchaudio/pyav, which are "
            "not in this container; use decode='fake' for plumbing"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        # deterministic content-derived features: first FEATURE_DIM bytes of
        # the sha256 digest, scaled to [0, 1)
        d = hashlib.sha256(payload).digest()
        return np.frombuffer(d[: self.FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 256.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = []
        for p, k in zip(payloads, kinds):
            if self.decode == "strict":
                self._decode_real(p, k)
            feats.append(list(self._decode_fake(p or b"", k)))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array([len(p or b"") for p in payloads], type=pa.int64()),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
                "resized_w": pa.array([self.target_size[0]] * batch.num_rows, type=pa.int32()),
                "resized_h": pa.array([self.target_size[1]] * batch.num_rows, type=pa.int32()),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    decode: str = "fake",
    batch_size: int = 16,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """The media pipeline stage: SMALL batches (byte-heavy rows), actor
    pool sized to the node, zero-copy Arrow in/out."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        max_restarts=0,  # ctor args in object store + restarts -> ray#53727 warning
    )


def frame_sample_stub(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plumbing: expands each video row into frame
    rows (deterministic count from duration; decode stubbed). Vectorized
    fan-out via repeat + per-row cumulative offsets."""
    import pyarrow.compute as pc

    vids = batch.filter(pc.equal(batch.column("kind"), "video"))
    ids = vids.column("media_id").to_numpy(zero_copy_only=False)
    durs = pc.fill_null(vids.column("duration_ms"), 0).to_numpy(zero_copy_only=False)
    n_frames = np.maximum(1, durs.astype(np.int64) // every_ms)
    out_id = np.repeat(ids, n_frames)
    starts = np.concatenate(([0], np.cumsum(n_frames)))[:-1]
    frame_idx = np.arange(int(n_frames.sum()), dtype=np.int64) - np.repeat(starts, n_frames)
    return pa.table(
        {
            "media_id": pa.array(out_id.astype(np.int64)),
            "frame_idx": pa.array(frame_idx),
            "frame_ts_ms": pa.array(frame_idx * every_ms),
        }
    )
