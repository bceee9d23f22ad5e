"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the engine's 100 TB training-data-pipeline charter):
- one row per item: ``(item_id, modality, data: binary, meta: struct)`` —
  the blob never leaves the executors; metadata is columnar and prunable;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` kernels, one batch of items per task;
- the codec step is pluggable: ``decode="fake"`` produces a deterministic
  array from the bytes (so the plumbing — schemas, batching, partitioning —
  is fully testable with no image libraries installed); ``decode="real"``
  decodes ``raw_u8`` payloads natively (buffer reinterpret, no dependency)
  and encoded formats (jpeg/png/...) via PIL, imported lazily at call time —
  on a cluster with Pillow present the same code is a real codec, in this
  container it raises NotImplementedError only for encoded payloads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "multimodal_schema",
    "make_items",
    "image_features_df",
    "resize_images_df",
    "tile_images_df",
    "sample_frames_df",
    "audio_features_df",
    "audio_energy_segments_df",
    "resample_audio_df",
    "fake_decode_image",
    "real_decode_image",
]


def multimodal_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("item_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("data", T.BinaryType(), False),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("width", T.IntegerType(), True),
                        T.StructField("height", T.IntegerType(), True),
                        T.StructField("channels", T.IntegerType(), True),
                        T.StructField("sample_rate", T.IntegerType(), True),
                        T.StructField("n_frames", T.IntegerType(), True),
                        T.StructField("format", T.StringType(), True),
                    ]
                ),
                False,
            ),
        ]
    )


def make_items(spark: SparkSession, items: list[dict]) -> DataFrame:
    rows = [
        (
            int(it["item_id"]),
            it["modality"],
            it["data"],
            (
                it.get("width"),
                it.get("height"),
                it.get("channels"),
                it.get("sample_rate"),
                it.get("n_frames"),
                it.get("format"),
            ),
        )
        for it in items
    ]
    return spark.createDataFrame(rows, schema=multimodal_schema())


def fake_decode_image(data: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: bytes -> (H, W, C) uint8.

    STUB — a real deployment replaces this with PIL/turbojpeg.  The output is
    pure md5 arithmetic on the payload bytes: pixel block ``b`` is the 16-byte
    digest of ``f"{md5(data)}-{b}"``.  That makes it reproducible not just
    across processes but across ENGINES — DuckDB recomputes the identical
    pixels with ``md5() + substr()``, which is what upgrades the multimodal
    driver gate from rows-only to a value-hash match.
    """
    import hashlib

    seed = hashlib.md5(data).hexdigest()
    n = height * width * channels
    buf = b"".join(
        hashlib.md5(f"{seed}-{b}".encode()).digest() for b in range((n + 15) // 16)
    )
    return np.frombuffer(buf[:n], dtype=np.uint8).reshape(height, width, channels).copy()


def real_decode_image(data: bytes, meta) -> np.ndarray:
    """Actual codec: bytes -> (H, W, C) uint8.

    ``raw_u8`` payloads (e.g. ``resize_images_df`` output) are a plain buffer
    reinterpret — no dependency.  Encoded formats go through PIL, imported
    lazily so environments without Pillow still run every other path.
    """
    fmt = (meta["format"] or "").lower()
    if fmt == "raw_u8":
        h, w, c = meta["height"], meta["width"], meta["channels"]
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, c)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised only sans Pillow
        raise NotImplementedError(
            f"decoding {fmt or 'encoded'} images requires Pillow; "
            "install it or use decode='fake' for plumbing tests"
        ) from e
    import io

    img = Image.open(io.BytesIO(data))
    if meta["channels"] == 1:
        img = img.convert("L")
        return np.asarray(img, dtype=np.uint8)[..., None]
    img = img.convert("RGB" if meta["channels"] == 3 else "RGBA")
    return np.asarray(img, dtype=np.uint8)


def _decode(data, meta, decode: str) -> np.ndarray:
    if decode == "real":
        return real_decode_image(data, meta)
    return fake_decode_image(data, meta["width"], meta["height"], meta["channels"])


# Batch iteration is zip over the column Series, never pdf.iterrows():
# iterrows materializes a pandas Series PER ROW (dtype unification + index
# plumbing) — pandas' slowest iteration idiom, pure overhead inside an
# Arrow kernel whose real work is per-item numpy.


def image_features_df(items: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-image channel statistics: ``(item_id, mean..., std..., p_low)``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "mean_c0": [], "std_c0": [], "frac_dark": []}
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                img = _decode(data, meta, decode).astype(np.float64)
                out["item_id"].append(iid)
                out["mean_c0"].append(float(img[..., 0].mean()))
                out["std_c0"].append(float(img[..., 0].std()))
                out["frac_dark"].append(float((img.mean(axis=-1) < 32).mean()))
            yield pd.DataFrame(out)

    return items.filter(items.modality == "image").mapInPandas(
        run, schema="item_id long, mean_c0 double, std_c0 double, frac_dark double"
    )


def resize_images_df(items: DataFrame, out_w: int, out_h: int, decode: str = "fake") -> DataFrame:
    """Nearest-neighbor resize; re-emits the multimodal schema with raw
    (H, W, C) uint8 payloads and updated metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"item_id": [], "modality": [], "data": [], "meta": []}
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                img = _decode(data, meta, decode)
                ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
                res = img[ys][:, xs]
                rows["item_id"].append(iid)
                rows["modality"].append("image")
                rows["data"].append(np.ascontiguousarray(res).tobytes())
                rows["meta"].append(
                    {
                        "width": out_w,
                        "height": out_h,
                        "channels": int(img.shape[2]),
                        "sample_rate": None,
                        "n_frames": None,
                        "format": "raw_u8",
                    }
                )
            yield pd.DataFrame(rows)

    return items.filter(items.modality == "image").mapInPandas(run, schema=multimodal_schema())


def tile_images_df(
    items: DataFrame, tile_w: int, tile_h: int, decode: str = "fake"
) -> DataFrame:
    """Cut each image into the non-overlapping ``tile_h x tile_w`` grid —
    the ViT-style patching step of a multimodal training pipeline.  One
    row per FULL tile (partial edge tiles are dropped — the patching
    contract; resize first if every pixel must be covered):
    ``(item_id, tile_row, tile_col, data, meta)`` with ``data`` the raw
    (tile_h, tile_w, C) uint8 payload and meta updated to tile
    dimensions.

    Row-local Arrow kernel over the decoded array (a pure numpy slice
    per tile) — no shuffle, streaming-legal, embarrassingly parallel
    over images at 100 TB."""
    tile_w, tile_h = int(tile_w), int(tile_h)
    if tile_w <= 0 or tile_h <= 0:
        raise ValueError(f"tile dims must be positive, got {tile_w}x{tile_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "item_id": [], "tile_row": [], "tile_col": [],
                "data": [], "meta": [],
            }
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                img = _decode(data, meta, decode)
                n_r = img.shape[0] // tile_h
                n_c = img.shape[1] // tile_w
                for r in range(n_r):
                    for c in range(n_c):
                        tile = img[
                            r * tile_h : (r + 1) * tile_h,
                            c * tile_w : (c + 1) * tile_w,
                        ]
                        rows["item_id"].append(iid)
                        rows["tile_row"].append(r)
                        rows["tile_col"].append(c)
                        rows["data"].append(np.ascontiguousarray(tile).tobytes())
                        rows["meta"].append(
                            {
                                "width": tile_w,
                                "height": tile_h,
                                "channels": int(img.shape[2]),
                                "sample_rate": None,
                                "n_frames": None,
                                "format": "raw_u8",
                            }
                        )
            if rows["item_id"]:
                # an all-empty batch (every image smaller than one tile)
                # must yield NOTHING: an empty pandas column types as
                # float64 and Arrow refuses to cast it to the meta struct
                yield pd.DataFrame(rows)

    meta_t = "struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int,format:string>"
    return items.filter(items.modality == "image").mapInPandas(
        run,
        schema=(
            f"item_id long, tile_row int, tile_col int, data binary, meta {meta_t}"
        ),
    )


def audio_features_df(items: DataFrame) -> DataFrame:
    """Per-clip audio features for PCM16 payloads — a REAL codec path with no
    dependency (int16 buffer reinterpret): duration, RMS level, peak, and
    zero-crossing rate.  ``(item_id, duration_s, rms, peak, zcr)``.

    Non-PCM formats (mp3/ogg) would slot in behind a lazy import exactly like
    ``real_decode_image`` does for encoded images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "duration_s": [], "rms": [], "peak": [], "zcr": []}
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                fmt = (meta["format"] or "").lower()
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio format {fmt or 'unknown'}: only pcm16 decodes natively"
                    )
                sr = int(meta["sample_rate"])
                x = np.frombuffer(data, dtype=np.int16).astype(np.float64) / 32768.0
                out["item_id"].append(iid)
                out["duration_s"].append(len(x) / sr)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
                out["zcr"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                )
            yield pd.DataFrame(out)

    return items.filter(items.modality == "audio").mapInPandas(
        run, schema="item_id long, duration_s double, rms double, peak double, zcr double"
    )


def sample_frames_df(items: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video items: treats the payload as a sequence of
    ``n_frames`` equal-size chunks and keeps every ``every_n``-th.
    ``(item_id, frame_index, frame_data)``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "frame_index": [], "frame_data": []}
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                n = meta["n_frames"] or 0
                if not n:
                    continue
                fsize = len(data) // n
                for k in range(0, n, every_n):
                    out["item_id"].append(iid)
                    out["frame_index"].append(k)
                    out["frame_data"].append(data[k * fsize : (k + 1) * fsize])
            yield pd.DataFrame(out)

    return items.filter(items.modality == "video").mapInPandas(
        run, schema="item_id long, frame_index int, frame_data binary"
    )


def audio_energy_segments_df(
    items: DataFrame,
    frame_len: int = 400,
    threshold: int = 1,
    min_frames: int = 1,
) -> DataFrame:
    """Energy-threshold segmentation of PCM16 clips (the voice-activity /
    silence-trim shape of a speech-data pipeline): samples split into
    non-overlapping ``frame_len``-sample frames (last partial frame
    kept), per-frame energy = the INTEGER sum of squared samples, frames
    with ``energy >= threshold`` are active, and maximal runs of >=
    ``min_frames`` consecutive active frames become segments.  One row
    per segment: ``(item_id, seg, start_frame, end_frame, n_frames,
    energy)`` — ``seg`` is the 0-based index among EMITTED segments,
    ``end_frame`` inclusive, ``energy`` the segment total.

    Everything is exact int64 arithmetic (a squared int16 is < 2^31, so
    even billion-sample clips sum far inside 63 bits) — which is what
    lets a segmentation gate hash-match a relational oracle bit-for-bit.

    Plan shape at 100 TB: a clip's samples live in one Arrow row, so
    frame energies, thresholding, and the island scan are all ROW-LOCAL
    numpy — embarrassingly parallel over clips, no shuffle, no window,
    streaming-legal (ingestion-time VAD on a crawl of audio).  Contrast
    with the relational formulation (explode samples → frame groupBy →
    gaps-and-islands window), which shuffles every SAMPLE twice; that
    form exists as the independent oracle, not the operator."""
    frame_len = int(frame_len)
    if frame_len <= 0:
        raise ValueError(f"frame_len must be positive, got {frame_len}")
    min_frames = int(min_frames)
    if min_frames <= 0:
        raise ValueError(f"min_frames must be positive, got {min_frames}")
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "item_id": [], "seg": [], "start_frame": [],
                "end_frame": [], "n_frames": [], "energy": [],
            }
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                fmt = (meta["format"] or "").lower()
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio format {fmt or 'unknown'}: only pcm16 decodes natively"
                    )
                x = np.frombuffer(data, dtype="<i2").astype(np.int64)
                if not len(x):
                    continue
                sq = x * x
                # reduceat over the frame boundaries: vectorized segment
                # sums (np.add.at is an unbuffered per-element scatter,
                # ~10x slower on long clips)
                energy = np.add.reduceat(sq, np.arange(0, len(x), frame_len))
                act = energy >= thr
                if not act.any():
                    continue
                starts = np.flatnonzero(
                    act & ~np.concatenate(([False], act[:-1]))
                )
                ends = np.flatnonzero(act & ~np.concatenate((act[1:], [False])))
                csum = np.concatenate(([0], np.cumsum(energy)))
                seg = 0
                for s, e in zip(starts, ends):
                    if e - s + 1 < min_frames:
                        continue
                    out["item_id"].append(iid)
                    out["seg"].append(seg)
                    out["start_frame"].append(int(s))
                    out["end_frame"].append(int(e))
                    out["n_frames"].append(int(e - s + 1))
                    out["energy"].append(int(csum[e + 1] - csum[s]))
                    seg += 1
            yield pd.DataFrame(out)

    return items.filter(items.modality == "audio").mapInPandas(
        run,
        schema=(
            "item_id long, seg int, start_frame int, end_frame int,"
            " n_frames int, energy long"
        ),
    )


def resample_audio_df(items: DataFrame, target_rate: int) -> DataFrame:
    """Linear-interpolation resampling of PCM16 clips to ``target_rate``:
    ``(item_id, sr_in, sr_out, n_in, n_out, data, samples_hash)`` with
    ``data`` the little-endian int16 buffer at the new rate and
    ``samples_hash`` an md5 content fingerprint of the resampled samples
    (micro-snapped, the clip-dedup key — two clips that resample to the
    same waveform hash identically).

    Math contract (what the ``mm_resample`` gate pins cross-engine):
    output sample ``j`` sits at source position ``p = j*sr/target``,
    split EXACTLY as integers — ``idx = (j*sr) DIV target``,
    ``frac = ((j*sr) MOD target) / target`` — then
    ``val = s[idx] + (s[idx+1] - s[idx]) * frac`` (one correctly-rounded
    multiply over integer samples, identical in any IEEE engine; a
    floating ``j*sr/target`` position would round differently from the
    oracle's integer split).  ``n_out = (n_in-1)*target DIV sr + 1`` —
    the last output lands on or before the last input sample, so no
    extrapolation.  This is ``operators.interp1d``'s gather+lerp shape
    run ROW-LOCALLY per clip: the samples of one clip live in one Arrow
    row, so resampling is embarrassingly parallel over clips with no
    joins at all.

    Arrow-batched numpy kernel (vectorized gathers); non-pcm16 formats
    raise like every audio path here.  Clips shorter than 2 samples pass
    through unchanged (nothing to interpolate between).
    """
    import hashlib

    sr_out = int(target_rate)
    if sr_out <= 0:
        raise ValueError(f"target_rate must be positive, got {target_rate}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "item_id": [], "sr_in": [], "sr_out": [], "n_in": [],
                "n_out": [], "data": [], "samples_hash": [],
            }
            for iid, data, meta in zip(pdf["item_id"], pdf["data"], pdf["meta"]):
                fmt = (meta["format"] or "").lower()
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio format {fmt or 'unknown'}: only pcm16 decodes natively"
                    )
                sr = int(meta["sample_rate"])
                x = np.frombuffer(data, dtype="<i2").astype(np.float64)
                n = len(x)
                if n < 2:
                    vals = x
                else:
                    m = (n - 1) * sr_out // sr + 1
                    pn = np.arange(m, dtype=np.int64) * sr
                    idx = pn // sr_out
                    frac = (pn % sr_out).astype(np.float64) / float(sr_out)
                    xp = np.append(x, x[-1])  # idx+1 gather pad (frac=0 there)
                    vals = x[idx] + (xp[idx + 1] - x[idx]) * frac
                micro = np.round(vals * 1_000_000).astype(np.int64)
                out["item_id"].append(iid)
                out["sr_in"].append(sr)
                out["sr_out"].append(sr_out)
                out["n_in"].append(n)
                out["n_out"].append(len(vals))
                out["data"].append(
                    np.clip(np.round(vals), -32768, 32767)
                    .astype("<i2")
                    .tobytes()
                )
                out["samples_hash"].append(
                    hashlib.md5(
                        ",".join(str(int(v)) for v in micro).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return items.filter(items.modality == "audio").mapInPandas(
        run,
        schema=(
            "item_id long, sr_in int, sr_out int, n_in long, n_out long,"
            " data binary, samples_hash string"
        ),
    )
