"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed struct metadata, processed in Arrow-batched Pandas stages.

The *decode* step is capability-gated (the io.py:avro_available
pattern): when PIL/pillow is importable, ``decode_image`` really
decodes and ``decode_images`` uses it; otherwise the deterministic
``fake_decode_image`` keeps every schema/partitioning/batch-shape path
tested, and asking for the real path explicitly raises a clearly-marked
NotImplementedError.  A cluster that carries pillow gets real decode
with no code change.

Schema convention:
    payload  binary          the raw media bytes
    meta     struct<...>     typed metadata (byte_len, mime, ...)
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: chunk size for the frame-sampling stub (stands in for video frames)
CHUNK = 64

_IMAGING_AVAILABLE: bool | None = None


def imaging_available() -> bool:
    """True when PIL/pillow is importable (driver-side probe; executors
    on the same image share the answer — same gating idea as
    sources/io.py:avro_available for the avro jar)."""
    global _IMAGING_AVAILABLE
    if _IMAGING_AVAILABLE is None:
        try:
            import PIL.Image  # noqa: F401

            _IMAGING_AVAILABLE = True
        except ImportError:
            _IMAGING_AVAILABLE = False
    return _IMAGING_AVAILABLE


def binarize(df: DataFrame, col: str, out: str = "payload") -> DataFrame:
    """Attach a binary payload column (here: utf-8 bytes of a string
    column — in production, the raw media file bytes)."""
    return df.withColumn(out, F.encode(F.col(col), "UTF-8"))


def decode_image(payload: bytes) -> dict:
    """Image decode → {width, height, mode}.  REAL when pillow is
    present (PIL.Image.open over an in-memory buffer); otherwise raises
    NotImplementedError — use fake_decode_image (or decode_images,
    which falls back automatically) for deterministic testing."""
    if not imaging_available():
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this container); "
            "use fake_decode_image for deterministic testing"
        )
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "mode": im.mode}


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decode: derives 'dimensions' from the bytes.
    Keeps every downstream schema/partitioning path honest."""
    n = len(payload)
    return {
        "width": (n % 64) + 1,
        "height": (n // 64) + 1,
        "mode": "L" if n % 2 else "RGB",
    }


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use: str = "auto",
) -> DataFrame:
    """Decode a binary image column to (id, width, height, mode) via an
    Arrow-batched narrow map (mapInPandas — no shuffle, scales with the
    scan).  ``use``: 'auto' picks the real PIL decode when the imaging
    probe passes and the deterministic fake otherwise; 'real'/'fake'
    force a path ('real' without pillow raises at plan build, not
    mid-job on an executor)."""
    if use not in ("auto", "real", "fake"):
        raise ValueError(f"use must be auto|real|fake, got {use!r}")
    if use == "real" and not imaging_available():
        decode_image(b"")  # raises the canonical NotImplementedError
    real = use == "real" or (use == "auto" and imaging_available())
    schema = f"{id_col} long, width int, height int, mode string"

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        # the driver's probe decides the path for the whole job; a
        # worker missing pillow raises the canonical error rather than
        # silently mixing fake values into real output
        fn = decode_image if real else fake_decode_image
        for pdf in batches:
            metas = [fn(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "mode": pd.Series([m["mode"] for m in metas], dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def extract_meta(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over mapInPandas: byte length,
    first byte, chunk count.  One narrow map — no shuffle; scales with
    the scan."""
    schema = f"{id_col} long, byte_len long, first_byte int, n_chunks long"

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pl = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": pl.map(len).astype("int64"),
                    "first_byte": pl.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "n_chunks": pl.map(lambda b: (len(b) + CHUNK - 1) // CHUNK).astype(
                        "int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", stride: int = 2) -> DataFrame:
    """Frame-sampling stub: split the payload into CHUNK-byte 'frames',
    keep every ``stride``-th one.  Output (id, frame_idx, frame binary)
    — the row-multiplying shape a video pipeline produces, with the
    decode left to a real codec on a real cluster."""
    schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for j in range(0, (len(b) + CHUNK - 1) // CHUNK, stride):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(bytes(b[j * CHUNK : (j + 1) * CHUNK]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
