"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed struct metadata, processed in Arrow-batched Pandas stages.

The container has no image/audio libraries, so the *decode* step is
stubbed (clearly-marked NotImplementedError + a deterministic fake);
the Spark-side plumbing — schema, partitioning, mapInPandas batch shape
— is real and tested.  On a real cluster you swap ``fake_decode_image``
for a PIL/ffmpeg call and nothing else changes.

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


def binarize(df: DataFrame, col: str, out: str = "payload") -> DataFrame:
    """Attach a binary payload column (here: utf-8 bytes of a string
    column — in production, the raw media file bytes)."""
    return df.withColumn(out, F.encode(F.col(col), "UTF-8"))


def decode_image(payload: bytes) -> dict:
    """Real image decode — requires an imaging library not present in
    this container.  STUB: see fake_decode_image for the deterministic
    stand-in used by tests."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this container); "
            "use fake_decode_image for deterministic testing"
        ) from e
    raise NotImplementedError("wire PIL decode here on a real cluster")


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decode: derives 'dimensions' from the bytes.
    Keeps every downstream schema/partitioning path honest."""
    n = len(payload)
    return {
        "width": (n % 64) + 1,
        "height": (n // 64) + 1,
        "mode": "L" if n % 2 else "RGB",
    }


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
