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

from pigout_spark.plans.partitioning import fan_out

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


def encode_ppm(
    width: int,
    height: int,
    pixels: bytes,
    maxval: int = 255,
    gray: bool = False,
) -> bytes:
    """Binary-PPM (P6) / PGM (P5) encoder — the netpbm format is simple
    enough to implement from its public spec in a few lines, which is
    exactly why it is this engine's dependency-free REAL image format
    (r9 verdict #7: make image decode hash-checkable without pillow).
    ``pixels`` is the raster: width·height·(1|3) samples, row-major,
    RGB interleaved for P6 (maxval ≤ 255 → 1 byte/sample, else 2-byte
    big-endian per the spec)."""
    ch = 1 if gray else 3
    bps = 1 if maxval <= 255 else 2
    want = width * height * ch * bps
    if len(pixels) != want:
        raise ValueError(
            f"encode_ppm: raster is {len(pixels)} bytes, expected {want} "
            f"({width}x{height}, {ch} channel(s), {bps} byte(s)/sample)"
        )
    magic = b"P5" if gray else b"P6"
    return magic + f"\n{width} {height}\n{maxval}\n".encode("ascii") + pixels


def decode_ppm(payload: bytes) -> dict:
    """Pure-Python binary-PPM/PGM decode → header fields plus exact
    per-channel integer sums (the hash-stable raster statistic):

        {width, height, maxval, mode ('RGB'|'L'), n_px,
         ch_sums [r, g, b] or [gray]}

    Header per the netpbm spec: magic P5/P6, then whitespace-separated
    width/height/maxval with ``#`` comments allowed anywhere in the
    header, then EXACTLY ONE whitespace byte before the raster.
    Samples are 1 byte (maxval ≤ 255) or 2-byte big-endian.  Truncated
    or malformed payloads raise ValueError naming the defect — a
    corrupt crawl byte-range must fail loudly, not read garbage
    stats."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("decode_ppm: not a binary PPM/PGM (magic != P5/P6)")
    gray = payload[1:2] == b"5"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("decode_ppm: malformed header (expected digits)")
        fields.append(int(payload[start:pos]))
    # The spec mandates EXACTLY ONE whitespace byte between maxval and
    # the raster; a header missing it would shift the raster read by a
    # byte and return wrong channel sums silently (ADVICE r10) —
    # fail loudly per the documented contract instead.
    if not payload[pos : pos + 1].isspace():
        raise ValueError(
            "decode_ppm: malformed header (missing whitespace separator "
            "after maxval)"
        )
    pos += 1  # the single post-maxval whitespace byte
    width, height, maxval = fields
    if not (0 < maxval < 65536):
        raise ValueError(f"decode_ppm: maxval {maxval} out of (0, 65536)")
    ch = 1 if gray else 3
    bps = 1 if maxval <= 255 else 2
    want = width * height * ch * bps
    raster = payload[pos : pos + want]
    if len(raster) != want:
        raise ValueError(
            f"decode_ppm: truncated raster ({len(raster)} of {want} bytes)"
        )
    sums = [0] * ch
    if bps == 1:
        for i, b in enumerate(raster):
            sums[i % ch] += b
    else:
        for i in range(0, want, 2):
            sums[(i // 2) % ch] += (raster[i] << 8) | raster[i + 1]
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "mode": "L" if gray else "RGB",
        "n_px": width * height,
        "ch_sums": sums,
    }


def decode_image(payload: bytes) -> dict:
    """Image decode → {width, height, mode}.  Binary PPM/PGM payloads
    decode for REAL in pure Python (decode_ppm — no dependency); other
    formats decode via PIL when pillow is present, and otherwise raise
    NotImplementedError — use fake_decode_image (or decode_images,
    which falls back automatically) for deterministic testing."""
    if payload[:2] in (b"P5", b"P6"):
        m = decode_ppm(payload)
        return {"width": m["width"], "height": m["height"], "mode": m["mode"]}
    if not imaging_available():
        raise NotImplementedError(
            "non-PPM image decode requires PIL/pillow (not in this "
            "container); use PPM payloads or fake_decode_image for "
            "deterministic testing"
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


def decode_ppm_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image decode without pillow: an Arrow-batched narrow map
    (mapInPandas — no shuffle, scales with the scan) running
    :func:`decode_ppm` per payload.  Output carries the header plus
    EXACT integer channel sums — means/ratios belong downstream in
    JVM expressions (``F.round(sum/n_px, 6)``) so the rounding
    discipline matches the oracle engine's, not Python's
    banker's-rounding.

    Schema: (id, width, height, maxval, mode, n_px,
    sum_r, sum_g, sum_b) — for P5 grayscale the single channel reads
    as sum_r and sum_g/sum_b are NULL."""
    schema = (
        f"{id_col} long, width int, height int, maxval int, mode string, "
        "n_px long, sum_r long, sum_g long, sum_b long"
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_ppm(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series(
                        [m["width"] for m in metas], dtype="int32"
                    ),
                    "height": pd.Series(
                        [m["height"] for m in metas], dtype="int32"
                    ),
                    "maxval": pd.Series(
                        [m["maxval"] for m in metas], dtype="int32"
                    ),
                    "mode": pd.Series([m["mode"] for m in metas], dtype=object),
                    "n_px": pd.Series([m["n_px"] for m in metas], dtype="int64"),
                    "sum_r": pd.Series(
                        [m["ch_sums"][0] for m in metas], dtype="int64"
                    ),
                    "sum_g": pd.Series(
                        [
                            m["ch_sums"][1] if len(m["ch_sums"]) > 1 else None
                            for m in metas
                        ],
                        dtype="Int64",
                    ),
                    "sum_b": pd.Series(
                        [
                            m["ch_sums"][2] if len(m["ch_sums"]) > 2 else None
                            for m in metas
                        ],
                        dtype="Int64",
                    ),
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


def encode_wav(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    frames: bytes,
) -> bytes:
    """Canonical PCM WAV (RIFF/WAVE) encoder — like :func:`encode_ppm`,
    the format is simple enough to implement from its public spec
    (Microsoft/IBM RIFF, 1991; the 44-byte canonical PCM header) in a
    few lines, making it this engine's dependency-free REAL audio
    format (r13 verdict #8: the audio analog of the PPM codec).
    ``frames`` is the raw sample data: n_frames · channels samples,
    frame-interleaved, 8-bit unsigned or 16-bit signed little-endian
    per the spec."""
    if bits_per_sample not in (8, 16):
        raise ValueError(
            f"encode_wav: bits_per_sample must be 8 or 16 (PCM), got "
            f"{bits_per_sample}"
        )
    if channels < 1:
        raise ValueError(f"encode_wav: channels must be >= 1, got {channels}")
    block_align = channels * (bits_per_sample // 8)
    if len(frames) % block_align:
        raise ValueError(
            f"encode_wav: frame data ({len(frames)} bytes) is not a "
            f"multiple of block_align={block_align}"
        )
    byte_rate = sample_rate * block_align

    def le(n: int, width: int) -> bytes:
        return int(n).to_bytes(width, "little")

    fmt = (
        b"fmt " + le(16, 4) + le(1, 2) + le(channels, 2)
        + le(sample_rate, 4) + le(byte_rate, 4)
        + le(block_align, 2) + le(bits_per_sample, 2)
    )
    data = b"data" + le(len(frames), 4) + frames
    body = b"WAVE" + fmt + data
    return b"RIFF" + le(len(body), 4) + body


def decode_wav(payload: bytes) -> dict:
    """Pure-Python PCM WAV (RIFF/WAVE) decode → header fields plus
    exact per-channel integer sample sums (the hash-stable audio
    statistic, mirroring decode_ppm's ch_sums):

        {sample_rate, channels, bits_per_sample, n_frames,
         duration_us, ch_sums [ch0, ch1, ...]}

    ``duration_us`` is exact integer micro-units (n_frames · 10⁶ //
    sample_rate — the vocab_kl no-float discipline).  The chunk walk
    follows the RIFF spec: 4-byte id + LE32 size, chunks word-aligned
    (odd sizes padded), unknown chunks (LIST, fact, ...) skipped.
    Only format code 1 (integer PCM) at 8/16 bits is supported —
    compressed/float formats raise NotImplementedError naming the
    format, and truncated or malformed payloads raise ValueError
    naming the defect (a corrupt crawl byte-range must fail loudly,
    not read garbage stats)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("decode_wav: not a RIFF container (magic != RIFF)")
    if payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: RIFF form type is not WAVE")
    riff_size = int.from_bytes(payload[4:8], "little")
    if 8 + riff_size > len(payload):
        raise ValueError(
            f"decode_wav: truncated container (header claims "
            f"{8 + riff_size} bytes, payload has {len(payload)})"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(
                f"decode_wav: truncated {cid!r} chunk "
                f"({len(body)} of {csize} bytes)"
            )
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("decode_wav: fmt chunk shorter than 16 bytes")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "block_align": int.from_bytes(body[12:14], "little"),
                "bits_per_sample": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # word alignment per the spec
    if fmt is None:
        raise ValueError("decode_wav: missing fmt chunk")
    if data is None:
        raise ValueError("decode_wav: missing data chunk")
    if fmt["audio_format"] != 1:
        raise NotImplementedError(
            f"decode_wav: only integer PCM (format 1) is supported, got "
            f"format {fmt['audio_format']} — decode compressed/float "
            "audio with a real codec on a real cluster"
        )
    bits, ch = fmt["bits_per_sample"], fmt["channels"]
    if bits not in (8, 16):
        raise NotImplementedError(
            f"decode_wav: only 8/16-bit PCM is supported, got {bits}"
        )
    if ch < 1:
        raise ValueError("decode_wav: channels must be >= 1")
    want_align = ch * (bits // 8)
    if fmt["block_align"] != want_align:
        raise ValueError(
            f"decode_wav: block_align {fmt['block_align']} does not match "
            f"channels x bytes/sample = {want_align}"
        )
    if len(data) % want_align:
        raise ValueError(
            f"decode_wav: data chunk ({len(data)} bytes) is not a "
            f"multiple of block_align={want_align}"
        )
    n_frames = len(data) // want_align
    sums = [0] * ch
    if bits == 8:  # unsigned per the spec
        for i, b in enumerate(data):
            sums[i % ch] += b
    else:  # 16-bit signed little-endian
        for i in range(0, len(data), 2):
            v = int.from_bytes(data[i : i + 2], "little", signed=True)
            sums[(i // 2) % ch] += v
    sr = fmt["sample_rate"]
    if sr <= 0:
        raise ValueError(f"decode_wav: sample_rate {sr} must be positive")
    return {
        "sample_rate": sr,
        "channels": ch,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // sr,
        "ch_sums": sums,
    }


def synth_wav(key: int) -> bytes:
    """Deterministic PCM WAV fixture from an integer key — the audio
    analog of binarize()'s text payloads: every field and sample is
    pure integer arithmetic on ``key``, so a SQL oracle can replay the
    header fields AND the exact channel sums without parsing a byte.

    Law (mirrored in the x_wav_meta oracle):
        sample_rate     = 8000 + (key % 5) · 2000
        channels        = 1 + (key % 2)
        bits            = 8 when key % 3 == 0 else 16
        n_frames        = 50 + (key % 100)
        8-bit sample    = (key·7 + i·13 + c·31) % 256        (unsigned)
        16-bit sample   = (key·7 + i·13 + c·31) % 201 − 100  (signed)
    """
    key = int(key)
    sr = 8000 + (key % 5) * 2000
    ch = 1 + (key % 2)
    bits = 8 if key % 3 == 0 else 16
    nf = 50 + (key % 100)
    if bits == 8:
        frames = bytes(
            (key * 7 + i * 13 + c * 31) % 256
            for i in range(nf)
            for c in range(ch)
        )
    else:
        buf = bytearray()
        for i in range(nf):
            for c in range(ch):
                v = (key * 7 + i * 13 + c * 31) % 201 - 100
                buf += int(v).to_bytes(2, "little", signed=True)
        frames = bytes(buf)
    return encode_wav(sr, ch, bits, frames)


def synth_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Attach a deterministic WAV payload column derived from the id
    (:func:`synth_wav`) — an Arrow-batched narrow map (mapInPandas, no
    shuffle; the binarize() pattern for audio)."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{cols}, {out} binary"
    # r14 optimization (guide §2.6/§4): the id relation of a synthetic
    # payload column is tiny on disk, so the scan is 1-2 tasks and the
    # per-row Python encoder ran single-threaded while 31 cores idled.
    # The GUARDED fan_out spreads the rows first (no-op at production
    # scan widths); payloads are a pure per-row function of the id, so
    # the result is partition-layout-independent.
    df = fan_out(df)

    def run(batches: Iterable) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [synth_wav(int(k)) for k in pdf[id_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def decode_wav_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL audio metadata extraction without an audio library: an
    Arrow-batched narrow map (mapInPandas — no shuffle, scales with
    the scan) running :func:`decode_wav` per payload, the audio
    parallel of :func:`decode_ppm_images`.  Output carries the RIFF
    header fields, the exact integer micro-unit duration, and EXACT
    per-channel sample sums — means/levels belong downstream in JVM
    expressions so the rounding discipline matches the oracle engine.

    Schema: (id, sample_rate, channels, bits, n_frames, duration_us,
    sum_ch0, sum_ch1) — sum_ch1 is NULL for mono payloads; channels
    beyond the second fold into neither column (sums for arbitrary
    channel counts come from decode_wav directly)."""
    schema = (
        f"{id_col} long, sample_rate int, channels int, bits int, "
        "n_frames long, duration_us long, sum_ch0 long, sum_ch1 long"
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_wav(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series(
                        [m["sample_rate"] for m in metas], dtype="int32"
                    ),
                    "channels": pd.Series(
                        [m["channels"] for m in metas], dtype="int32"
                    ),
                    "bits": pd.Series(
                        [m["bits_per_sample"] for m in metas], dtype="int32"
                    ),
                    "n_frames": pd.Series(
                        [m["n_frames"] for m in metas], dtype="int64"
                    ),
                    "duration_us": pd.Series(
                        [m["duration_us"] for m in metas], dtype="int64"
                    ),
                    "sum_ch0": pd.Series(
                        [m["ch_sums"][0] for m in metas], dtype="int64"
                    ),
                    "sum_ch1": pd.Series(
                        [
                            m["ch_sums"][1] if len(m["ch_sums"]) > 1 else None
                            for m in metas
                        ],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def encode_avi_header(
    width: int,
    height: int,
    total_frames: int,
    us_per_frame: int,
    streams: int = 1,
) -> bytes:
    """Minimal RIFF/AVI container with a spec-shaped header: the
    ``LIST hdrl`` holding the 56-byte ``avih`` main header (public
    AVI RIFF form, Microsoft Video for Windows spec) plus an empty
    ``LIST movi`` body — the video analog of :func:`encode_wav`.
    Carries NO frame data (frame decode belongs to a real codec on a
    real cluster); the container metadata is the part a 100 TB crawl
    pipeline actually reads (dimensions, frame count, frame rate)."""
    if us_per_frame <= 0:
        raise ValueError(
            f"encode_avi_header: us_per_frame must be positive, got "
            f"{us_per_frame}"
        )

    def le(n: int, width_b: int) -> bytes:
        return int(n).to_bytes(width_b, "little")

    avih_body = (
        le(us_per_frame, 4)        # dwMicroSecPerFrame
        + le(0, 4)                 # dwMaxBytesPerSec
        + le(0, 4)                 # dwPaddingGranularity
        + le(0x10, 4)              # dwFlags (AVIF_HASINDEX)
        + le(total_frames, 4)      # dwTotalFrames
        + le(0, 4)                 # dwInitialFrames
        + le(streams, 4)           # dwStreams
        + le(0, 4)                 # dwSuggestedBufferSize
        + le(width, 4)             # dwWidth
        + le(height, 4)            # dwHeight
        + le(0, 4) * 4             # dwReserved[4]
    )
    avih = b"avih" + le(len(avih_body), 4) + avih_body
    hdrl = b"LIST" + le(4 + len(avih), 4) + b"hdrl" + avih
    movi = b"LIST" + le(4, 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + le(len(body), 4) + body


def decode_avi_meta(payload: bytes) -> dict:
    """Pure-Python AVI container metadata → the ``avih`` main-header
    fields a pipeline filters on:

        {width, height, total_frames, us_per_frame, streams,
         duration_us, fps_milli}

    ``duration_us`` = total_frames · us_per_frame (exact integers);
    ``fps_milli`` = 10⁹ // us_per_frame (frame rate in exact
    milli-fps — the micro-unit no-float discipline).  The walk
    follows the RIFF spec shared with :func:`decode_wav` (LE32 sizes,
    word alignment): form type must be ``AVI ``, and the ``avih``
    header is found inside the ``LIST hdrl`` chunk.  Malformed or
    truncated payloads raise ValueError naming the defect."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("decode_avi_meta: not a RIFF container (magic != RIFF)")
    if payload[8:12] != b"AVI ":
        raise ValueError("decode_avi_meta: RIFF form type is not 'AVI '")
    riff_size = int.from_bytes(payload[4:8], "little")
    if 8 + riff_size > len(payload):
        raise ValueError(
            f"decode_avi_meta: truncated container (header claims "
            f"{8 + riff_size} bytes, payload has {len(payload)})"
        )
    pos, avih = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(
                f"decode_avi_meta: truncated {cid!r} chunk "
                f"({len(body)} of {csize} bytes)"
            )
        if cid == b"LIST" and body[:4] == b"hdrl":
            # walk the list's children for the main header
            ipos = 4
            while ipos + 8 <= len(body):
                iid = body[ipos : ipos + 4]
                isize = int.from_bytes(body[ipos + 4 : ipos + 8], "little")
                ibody = body[ipos + 8 : ipos + 8 + isize]
                if iid == b"avih":
                    if isize < 40:
                        raise ValueError(
                            "decode_avi_meta: avih chunk shorter than the "
                            "40 header bytes read"
                        )
                    avih = ibody
                    break
                ipos += 8 + isize + (isize & 1)
        pos += 8 + csize + (csize & 1)
    if avih is None:
        raise ValueError("decode_avi_meta: missing LIST hdrl / avih chunk")
    upf = int.from_bytes(avih[0:4], "little")
    if upf <= 0:
        raise ValueError(
            f"decode_avi_meta: dwMicroSecPerFrame {upf} must be positive"
        )
    frames = int.from_bytes(avih[16:20], "little")
    return {
        "width": int.from_bytes(avih[32:36], "little"),
        "height": int.from_bytes(avih[36:40], "little"),
        "total_frames": frames,
        "us_per_frame": upf,
        "streams": int.from_bytes(avih[24:28], "little"),
        "duration_us": frames * upf,
        "fps_milli": 1_000_000_000 // upf,
    }


def synth_avi(key: int) -> bytes:
    """Deterministic AVI container fixture from an integer key — the
    video analog of :func:`synth_wav`; every field is integer
    arithmetic on ``key`` so a SQL oracle replays the metadata without
    parsing a byte.

    Law (mirrored in the x_avi_meta oracle):
        width        = 160 · (1 + key % 4)
        height       = 120 · (1 + key % 4)
        total_frames = 24 + (key % 240)
        us_per_frame = 33333 when key % 2 == 0 else 41666  (≈30/24 fps)
        streams      = 1 + (key % 2)
    """
    key = int(key)
    return encode_avi_header(
        width=160 * (1 + key % 4),
        height=120 * (1 + key % 4),
        total_frames=24 + (key % 240),
        us_per_frame=33333 if key % 2 == 0 else 41666,
        streams=1 + (key % 2),
    )


def decode_avi_videos(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Container-metadata extraction for a binary AVI column: an
    Arrow-batched narrow map (mapInPandas — no shuffle, scales with
    the scan) running :func:`decode_avi_meta` per payload.

    Schema: (id, width, height, total_frames, us_per_frame, streams,
    duration_us, fps_milli)."""
    schema = (
        f"{id_col} long, width int, height int, total_frames long, "
        "us_per_frame long, streams int, duration_us long, fps_milli long"
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_avi_meta(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "total_frames": pd.Series(
                        [m["total_frames"] for m in metas], dtype="int64"
                    ),
                    "us_per_frame": pd.Series(
                        [m["us_per_frame"] for m in metas], dtype="int64"
                    ),
                    "streams": pd.Series(
                        [m["streams"] for m in metas], dtype="int32"
                    ),
                    "duration_us": pd.Series(
                        [m["duration_us"] for m in metas], dtype="int64"
                    ),
                    "fps_milli": pd.Series(
                        [m["fps_milli"] for m in metas], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def synth_avi_payloads(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Attach a deterministic AVI payload column derived from the id
    (:func:`synth_avi`) — the synth_wav_payloads pattern for video."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{cols}, {out} binary"
    # r14 optimization note: unlike synth_wav/synth_png (real per-row
    # compute — sample loops, scanline filters + DEFLATE), the AVI
    # payload is a header-only container build (~µs/row), so the
    # fan_out respray measured NET-NEGATIVE here (0.28 s -> 0.74 s at
    # sf0.1: the exchange costs more than the idle cores recover).
    # Deliberately NOT fanned out — see OPTIMIZATION_r14.md.

    def run(batches: Iterable) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [synth_avi(int(k)) for k in pdf[id_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


# PNG — the third real image codec beside PPM (r14): the format's
# chunk/CRC/filter machinery is fully specified in the public W3C
# PNG spec (RFC 2083), and stdlib zlib covers the DEFLATE layer, so a
# dependency-free implementation stays honest — including all five
# scanline filters, which synth_png exercises row by row.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor per the PNG spec (filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    row_filters: list[int] | None = None,
) -> bytes:
    """Minimal spec-correct PNG encoder: 8-bit greyscale (color_type
    0) or RGB (color_type 2), one IHDR/IDAT/IEND chunk each, real
    CRC-32s, and REAL scanline filtering — ``row_filters`` picks the
    per-row filter type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth;
    default all 0), so the decoder's unfilter paths are genuinely
    exercised, not vacuously passed through."""
    import zlib

    if color_type not in (0, 2):
        raise ValueError(
            f"encode_png: color_type must be 0 (grey) or 2 (RGB), got "
            f"{color_type}"
        )
    bpp = 1 if color_type == 0 else 3
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(
            f"encode_png: pixel buffer is {len(pixels)} bytes, expected "
            f"{stride * height} ({width}x{height}x{bpp})"
        )
    filters = list(row_filters or [0] * height)
    if len(filters) != height:
        raise ValueError(
            f"encode_png: row_filters has {len(filters)} entries for "
            f"{height} rows"
        )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = int(filters[y])
        if ft not in (0, 1, 2, 3, 4):
            raise ValueError(f"encode_png: bad filter type {ft}")
        raw.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                raw.append(x)
            elif ft == 1:
                raw.append((x - a) % 256)
            elif ft == 2:
                raw.append((x - b) % 256)
            elif ft == 3:
                raw.append((x - (a + b) // 2) % 256)
            else:
                raw.append((x - _paeth(a, b, c)) % 256)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Pure-Python PNG decode → header fields plus exact per-channel
    integer pixel sums (the decode_ppm/decode_wav hash-stable
    statistic):

        {width, height, bit_depth, color_type, n_chunks, n_pixels,
         ch_sums [c0, (c1, c2)], pixels (the unfiltered raw bytes —
         downstream perceptual hashing reads them)}

    The chunk walk verifies EVERY chunk's CRC-32 (a corrupt crawl
    byte-range fails loudly, never reads garbage stats), inflates the
    concatenated IDAT stream, and UNFILTERS all five spec filter
    types.  Supported: 8-bit greyscale and truecolor (color types
    0/2), non-interlaced — palette/alpha/16-bit/Adam7 raise
    NotImplementedError naming the feature (real corpora route those
    through a real image library on a real cluster)."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("decode_png: bad PNG signature")
    pos, ihdr, idat, n_chunks, ended = 8, None, bytearray(), 0, False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("decode_png: truncated chunk header")
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise ValueError(
                f"decode_png: truncated {ctype!r} chunk "
                f"({len(data)} of {clen} bytes)"
            )
        crc = payload[pos + 8 + clen : pos + 12 + clen]
        if len(crc) != 4:
            raise ValueError(f"decode_png: missing CRC on {ctype!r}")
        if int.from_bytes(crc, "big") != zlib.crc32(ctype + data):
            raise ValueError(f"decode_png: CRC mismatch on {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + clen
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("decode_png: missing or malformed IHDR")
    if not ended:
        raise ValueError("decode_png: missing IEND chunk")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, comp, filt, interlace = ihdr[8:13]
    if comp != 0 or filt != 0:
        raise ValueError(
            f"decode_png: unknown compression/filter method "
            f"({comp}/{filt})"
        )
    if interlace != 0:
        raise NotImplementedError("decode_png: Adam7 interlace unsupported")
    if bit_depth != 8 or color_type not in (0, 2):
        raise NotImplementedError(
            f"decode_png: only 8-bit grey/RGB supported, got depth "
            f"{bit_depth} color type {color_type}"
        )
    bpp = 1 if color_type == 0 else 3
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"decode_png: inflated stream is {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    sums = [0] * bpp
    pixels = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft not in (0, 1, 2, 3, 4):
            raise ValueError(f"decode_png: bad filter type {ft} on row {y}")
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                line[i] = (line[i] + a) % 256
            elif ft == 2:
                line[i] = (line[i] + b) % 256
            elif ft == 3:
                line[i] = (line[i] + (a + b) // 2) % 256
            elif ft == 4:
                line[i] = (line[i] + _paeth(a, b, c)) % 256
            sums[i % bpp] += line[i]
        prev = line
        pixels += line
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "n_chunks": n_chunks,
        "n_pixels": width * height,
        "ch_sums": sums,
        "pixels": bytes(pixels),
    }


def synth_png(key: int) -> bytes:
    """Deterministic PNG fixture from an integer key — the synth_wav
    pattern for images, with the row FILTER TYPE varying by the law so
    every unfilter path is exercised across a corpus.

    Law (mirrored in the x_png_meta oracle):
        width       = 8 + (key % 9)
        height      = 8 + (key % 7)
        color_type  = 0 (grey) when key % 4 == 0 else 2 (RGB)
        channel c of pixel i = (key·7 + i·13 + c·31) % 256
        filter of row y      = (key + y) % 5
    """
    key = int(key)
    w = 8 + (key % 9)
    h = 8 + (key % 7)
    ct = 0 if key % 4 == 0 else 2
    bpp = 1 if ct == 0 else 3
    pixels = bytes(
        (key * 7 + i * 13 + c * 31) % 256
        for i in range(w * h)
        for c in range(bpp)
    )
    return encode_png(
        w, h, pixels, color_type=ct,
        row_filters=[(key + y) % 5 for y in range(h)],
    )


def synth_png_payloads(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Attach a deterministic PNG payload column derived from the id
    (:func:`synth_png`) — the synth_wav_payloads pattern for images."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{cols}, {out} binary"
    # r14 optimization (guide §2.6/§4): the id relation of a synthetic
    # payload column is tiny on disk, so the scan is 1-2 tasks and the
    # per-row Python encoder ran single-threaded while 31 cores idled.
    # The GUARDED fan_out spreads the rows first (no-op at production
    # scan widths); payloads are a pure per-row function of the id, so
    # the result is partition-layout-independent.
    df = fan_out(df)

    def run(batches: Iterable) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [synth_png(int(k)) for k in pdf[id_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def decode_png_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL PNG metadata + pixel statistics without an image library:
    an Arrow-batched narrow map (mapInPandas — no shuffle, scales with
    the scan) running :func:`decode_png` per payload (CRC-verified
    chunk walk, inflate, full unfilter).

    Schema: (id, width, height, color_type, n_chunks, n_pixels,
    sum_c0, sum_c1, sum_c2) — sum_c1/sum_c2 NULL for greyscale."""
    schema = (
        f"{id_col} long, width int, height int, color_type int, "
        "n_chunks int, n_pixels long, sum_c0 long, sum_c1 long, "
        "sum_c2 long"
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_png(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series(
                        [m["width"] for m in metas], dtype="int32"
                    ),
                    "height": pd.Series(
                        [m["height"] for m in metas], dtype="int32"
                    ),
                    "color_type": pd.Series(
                        [m["color_type"] for m in metas], dtype="int32"
                    ),
                    "n_chunks": pd.Series(
                        [m["n_chunks"] for m in metas], dtype="int32"
                    ),
                    "n_pixels": pd.Series(
                        [m["n_pixels"] for m in metas], dtype="int64"
                    ),
                    "sum_c0": pd.Series(
                        [m["ch_sums"][0] for m in metas], dtype="int64"
                    ),
                    "sum_c1": pd.Series(
                        [
                            m["ch_sums"][1] if len(m["ch_sums"]) > 1 else None
                            for m in metas
                        ],
                        dtype="Int64",
                    ),
                    "sum_c2": pd.Series(
                        [
                            m["ch_sums"][2] if len(m["ch_sums"]) > 2 else None
                            for m in metas
                        ],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def dhash_rows(width: int, height: int, bpp: int, pixels: bytes) -> list[int]:
    """Difference-hash (dHash) row bytes from raw pixels — the classic
    perceptual image fingerprint (a 2010s-folklore standard, e.g.
    Krawetz's HackerFactor writeup): downsample to a 9×8 luma grid by
    integer block averaging, then one bit per horizontal neighbor
    comparison (grid[x] > grid[x+1]), packed MSB-first into one byte
    per row.  Returned as EIGHT per-row bytes, not one int64 — the
    block-bucket pairing key AND sign-safe in engines whose BIGINT
    shifts are arithmetic.

    Integer determinism end-to-end: luma = (r+g+b)//3 (bpp 3) or the
    sample itself (bpp 1); cell bounds x₀ = ⌊gx·w/9⌋ with a minimum
    width of one pixel (images narrower than the grid reuse pixels —
    deterministic, no interpolation); cell value = sum // count.
    """
    if width < 1 or height < 1 or bpp not in (1, 3):
        raise ValueError(
            f"dhash_rows: bad raster ({width}x{height}, bpp={bpp})"
        )
    if len(pixels) != width * height * bpp:
        raise ValueError(
            f"dhash_rows: raster is {len(pixels)} bytes, expected "
            f"{width * height * bpp}"
        )

    def luma(x: int, y: int) -> int:
        i = (y * width + x) * bpp
        if bpp == 1:
            return pixels[i]
        return (pixels[i] + pixels[i + 1] + pixels[i + 2]) // 3

    def cell(gx: int, gy: int) -> int:
        x0 = gx * width // 9
        x1 = max(x0 + 1, (gx + 1) * width // 9)
        y0 = gy * height // 8
        y1 = max(y0 + 1, (gy + 1) * height // 8)
        s = cnt = 0
        for y in range(y0, y1):
            for x in range(x0, x1):
                s += luma(x, y)
                cnt += 1
        return s // cnt

    grid = [[cell(gx, gy) for gy in range(8)] for gx in range(9)]
    return [
        sum(
            (1 << (7 - gx)) if grid[gx][gy] > grid[gx + 1][gy] else 0
            for gx in range(8)
        )
        for gy in range(8)
    ]


def dhash_png_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual dHash over a PNG payload column: the full
    :func:`decode_png` (CRC walk, inflate, unfilter) feeds
    :func:`dhash_rows` in ONE Arrow-batched narrow map — no shuffle,
    scales with the scan.  Output: (id, b0..b7 int) — the eight row
    bytes, ready for :func:`pigout_spark.pipeline.dedup.
    dhash_hamming_pairs`' block-bucketed Hamming join."""
    schema = (
        f"{id_col} long, b0 int, b1 int, b2 int, b3 int, "
        "b4 int, b5 int, b6 int, b7 int"
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for b in pdf[payload_col]:
                m = decode_png(bytes(b))
                bpp = 1 if m["color_type"] == 0 else 3
                rows.append(
                    dhash_rows(m["width"], m["height"], bpp, m["pixels"])
                )
            out = {id_col: pdf[id_col].astype("int64")}
            for j in range(8):
                out[f"b{j}"] = pd.Series(
                    [r[j] for r in rows], dtype="int32"
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
