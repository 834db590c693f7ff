"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns + a typed metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested. The actual codec step is STUBBED
— this container has no image/audio libraries — behind
``decoder="fake"`` (deterministic, hash-derived features, used by
tests) or ``decoder="real"`` (raises NotImplementedError with the
intended library call spelled out).

Scale notes baked into the design:
- ``mapInPandas`` streams Arrow batches, so a 100 MB media blob
  never materializes the whole partition in Python at once; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` for large blobs.
- Feature extraction emits fixed-size vectors → downstream joins/ANN
  are unaffected by blob size (project blobs away before shuffles).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type STRING, width INT, height INT, duration_ms INT, codec STRING"
)

FEATURE_DIM = 16

FEATURE_SCHEMA = f"id BIGINT, feature ARRAY<DOUBLE>, n_bytes BIGINT, sha256 STRING"


def attach_media(
    df: DataFrame, payload_col: str, media_type: str, id_col: str
) -> DataFrame:
    """Wrap an existing column as an opaque media blob with typed
    metadata — the canonical multimodal row shape:
    (id, media BINARY, meta STRUCT<media_type,width,height,…>)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).cast("binary").alias("media"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: 16 doubles
    derived from the sha256 digest. Stable across runs/machines."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode media and emit fixed-size feature vectors via
    ``mapInPandas`` (Arrow-batched; blobs dropped from the output so
    nothing heavy shuffles downstream).

    ``decoder="netpbm"`` is a REAL image codec path (pure stdlib
    P2/P3/P5/P6 parse → pixel statistics); ``decoder="wav"`` is a
    REAL audio codec path (stdlib ``wave`` PCM parse →
    numpy-vectorized loudness/envelope features); ``"fake"`` is the
    deterministic hash-derived stand-in; ``"real"`` names the
    PIL/pyav call this container can't import."""
    if decoder == "real":
        raise NotImplementedError(
            "real decode needs PIL/torchaudio/pyav — not in this container; "
            "use decoder='netpbm' for a genuine stdlib codec path, or plug "
            "the decode into _fake_features's slot (bytes -> vector)"
        )
    feature_fn = {
        "netpbm": lambda b: _netpbm_features(b),
        "wav": lambda b: _wav_features(b),
    }.get(decoder, _fake_features)

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [
                feature_fn(bytes(b)) if b is not None else None
                for b in pdf[media_col]
            ]
            nbytes = [len(bytes(b)) if b is not None else 0 for b in pdf[media_col]]
            shas = [
                hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "feature": feats,
                    "n_bytes": nbytes,
                    "sha256": shas,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "id BIGINT, media BINARY, "
    "meta STRUCT<media_type STRING, width INT, height INT, "
    "duration_ms INT, codec STRING>"
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "id",
    meta_col: str = "meta",
    decoder: str = "raw",
) -> DataFrame:
    """Image resize via ``mapInPandas`` (same Arrow-batch shape as
    :func:`extract_features`; resized blobs replace the originals and
    meta dims are updated).

    - ``decoder="raw"`` (default): REAL nearest-neighbor resampling
      over raw grayscale uint8 buffers — pure numpy index gather, no
      codec involved. Source dims come from ``meta.width/height``;
      when absent the buffer is treated as square. This path is fully
      functional, not a fake.
    - ``decoder="netpbm"``: REAL codec round-trip — P2/P3/P5/P6
      parse → nearest-neighbor gather on decoded pixels → binary
      netpbm re-encode. Pure stdlib, grayscale and RGB.
    - ``decoder="pil"``: compressed formats (JPEG/PNG) decode through
      PIL when importable; import-gated — this container has no PIL,
      so it raises ImportError naming the dependency rather than
      failing mid-job.
    """
    import numpy as np

    if decoder == "pil":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - container has no PIL
            raise ImportError(
                "decoder='pil' needs pillow; install it or use "
                "decoder='raw' for raw grayscale buffers"
            ) from e

    def _resize_raw(blob: bytes, sw: int | None, sh: int | None) -> bytes:
        buf = np.frombuffer(blob, dtype=np.uint8)
        if not sw or not sh:
            side = int(len(buf) ** 0.5)
            sw = sh = max(side, 1)
        src = buf[: sw * sh].reshape(sh, sw)
        rows = (np.arange(height) * sh) // height
        cols = (np.arange(width) * sw) // width
        return src[rows][:, cols].tobytes()

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for rid, blob, meta in zip(pdf[id_col], pdf[media_col], pdf[meta_col]):
                if blob is None:
                    continue
                meta = dict(meta) if meta is not None else {}
                if decoder == "pil":  # pragma: no cover - needs pillow
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(bytes(blob))).resize((width, height))
                    resized = img.tobytes()
                elif decoder == "netpbm":
                    resized = _netpbm_resize(bytes(blob), width, height)
                else:
                    resized = _resize_raw(
                        bytes(blob), meta.get("width"), meta.get("height")
                    )
                out.append(
                    {
                        "id": rid,
                        "media": resized,
                        "meta": {**meta, "width": width, "height": height,
                                 **({"codec": "netpbm"} if decoder == "netpbm" else {})},
                    }
                )
            yield pd.DataFrame(out, columns=["id", "media", "meta"])

    return df.mapInPandas(_run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "id BIGINT, frame_idx INT, frame BINARY, frame_sha256 STRING"


def sample_frames(
    df: DataFrame,
    every_ms: int,
    media_col: str = "media",
    id_col: str = "id",
    decoder: str = "fake",
    fake_duration_ms: int = 1000,
    frame_ms: int = 40,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (id, frame_idx, frame BINARY, sha). The Spark plumbing — Arrow
    batches in, row-explosion out, blobs never surviving past the
    projection that consumes them — is real. Codecs:

    - ``"netpbm-stream"``: REAL container parse — the payload is a
      concatenation of binary netpbm frames (P5/P6, the motion-PPM
      form ffmpeg emits for ``-f image2pipe -vcodec ppm``); frame
      boundaries come from each frame's own header, frames are
      ``frame_ms`` apart, and every ``ceil(every_ms/frame_ms)``-th
      frame is emitted verbatim.
    - ``"fake"``: deterministic sha-derived stand-in.
    - ``"real"`` raises, naming the pyav call this container lacks
      (the plug point is the ``_frames`` generator)."""
    if decoder == "real":
        raise NotImplementedError(
            "frame decode requires pyav; plug a (bytes, every_ms) -> "
            "iterator[bytes] generator into _frames"
        )

    n_frames = max(1, fake_duration_ms // max(1, every_ms))
    stride = max(1, -(-every_ms // max(1, frame_ms)))  # ceil

    def _frames(payload: bytes):
        if decoder == "netpbm-stream":
            for k, frame in enumerate(split_netpbm_stream(payload)):
                if k % stride == 0:
                    yield frame
            return
        for i in range(n_frames):
            yield hashlib.sha256(payload + i.to_bytes(4, "big")).digest()

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # columnar accumulation: a dict-per-row list made pandas
            # re-infer 4 columns over 60k frame rows per task on the
            # video corpus — pure Python/pandas overhead, same rows
            ids: list = []
            idxs: list = []
            frames: list = []
            shas: list = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    continue
                for idx, frame in enumerate(_frames(bytes(blob))):
                    ids.append(rid)
                    idxs.append(idx)
                    frames.append(frame)
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_sha256": shas,
                },
                columns=["id", "frame_idx", "frame", "frame_sha256"],
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


DHASH_SCHEMA = "id BIGINT, band0 INT, band1 INT, band2 INT, band3 INT"


def _dhash_bands(payload: bytes) -> list[int] | None:
    """The dHash kernel shared by the batch (:func:`image_dhash`)
    and streaming (:func:`image_dhash_band_col`) paths: netpbm
    decode → 9×8 NN grayscale → four 16-bit row-pair bands.
    None on undecodable payloads."""
    return _dhash_bands_batch([payload])[0]


def _dhash_bands_batch(payloads) -> list:
    """Batch dHash: same integer arithmetic as the one-payload form
    but vectorized across every same-shaped raster in the batch —
    per-frame numpy dispatch overhead (~25 tiny-array ops per call)
    was the dominant cost of the video near-dup signature pass at
    60k frames (guide §4.2: hand whole batches to vectorized
    kernels). Rasters are grouped by (w, h, channels); each group
    runs ONE gather/compare/pack pipeline. Returns a list aligned
    with ``payloads`` (None for undecodable entries). Integer-exact:
    the NN gather, (r+g+b)//3 grayscale, strict > compare and
    MSB-first band packing are element-for-element the operations
    the scalar kernel performed."""
    import numpy as np

    out: list = [None] * len(payloads)
    groups: dict = {}
    for i, p in enumerate(payloads):
        if p is None:
            continue
        try:
            arr, w, h = decode_netpbm(bytes(p))
        except ValueError:
            continue
        groups.setdefault((w, h, arr.ndim == 3), []).append((i, arr))
    weights = 1 << (15 - np.arange(16, dtype=np.int64))
    for (w, h, rgb), items in groups.items():
        px = np.stack([a for _, a in items]).astype(np.int64)
        if rgb:
            px = px.sum(axis=3) // 3
        ys = np.minimum(np.arange(8) * h // 8, h - 1)
        xs = np.minimum(np.arange(9) * w // 9, w - 1)
        small = px[:, ys][:, :, xs]                      # (n, 8, 9)
        bits = (small[:, :, :-1] > small[:, :, 1:]).astype(np.int64)
        bands = bits.reshape(len(items), 4, 16) @ weights  # (n, 4)
        for (i, _), row in zip(items, bands):
            out[i] = [int(x) for x in row]
    return out


def image_dhash_band_col(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    out_col: str = "__bands__",
) -> DataFrame:
    """Attach the four dHash bands IN-ROW as the (band_id, band_key)
    struct array :func:`mirabelle_spark.pipeline.dedup.
    minhash_band_keys` emits for text — the band source for the
    STREAMING image near-dup twin (every other column passes
    through, so the keyed-state shell can carry the original row).
    band_key packs (band_id << 16) | band_value so the four bands
    occupy disjoint key spaces in one state store. Undecodable
    media gets the never-dup sentinel (band_id −1), mirroring the
    short-document convention of the text path."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    out_schema = StructType(
        df.schema.fields
        + [
            StructField(
                out_col,
                ArrayType(
                    StructType(
                        [
                            StructField("band_id", IntegerType()),
                            StructField("band_key", LongType()),
                        ]
                    )
                ),
            )
        ]
    )

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            col = []
            for bb in _dhash_bands_batch(list(pdf[media_col])):
                if bb is None:
                    col.append([{"band_id": -1, "band_key": 0}])
                else:
                    col.append(
                        [
                            {"band_id": k, "band_key": (k << 16) | bb[k]}
                            for k in range(4)
                        ]
                    )
            out = pdf.copy()
            out[out_col] = col
            yield out

    return df.mapInPandas(_run, schema=out_schema)


def image_dhash(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """Perceptual difference-hash (dHash) over real decoded pixels —
    the standard LAION-style image near-dup signature: decode →
    nearest-neighbor resize to a 9×8 grayscale grid → 64 bits, one
    per horizontal neighbor pair (``bit(y,x) = p(y,x) > p(y,x+1)``).

    Emitted as FOUR 16-bit row-pair bands (band ``b`` packs rows
    ``2b, 2b+1``, MSB-first) instead of one 64-bit long, so the
    Hamming-band bucketing downstream (:func:`mirabelle_spark.
    pipeline.dedup.band_hamming_pairs`) is a plain equi-join column
    and the DuckDB oracle can rebuild every band with integer SQL
    (no 64-bit sign-bit gymnastics).

    Integer-exact by construction: the NN gather uses the same
    ``(i·src)//dst`` floor indexing as :func:`resize_images`, so a
    resize that doubles each axis (or any 2^k NN upscale) commutes
    with the hash — ``floor(floor(2a)/2) = floor(a)`` — and a
    re-encoded/upscaled copy hashes IDENTICALLY (pytest-pinned).
    RGB inputs are grayscaled with integer mean ``(r+g+b)//3``.

    Scale shape: one Arrow pass over the blobs (``mapInPandas``),
    20-byte rows out — blobs never survive to a shuffle. Decode
    failures yield NULL bands (dead-letter routing upstream decides).
    """

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            bands = _dhash_bands_batch(list(pdf[media_col]))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    **{
                        f"band{k}": [bb[k] if bb is not None else None for bb in bands]
                        for k in range(4)
                    },
                }
            )

    return df.mapInPandas(_run, schema=DHASH_SCHEMA)


def video_dhash(
    df: DataFrame,
    every_ms: int,
    media_col: str = "media",
    id_col: str = "id",
    frame_ms: int = 40,
) -> DataFrame:
    """Fused container-parse + per-frame dHash: one Arrow pass from
    video blob to (id, band0..band3) frame-signature rows — result-
    identical to :func:`sample_frames` (netpbm-stream) piped into
    :func:`image_dhash`, minus the intermediate Arrow round trip of
    every frame blob and the sha256 column the near-dup path never
    reads (r16 optimization: the two-pass form re-serialized ~5 MB
    of frames per task and hashed 60k frames for nothing). Same
    stride rule (every ``ceil(every_ms/frame_ms)``-th frame), same
    NULL-band convention for undecodable frames; blobs die inside
    the single pass."""
    stride = max(1, -(-every_ms // max(1, frame_ms)))  # ceil

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids: list = []
            frames: list = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    continue
                for k, frame in enumerate(split_netpbm_stream(bytes(blob))):
                    if k % stride == 0:
                        ids.append(rid)
                        frames.append(frame)
            bands = _dhash_bands_batch(frames)
            yield pd.DataFrame(
                {
                    "id": ids,
                    **{
                        f"band{k}": [
                            bb[k] if bb is not None else None for bb in bands
                        ]
                        for k in range(4)
                    },
                }
            )

    return df.mapInPandas(_run, schema=DHASH_SCHEMA)


def audio_dhash(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    segments: int = 65,
    samples_per_segment: int = 16,
) -> DataFrame:
    """Perceptual difference-hash for AUDIO (r16 — the audio grain
    of the near-dup family): REAL stdlib ``wave`` PCM decode →
    integer energy per fixed-width segment (Σ x², exact in int64:
    1040 × 32768² < 2⁶³) → one bit per adjacent-segment comparison
    (``e[i] > e[i+1]``) → 64 bits packed as four 16-bit bands, the
    same band shape :func:`mirabelle_spark.pipeline.dedup.
    band_hamming_pairs` buckets on.

    GAIN-INVARIANT BY CONSTRUCTION for exact rescalings: an
    amplitude change that multiplies every sample by the same
    rational (e.g. the >>1 of :func:`audio_gain` on samples that
    divide exactly) scales every segment energy by the same factor
    and preserves every comparison sign — so a volume-normalized
    re-encode hashes identically, the audio analogue of the
    dHash/NN-resize commutation. A localized dropout (one segment
    zeroed) flips at most 2 bits. 16-bit mono PCM; only the first
    ``segments × samples_per_segment`` samples are hashed (fixed
    window, so trailing-padding re-encodes are also invariant).
    Decode failures yield NULL bands. One Arrow pass; 20-byte rows
    out, blobs never shuffle."""
    import numpy as np

    n_bits = segments - 1
    if n_bits % 4:
        raise ValueError("segments - 1 must split into 4 equal bands")
    per_band = n_bits // 4

    def _decode(payload: bytes):
        """WAV → the first segments×samples_per_segment int16 samples
        (None on codec/shape rejects) — the per-row half; the energy
        and band math runs batch-vectorized below (guide §4.2)."""
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    return None
                raw = w.readframes(w.getnframes())
        except Exception:
            return None
        need = segments * samples_per_segment
        x = np.frombuffer(raw[: 2 * need], dtype="<i2")
        if x.size < need:
            return None
        return x

    def _bands_batch(payloads) -> list:
        """Vectorized across the batch: stack every decoded clip and
        run ONE energy/compare/pack pipeline — arithmetic identical
        to the per-clip form (int64-exact Σx² per segment, strict >
        compare, MSB-first band packing)."""
        out: list = [None] * len(payloads)
        decoded = []
        for i, p in enumerate(payloads):
            if p is None:
                continue
            x = _decode(bytes(p))
            if x is not None:
                decoded.append((i, x))
        if not decoded:
            return out
        X = np.stack([x for _, x in decoded]).astype(np.int64)
        e = (X * X).reshape(len(decoded), segments, samples_per_segment).sum(axis=2)
        bits = (e[:, :-1] > e[:, 1:]).astype(np.int64)
        weights = 1 << (per_band - 1 - np.arange(per_band, dtype=np.int64))
        bands = bits.reshape(len(decoded), 4, per_band) @ weights
        for (i, _), row in zip(decoded, bands):
            out[i] = [int(x) for x in row]
        return out

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            bands = _bands_batch(list(pdf[media_col]))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    **{
                        f"band{k}": [bb[k] if bb is not None else None for bb in bands]
                        for k in range(4)
                    },
                }
            )

    return df.mapInPandas(_run, schema=DHASH_SCHEMA)


def audio_gain(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    shift: int = 1,
) -> DataFrame:
    """REAL audio transform through the stdlib ``wave`` codec: PCM
    decode → arithmetic right-shift by ``shift`` (volume ÷ 2^shift;
    numpy's >> on int16 is arithmetic, and on samples that are
    multiples of 2^shift the rescale is EXACT — the property
    :func:`audio_dhash` is invariant under) → WAV re-encode with the
    original rate. Different bytes out, same fingerprint in: the
    audio twin of the netpbm upscale re-encode."""
    import numpy as np

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    continue
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    nch, sw, rate = (
                        w.getnchannels(), w.getsampwidth(), w.getframerate()
                    )
                    raw = w.readframes(w.getnframes())
                if sw != 2:
                    raise ValueError("audio_gain supports 16-bit PCM only")
                x = np.frombuffer(raw, dtype="<i2") >> shift
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(nch)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(x.astype("<i2").tobytes())
                out.append({"id": rid, "media": buf.getvalue()})
            yield pd.DataFrame(out, columns=["id", "media"])

    return df.mapInPandas(_run, schema="id BIGINT, media BINARY")


# -- netpbm: a REAL image codec in pure stdlib ------------------------------
# The container has no PIL/pyav, but the netpbm family (PGM P2/P5,
# PPM P3/P6) is a public, trivial format — so at least one genuine
# decode→process→encode path runs end-to-end with real pixels.


def _netpbm_extent(data: bytes, start: int) -> int:
    """Byte length of the binary netpbm frame (P5/P6) starting at
    ``start`` — header walk + raster size; raises on anything else
    (ASCII P2/P3 have no self-delimiting raster, so they can't be
    stream members)."""
    if data[start : start + 1] != b"P" or data[start + 1 : start + 2] not in b"56":
        raise ValueError(f"offset {start}: not a P5/P6 frame header")
    channels = 3 if data[start + 1 : start + 2] == b"6" else 1
    i = start + 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("netpbm maxval > 255 not supported")
    i += 1  # single whitespace after maxval
    end = i + width * height * channels
    if end > len(data):
        raise ValueError("truncated netpbm raster in stream")
    return end - start


def split_netpbm_stream(data: bytes) -> list[bytes]:
    """Split a concatenation of binary netpbm frames into the
    individual frame byte strings (REAL container parse: each
    frame's own header declares its raster size)."""
    frames: list[bytes] = []
    i = 0
    while i < len(data):
        n = _netpbm_extent(data, i)
        frames.append(data[i : i + n])
        i += n
    return frames


def decode_netpbm(data: bytes):
    """Parse P2/P3 (ASCII) / P5/P6 (binary) netpbm bytes →
    (np.ndarray h×w or h×w×3 uint8, width, height). maxval ≤ 255."""
    import numpy as np

    if not data or data[:1] != b"P" or data[1:2] not in b"2356":
        raise ValueError("not a supported netpbm payload (P2/P3/P5/P6)")
    magic = data[:2].decode("ascii")
    i = 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("netpbm maxval > 255 not supported")
    channels = 3 if magic in ("P3", "P6") else 1
    n = width * height * channels
    if magic in ("P5", "P6"):
        i += 1  # single whitespace after maxval
        raw = data[i : i + n]
        if len(raw) < n:
            raise ValueError("truncated netpbm raster")
        arr = np.frombuffer(raw, dtype=np.uint8, count=n)
    else:
        vals = data[i:].split()
        if len(vals) < n:
            raise ValueError("truncated netpbm raster")
        arr = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return arr.reshape(shape), width, height


def encode_netpbm(arr) -> bytes:
    """uint8 h×w (→P5) or h×w×3 (→P6) → binary netpbm bytes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise ValueError("expect h×w or h×w×3 uint8")
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def _netpbm_features(payload: bytes) -> list[float]:
    """REAL pixel statistics as the fixed 16-dim feature vector:
    [mean, std, min, max, aspect, 3 channel means, 8-bin luminance
    histogram], all scaled to [0, 1]."""
    import numpy as np

    arr, width, height = decode_netpbm(payload)
    px = arr.astype(np.float64)
    lum = px.mean(axis=2) if px.ndim == 3 else px
    chans = (
        [px[:, :, c].mean() / 255.0 for c in range(3)]
        if px.ndim == 3
        else [lum.mean() / 255.0] * 3
    )
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    hist = hist / lum.size
    feats = [
        lum.mean() / 255.0,
        lum.std() / 255.0,
        lum.min() / 255.0,
        lum.max() / 255.0,
        min(width / height, height / width),
        *chans,
        *hist.tolist(),
    ]
    assert len(feats) == FEATURE_DIM
    return [float(x) for x in feats]


def _netpbm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample with real decoded pixels, re-encoded
    to binary netpbm — decode → index-gather → encode."""
    import numpy as np

    arr, w0, h0 = decode_netpbm(payload)
    ys = np.minimum((np.arange(height) * h0 // height), h0 - 1)
    xs = np.minimum((np.arange(width) * w0 // width), w0 - 1)
    out = arr[ys][:, xs]
    return encode_netpbm(out)


def _wav_features(payload: bytes) -> list[float] | None:
    """REAL audio decode via the stdlib ``wave`` module (PCM WAV,
    8/16/32-bit): FEATURE_DIM doubles —
    [duration_s, sample_rate, channels, sample_width_bytes,
     rms, peak, zero_crossing_rate, dc_mean,
     seg_rms_0..seg_rms_7]  (RMS of 8 equal time segments — a crude
    loudness envelope). Amplitudes normalized to [-1, 1]; all math
    numpy-vectorized (no per-sample Python — the same rule the
    relational SimHash pass enforces, applied inside the UDF).
    Returns None for undecodable payloads (the ok/error routing
    upstream decides whether that's a dead letter)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch, sw, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
            )
            raw = w.readframes(nframes)
    except Exception:
        return None
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None or rate <= 0 or nch <= 0:
        return None
    usable = len(raw) - (len(raw) % np.dtype(dtype).itemsize)
    samples = np.frombuffer(raw[:usable], dtype=dtype).astype(np.float64)
    if samples.size == 0:
        return None
    scale = float(1 << (8 * sw - 1))
    x = samples / scale
    dur = nframes / float(rate)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    pos = samples >= 0
    zcr = float(np.count_nonzero(pos[1:] != pos[:-1])) / samples.size
    dc = float(np.mean(x))
    seg = [0.0] * 8
    bounds = [samples.size * k // 8 for k in range(9)]
    for k in range(8):
        part = x[bounds[k]: bounds[k + 1]]
        if part.size:
            seg[k] = float(np.sqrt(np.mean(part * part)))
    return [dur, float(rate), float(nch), float(sw), rms, peak, zcr, dc] + seg
