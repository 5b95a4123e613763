"""Multimodal column handling (SURVEY.md §2.11).

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata — Spark shuffles, joins, and aggregates
BinaryType natively, so the pipeline shape (schema, partitioning,
Arrow batch transfer) is identical to production.

The decode seam is :func:`decode_features`, a ``mapInPandas`` stage
with three codec branches: (a) ``codec='fake'`` — deterministic byte
stats (real plumbing, fake features) used by tests; (b)
``codec='ppm'`` — a REAL public codec, binary-PPM (P6) header parse +
numpy channel means; (c) ``codec='png'`` — a REAL compressed codec,
PNG 8-bit RGB via stdlib ``zlib`` inflate + per-scanline filter
reconstruction (None/Sub/Up/Average/Paeth), no PIL needed; (d)
``codec='wav'`` — a REAL audio codec, RIFF/WAVE 16-bit PCM parse +
per-channel sample means. Only codecs needing external libraries
(JPEG/video) remain gated behind ``NotImplementedError`` — clearly
marked so nobody mistakes the gate for a codec.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition
of payloads fits executor memory, and project payload columns away
before any wide shuffle (the helpers here carry (id, features)
forward, never the bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_samples_spark.utils import parallelize_narrow

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, byte_mean double, head_hash bigint"
)

# output of the REAL ppm codec branch: header fields + per-channel
# means; `valid` marks payloads the parser rejected (corrupt corpus
# rows become a flagged row, never a dead job)
PPM_STATS_SCHEMA = (
    "doc_id bigint, valid boolean, width int, height int, "
    "r_mean double, g_mean double, b_mean double"
)

# output of the REAL wav codec branch: format fields + per-channel
# sample means (stereo; mono payloads surface ch1_mean = NULL) —
# same corrupt-row contract as the image codecs
WAV_STATS_SCHEMA = (
    "doc_id bigint, valid boolean, n_channels int, sample_rate int, "
    "n_frames bigint, ch0_mean double, ch1_mean double"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Test-data adapter: materialize a binary column from text (the
    driver tables ship no image bytes). Production: read real bytes
    via ``spark.read.format('binaryFile')`` or a parquet binary col."""
    return docs.withColumn("payload", F.encode(F.col("text"), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def _make_ppm_parser():
    """Build the binary-PPM (P6) header parser — the public Netpbm
    format: ``P6`` magic, then whitespace-separated width/height/
    maxval tokens with ``#``-to-end-of-line comments allowed between
    them, then EXACTLY ONE whitespace byte before the raw RGB
    samples. Factory-nested (like the signature kernels) so the
    decode closure pickles it BY VALUE — executors never need the
    package importable.

    The parser returns (width, height, maxval, pixel_data_offset);
    it raises ``ValueError`` on anything malformed (bad magic,
    missing tokens, maxval outside 1..255 — multi-byte samples are
    out of scope, truncated pixel data)."""

    def parse_ppm_p6(buf: bytes) -> tuple[int, int, int, int]:
        if len(buf) < 2 or buf[0:2] != b"P6":
            raise ValueError("not a P6 ppm: bad magic")
        # Netpbm requires whitespace (or a comment) AFTER the magic;
        # without this check a garbled blob like b"P61 1 255..." would
        # parse as a fabricated 1x1 image instead of being rejected
        if len(buf) < 3 or not (buf[2:3].isspace() or buf[2] == 0x23):
            raise ValueError("not a P6 ppm: magic not followed by whitespace")
        pos, vals = 2, []
        while len(vals) < 3:
            # skip whitespace and comments between header tokens
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if pos < len(buf) and buf[pos] == 0x23:  # '#'
                nl = buf.find(b"\n", pos)
                if nl == -1:
                    raise ValueError("unterminated header comment")
                pos = nl + 1
                continue
            start = pos
            while pos < len(buf) and buf[pos : pos + 1].isdigit():
                pos += 1
            if pos == start:
                raise ValueError("missing header integer")
            vals.append(int(buf[start:pos]))
        # exactly one whitespace byte separates maxval from pixel data
        if pos >= len(buf) or not buf[pos : pos + 1].isspace():
            raise ValueError("missing pixel-data separator")
        pos += 1
        width, height, maxval = vals
        if width <= 0 or height <= 0 or not 1 <= maxval <= 255:
            raise ValueError(f"unsupported header: {width}x{height} maxval={maxval}")
        if len(buf) - pos < width * height * 3:
            raise ValueError("truncated pixel data")
        return width, height, maxval, pos

    return parse_ppm_p6


def synth_ppm_payload(docs: DataFrame) -> DataFrame:
    """Test-data adapter (the driver tables ship no image bytes):
    deterministically synthesize a REAL binary-PPM (P6) payload per
    doc_id — width ``4 + doc_id % 5``, height ``3 + doc_id % 4``, a
    header comment line (exercises the parser's comment path), and
    pixel byte ``i`` (0-based within the RGB data) valued
    ``(doc_id * 31 + i) % 256``. The pinned arithmetic is what lets a
    SQL oracle compute the expected channel means independently of
    the parser. Production replaces this with
    ``spark.read.format('binaryFile')`` or a parquet binary column.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                header = f"P6\n# synthetic fixture {d}\n{w} {h}\n255\n".encode()
                i = np.arange(w * h * 3, dtype=np.int64)
                pix = ((d * 31 + i) % 256).astype(np.uint8)
                payloads.append(header + pix.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return parallelize_narrow(docs.select("doc_id")).mapInPandas(
        gen, "doc_id bigint, payload binary"
    )


def _make_png_decoder():
    """Build the PNG decoder — the real compressed public format, done
    with ONLY the stdlib: chunk walk with CRC32 verification, IHDR
    validation (8-bit, color type 2 = RGB, no interlace), concatenated
    IDAT ``zlib`` inflate, then per-scanline filter reconstruction
    (None/Sub/Up/Average/Paeth per the PNG spec §9) over numpy rows.
    Factory-nested like :func:`_make_ppm_parser` so the decode closure
    pickles BY VALUE — executors never need the package importable.

    Returns ``decode_png(buf) -> (width, height, pixels)`` with
    ``pixels`` a ``(width*height, 3)`` uint8 array in scanline order;
    raises ``ValueError`` on anything malformed (bad signature, CRC
    mismatch, unsupported bit depth/color type, truncated or
    over-long inflate, bad filter byte).

    Scale note: None/Up/Sub rows reconstruct vectorized (Sub is a
    per-channel running sum — uint8 cumsum wraps mod 256); only
    Average/Paeth rows need a sequential left-to-right per-byte
    Python pass (each byte depends on the reconstructed byte 3 to its
    left through a non-linear predictor). The 16.7M-px header cap
    below bounds inflate MEMORY; it does NOT bound the CPU of that
    sequential pass — a hostile max-dimension all-Paeth payload costs
    ~50M interpreter-loop iterations (minutes) in one task. Accepted
    for this stdlib-only decoder: the task stalls, it does not OOM,
    and at production scale this mapInPandas stage swaps in a C-level
    codec (PIL/libpng) with zero plan changes, which resolves both.

    Parse leniency (deliberate, harmless for the stats use): IDAT
    chunks need not be consecutive, and trailing bytes after IEND are
    ignored — stricter than nothing (every chunk is still
    CRC-verified) but looser than spec §5.6/§11.2.4.
    """
    import struct
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def decode_png(buf: bytes):
        if len(buf) < len(SIG) or buf[: len(SIG)] != SIG:
            raise ValueError("not a PNG: bad signature")
        pos = len(SIG)
        width = height = None
        idat = bytearray()
        saw_iend = False
        while pos < len(buf):
            if pos + 8 > len(buf):
                raise ValueError("truncated chunk header")
            (length,) = struct.unpack(">I", buf[pos : pos + 4])
            ctype = buf[pos + 4 : pos + 8]
            end = pos + 8 + length
            if end + 4 > len(buf):
                raise ValueError("truncated chunk data")
            data = buf[pos + 8 : end]
            (crc,) = struct.unpack(">I", buf[end : end + 4])
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"bad CRC in {ctype!r} chunk")
            if ctype == b"IHDR":
                if width is not None:
                    raise ValueError("duplicate IHDR")
                if length != 13:
                    raise ValueError("bad IHDR length")
                width, height, depth, ctype_f, comp, filt, ilace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or ctype_f != 2:
                    raise ValueError(
                        f"unsupported PNG: depth={depth} colortype={ctype_f} "
                        "(only 8-bit RGB)"
                    )
                if comp != 0 or filt != 0 or ilace != 0:
                    raise ValueError("unsupported compression/filter/interlace")
                if width == 0 or height == 0:
                    raise ValueError("zero-dimension image")
                # the inflate bound below is computed FROM this header,
                # so a hostile header declaring 60000x60000 would
                # re-open the bomb hole it closes — cap total pixels
                # (16.7M px = a 4K+ frame; bounds the inflate to
                # ~67 MB worst case)
                if width * height > (1 << 24):
                    raise ValueError(
                        f"image dimensions exceed decoder cap: {width}x{height}"
                    )
            elif ctype == b"IDAT":
                if width is None:
                    raise ValueError("IDAT before IHDR")
                idat += data
            elif ctype == b"IEND":
                saw_iend = True
                break
            # ancillary chunks (tEXt, tIME, ...) pass the CRC check
            # above and are otherwise ignored, per spec
            pos = end + 4
        if width is None or not saw_iend:
            raise ValueError("missing IHDR or IEND")
        stride = width * 3
        expected = height * (1 + stride)
        try:
            # bounded inflate: a crafted deflate bomb in IDAT would
            # otherwise balloon executor memory BEFORE the size check
            # (corpus hygiene — one hostile blob must not OOM a task);
            # max_length caps output at expected+1, so any stream
            # longer than the header promises fails the length check
            # without ever materializing
            raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
        except zlib.error as e:
            raise ValueError(f"IDAT inflate failed: {e}") from e
        if len(raw) != expected:
            raise ValueError("inflated size mismatch")
        out = np.empty((height, stride), dtype=np.uint8)
        for r in range(height):
            row = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=r * (1 + stride) + 1
            ).astype(np.int64)
            f = raw[r * (1 + stride)]
            prior = out[r - 1].astype(np.int64) if r > 0 else np.zeros(stride, np.int64)
            if f == 0:
                recon = row
            elif f == 2:  # Up — vectorized
                recon = (row + prior) % 256
            elif f == 1:
                # Sub — recon[x] = row[x] + recon[x-3]: a per-CHANNEL
                # running sum, so a (width, 3) cumsum along axis 0
                # with uint8 accumulation (wraps mod 256 natively)
                # replaces the per-byte loop.
                recon = (
                    np.cumsum(row.astype(np.uint8).reshape(-1, 3), axis=0,
                              dtype=np.uint8)
                    .reshape(-1)
                    .astype(np.int64)
                )
            elif f in (3, 4):  # Average/Paeth — inherently sequential in x
                recon = np.empty(stride, dtype=np.int64)
                for x in range(stride):
                    left = recon[x - 3] if x >= 3 else 0
                    if f == 3:
                        pred = (left + prior[x]) // 2
                    else:
                        upleft = prior[x - 3] if x >= 3 else 0
                        pred = paeth(int(left), int(prior[x]), int(upleft))
                    recon[x] = (row[x] + pred) % 256
            else:
                raise ValueError(f"bad filter byte {f} on row {r}")
            out[r] = recon.astype(np.uint8)
        return width, height, out.reshape(-1, 3)

    return decode_png


def synth_png_payload(docs: DataFrame) -> DataFrame:
    """Test-data adapter: deterministically synthesize a REAL PNG
    (8-bit RGB) per doc_id with the SAME pinned pixel arithmetic as
    :func:`synth_ppm_payload` — width ``4 + doc_id % 5``, height
    ``3 + doc_id % 4``, pixel byte ``i`` valued ``(doc_id*31 + i) %
    256`` — so the same SQL oracle computes expected channel means
    independently of BOTH codecs. Each scanline is filter-encoded
    with type ``(doc_id + row) % 5``, so every decode exercises all
    five reconstruction paths; filter choice never changes decoded
    pixels, keeping the oracle arithmetic-only. An ancillary ``tEXt``
    chunk exercises the decoder's skip-with-CRC path.
    """
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sig = b"\x89PNG\r\n\x1a\n"
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                stride = w * 3
                i = np.arange(h * stride, dtype=np.int64)
                pix = ((d * 31 + i) % 256).reshape(h, stride)
                raw = bytearray()
                zeros = np.zeros(stride, dtype=np.int64)
                for r in range(h):
                    recon = pix[r]
                    prior = pix[r - 1] if r > 0 else zeros
                    left = np.concatenate([[0, 0, 0], recon[:-3]])
                    upleft = np.concatenate([[0, 0, 0], prior[:-3]])
                    f = (d + r) % 5
                    if f == 0:
                        filt = recon
                    elif f == 1:
                        filt = recon - left
                    elif f == 2:
                        filt = recon - prior
                    elif f == 3:
                        filt = recon - (left + prior) // 2
                    else:  # vectorized Paeth predictor (encode side
                        # only needs already-known recon rows, so no
                        # sequential dependency)
                        p = left + prior - upleft
                        pa, pb, pc = (
                            np.abs(p - left),
                            np.abs(p - prior),
                            np.abs(p - upleft),
                        )
                        pred = np.where(
                            (pa <= pb) & (pa <= pc),
                            left,
                            np.where(pb <= pc, prior, upleft),
                        )
                        filt = recon - pred
                    raw.append(f)
                    raw += (filt % 256).astype(np.uint8).tobytes()
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(
                    sig
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"tEXt", b"Comment\x00synthetic fixture %d" % d)
                    + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return parallelize_narrow(docs.select("doc_id")).mapInPandas(
        gen, "doc_id bigint, payload binary"
    )


def _make_wav_parser():
    """Build the WAV (RIFF/PCM) parser — the real public audio
    container, stdlib-only: RIFF/WAVE magic, chunk walk with even-byte
    padding per the RIFF spec, ``fmt `` validation (PCM format tag 1,
    16-bit samples, 1–8 channels, coherent block_align/byte_rate),
    ``data`` chunk sliced to its declared length. Factory-nested like
    the image parsers so the decode closure pickles BY VALUE.

    Returns ``parse_wav(buf) -> (n_channels, sample_rate, frames)``
    with ``frames`` an ``(n_frames, n_channels)`` int16 array;
    raises ``ValueError`` on anything malformed (bad magic, missing
    fmt/data, non-PCM, unsupported bit depth, truncated data, a data
    length that is not a whole number of frames). No compression is
    involved, so the declared data length is bounded by the actual
    buffer — no bomb surface."""
    import struct

    def parse_wav(buf: bytes):
        if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(buf):
            ctype = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            end = pos + 8 + length
            if end > len(buf):
                raise ValueError(f"truncated {ctype!r} chunk")
            body = buf[pos + 8 : end]
            if ctype == b"fmt ":
                if length < 16:
                    raise ValueError("fmt chunk too short")
                audio_format, n_ch, rate, byte_rate, block_align, bits = (
                    struct.unpack("<HHIIHH", body[:16])
                )
                if audio_format != 1:
                    raise ValueError(f"unsupported format tag {audio_format} (PCM only)")
                if bits != 16:
                    raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
                if not 1 <= n_ch <= 8:
                    raise ValueError(f"unsupported channel count {n_ch}")
                if block_align != n_ch * 2 or byte_rate != rate * block_align:
                    raise ValueError("incoherent fmt fields")
                if rate == 0:
                    raise ValueError("zero sample rate")
                fmt = (n_ch, rate)
            elif ctype == b"data":
                if fmt is None:
                    raise ValueError("data chunk before fmt")
                data = body
                break  # everything after data is ancillary for stats
            # unknown chunks (LIST, cue, ...) are skipped per spec
            pos = end + (length & 1)  # RIFF pads chunks to even size
        if fmt is None or data is None:
            raise ValueError("missing fmt or data chunk")
        n_ch, rate = fmt
        if len(data) % (n_ch * 2) != 0:
            raise ValueError("data length is not a whole number of frames")
        frames = np.frombuffer(data, dtype="<i2").reshape(-1, n_ch)
        return n_ch, rate, frames

    return parse_wav


def synth_wav_payload(docs: DataFrame) -> DataFrame:
    """Test-data adapter: deterministically synthesize a REAL stereo
    16-bit PCM WAV per doc_id — ``n_frames = 50 + doc_id % 17``,
    ``sample_rate = 8000 + (doc_id % 4) * 4000``, and interleaved
    sample ``j`` (= 2*frame + channel) valued
    ``((doc_id*37 + j) * 131) % 65536 - 32768`` — pinned arithmetic a
    SQL oracle can recompute independently of the parser, exactly like
    the PPM/PNG fixtures. An ancillary LIST chunk before ``data``
    exercises the parser's skip path."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 50 + d % 17
                rate = 8000 + (d % 4) * 4000
                j = np.arange(nf * 2, dtype=np.int64)
                pcm = (((d * 37 + j) * 131) % 65536 - 32768).astype("<i2")
                data = pcm.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
                lst = b"INFOICMT" + struct.pack("<I", 4) + b"fix\x00"
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"LIST" + struct.pack("<I", len(lst)) + lst
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return parallelize_narrow(docs.select("doc_id")).mapInPandas(
        gen, "doc_id bigint, payload binary"
    )


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-payload feature extraction over Arrow batches.

    ``codec='fake'``: deterministic byte statistics (real plumbing,
    fake features) — output schema ``FEATURE_SCHEMA``.

    ``codec='ppm'``: a REAL public codec — binary-PPM (P6) header
    parse + per-channel pixel means via numpy — output schema
    ``PPM_STATS_SCHEMA``; malformed payloads yield ``valid=false``
    rows with NULL stats instead of failing the task (corpus hygiene:
    one corrupt blob must not kill a 100 TB decode pass).

    ``codec='png'``: a REAL COMPRESSED public codec — PNG 8-bit RGB
    via stdlib ``zlib`` inflate + per-scanline filter reconstruction
    (:func:`_make_png_decoder`) — same output schema and same
    corrupt-payload contract as the ppm branch.

    ``codec='wav'``: a REAL AUDIO codec — RIFF/WAVE 16-bit PCM parse
    (:func:`_make_wav_parser`) + per-channel numpy sample means —
    output schema ``WAV_STATS_SCHEMA``, same corrupt-payload contract.

    Any other codec raises — JPEG/video decoders need PIL/ffmpeg,
    absent in this environment.
    """
    if codec == "wav":
        parse_wav = _make_wav_parser()

        def decode_wav_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = {k: [] for k in ("valid", "nc", "rate", "nf", "c0", "c1")}
                for payload in pdf["payload"]:
                    try:
                        if payload is None:
                            raise ValueError("null payload")
                        n_ch, rate, frames = parse_wav(bytes(payload))
                        # a zero-frame data chunk is VALID (means are
                        # NULL, not nan) — mean() over it would warn
                        # and produce nan, so guard before computing
                        means = (
                            frames.mean(axis=0, dtype=np.float64)
                            if len(frames)
                            else None
                        )
                        rows["valid"].append(True)
                        rows["nc"].append(n_ch)
                        rows["rate"].append(rate)
                        rows["nf"].append(len(frames))
                        rows["c0"].append(
                            round(float(means[0]), 6) if means is not None else None
                        )
                        rows["c1"].append(
                            round(float(means[1]), 6)
                            if means is not None and n_ch >= 2
                            else None
                        )
                    except ValueError:
                        rows["valid"].append(False)
                        for k in ("nc", "rate", "nf", "c0", "c1"):
                            rows[k].append(None)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "valid": pd.Series(rows["valid"], dtype="bool"),
                        "n_channels": pd.Series(rows["nc"], dtype="Int32"),
                        "sample_rate": pd.Series(rows["rate"], dtype="Int32"),
                        "n_frames": pd.Series(rows["nf"], dtype="Int64"),
                        "ch0_mean": pd.Series(rows["c0"], dtype="float64"),
                        "ch1_mean": pd.Series(rows["c1"], dtype="float64"),
                    }
                )

        return parallelize_narrow(media.select("doc_id", "payload")).mapInPandas(
            decode_wav_batches, WAV_STATS_SCHEMA
        )
    if codec == "png":
        decode_png = _make_png_decoder()

        def decode_png_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = {k: [] for k in ("valid", "width", "height", "r", "g", "b")}
                for payload in pdf["payload"]:
                    try:
                        if payload is None:
                            raise ValueError("null payload")
                        w, h, pix = decode_png(bytes(payload))
                        means = pix.mean(axis=0, dtype=np.float64)
                        rows["valid"].append(True)
                        rows["width"].append(w)
                        rows["height"].append(h)
                        for c, m in zip(("r", "g", "b"), means):
                            rows[c].append(round(float(m), 6))
                    except ValueError:
                        rows["valid"].append(False)
                        rows["width"].append(None)
                        rows["height"].append(None)
                        for c in ("r", "g", "b"):
                            rows[c].append(None)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "valid": pd.Series(rows["valid"], dtype="bool"),
                        "width": pd.Series(rows["width"], dtype="Int32"),
                        "height": pd.Series(rows["height"], dtype="Int32"),
                        "r_mean": pd.Series(rows["r"], dtype="float64"),
                        "g_mean": pd.Series(rows["g"], dtype="float64"),
                        "b_mean": pd.Series(rows["b"], dtype="float64"),
                    }
                )

        return parallelize_narrow(media.select("doc_id", "payload")).mapInPandas(
            decode_png_batches, PPM_STATS_SCHEMA
        )
    if codec == "ppm":
        parse_ppm_p6 = _make_ppm_parser()

        def decode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = {k: [] for k in ("valid", "width", "height", "r", "g", "b")}
                for payload in pdf["payload"]:
                    try:
                        if payload is None:
                            raise ValueError("null payload")
                        w, h, _maxval, off = parse_ppm_p6(bytes(payload))
                        pix = np.frombuffer(
                            payload, dtype=np.uint8, count=w * h * 3, offset=off
                        ).reshape(-1, 3)
                        means = pix.mean(axis=0, dtype=np.float64)
                        rows["valid"].append(True)
                        rows["width"].append(w)
                        rows["height"].append(h)
                        for c, m in zip(("r", "g", "b"), means):
                            rows[c].append(round(float(m), 6))
                    except ValueError:
                        rows["valid"].append(False)
                        rows["width"].append(None)
                        rows["height"].append(None)
                        for c in ("r", "g", "b"):
                            rows[c].append(None)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "valid": pd.Series(rows["valid"], dtype="bool"),
                        "width": pd.Series(rows["width"], dtype="Int32"),
                        "height": pd.Series(rows["height"], dtype="Int32"),
                        "r_mean": pd.Series(rows["r"], dtype="float64"),
                        "g_mean": pd.Series(rows["g"], dtype="float64"),
                        "b_mean": pd.Series(rows["b"], dtype="float64"),
                    }
                )

        return parallelize_narrow(media.select("doc_id", "payload")).mapInPandas(
            decode_ppm, PPM_STATS_SCHEMA
        )
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: only 'fake' (byte stats), 'ppm' (real P6 "
            "parse), 'png' (real zlib inflate + filter reconstruction), "
            "and 'wav' (real RIFF/PCM parse) run in this environment; "
            "plug PIL/ffmpeg into decode_features here for JPEG/video"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, byte_sum, byte_mean, head_hash = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    # NULL payload → zero-byte features, not a dead
                    # job (np.frombuffer(None) raises TypeError and
                    # aborts the whole task)
                    n_bytes.append(0)
                    byte_sum.append(0)
                    byte_mean.append(0.0)
                    head_hash.append(0)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_bytes.append(len(arr))
                s = int(arr.sum())
                byte_sum.append(s)
                byte_mean.append(float(s) / len(arr) if len(arr) else 0.0)
                h = 0
                for byte in arr[:16]:
                    h = (h * 131 + int(byte)) % (1 << 61)
                head_hash.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "byte_sum": pd.Series(byte_sum, dtype="int64"),
                    "byte_mean": pd.Series(byte_mean, dtype="float64"),
                    "head_hash": pd.Series(head_hash, dtype="int64"),
                }
            )

    return parallelize_narrow(media.select("doc_id", "payload")).mapInPandas(
        featurize, FEATURE_SCHEMA
    )


def multimodal_passthrough(embeddings: DataFrame) -> DataFrame:
    """Array<float> payloads through shuffle + agg intact: group by
    label, carry vector stats — proves nested types survive the
    exchange with Arrow/Tungsten untouched."""
    # NULL elements are SKIPPED, matching the oracle's list_sum
    # semantics — a bare acc+x fold would turn one NULL element into
    # a NULL vec_sum and silently drop the vector from total_sum
    dbl = F.filter(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        lambda x: x.isNotNull(),
    )
    per_row = embeddings.select(
        "label",
        F.size("embedding").alias("n_dims"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
    )
    return per_row.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("n_dims").alias("min_dims"),
        F.max("n_dims").alias("max_dims"),
        F.round(F.sum("vec_sum"), 4).alias("total_sum"),
    )


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every: int = 4
) -> DataFrame:
    """Deterministic frame sampling over binary payloads: treat each
    payload as ``n_frames = floor(n_bytes / frame_bytes)`` fixed-size
    frames, keep every ``every``-th frame index, and slice the frame's
    bytes JVM-side (``substring`` works on BinaryType) — the shape of
    a video key-frame sampler, with the byte-slicing plumbing REAL and
    only the codec absent (the sliced frame goes to md5 here; a real
    pipeline hands it to the decoder).

    Output: (doc_id, frame_idx, frame_md5).

    Scale: narrow map — sequence/explode/substring/md5 in one codegen
    stage, no Python, no shuffle; payload bytes never leave the scan
    stage (only the 16-byte digest flows on).
    """
    if frame_bytes <= 0 or every <= 0:
        # fail at call time, not as an ANSI DIVIDE_BY_ZERO or an
        # illegal-sequence-step task failure mid-job
        raise ValueError(
            f"sample_frames: frame_bytes and every must be positive "
            f"(got frame_bytes={frame_bytes}, every={every})"
        )
    n_frames = F.floor(F.length("payload") / F.lit(frame_bytes)).cast("bigint")
    idx = F.sequence(F.lit(0).cast("bigint"), n_frames - 1, F.lit(every).cast("bigint"))
    base = media.select(
        "doc_id", "payload", F.when(n_frames > 0, idx).otherwise(F.array()).alias("idxs")
    )
    return base.select(
        "doc_id", F.explode("idxs").alias("frame_idx"), "payload"
    ).select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.md5(
            F.expr(f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})")
        ).alias("frame_md5"),
    )
