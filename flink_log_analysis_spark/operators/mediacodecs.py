"""Pure-stdlib media codecs: uncompressed 24-bit BMP and PCM WAV.

Deliberately self-contained (stdlib imports only, no package-relative
imports): the mapInPandas closures in ``multimodal.py`` register this
module pickle-by-value, so executors receive the codec SOURCE inside
the serialized task and never need the package importable on the
worker's PYTHONPATH — the same portability contract the fake-path
closures keep by construction.

Formats beyond these (PNG/JPEG/MP3/video) raise NotImplementedError at
the exact call site a pillow/librosa/ffmpeg call would occupy.
"""

from __future__ import annotations


def decode_bmp(buf: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse an uncompressed 24-bit BMP into (width, height, rows of
    (r, g, b)) with pure stdlib ``struct`` — no pillow required.

    Handles both bottom-up (positive height, the common case) and
    top-down BMPs, and the 4-byte row padding the format mandates.
    Anything else (other bit depths, RLE compression) raises
    NotImplementedError: that is pillow territory.
    """
    import struct

    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: only uncompressed "
            "24-bit is stdlib-decodable; others need pillow"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        src = (h - 1 - r) if bottom_up else r
        off = data_offset + src * row_size
        row = []
        for c in range(w):
            b_, g_, r_ = buf[off + c * 3 : off + c * 3 + 3]
            row.append((r_, g_, b_))
        rows.append(row)
    return w, h, rows


def encode_bmp(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Inverse of :func:`decode_bmp`: (r, g, b) rows -> a valid
    bottom-up uncompressed 24-bit BMP."""
    import struct

    h = len(rows)
    w = len(rows[0]) if h else 0
    row_size = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(
        b"".join(bytes((b_, g_, r_)) for r_, g_, b_ in row) + pad
        for row in reversed(rows)
    )
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def decode_wav(buf: bytes) -> tuple[int, int, list[int]]:
    """Parse a PCM WAV into (sample_rate, n_channels, samples) with the
    stdlib ``wave`` module. Compressed audio needs librosa/ffmpeg."""
    import io
    import wave

    with wave.open(io.BytesIO(buf)) as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    samples = [
        int.from_bytes(raw[i : i + width], "little", signed=width > 1)
        for i in range(0, len(raw), width)
    ]
    return rate, nch, samples


def real_media_features(buf: bytes, feature_dim: int) -> list[float]:
    """Real per-payload feature vector for stdlib-decodable media.

    BMP: mean pixel intensity (0-1) over ``feature_dim`` horizontal
    stripes of the decoded image. WAV: mean |amplitude| (0-1, peak
    normalized) over ``feature_dim`` stripes of the decoded samples.
    The vector shape is identical to the fake path's, so downstream
    schemas don't care which codec produced it.
    """
    if buf[:2] == b"BM":
        _, _, rows = decode_bmp(buf)
        lum = [(r_ + g_ + b_) / 3.0 for row in rows for (r_, g_, b_) in row]
    elif buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        _, _, samples = decode_wav(buf)
        peak = 1.0
        if samples:
            peak = float(max(1, max(abs(s) for s in samples)))
        lum = [abs(s) / peak * 255.0 for s in samples] or [0.0]
    else:
        raise NotImplementedError(
            "real decode for this format needs pillow/librosa; "
            "stdlib handles uncompressed BMP and PCM WAV"
        )
    n = len(lum)
    stripe = max(n // feature_dim, 1)
    out = []
    for i in range(feature_dim):
        chunk = lum[i * stripe : (i + 1) * stripe] or [0.0]
        out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return out


def encode_wav(samples: list[int], rate: int = 8000) -> bytes:
    """Write 16-bit mono PCM WAV bytes with the stdlib ``wave`` module
    (standard 44-byte header + 2 bytes per sample)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()
