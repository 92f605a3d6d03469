"""Pure-stdlib media codecs: real PNG and WAV/PCM decode (and the
matching encoders used to build deterministic fixtures) — no
PIL/soundfile/ffmpeg anywhere.

This converts the multimodal `decoder="real"` path from a blanket
NotImplementedError into a working decode for the two formats the
Python standard library can fully parse:

  * PNG — chunk walk (IHDR/IDAT/IEND), zlib inflate, scanline
    UN-filtering (all five filter types: None/Sub/Up/Average/Paeth),
    8-bit gray / gray+alpha / RGB / RGBA, non-interlaced. Output:
    dimensions + channel count + the pixel matrix.
  * WAV — RIFF header via the stdlib `wave` module, 16-bit PCM frames
    to an int16 sample array. Output: sample rate + channels +
    duration + the sample matrix.

Formats that genuinely need codec libraries (JPEG, MP3, MP4, ...)
still raise NotImplementedError at the dispatch point — the honest
capability boundary, now narrowed to where the container truly cannot
go.

Encoders write filter-0 PNG scanlines and plain PCM WAV, so an
encode→decode roundtrip is byte-deterministic: the media_decode oracle
(__spark_entry__) predicts every decoded value (dims, duration,
channel means) arithmetically in SQL from the generation formula.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> channels


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def png_encode(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0 per scanline. pixels is
    (h, w) gray or (h, w, c) with c in {1, 2, 3, 4}."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """-> (width, height, channels, pixels[h, w, c] uint8). Supports
    8-bit depth, colortypes 0/2/4/6, non-interlaced — everything the
    filter-0 encoder above emits plus filtered output from other
    writers. Filters Sub/Average/Paeth carry a left-pixel dependency,
    so those rows decode with a per-byte loop — fine for fixtures and
    metadata extraction; bulk image work belongs to a codec library."""
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(PNG_SIG), None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8 or colortype not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={colortype} interlace={interlace}: "
            "only 8-bit non-interlaced gray/GA/RGB/RGBA supported"
        )
    c = _PNG_CHANNELS[colortype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorized, no left dependency
            row = bytearray(
                (np.frombuffer(bytes(row), np.uint8) + prior).astype(np.uint8).tobytes()
            )
        elif ftype in (1, 3, 4):
            for i in range(stride):
                left = row[i - c] if i >= c else 0
                up = int(prior[i])
                ul = int(out[y - 1][i - c]) if (y > 0 and i >= c) else 0
                if ftype == 1:
                    row[i] = (row[i] + left) & 0xFF
                elif ftype == 3:
                    row[i] = (row[i] + (left + up) // 2) & 0xFF
                else:
                    row[i] = (row[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), np.uint8)
    return w, h, c, out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """16-bit PCM WAV. samples is (n,) mono or (n, ch) int16."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """-> (framerate, channels, samples[n, ch] int16). 16-bit PCM."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sampwidth={wf.getsampwidth()}: only 16-bit PCM supported"
            )
        ch = wf.getnchannels()
        fr = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return fr, ch, np.frombuffer(frames, dtype=np.int16).reshape(-1, ch)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def sniff(payload: bytes) -> str:
    """Container detection by magic bytes (the only honest signal —
    the `mime` metadata column is caller-supplied and may lie)."""
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_meta(payload: bytes) -> dict:
    """Real metadata + content stats for the formats the stdlib can
    decode; NotImplementedError (with the format named) for the rest.

    Returns keys: fmt, width, height, n_channels, n_samples,
    framerate, duration_ms, value_mean, value_min, value_max —
    image-only / audio-only fields are None on the other kind."""
    fmt = sniff(payload)
    if fmt == "png":
        w, h, c, px = png_decode(payload)
        flat = px.astype(np.float64)
        return {
            "fmt": fmt, "width": w, "height": h, "n_channels": c,
            "n_samples": None, "framerate": None, "duration_ms": None,
            "value_mean": float(flat.mean()),
            "value_min": int(px.min()), "value_max": int(px.max()),
        }
    if fmt == "wav":
        fr, ch, s = wav_decode(payload)
        return {
            "fmt": fmt, "width": None, "height": None, "n_channels": ch,
            "n_samples": int(s.shape[0]), "framerate": fr,
            "duration_ms": int(s.shape[0] * 1000 // fr),
            "value_mean": float(s.astype(np.float64).mean()),
            "value_min": int(s.min()), "value_max": int(s.max()),
        }
    raise NotImplementedError(
        f"format {fmt!r}: needs a codec library (PIL/ffmpeg) not in this "
        "container; stdlib-decodable formats are png and 16-bit pcm wav"
    )


def real_feature_kernel(payload: bytes, dim: int = 16) -> np.ndarray:
    """Drop-in kernel for multimodal.extract_features(decoder='real'):
    a real decoded-content feature vector for png/wav —
    [kind_flag, dims/rate, mean, std, min, max, energy, zero-cross...]
    padded/truncated to `dim`. Unsupported formats raise (capability
    boundary), exactly like decode_meta."""
    fmt = sniff(payload)
    if fmt == "png":
        w, h, c, px = png_decode(payload)
        flat = px.astype(np.float64).ravel()
        vals = [1.0, float(w), float(h), float(c), flat.mean(), flat.std(),
                float(flat.min()), float(flat.max())]
    elif fmt == "wav":
        fr, ch, s = wav_decode(payload)
        flat = s.astype(np.float64).ravel()
        zc = float(np.count_nonzero(np.diff(np.signbit(flat)))) if len(flat) > 1 else 0.0
        vals = [2.0, float(fr), float(ch), float(len(s)), flat.mean(), flat.std(),
                np.sqrt((flat ** 2).mean()), zc]
    else:
        raise NotImplementedError(
            f"format {fmt!r}: needs a codec library (PIL/ffmpeg) not in "
            "this container"
        )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(vals))] = np.asarray(vals[:dim], dtype=np.float32)
    return out
