"""Pure-numpy audio/video container codecs: RIFF WAV (PCM 16-bit) and
YUV4MPEG2 (Y4M) — the uncompressed interchange formats that need no
external library, completing the multimodal story the same way
:mod:`.imagecodec` does for images: ``fake=False`` paths are REAL for
raw formats, and the ffmpeg/codec environment gate applies only to
compressed containers (MP3/AAC/MP4/...), per payload.

Both codecs are exact round-trips (encode∘decode identity), so golden
test values are derived, not approximated.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
Y4M_MAGIC = b"YUV4MPEG2"


# --- WAV (RIFF, PCM 16-bit) ------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 array, shape (n,) mono or (n, channels) -> RIFF WAV PCM."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAV -> (int16 array shape (n, channels), sample_rate).
    PCM 16-bit only; anything compressed (format tag != 1) raises
    NotImplementedError — that is codec-library territory, like MP3."""
    if blob[:4] != WAV_MAGIC or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"WAV chunk {cid!r} declares {size} bytes but only "
                f"{len(body)} present: truncated file"
            )
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _, _, bits = fmt
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV supported (format={tag}, bits={bits}); "
            "compressed audio needs a codec library"
        )
    # a fmt chunk declaring 0 channels is corrupt, not unsupported —
    # validate before the frame-size modulo so it gets the ValueError
    # contract instead of a ZeroDivisionError (ADVICE r7)
    if ch < 1:
        raise ValueError(f"WAV fmt chunk declares {ch} channels: corrupt")
    # strict like the image codecs (which raise on a short raster):
    # a data chunk that is not a whole number of frames is corrupt, and
    # silently truncating it would decode corrupt audio as valid.
    if len(data) % (2 * ch) != 0:
        raise ValueError(
            f"WAV data chunk length {len(data)} is not a multiple of the "
            f"{2 * ch}-byte frame size (16-bit x {ch}ch): corrupt/truncated"
        )
    n = len(data) // (2 * ch)
    arr = np.frombuffer(data, dtype="<i2").reshape(n, ch).copy()
    return arr, rate


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """Deterministic per-clip feature row: [n_samples, channels, rate,
    peak, rms] with amplitudes normalized to [-1, 1]."""
    a = samples.astype(np.float64) / 32768.0
    return [
        float(samples.shape[0]),
        float(samples.shape[1]),
        float(rate),
        float(np.abs(a).max(initial=0.0)),
        float(np.sqrt((a * a).mean())) if a.size else 0.0,
    ]


# --- Y4M (YUV4MPEG2) -------------------------------------------------------

_Y4M_FRAME_SIZES = {
    "420": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420jpeg": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420mpeg2": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420paldv": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "422": lambda w, h: w * h + 2 * ((w + 1) // 2) * h,
    "444": lambda w, h: 3 * w * h,
    "mono": lambda w, h: w * h,
}


def encode_y4m(
    frames: list[bytes], width: int, height: int, colorspace: str = "444",
    fps: str = "25:1",
) -> bytes:
    """Frame byte-planes -> YUV4MPEG2 stream. Frames must each be the
    exact plane size for the colorspace."""
    size = _Y4M_FRAME_SIZES[colorspace](width, height)
    for i, f in enumerate(frames):
        if len(f) != size:
            raise ValueError(f"frame {i}: {len(f)} bytes != {size}")
    head = f"YUV4MPEG2 W{width} H{height} F{fps} Ip A1:1 C{colorspace}\n"
    return head.encode() + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(blob: bytes) -> tuple[list[bytes], dict]:
    """YUV4MPEG2 stream -> (frame byte-planes, header params). Pure
    demux: planes stay opaque bytes (pixel conversion is a separate
    concern, exactly like a real demuxer)."""
    if not blob.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.index(b"\n")
    params: dict = {"C": "420jpeg"}  # Y4M default colorspace
    for tok in blob[len(Y4M_MAGIC) : nl].split():
        params[tok[:1].decode()] = tok[1:].decode()
    w, h = int(params["W"]), int(params["H"])
    cs = params["C"]
    if cs not in _Y4M_FRAME_SIZES:
        raise NotImplementedError(f"Y4M colorspace {cs!r} unsupported")
    size = _Y4M_FRAME_SIZES[cs](w, h)
    frames, pos = [], nl + 1
    while pos < len(blob):
        fnl = blob.index(b"\n", pos)
        if blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        frames.append(blob[fnl + 1 : fnl + 1 + size])
        if len(frames[-1]) != size:
            raise ValueError("truncated Y4M frame")
        pos = fnl + 1 + size
    return frames, params
