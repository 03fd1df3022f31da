"""Pure-numpy image codec: real decode/encode for the UNCOMPRESSED
raster formats (PPM P6, 24-bit BI_RGB BMP) plus nearest-neighbor
resize.

This exists so the multimodal pipeline's ``fake=False`` paths are REAL
for the formats that need no external library — raw-raster interchange
is exactly what large ingest pipelines normalize compressed images into
before feature extraction. Compressed formats (JPEG/PNG) still require
PIL/cv2 and stay behind the honest environment gate in multimodal.py;
the gate now triggers per-payload by magic-byte sniffing instead of
unconditionally.

Both codecs are exact round-trips (encode∘decode == identity on uint8
HxWx3 arrays — property-tested), so golden values in tests are derived,
not approximated.
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MAGIC = b"P6"
BMP_MAGIC = b"BM"


def sniff(blob: bytes) -> str | None:
    """'ppm' | 'bmp' | None (unknown / compressed format)."""
    if blob[:2] == PPM_MAGIC and (len(blob) > 2 and blob[2:3].isspace()):
        return "ppm"
    if blob[:2] == BMP_MAGIC:
        return "bmp"
    return None


# --- PPM (P6, maxval 255) --------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 HxWx3 array -> binary PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 HxWx3. Handles whitespace runs and
    ``#`` comments in the header per the netpbm spec."""
    if blob[:2] != PPM_MAGIC:
        raise ValueError("not a P6 PPM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(blob[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates header from raster
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} != 255")
    need = w * h * 3
    raster = blob[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster short: {len(raster)} != {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


# --- BMP (24-bit, BI_RGB, V3 header) ---------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 HxWx3 (RGB) -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4-byte multiples)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3, got {a.shape}")
    h, w = a.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr_bottom_up = a[::-1, :, ::-1]  # flip rows, RGB->BGR
    rows = bgr_bottom_up.reshape(h, row_bytes)
    padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    padded[:, :row_bytes] = rows
    raster = padded.tobytes()
    file_size = 14 + 40 + len(raster)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_header + info_header + raster


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 HxWx3 (RGB). Supports bottom-up
    (height > 0) and top-down (height < 0) row order; anything
    compressed or non-24bpp raises NotImplementedError (that is PIL
    territory, like JPEG)."""
    if blob[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", blob, 0)
    header_size, w, h = struct.unpack_from("<Iii", blob, 14)
    if header_size < 40:
        raise NotImplementedError(f"BMP header size {header_size} < 40")
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = stride * h
    raster = blob[data_offset : data_offset + need]
    if len(raster) != need:
        raise ValueError(f"BMP raster short: {len(raster)} != {need}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[
        :, :row_bytes
    ]
    img = rows.reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


# --- shared ops ------------------------------------------------------------


def decode_image(blob: bytes) -> np.ndarray:
    """Decode a supported raster payload; NotImplementedError for
    compressed/unknown formats (the PIL/cv2 gate). The payload is
    materialized to ``bytes`` exactly once — callers may pass
    memoryview/bytearray without paying per-call copies in the
    payload-linear mapInPandas hot path."""
    blob = blob if isinstance(blob, bytes) else bytes(blob)
    kind = sniff(blob)
    if kind == "ppm":
        return decode_ppm(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    raise NotImplementedError(
        "payload is not an uncompressed PPM/BMP raster; compressed "
        "formats (JPEG/PNG/...) require PIL/cv2, absent from this "
        "container"
    )


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index mapping — the deterministic,
    library-free resampler (sample k maps to floor((k+0.5)*in/out), the
    standard pixel-center rule)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
    return arr[rows][:, cols]


def image_features(arr: np.ndarray) -> list[float]:
    """Deterministic per-image feature row: [height, width, mean_R,
    mean_G, mean_B] — the decode-real replacement for the byte-histogram
    stand-in."""
    h, w = arr.shape[:2]
    means = arr.reshape(-1, 3).mean(axis=0)
    return [float(h), float(w)] + [float(m) for m in means]
