"""Pure-NumPy image codecs + perceptual hash for the image+caption table.

The sandbox has no PIL/opencv (SURVEY.md preamble), so the engine ships
small real codecs for formats that are losslessly NumPy-codable:

- ``ppm``    — binary PPM (P6), lossless
- ``bmp``    — 24-bit uncompressed BI_RGB, bottom-up rows, padded, lossless
- ``rawrgb`` — bare ``h*w*3`` RGB bytes, lossless
- ``qoil``   — a deliberately *lossy* stand-in (6-bit/channel quantized raw
  RGB) exercising the PSNR≥40dB per-row invariant from BASELINE.json's
  input_hint (6-bit quantization ⇒ PSNR ≈ 46 dB)

``decode_image`` is the single entry point used by pipeline stages; heavy
real-world decoders (JPEG etc.) would slot in the same actor-pool stage
(see georay/stages/multimodal.py).
"""

from __future__ import annotations

import numpy as np

LOSSLESS_FORMATS = ("ppm", "bmp", "rawrgb")
LOSSY_FORMATS = ("qoil",)
ALL_FORMATS = LOSSLESS_FORMATS + LOSSY_FORMATS


# ------------------------------------------------------------------ encode

def encode_ppm(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pix.astype(np.uint8).tobytes()


def encode_bmp(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    row_size = (3 * w + 3) & ~3
    img_size = row_size * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pix[::-1, :, ::-1].astype(np.uint8)  # bottom-up, BGR
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + rows.tobytes()


def encode_rawrgb(pix: np.ndarray) -> bytes:
    return pix.astype(np.uint8).tobytes()


def encode_qoil(pix: np.ndarray) -> bytes:
    """Lossy: quantize to 6 bits/channel then store raw (marker format)."""
    q = (pix.astype(np.uint8) >> 2) << 2
    return b"QOIL" + q.tobytes()


def encode_image(pix: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(pix)
    if fmt == "bmp":
        return encode_bmp(pix)
    if fmt == "rawrgb":
        return encode_rawrgb(pix)
    if fmt == "qoil":
        return encode_qoil(pix)
    raise ValueError(f"unknown image format {fmt!r}")


# ------------------------------------------------------------------ decode

def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    body = parts[3]
    return np.frombuffer(body, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little")
    h = int.from_bytes(data[22:26], "little")
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=off)
    rows = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # top-down, RGB


def decode_rawrgb(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


def decode_qoil(data: bytes, w: int, h: int) -> np.ndarray:
    if not data.startswith(b"QOIL"):
        raise ValueError("not a QOIL payload")
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=4).reshape(
        h, w, 3
    )


def decode_image(data: bytes, fmt: str, w: int | None = None, h: int | None = None) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "rawrgb":
        return decode_rawrgb(data, w, h)
    if fmt == "qoil":
        return decode_qoil(data, w, h)
    raise ValueError(f"unknown image format {fmt!r}")


# ------------------------------------------------------------------- hash

def phash64(pix: np.ndarray) -> int:
    """Average-hash: mean-pool to 8×8, threshold at the global mean.

    Deterministic in the pixels only, so byte-identical pixel content
    always collides — the property the exact-dedup operator keys on.
    """
    g = pix.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # mean-pool to 8x8 via integral sums over (possibly ragged) blocks
    ys = (np.arange(9) * h // 8).astype(int)
    xs = (np.arange(9) * w // 8).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # int64 range (signed) for parquet friendliness
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n): B @ x applies the DCT."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    b = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    b[0] /= np.sqrt(2.0)
    return b


def _pool_gray(pix: np.ndarray, n: int = 32) -> np.ndarray:
    """Mean-pool the grayscale image to n×n (ragged blocks like phash64)."""
    g = pix.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(n + 1) * h // n).astype(int)
    xs = (np.arange(n + 1) * w // n).astype(int)
    # integral image → arbitrary-rectangle means without Python loops
    ii = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=ii[1:, 1:])
    s = ii[ys][:, xs]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return (s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]) / np.maximum(area, 1)


def dct_phash64(pix: np.ndarray, basis: np.ndarray | None = None) -> int:
    """DCT perceptual hash: 32×32 grayscale pool → 2-D DCT-II → the 8×8
    low-frequency block (DC excluded) thresholded at its median →
    64-bit signature. Robust to resize/noise (unlike the average-hash
    ``phash64``, which keys exact content)."""
    b = basis if basis is not None else _dct_basis(32)
    small = _pool_gray(pix, 32)
    freq = b @ small @ b.T
    block = freq[:8, :8].flatten()
    block[0] = np.median(block)  # neutralize DC so it never votes
    bits = block > np.median(block)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
