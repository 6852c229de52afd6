"""K3 image sink: render word weights to a PNG word cloud.

Reference parity: ``scrappy.py:507-526`` (``generate_wordcloud``) sums
c-TF-IDF weights per word and renders via the ``wordcloud`` +
matplotlib libraries. Neither is in this container — and neither is
needed: the engine renders with an embedded public-shape 5×7 bitmap
font, scaled per word weight, shelf-packed rows on a white background,
and encodes the image with the dependency-free PNG encoder in
``operators/codecs.py``. The layout is fully deterministic (sorted by
weight desc then word; colors hashed from the word), so the sink is
testable byte-for-byte.

Scale note: the cloud renders the TOP-N words (default 100) of a
weights DataFrame — the ``orderBy().limit()`` runs distributed and
only the N winners reach the driver, the same bounded-action shape as
every other report sink here. The image is a driver-side artifact by
nature; the data-parallel part (c-TF-IDF weight aggregation) lives in
``ml/taxonomy.py::wordcloud_weights``.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame, functions as F

# 5×7 glyphs, 7 rows of 5 bits each (MSB = leftmost pixel). Lowercase
# maps to uppercase; unknown characters render as space.
_GLYPHS: dict[str, tuple[int, ...]] = {
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b11011, 0b10001),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00110, 0b01000, 0b10000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    "-": (0b00000, 0b00000, 0b00000, 0b11111, 0b00000, 0b00000, 0b00000),
    "_": (0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b11111),
    ".": (0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b01100, 0b01100),
    "+": (0b00000, 0b00100, 0b00100, 0b11111, 0b00100, 0b00100, 0b00000),
    "/": (0b00000, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b00000),
    "(": (0b00010, 0b00100, 0b01000, 0b01000, 0b01000, 0b00100, 0b00010),
    ")": (0b01000, 0b00100, 0b00010, 0b00010, 0b00010, 0b00100, 0b01000),
    ",": (0b00000, 0b00000, 0b00000, 0b00000, 0b01100, 0b00100, 0b01000),
    ":": (0b00000, 0b01100, 0b01100, 0b00000, 0b01100, 0b01100, 0b00000),
    " ": (0, 0, 0, 0, 0, 0, 0),
}

GLYPH_W, GLYPH_H, TRACKING = 5, 7, 1

#: dark, white-background-legible palette; word → color by md5 so the
#: assignment is stable across runs and processes (no hash-seed drift)
_PALETTE = np.array(
    [
        (27, 94, 32),
        (13, 71, 161),
        (136, 14, 79),
        (69, 39, 160),
        (183, 28, 28),
        (0, 105, 92),
        (230, 81, 0),
        (38, 50, 56),
    ],
    dtype=np.uint8,
)


def _glyph_array(ch: str) -> np.ndarray:
    rows = _GLYPHS.get(ch.upper(), _GLYPHS[" "])
    return np.array(
        [[(r >> (GLYPH_W - 1 - x)) & 1 for x in range(GLYPH_W)] for r in rows],
        dtype=np.uint8,
    )


def _word_bitmap(word: str, scale: int) -> np.ndarray:
    cells = [_glyph_array(c) for c in word]
    spaced = []
    for i, g in enumerate(cells):
        spaced.append(g)
        if i < len(cells) - 1:
            spaced.append(np.zeros((GLYPH_H, TRACKING), dtype=np.uint8))
    mask = np.hstack(spaced) if spaced else np.zeros((GLYPH_H, 0), dtype=np.uint8)
    return np.kron(mask, np.ones((scale, scale), dtype=np.uint8))


def _color(word: str) -> np.ndarray:
    h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "big")
    return _PALETTE[h % len(_PALETTE)]


def _render(
    weights: list[tuple[str, float]],
    width: int,
    height: int,
    min_scale: int,
    max_scale: int,
    pad: int,
) -> tuple[np.ndarray, int]:
    """Shelf-pack words onto a white canvas; returns (canvas, n_drawn).
    Words too wide for the canvas are skipped and packing stops when a
    shelf would overflow the bottom, so n_drawn ≤ len(weights)."""
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    drawn = 0
    if weights:
        wmax = max(w for _, w in weights) or 1.0
        x = y = pad
        row_h = 0
        for word, w in sorted(weights, key=lambda t: (-t[1], t[0])):
            frac = max(float(w), 0.0) / wmax
            scale = max(min_scale, round(max_scale * np.sqrt(frac)))
            bm = _word_bitmap(word, scale)
            bh, bw = bm.shape
            if bw > width - 2 * pad:
                continue
            if x + bw > width - pad:  # next shelf
                x, y = pad, y + row_h + pad
                row_h = 0
            if y + bh > height - pad:
                break
            region = canvas[y : y + bh, x : x + bw]
            region[bm == 1] = _color(word)
            x += bw + 2 * pad
            row_h = max(row_h, bh)
            drawn += 1
    return canvas, drawn


def render_word_cloud(
    weights: list[tuple[str, float]],
    width: int = 800,
    height: int = 400,
    min_scale: int = 1,
    max_scale: int = 6,
    pad: int = 3,
) -> bytes:
    """(word, weight) pairs → PNG bytes. Font scale ∝ sqrt(weight /
    max_weight) (area ∝ weight, the word-cloud convention); words are
    shelf-packed in weight order and words that no longer fit are
    dropped — same behavior as the reference renderer at a full canvas."""
    from ..operators.codecs import encode_png

    canvas, _ = _render(weights, width, height, min_scale, max_scale, pad)
    return encode_png(canvas)


def save_wordcloud_png(
    weights_df: DataFrame,
    path: str,
    word_col: str = "word",
    weight_col: str = "weight",
    max_words: int = 100,
    width: int = 800,
    height: int = 400,
) -> int:
    """Render the top-``max_words`` of a (word, weight) DataFrame to a
    PNG file. The top-N selection runs distributed; only N rows reach
    the driver (bounded action). Returns the number of words ACTUALLY
    drawn — canvas overflow drops words, so this can be smaller than
    ``max_words``."""
    from ..operators.codecs import encode_png

    top = (
        weights_df.select(
            F.col(word_col).alias("word"), F.col(weight_col).cast("double").alias("weight")
        )
        .orderBy(F.desc("weight"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    pairs = [(r.word, r.weight) for r in top]
    canvas, drawn = _render(pairs, width, height, min_scale=1, max_scale=6, pad=3)
    with open(path, "wb") as f:
        f.write(encode_png(canvas))
    return drawn
