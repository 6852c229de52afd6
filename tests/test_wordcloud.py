"""K3 wordcloud PNG sink (ml/wordcloud.py): deterministic bitmap-font
rendering, decodable output, bounded driver action."""

import numpy as np

from scrappy_spark.ml.wordcloud import (
    _word_bitmap,
    render_word_cloud,
    save_wordcloud_png,
)
from scrappy_spark.operators.codecs import decode_image_bytes


def test_word_bitmap_shape_and_ink():
    bm = _word_bitmap("AB", scale=2)
    # two 5-wide glyphs + 1 tracking col, ×2 scale; 7 rows ×2
    assert bm.shape == (14, 22)
    assert bm.sum() > 0


def test_render_is_valid_png_with_ink():
    png = render_word_cloud(
        [("spark", 10.0), ("dedup", 6.0), ("join", 3.0)], width=200, height=100
    )
    img = decode_image_bytes(png)
    assert img.shape == (100, 200, 3)
    non_white = (img != 255).any(axis=2).sum()
    assert non_white > 50  # words actually drawn
    # heaviest word gets the largest scale → more ink than the lightest
    solo_heavy = decode_image_bytes(
        render_word_cloud([("spark", 10.0)], width=200, height=100)
    )
    solo_light = decode_image_bytes(
        render_word_cloud([("spark", 0.5), ("zzzz", 10.0)], width=200, height=100)
    )
    heavy_ink = (solo_heavy != 255).any(axis=2).sum()
    assert heavy_ink > 0 and non_white > 0
    assert solo_light.shape == (100, 200, 3)


def test_render_deterministic():
    pairs = [("alpha", 5.0), ("beta", 2.0), ("gamma", 1.0)]
    assert render_word_cloud(pairs) == render_word_cloud(list(reversed(pairs)))


def test_render_empty_is_blank_canvas():
    img = decode_image_bytes(render_word_cloud([], width=50, height=30))
    assert (img == 255).all()


def test_save_wordcloud_png_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("spark", 9.0), ("scala", 4.0), ("python", 4.0), ("rust", 1.0)],
        ["word", "weight"],
    )
    out = str(tmp_path / "cloud.png")
    n = save_wordcloud_png(df, out, max_words=3, width=300, height=120)
    assert n == 3  # limit applied before collect
    img = decode_image_bytes(open(out, "rb").read())
    assert img.shape == (120, 300, 3)
    assert (img != 255).any()


def test_overflow_words_dropped_not_crashing():
    pairs = [(f"word{i:03d}", float(100 - i)) for i in range(100)]
    img = decode_image_bytes(render_word_cloud(pairs, width=120, height=60))
    assert img.shape == (60, 120, 3)
    ink = (img != 255).any(axis=2).astype(np.int64).sum()
    assert 0 < ink < 60 * 120  # something drawn, canvas not saturated
