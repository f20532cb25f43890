"""Property-based round-trip tests for the stdlib codecs (hypothesis).

The example-based tests in test_codecs.py pin known shapes; these
generate arbitrary dimensions/channel counts/sample data and assert the
encode→decode round trip is the identity — the property the oracle query
(q_image_decode) relies on transitively.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datapump_spark.operators.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    resize_nearest,
)

# bounded sizes: the property is structural, not a load test
_DIMS = st.integers(min_value=1, max_value=40)


@settings(max_examples=25, deadline=None)
@given(h=_DIMS, w=_DIMS, c=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_any_shape(h, w, c, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=25, deadline=None)
@given(h=_DIMS, w=_DIMS, seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_any_shape(h, w, seed):
    # w sweeps every row-padding residue (w*3 mod 4)
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 2000), ch=st.sampled_from([1, 2]),
       sr=st.sampled_from([4000, 8000, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_within_quantization(n, ch, sr, seed):
    s = np.random.default_rng(seed).uniform(-1.0, 1.0, (n, ch))
    out, got_sr = decode_wav(encode_wav(s, sr))
    assert got_sr == sr and out.shape == (n, ch)
    # 16-bit PCM error: half an LSB of rounding plus the 32767-encode /
    # 32768-decode scale asymmetry (|s|/32768), elementwise
    assert (np.abs(out - s) <= (np.abs(s) + 0.51) / 32768).all()


@settings(max_examples=25, deadline=None)
@given(h=_DIMS, w=_DIMS, nh=_DIMS, nw=_DIMS, seed=st.integers(0, 2**31 - 1))
def test_resize_samples_only_real_pixels(h, w, nh, nw, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    out = resize_nearest(img, nw, nh)
    assert out.shape == (nh, nw, 3)
    # nearest-neighbor invents nothing: every output value exists in input
    assert set(np.unique(out)) <= set(np.unique(img))
    # identity resize is exact
    assert (resize_nearest(img, w, h) == img).all()


@settings(max_examples=20, deadline=None)
@given(h=_DIMS, w=_DIMS, seed=st.integers(0, 2**31 - 1),
       interlace=st.booleans())
def test_gif_roundtrip_any_shape(h, w, seed, interlace):
    """GIF is palette-exact: any ≤256-color image round-trips to
    identity, interlaced or not, at every LZW code-width residue."""
    from datapump_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    n_colors = int(rng.integers(1, 257))
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, (h, w))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=15, deadline=None)
@given(h=_DIMS, w=_DIMS, seed=st.integers(0, 2**31 - 1),
       quality=st.sampled_from([50, 75, 95]),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_roundtrip_shape_and_bounded_error(h, w, seed, quality, sub):
    """JPEG is lossy: the property is shape preservation plus an error
    bound that holds for ANY input at the given quality (worst case is
    white noise; 255 would mean the pipeline lost the image)."""
    from datapump_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # bounds calibrated from a 1050-case sweep of worst measured error
    # per (quality, sub): 444 -> 51.9/36.3/7.2 at q50/75/95; 420 ->
    # 72.4/73.2/71.7 (chroma subsampling of random noise dominates, so
    # 420's worst case is quality-independent). ~30% margin over worst:
    # the property is "never lost the image"
    bound = {"444": {50: 68, 75: 48, 95: 12},
             "420": {50: 95, 75: 95, 95: 95}}[sub][quality]
    assert err < bound, err


@settings(max_examples=15, deadline=None)
@given(v=st.integers(0, 255), h=_DIMS, w=_DIMS)
def test_jpeg_solid_grayscale_q95_is_exact(v, h, w):
    """The exactness property q_jpeg_decode's oracle rests on, for
    arbitrary dims (not just the 256 fixed-size cases in test_jpeg)."""
    from datapump_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.full((h, w), v, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (out[:, :, 0] == v).all()


# ---------------------------------------------------------------------------
# r11 document-format round trips: every writer twin must reproduce
# arbitrary printable multi-line text EXACTLY through its extractor.
# ---------------------------------------------------------------------------

_DOC_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FFF,
                           blacklist_characters="\x7f"),
    max_size=400).map(lambda s: s.replace("\r", " "))


@settings(max_examples=25, deadline=None)
@given(t=_DOC_TEXT, nl=st.integers(0, 6))
def test_document_twins_round_trip_any_text(t, nl):
    import re as _re

    from datapump_spark.operators.doc import encode_doc, extract_doc_text
    from datapump_spark.operators.doc import encode_ppt, extract_ppt_text
    from datapump_spark.operators.docx import (encode_docx, encode_epub,
                                               encode_pptx,
                                               extract_docx_text,
                                               extract_epub_text,
                                               extract_pptx_text)
    from datapump_spark.operators.rtf import encode_rtf, extract_rtf_text

    # sprinkle newlines deterministically
    parts = t.split(" ") if t else [""]
    step = max(1, len(parts) // (nl + 1))
    text = "\n".join(" ".join(parts[i:i + step])
                     for i in range(0, len(parts), step)) if t else ""
    pairs = [(encode_docx, extract_docx_text),
             (encode_epub, extract_epub_text),
             (encode_pptx, extract_pptx_text),
             (encode_rtf, extract_rtf_text),
             (encode_ppt, extract_ppt_text)]
    for enc, dec in pairs:
        got = dec(enc(text))[0]
        assert got == text, (enc.__name__, got[:80], text[:80])
    # .doc: control chars < 0x20 are structural in Word — keep the
    # printable projection for its check
    doc_text = _re.sub(r"[\x00-\x09\x0b-\x1f]", "", text)
    assert extract_doc_text(encode_doc(doc_text))[0] == doc_text


@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.lists(st.one_of(st.integers(-10**6, 10**6),
                       st.floats(allow_nan=False, allow_infinity=False,
                                 width=32),
                       st.booleans(),
                       st.text(max_size=12)),
             min_size=1, max_size=5),
    min_size=1, max_size=10))
def test_xls_twin_round_trips_any_rows(rows):
    from datapump_spark.sources.xls import encode_xls, iter_xls_cells
    got = {(r, c): v for _, r, c, v, _ in
           iter_xls_cells(encode_xls(rows))}
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                want = "TRUE" if v else "FALSE"
            elif isinstance(v, (int, float)):
                fv = float(v)
                want = (str(int(fv))
                        if fv == int(fv) and abs(fv) < 1e15
                        else repr(fv))
            else:
                want = str(v)
            assert got.get((r, c), "") == want or \
                (want == "" and (r, c) not in got), (r, c, v)
