"""RTF text-extraction gates (operators/rtf.py, r11): twin round
trips, foreign control-word constructs the twin never emits,
destination skipping, charset/unicode protocols, honest seams, and
the mixed-dispatcher route."""

from __future__ import annotations

import pytest

from datapump_spark.operators.rtf import encode_rtf, extract_rtf_text


def test_round_trip_with_escapes_and_unicode():
    t = ("hello & {braces} \\ backslash\nsecond\twith tab\n"
         "café — über 中文 …\ntrailing spaces  ")
    text, n, flags = extract_rtf_text(encode_rtf(t))
    assert text == t and n == 4 and flags == []
    # empty document and trailing newline survive exactly
    assert extract_rtf_text(encode_rtf(""))[0] == ""
    assert extract_rtf_text(encode_rtf("a\n"))[:2] == ("a\n", 2)


def test_foreign_constructs():
    """Field results kept / instructions skipped, pict skipped, \\uc2
    fallback skipping, \\'hh through the declared code page, raw CRLF
    ignored, \\bin raw-byte skip, group-scoped \\uc restore."""
    b = (b"{\\rtf1\\ansi\\ansicpg1252\\uc2 pre "
         b"{\\field{\\*\\fldinst HYPERLINK x}{\\fldrslt click}}"
         b"{\\pict 0011AABB} mid\\par" + b"\r\n"
         b" \\u20013??after \\'e9 {\\uc1 \\u233?x} tail"
         b"\\bin4 XXXX end}")
    text, n, flags = extract_rtf_text(b)
    assert text == "pre click mid\n 中after \xe9 \xe9x tail end"
    assert n == 2 and flags == []
    # \~ nbsp, \- soft hyphen dropped, special punctuation words
    # (each control word eats its one delimiter space)
    b2 = (b"{\\rtf1 a\\~b\\-c \\emdash\\endash "
          b"\\lquote\\rquote\\ldblquote\\rdblquote.}")
    text, _, _ = extract_rtf_text(b2)
    assert text == "a\xa0bc —–‘’“”."


def test_table_flattening_and_structure_words():
    b = (b"{\\rtf1 r1c1\\cell r1c2\\cell\\row r2c1\\cell r2c2\\cell"
         b"\\row after\\sect done}")
    text, _, _ = extract_rtf_text(b)
    assert text == "r1c1\tr1c2\t\nr2c1\tr2c2\t\nafter\ndone"


def test_charset_and_flags():
    # cp1251 Cyrillic through \'hh
    b = b"{\\rtf1\\ansicpg1251 \\'e4\\'e0}"
    text, _, flags = extract_rtf_text(b)
    assert text == "да" and flags == []
    # unknown code page falls back with a flag
    _, _, flags = extract_rtf_text(b"{\\rtf1\\ansicpg99999 x}")
    assert flags == ["unknown_charset"]


def test_honest_seams():
    with pytest.raises(ValueError, match="not an RTF"):
        extract_rtf_text(b"plain text, no header")
    # unbalanced groups do not crash (best-effort text)
    text, _, _ = extract_rtf_text(b"{\\rtf1 {\\b bold open")
    assert "bold open" in text


def test_document_text_kind_rtf(spark):
    from datapump_spark.operators.docx import document_text
    df = spark.createDataFrame(
        [(1, encode_rtf("one\ntwo"))], "media_id long, payload binary")
    row = document_text(df).collect()[0]
    assert row["kind"] == "rtf" and row["n_units"] == 2
    assert row["text"] == "one\ntwo"
