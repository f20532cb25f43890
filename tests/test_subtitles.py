"""SRT/WebVTT cue parsing gates (operators/subtitles.py, round 9):
zero-Python block/arrow/body decomposition, format quirks, plan
assertion."""

from __future__ import annotations

import pytest

from datapump_spark.operators.subtitles import (
    format_srt,
    format_vtt,
    parse_subtitles,
)

CUES = [(0, 900, "hello there"),
        (1500, 2500, "two\nlines"),
        (3_700_000, 3_700_900, "over an hour")]


def _parse(spark, text, doc_id=1):
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    return sorted(parse_subtitles(df).collect(), key=lambda r: r["cue_idx"])


def test_srt_roundtrip(spark):
    rows = _parse(spark, format_srt(CUES))
    assert [(r["cue_idx"], r["start_ms"], r["end_ms"], r["cue_text"])
            for r in rows] == [
        (0, 0, 900, "hello there"),
        (1, 1500, 2500, "two\nlines"),
        (2, 3_700_000, 3_700_900, "over an hour")]


def test_vtt_roundtrip_with_header_and_settings(spark):
    """The WEBVTT header block has no arrow (dropped), cue settings
    after the target are ignored, dot millis parse."""
    rows = _parse(spark, format_vtt(CUES))
    assert [(r["start_ms"], r["end_ms"]) for r in rows] == [
        (0, 900), (1500, 2500), (3_700_000, 3_700_900)]
    assert rows[1]["cue_text"] == "two\nlines"


def test_vtt_short_form_and_note_blocks(spark):
    text = ("WEBVTT\n\nNOTE this is a comment\nspanning lines\n\n"
            "02:03.500 --> 02:04.000\nshort-form hours omitted\n\n"
            "STYLE\n::cue { color: lime }\n\n"
            "00:05.000 --> 00:06.250 align:end\nlast cue")
    rows = _parse(spark, text)
    assert [(r["cue_idx"], r["start_ms"], r["end_ms"]) for r in rows] == [
        (0, 123500, 124000), (1, 5000, 6250)]
    assert rows[1]["cue_text"] == "last cue"


def test_crlf_and_empty(spark):
    crlf = format_srt(CUES[:2]).replace("\n", "\r\n")
    rows = _parse(spark, crlf)
    assert len(rows) == 2 and rows[0]["cue_text"].strip() == "hello there"
    assert _parse(spark, "no cues here at all") == []


def test_zero_python_plan(spark):
    """The parser must stay whole-stage codegen: no Python evals in
    the plan (the 100 TB transcript-scan property)."""
    df = spark.createDataFrame([(1, format_srt(CUES))],
                               "doc_id long, text string")
    plan = parse_subtitles(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_hours_beyond_two_digits(spark):
    """ADVICE r9: WebVTT allows 2+ digit hours (>99h transcripts
    exist); '100:00:00.000' used to match a SHIFTED substring that
    silently dropped the leading hour digit."""
    text = ("WEBVTT\n\n100:00:00.000 --> 100:00:01.500\nlate cue\n\n"
            "1000:02:03.004 --> 1000:02:04.000\nlater still\n")
    rows = _parse(spark, text)
    assert len(rows) == 2
    assert rows[0]["start_ms"] == 100 * 3_600_000
    assert rows[0]["end_ms"] == 100 * 3_600_000 + 1500
    assert rows[1]["start_ms"] == (1000 * 3600 + 2 * 60 + 3) * 1000 + 4


def _parse_ass(spark, text):
    from datapump_spark.operators.subtitles import parse_ass
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(parse_ass(df).collect(), key=lambda r: r["cue_idx"])


def test_ass_roundtrip_and_ssa(spark):
    """r12: ASS/SSA dialogue lines — centisecond stamps, commas in
    the text field (limit-10 split), \\N line breaks, Comment:/style
    lines dropped; SSA v4 (Marked=0) parses identically."""
    from datapump_spark.operators.subtitles import format_ass
    cues = [(1500, 2400, "hello, with comma"),
            (3000, 4210, "two\nlines, both"),
            (3_600_000 + 90_000, 3_600_000 + 91_500, "an hour in")]
    for ssa in (False, True):
        rows = _parse_ass(spark, format_ass(cues, ssa=ssa))
        assert [(r["start_ms"], r["end_ms"], r["cue_text"])
                for r in rows] == cues, ssa


def test_ass_override_tags_and_soft_breaks(spark):
    text = ("[Events]\n"
            "Format: Layer, Start, End, Style, Name, MarginL, "
            "MarginR, MarginV, Effect, Text\n"
            "Dialogue: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,"
            "{\\i1}styled{\\i0} and\\nsoft\\hbreak\n"
            "Comment: 0,0:00:03.00,0:00:04.00,Default,,0,0,0,,nope\n")
    rows = _parse_ass(spark, text)
    assert len(rows) == 1
    assert rows[0]["cue_text"] == "styled and\nsoft break"
    assert rows[0]["start_ms"] == 1000 and rows[0]["end_ms"] == 2000


def test_ass_zero_python_plan(spark):
    from datapump_spark.operators.subtitles import parse_ass
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = parse_ass(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
