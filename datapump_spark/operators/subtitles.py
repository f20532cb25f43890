"""SRT / WebVTT subtitle cue parsing — pure whole-stage codegen
(round 9).

Subtitles and caption tracks are the text side of a video training
corpus (transcript alignment, caption-quality filtering, cue-level
dedup), and both wire formats are line-structured text — so the
parser is all built-in expressions: split on blank lines, one regexp
for the timing arrow, arithmetic for the millisecond offsets, and a
dotall regexp for the cue body. Zero Python anywhere; scan-speed on
100 TB of transcripts.

Grammar handled: SRT counters (ignored — cue order is the block
order), comma OR dot millisecond separators (SRT vs VTT), optional
hours field absent in VTT short form (``MM:SS.mmm``), the WEBVTT
header block and NOTE/STYLE blocks (no arrow -> dropped), cue
settings after the arrow target (``align:start``), and multi-line cue
text joined with newlines.

Reference parity note: the reference has no subtitle surface; charter
extension for multimodal pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hours may exceed two digits (WebVTT allows 2+; >99h transcripts
# exist) — a {1,2} cap made '100:00:00.000' match a SHIFTED substring,
# silently dropping the leading digit (ADVICE r9)
_ARROW = (r"(?:(\d{1,4}):)?(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
          r"(?:(\d{1,4}):)?(\d{2}):(\d{2})[,.](\d{3})")


def _ms(h, m, s, ms):
    # regexp_extract yields '' (not NULL) for an absent optional hours
    # group: try_cast -> NULL -> coalesce 0 (strict cast of '' throws)
    return ((F.coalesce(h.try_cast("long"), F.lit(0)) * 3600
             + m.try_cast("long") * 60 + s.try_cast("long")) * 1000
            + ms.try_cast("long"))


def parse_subtitles(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, cue_idx, start_ms, end_ms, cue_text) — one row per cue.
    cue_idx is the 0-based cue order within the document (blocks
    without a timing arrow — WEBVTT headers, NOTE/STYLE blocks, bare
    counters — do not consume indexes). Works on SRT and WebVTT."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\r?\n[ \t]*\r?\n"))
         .alias("__pos", "__block"),
    )
    g = [F.regexp_extract("__block", _ARROW, i) for i in range(1, 9)]
    cues = (blocks
            .where(F.col("__block").rlike(_ARROW))
            .select(
                id_col, "__pos",
                _ms(*g[:4]).alias("start_ms"),
                _ms(*g[4:]).alias("end_ms"),
                # cue body: everything after the arrow line; dotall so
                # multi-line cues survive. Leading counter lines are
                # before the arrow and therefore excluded by design.
                F.regexp_extract("__block",
                                 r"(?s)-->[^\n]*\n(.*)$", 1)
                 .alias("cue_text"),
            ))
    w = Window.partitionBy(id_col).orderBy("__pos")
    return (cues
            .withColumn("cue_idx", F.row_number().over(w) - 1)
            .select(id_col, "cue_idx", "start_ms", "end_ms", "cue_text"))


def format_srt(cues: list[tuple[int, int, str]]) -> str:
    """Render (start_ms, end_ms, text) cues as an SRT document —
    fixture/sink twin of parse_subtitles (comma millis, counters)."""
    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, mil = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{mil:03d}"

    return "\n\n".join(
        f"{i + 1}\n{ts(a)} --> {ts(b)}\n{t}"
        for i, (a, b, t) in enumerate(cues))


def format_vtt(cues: list[tuple[int, int, str]]) -> str:
    """Render cues as WebVTT — dot millis, no counters, header block,
    a cue-settings suffix on the arrow line (parsers must ignore
    it)."""
    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, mil = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d}.{mil:03d}"

    body = "\n\n".join(
        f"{ts(a)} --> {ts(b)} align:start\n{t}" for a, b, t in cues)
    return "WEBVTT\n\n" + body


# ---------------------------------------------------------------------------
# ASS / SSA (Advanced SubStation Alpha) — r12, VERDICT r11 missing #6
# ---------------------------------------------------------------------------

# Dialogue line: "Dialogue: <Layer|Marked=N>,H:MM:SS.cc,H:MM:SS.cc,
# Style,Name,MarginL,MarginR,MarginV,Effect,Text" — the text is the
# 10th field and may itself contain commas, so it comes from a
# limit-10 split, not the regexp. SSA v4 differs only in the first
# field ("Marked=0"), which the [^,]* covers.
_ASS_TIME = (r"^\s*Dialogue:\s*[^,]*,"
             r"(\d+):(\d{2}):(\d{2})[.:](\d{2}),"
             r"(\d+):(\d{2}):(\d{2})[.:](\d{2}),")


def _cs_ms(h, m, s, cs):
    return ((F.coalesce(h.try_cast("long"), F.lit(0)) * 3600
             + m.try_cast("long") * 60 + s.try_cast("long")) * 1000
            + cs.try_cast("long") * 10)


def parse_ass(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, cue_idx, start_ms, end_ms, cue_text) from ASS/SSA scripts
    — the parse_subtitles contract over the third subtitle wire
    format. Zero Python: line explode, one timing regexp
    (centisecond stamps -> ms), limit-10 split for the comma-bearing
    text field, override-tag strip ({\\...} blocks), \\N / \\n ->
    newline, \\h -> space. Comment:/Format:/style lines carry no
    Dialogue: prefix and drop out; cue_idx is the dialogue-line order
    (ASS events may be stored out of time order — order preserved, as
    players re-sort by Start, which stays the caller's choice)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\r?\n"))
         .alias("__pos", "__line"),
    )
    g = [F.regexp_extract("__line", _ASS_TIME, i) for i in range(1, 9)]
    body = F.element_at(F.split(F.col("__line"), ",", 10), 10)
    cues = (lines
            .where(F.col("__line").rlike(_ASS_TIME))
            .select(
                id_col, "__pos",
                _cs_ms(*g[:4]).alias("start_ms"),
                _cs_ms(*g[4:]).alias("end_ms"),
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(body, r"\{[^}]*\}", ""),
                        r"\\[Nn]", "\n"),
                    r"\\h", " ").alias("cue_text"),
            ))
    w = Window.partitionBy(id_col).orderBy("__pos")
    return (cues
            .withColumn("cue_idx", F.row_number().over(w) - 1)
            .select(id_col, "cue_idx", "start_ms", "end_ms",
                    "cue_text"))


def format_ass(cues: list[tuple[int, int, str]],
               ssa: bool = False) -> str:
    """Render cues as an ASS (or SSA v4) script — the fixture/sink
    twin of parse_ass: centisecond stamps, \\N newlines, commas in
    text preserved (text is the last field), a style block and a
    Comment: line that parsers must drop."""
    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, cs = divmod(rem, 1000)
        return f"{h}:{m:02d}:{s:02d}.{cs // 10:02d}"

    first = "Marked=0" if ssa else "0"
    script = "v4.00" if ssa else "v4.00+"
    styles = "[V4 Styles]" if ssa else "[V4+ Styles]"
    head = (f"[Script Info]\nScriptType: {script}\n\n{styles}\n"
            "Format: Name, Fontname, Fontsize\n"
            "Style: Default,Arial,20\n\n[Events]\n"
            "Format: Layer, Start, End, Style, Name, MarginL, "
            "MarginR, MarginV, Effect, Text\n"
            "Comment: 0,0:00:00.00,0:00:00.01,Default,,0,0,0,,"
            "twin marker — not a cue\n")
    return head + "\n".join(
        f"Dialogue: {first},{ts(a)},{ts(b)},Default,,0,0,0,,"
        + t.replace("\n", "\\N")
        for a, b, t in cues)
