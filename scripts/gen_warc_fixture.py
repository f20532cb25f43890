"""Generate the checked-in WARC/WET fixtures under tests/data/warc/.

Deterministic (fixed seed, fixed dates) so re-running never churns git.
Layout:
  sample_00.warc / sample_01.warc — uncompressed WET-style archives:
      one warcinfo record + conversion records with multilingual
      (non-ASCII) payloads, exercising both readers and the byte-exact
      Content-Length slicing.
  sample.warc.gz — the same records as sample_00.warc, one gzip MEMBER
      per record (the real .warc.gz layout; gzip.decompress handles the
      concatenation) -> pins the multi-member path of read_warc.
  tricky.warc — a response record whose PAYLOAD embeds the record
      boundary bytes; only Content-Length framing parses it right ->
      pins the divergence documented in sources/warc.py.
"""

from __future__ import annotations

import gzip
import random
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "tests" / "data" / "warc"

WORDS = ("the quick brown fox jumps over lazy dog und über straße "
         "où est la crème naïve résumé 北京 大学 データ 処理 moon "
         "rocket falcon comet nebula quasar".split())


def record(warc_type: str, uri: str | None, date: str, rec_id: str,
           payload: bytes, content_type: str = "text/plain") -> bytes:
    heads = [f"WARC/1.0", f"WARC-Type: {warc_type}",
             f"WARC-Record-ID: <urn:uuid:{rec_id}>",
             f"WARC-Date: {date}"]
    if uri:
        heads.append(f"WARC-Target-URI: {uri}")
    heads += [f"Content-Type: {content_type}",
              f"Content-Length: {len(payload)}"]
    return ("\r\n".join(heads) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def conversion_records(shard: int, n: int) -> list[bytes]:
    rng = random.Random(1000 + shard)
    out = []
    for i in range(n):
        words = [WORDS[rng.randrange(len(WORDS))]
                 for _ in range(rng.randrange(8, 40))]
        payload = (" ".join(words) + "\n").encode("utf-8")
        out.append(record(
            "conversion",
            f"https://example.org/crawl/{shard}/page{i}",
            f"2024-03-0{shard + 1}T0{i % 10}:15:00Z",
            f"0000-{shard:04d}-{i:04d}", payload))
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for shard in (0, 1):
        info = record("warcinfo", None, f"2024-03-0{shard + 1}T00:00:00Z",
                      f"info-{shard:04d}-0000",
                      b"software: datapump-spark-fixture\r\n",
                      "application/warc-fields")
        recs = [info] + conversion_records(shard, 12 + shard * 5)
        (OUT / f"sample_{shard:02d}.warc").write_bytes(b"".join(recs))
        if shard == 0:
            members = b"".join(
                gzip.compress(r, mtime=0) for r in recs)
            (OUT / "sample.warc.gz").write_bytes(members)

    evil = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>boundary bait: \r\n\r\nWARC/1.0\r\n"
            b"WARC-Type: fake\r\n inside a payload</html>")
    tricky = (
        record("response", "https://example.org/tricky",
               "2024-03-03T12:00:00Z", "0000-0002-0000", evil,
               "application/http; msgtype=response")
        + record("conversion", "https://example.org/after-tricky",
                 "2024-03-03T12:00:01Z", "0000-0002-0001",
                 "after the bait über alles\n".encode("utf-8")))
    (OUT / "tricky.warc").write_bytes(tricky)
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
