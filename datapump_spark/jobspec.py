"""Declarative job specification (reference parity).

Mirrors the embedded JSON Schema the reference validates every job against
(datapump.py:22-53): required InputFile / TargetOrg / TargetPackage /
TargetResource / PrimaryKey / Dedupe, optional Truncate and Stats[]. The
reference's quirks are preserved where they are contract, fixed where they
are bugs (SURVEY §2.13):

- ``Dedupe`` accepts ``first`` / ``last`` / ``''`` — the schema enum forbids
  ``''`` but the code honors it as "no dedupe" (datapump.py:43,446); we
  accept it and document.
- ``Stats[].Kind`` is ``descriptive`` | ``mode`` | a pandas offset alias
  (validated eagerly, like the to_offset gate at datapump.py:386-392).
- Each stat sees the PRISTINE table (the reference's cumulative in-place
  DropColumns mutation across stats, datapump.py:291-293 + global df, is a
  bug we do not replicate — SURVEY §2.13.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


class JobValidationError(ValueError):
    pass


@dataclass(frozen=True)
class StatSpec:
    kind: str                       # 'descriptive' | 'mode' | offset alias
    group_by: list[str] = field(default_factory=list)
    drop_columns: list[str] = field(default_factory=list)

    def validate(self) -> None:
        if self.kind in ("descriptive", "mode"):
            return
        from datapump_spark.operators.resample import _parse_kind
        try:
            _parse_kind(self.kind)
        except ValueError as e:
            raise JobValidationError(f"Stats.Kind invalid: {e}") from e


@dataclass(frozen=True)
class JobSpec:
    input_file: str                 # glob, like InputFile (datapump.py:35)
    target_org: str
    target_package: str
    target_resource: str
    primary_key: list[str]          # split from the comma list (datapump.py:447)
    dedupe: str                     # 'first' | 'last' | ''
    truncate: bool = False
    stats: list[StatSpec] = field(default_factory=list)

    REQUIRED = ["InputFile", "TargetOrg", "TargetPackage", "TargetResource",
                "PrimaryKey", "Dedupe"]

    @classmethod
    def from_dict(cls, d: dict) -> "JobSpec":
        missing = [k for k in cls.REQUIRED if k not in d]
        if missing:
            raise JobValidationError(f"job missing required fields: {missing}")
        dedupe = d["Dedupe"]
        if dedupe not in ("first", "last", ""):
            raise JobValidationError(
                f"Dedupe must be 'first', 'last' or '' — got {dedupe!r}")
        stats = []
        for s in d.get("Stats", []):
            if "Kind" not in s:
                raise JobValidationError("Stats entry missing Kind")
            spec = StatSpec(
                kind=s["Kind"],
                group_by=[c for c in s.get("GroupBy", "").split(",") if c],
                drop_columns=[c for c in s.get("DropColumns", "").split(",") if c],
            )
            spec.validate()
            stats.append(spec)
        pk = [c for c in d["PrimaryKey"].split(",") if c]
        if not pk:
            raise JobValidationError("PrimaryKey must name at least one column")
        return cls(
            input_file=d["InputFile"],
            target_org=d["TargetOrg"],
            target_package=d["TargetPackage"],
            target_resource=d["TargetResource"],
            primary_key=pk,
            dedupe=dedupe,
            truncate=bool(d.get("Truncate", False)),
            stats=stats,
        )

    @classmethod
    def from_file(cls, path: str | Path) -> "JobSpec":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @property
    def qualified_name(self) -> str:
        """'{org}-{package}-{resource}' alias convention (datapump.py:224)."""
        return f"{self.target_org}-{self.target_package}-{self.target_resource}"

    def stat_table_name(self, stat: StatSpec) -> str:
        """Derived-table naming: '{resource}-{kind}', with descriptive →
        '-stats' (datapump.py:295,334,340)."""
        suffix = {"descriptive": "stats"}.get(stat.kind, stat.kind)
        return f"{self.target_resource}-{suffix}"


def scan_job_dir(job_dir: str | Path) -> list[Path]:
    """S1: non-hidden ``*-job.json`` regular files (datapump.py:694-697)."""
    p = Path(job_dir)
    return sorted(
        f for f in p.iterdir()
        if f.is_file() and f.name.endswith("-job.json") and not f.name.startswith(".")
    )
