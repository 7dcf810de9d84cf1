"""Catalog-snapshot validators — the table-scale re-expression of the
reference's ENVIRONMENT-probing validators:

- ``pathExists`` / ``isFilePath`` / ``isDirPath`` (validators.go file
  family): per-record ``os.Stat`` probes
- ``isActiveURL`` (net.LookupHost probe)

A per-row filesystem stat or DNS lookup is neither reproducible nor
sane at 10^12 rows (it would hammer the probed system and make verdicts
time-dependent). The honest distributed equivalent is membership
against a SNAPSHOT of the probed universe, taken once before the run:

- small snapshots (≲ 100k entries) compile into an ``isin`` literal
  predicate — broadcast by construction, fused into the validation
  scan, zero shuffle;
- large catalogs do not belong in a row predicate at all: use
  ``operators.refcheck.dangling_refs`` (broadcast/shuffle anti-join),
  which is the same membership test as a dataset-level operator.

``register_snapshot_validators`` wires the four reference names to a
given snapshot so existing rule strings (``avatar: "isFilePath"``) run
unchanged; per-rule-set isolation is available through the
``RuleSet.validators`` overlay instead of the global registry.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, functions as F

MAX_LITERAL_CATALOG = 100_000


def membership_validator(values: Iterable[str]):
    """Builder: value ∈ snapshot. Empty value never reaches this
    (skip-on-empty gates it like every non-required validator)."""
    vals = sorted({str(v) for v in values})
    if len(vals) > MAX_LITERAL_CATALOG:
        raise ValueError(
            f"snapshot has {len(vals)} entries — too large for a literal "
            "predicate; use operators.refcheck.dangling_refs (anti-join) "
            "for catalog-scale membership"
        )

    def builder(col: Column, args, ctx) -> Column:
        return col.cast("string").isin(vals)

    return builder


def prefix_membership_validator(values: Iterable[str]):
    """Builder: value ∈ snapshot OR is a descendant path of a snapshot
    DIRECTORY entry (``isDirPath``-style containment).

    Containment compiles to one ``substring_index(c, '/', k).isin(dirs
    with k segments)`` term per DISTINCT PATH DEPTH in the snapshot —
    the expression tree is O(max_depth) regardless of catalog size, and
    each term is an InSet hash probe (set built once, codegen'd). Never
    an OR-chain with one ``startswith`` per entry: 100k chained Ors are
    an analyzer/codegen blowup long before the isin limit trips.
    (``c`` is a descendant of some k-segment dir ⟺ its first k
    segments, as a path, are in the k-segment dir set.)"""
    vals = sorted({str(v).rstrip("/") for v in values})
    if len(vals) > MAX_LITERAL_CATALOG:
        raise ValueError("snapshot too large — use refcheck anti-joins")
    by_depth: dict[int, list[str]] = {}
    for v in vals:
        by_depth.setdefault(v.count("/") + 1, []).append(v)

    def builder(col: Column, args, ctx) -> Column:
        c = col.cast("string")
        # exact members: substring_index(c,'/',k) == c when c has exactly
        # k segments, so the depth terms also cover c == v; keep the
        # explicit isin for clarity (one extra InSet probe)
        pred = c.isin(vals)
        for k, vs in sorted(by_depth.items()):
            pred = pred | F.substring_index(c, "/", k).isin(vs)
        return pred

    return builder


def register_snapshot_validators(
    *,
    files: Iterable[str] | None = None,
    dirs: Iterable[str] | None = None,
    urls: Iterable[str] | None = None,
) -> None:
    """Bind the reference's probe validators to snapshots (globally —
    pass the builders via ``RuleSet.validators`` for per-instance use):

    - ``isFilePath`` ∈ files; ``isDirPath`` ∈ dirs;
      ``pathExists`` ∈ files ∪ dirs (plus dir containment)
    - ``isActiveURL`` ∈ urls (resolvable-host snapshot)
    """
    from validate_spark.functions.validators import register_validator

    files = list(files or [])
    dirs = list(dirs or [])
    if files or dirs:
        register_validator("isFilePath", membership_validator(files))
        register_validator("isDirPath", membership_validator(dirs))
        both = membership_validator(files + dirs)
        contained = prefix_membership_validator(dirs) if dirs else None

        def path_exists(col: Column, args, ctx) -> Column:
            pred = both(col, args, ctx)
            if contained is not None:
                pred = pred | contained(col, args, ctx)
            return pred

        register_validator("pathExists", path_exists)
    if urls is not None:
        register_validator("isActiveURL", membership_validator(urls))
