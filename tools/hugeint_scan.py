"""Scan every registered oracle for HUGEINT/UHUGEINT output columns.

DuckDB silently widens SUM over BIGINT/INTEGER to HUGEINT (int128); the
driver's value hash canonicalizes by each engine's own representation, so a
HUGEINT column hash-mismatches Spark's BIGINT even when values are equal
(round-4 verdict: 27 driver reds, 31 latent). This uses `con.sql(...).types`
— plan-only, no execution — so the full 229-query scan is cheap.

Usage: python tools/hugeint_scan.py [sf_dir]
Exits non-zero if any oracle has a HUGEINT/UHUGEINT output column.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tests.oracle_utils import duck_connect  # noqa: E402

from __spark_entry__ import oracle_sql  # noqa: E402

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def scan(sf_dir: str) -> dict[str, list[str]]:
    con = duck_connect(sf_dir)
    bad: dict[str, list[str]] = {}
    for name, sql in oracle_sql().items():
        rel = con.sql(sql)
        hits = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if str(t) in BAD_TYPES
        ]
        if hits:
            bad[name] = hits
    return bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = scan(sf)
    for name, hits in sorted(bad.items()):
        print(f"{name}: {', '.join(hits)}")
    print(f"{len(bad)} oracles with HUGEINT output columns")
    sys.exit(1 if bad else 0)
