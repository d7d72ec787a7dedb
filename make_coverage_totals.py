"""Regenerate the COVERAGE.md **Totals** block mechanically from
``__spark_entry__`` so the stamped counts can never drift from
``len(queries())`` / ``len(oracle_sql())`` again (VERDICT r4 board
item 8).  Run from the repo root: ``python make_coverage_totals.py``.
"""
import re
import sys


def main() -> int:
    import __spark_entry__ as entry
    q = entry.queries()
    o = entry.oracle_sql()
    rows_only = sorted(set(q) - set(o))
    text = open("COVERAGE.md", encoding="utf-8").read()
    new = (f"**Totals** (mechanically stamped by make_coverage_totals.py): "
           f"{len(q)} named queries in `queries()`, {len(o)}\n"
           f"with full DuckDB value-hash oracles "
           f"({', '.join(f'`{n}`' for n in rows_only)} are rows-only by "
           f"design —\nnot SQL-expressible; each carries dedicated pytest "
           f"invariants instead).")
    out, n = re.subn(r"\*\*Totals\*\*[^\n]*\n(?:[^\n*][^\n]*\n)*",
                     new + "\n", text, count=1)
    if n != 1:
        print("Totals block not found", file=sys.stderr)
        return 1
    open("COVERAGE.md", "w", encoding="utf-8").write(out)
    print(f"stamped: {len(q)} queries / {len(o)} oracles; "
          f"rows-only: {rows_only}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
