"""Regenerate docs/OPERATORS.md from the query registry.

Usage: python tools/gen_operators_md.py > docs/OPERATORS.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    groups: dict[str, list[tuple[str, bool, str]]] = {}
    for name, fn in sorted(qs.items()):
        mod = fn.__module__.replace("go_http_data_pipeline_spark.", "")
        doc = (inspect.getdoc(fn) or "").split("\n\n")[0].replace("\n", " ")
        if len(doc) > 200:
            doc = doc[:197] + "..."
        groups.setdefault(mod, []).append((name, name in oracles, doc))

    print("# OPERATORS — every registered query (auto-generated index)\n")
    print("Regenerate: `python tools/gen_operators_md.py > docs/OPERATORS.md`\n")
    total = sum(len(v) for v in groups.values())
    checked = sum(1 for v in groups.values() for _, o, _ in v if o)
    print(
        f"{total} queries; {checked} DuckDB-oracle hash-checked, "
        f"{total - checked} rows-only by design (the HLL and quantile sketches, whose\n"
        "accuracy is separately hash-gated by the sketch_accuracy_eval queries).\n"
    )
    for mod in sorted(groups):
        print(f"## {mod}\n")
        print("| query | oracle | what it does |")
        print("|---|---|---|")
        for name, has_oracle, doc in groups[mod]:
            kind = "hash" if has_oracle else "rows-only"
            print(f"| `{name}` | {kind} | {doc} |")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
