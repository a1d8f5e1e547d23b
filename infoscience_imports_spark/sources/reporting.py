"""S12 report sink: multi-sheet indicator report from tiny aggregates.

Reference parity: ``data_pipeline/reporting.py:175-199`` collects a handful
of per-run indicator frames and writes a multi-sheet Excel workbook. The
Spark-correct shape is unchanged: each sheet is a SMALL aggregate (counts,
rollups, KPI rows) — the heavy reduction happens distributed, and only the
result (10s-1000s of rows) crosses to the driver via ``toPandas``.

This container has no Excel writer, so sheets land as one CSV per sheet plus
an ``index.json`` manifest; on a host with openpyxl the same dict-of-frames
maps 1:1 onto ``pd.ExcelWriter`` sheets (swap kept behind this function).

Guard: a sheet whose plan would ship a non-aggregated table driver-side is
the classic collect() scale bug — ``max_rows`` hard-fails the report instead
of silently materializing it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_report(
    sheets: dict[str, DataFrame],
    out_dir: str,
    max_rows: int = 100_000,
) -> dict[str, int]:
    """Write each aggregate frame as a report sheet; returns rows per sheet."""
    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, int] = {}
    for name, df in sheets.items():
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad sheet name {name!r}")
        pdf = df.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"sheet {name!r} exceeds max_rows={max_rows}: report sheets "
                "must be aggregates, not tables"
            )
        pdf.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
        written[name] = len(pdf)
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump({"sheets": written}, f, indent=2, sort_keys=True)
    return written
