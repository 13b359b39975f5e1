"""Report sinks (SURVEY §2.2 K1-K6) — Spark-first re-expression.

Distributed sinks write JSONL/parquet from executors; report-shaped
outputs (validation summary, corpus metrics, final QA report,
spreadsheet) aggregate distributively and only the final small result
lands driver-side, exactly like the reference's report stage runs
after its pipelines (orchestrate.py:395-422).

  write_jsonl            K1/K2: distributed JSONL sink (df.write.json)
  validation_summary     K3: corpus-rollup of per-url ValidationReports
  corpus_metrics         K4: compute_metrics-shaped corpus aggregate
  final_report           K6 + A5-A7: summary %, discrepancy samples,
                         rule-based recommendations
  write_report_json      driver-side json.dump of a 1-row aggregate
  write_spreadsheet      K5: multi-sheet .xlsx — pandas/openpyxl where
                         installed, else the vendored stdlib minixlsx
                         writer; a real workbook lands either way

Reference anchors: validate.py:398-423 (write_report),
final_report.py:84-167 (write/_compute_summary/_collect_discrepancies/
_generate_recommendations), orchestrate.py:195-234 (ExcelWriter).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, functions as F


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1/K2: JSONL sink, one object per line, distributed writers."""
    df.write.mode(mode).json(path)


def validation_summary(validation: DataFrame) -> DataFrame:
    """K3/A4: corpus rollup of per-url validation reports — counts of
    matched/missing/extra/out-of-order plus match percentage."""
    agg = validation.agg(
        F.count("*").alias("docs"),
        F.sum("toc_section_count").alias("toc_sections"),
        F.sum("parsed_section_count").alias("parsed_sections"),
        F.sum(F.size("matched_sections")).alias("matched"),
        F.sum(F.size("missing_sections")).alias("missing"),
        F.sum(F.size("extra_sections")).alias("extra"),
        F.sum(F.size("out_of_order_sections")).alias("out_of_order"),
    )
    total = F.col("matched") + F.col("missing")
    pct = F.when(total > 0, F.round(F.col("matched") / total * 100, 1)).otherwise(F.lit(100.0))
    return agg.withColumn("match_pct", pct)


def corpus_metrics(metrics: DataFrame) -> DataFrame:
    """K4/A3: corpus-level compute_metrics rollup."""
    return metrics.agg(
        F.count("*").alias("docs"),
        F.sum("total_chapters").alias("total_chapters"),
        F.sum("total_sections").alias("total_sections"),
        F.sum("total_figures").alias("total_figures"),
        F.sum("total_tables").alias("total_tables"),
        F.round(F.avg("avg_tokens_per_section"), 1).alias("avg_tokens_per_section"),
    )


def final_report(validation: DataFrame, metrics: DataFrame, sample: int = 50) -> dict:
    """K6 + A5-A7: the reference's final QA report as one dict.

    Discrepancy lists are truncated server-side with slice() (W8)
    before the single collect — nothing unbounded reaches the driver.
    """
    vs = validation_summary(validation).collect()[0].asDict()
    ms = corpus_metrics(metrics).collect()[0].asDict()

    missing_sample = (
        validation.select(F.explode("missing_sections").alias("s"))
        .orderBy("s")
        .limit(sample)
        .agg(F.collect_list("s").alias("xs"))
        .collect()[0]["xs"]
    )

    recommendations = []
    if vs["missing"] and vs["missing"] > 0:
        recommendations.append(
            "Missing sections detected - check ToC page filters and heading gating."
        )
    if vs["extra"] and vs["extra"] > 0:
        recommendations.append(
            "Extra chunks not promised by the ToC - review heading noise filters."
        )
    if (ms["total_figures"] or 0) + (ms["total_tables"] or 0) == 0:
        recommendations.append("No figures/tables extracted - verify caption normalizers.")
    avg_tokens = ms["avg_tokens_per_section"] or 0
    if 0 < avg_tokens < 300:
        recommendations.append("Sections are short (<300 tokens avg) - chunks may be fragmented.")
    if avg_tokens > 9000:
        recommendations.append("Sections are very long (>9000 tokens avg) - consider splitting.")

    return {
        "summary": {
            **{k: vs[k] for k in ("docs", "matched", "missing", "extra", "out_of_order")},
            "match_pct": vs["match_pct"],
        },
        "metrics": ms,
        "missing_sections_sample": missing_sample,
        "recommendations": recommendations,
    }


def write_report_json(report: dict, path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(report, indent=2, ensure_ascii=False))


def _write_frames_xlsx(frames: dict, target: str, max_width: int = 60) -> None:
    """One workbook write attempt. With openpyxl installed this is the
    reference's exact engine AND styling (orchestrate.py:210-234
    _autofit: bold header row, width = min(longest+2, max_width));
    otherwise the vendored minixlsx writer, which applies the same
    header-bold/column-width rule natively."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
        from openpyxl.styles import Font

        Path(target).parent.mkdir(parents=True, exist_ok=True)
        with pd.ExcelWriter(target, engine="openpyxl") as xw:
            for name, pdf in frames.items():
                pdf.to_excel(xw, sheet_name=name[:31], index=False)
            for ws in xw.book.worksheets:
                for cell in ws[1]:
                    cell.font = Font(bold=True)
                for col in ws.columns:
                    values = [str(c.value) if c.value is not None else "" for c in col]
                    width = min(max((len(v) for v in values), default=0) + 2, max_width)
                    ws.column_dimensions[col[0].column_letter].width = width
    except ImportError:
        from .minixlsx import write_xlsx

        write_xlsx(
            {
                name: (
                    list(pdf.columns),
                    [tuple(r) for r in pdf.itertuples(index=False, name=None)],
                )
                for name, pdf in frames.items()
            },
            target,
        )


def write_spreadsheet(sheets: dict[str, DataFrame], target: str, max_rows: int = 10000) -> list[str]:
    """K5: multi-sheet .xlsx report (reference orchestrate.py:195-234).
    A real .xlsx lands either way (openpyxl or vendored minixlsx),
    never a CSV downgrade. Reference-parity behaviors (VERDICT r4 #7):
    a pre-existing target is unlinked first (PermissionError on the
    unlink tolerated — write may still succeed, orchestrate.py:220-228),
    and a PermissionError on the WRITE (file open in Excel) falls back
    to a timestamped ValidationReport_*.xlsx alongside it instead of
    failing the job (orchestrate.py:382-393). Returns the path(s)
    actually written."""
    frames = {name: df.limit(max_rows).toPandas() for name, df in sheets.items()}
    tpath = Path(target)
    if tpath.exists():
        try:
            tpath.unlink()
        except PermissionError:
            pass  # reference: "will try writing anyway"
    try:
        _write_frames_xlsx(frames, target)
        return [target]
    except PermissionError:
        import time as _time

        alt = tpath.parent / f"ValidationReport_{_time.strftime('%Y%m%d_%H%M%S')}.xlsx"
        _write_frames_xlsx(frames, str(alt))
        return [str(alt)]
