"""Trim command report generator (txt/json/yaml/pickle).

The legacy Cutadapt-style text report is produced by
``atropos_tpu.commands.legacy_report``.
"""
from atropos_tpu.commands.reports import BaseReportGenerator


class ReportGenerator(BaseReportGenerator):
    def generate_text_report(self, fmt, summary, outfile, **kwargs):
        if fmt == "txt":
            from atropos_tpu.commands.legacy_report import generate_trim_report

            generate_trim_report(summary, outfile)
        else:
            super().generate_text_report(fmt, summary, outfile, **kwargs)
