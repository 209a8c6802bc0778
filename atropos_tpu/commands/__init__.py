"""Command packages (trim/detect/error/qc) + CLI dispatch."""
