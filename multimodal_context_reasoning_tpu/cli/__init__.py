"""Command-line entry points (run_PMR_ModCR.py / run_vcr_ModCR.py parity)."""
