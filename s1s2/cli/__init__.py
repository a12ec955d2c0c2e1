"""Thin argparse CLIs mirroring the reference script surfaces."""
