"""Full width-ladder benchmark: every committed distilled rung, one JSON
line each, headline last.

This is bench.py with S1S2_BENCH_WIDTHS=1 — split out because the full
ladder (~15 min: 6 intermediate rungs × jit compile + in-process evidence
scoring) does not fit the driver's bench budget (VERDICT r3 weak #1); the
default bench.py profile prints only the anchor, the quality-matched line
and the headline rung. Run this for BENCH_NOTES tables.

Usage:
    timeout 1800 python tools/bench_width_ladder.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    os.environ["S1S2_BENCH_WIDTHS"] = "1"
    import bench

    bench.main()
