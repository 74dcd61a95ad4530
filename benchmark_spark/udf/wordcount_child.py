#!/usr/bin/env python3
"""External-script child for the Query-4 fidelity mode.

Plays the role of the reference's `runner/url_count.py` [P]
(SURVEY.md §2.0 Query 4): reads text lines on stdin, tokenizes,
emits one tab-separated `(token, 1)` record per token on stdout —
exactly the Hive TRANSFORM stdin/stdout contract. The re-aggregation
happens back in SQL (benchmark_spark/udf/surface.py).
"""

import sys


def main() -> None:
    out = sys.stdout
    for line in sys.stdin:
        for tok in line.strip().split(" "):
            if tok:
                out.write(f"{tok}\t1\n")


if __name__ == "__main__":
    main()
