#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries into
plans/<round>/<query>_<tag>.txt — the before/after plan evidence for the
optimization rounds.

Usage: python tools/explain_to_file.py --tag before --out plans/r10 name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from audience_manager_platform_spark import registry
    from audience_manager_platform_spark.session import get_spark

    spark = get_spark("explain_to_file")
    qs = registry.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
