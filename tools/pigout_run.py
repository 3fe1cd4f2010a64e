"""`pigout script.pig` analog (SURVEY.md §3.1 entry point #1).

Usage:
    python tools/pigout_run.py script.pig [--catalog SF_DIR] [--dump ALIAS]

Runs the script's statements in order (STORE/DUMP execute eagerly);
--dump prints an alias afterward without needing a DUMP statement.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("script")
    ap.add_argument("--catalog", default=None, help="fixture dir to register as tables")
    ap.add_argument("--dump", default=None, help="alias to print after the run")
    args = ap.parse_args()

    from pigout_spark.catalog import Catalog
    from pigout_spark.latin import run_script
    from pigout_spark.session import get_spark

    catalog = Catalog().register_fixture_dir(args.catalog) if args.catalog else None
    spark = get_spark("pigout-run")
    pig = run_script(spark, Path(args.script).read_text(), catalog)
    if args.dump:
        pig.dump(args.dump)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
