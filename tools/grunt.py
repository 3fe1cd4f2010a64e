"""Grunt-shell analog (SURVEY.md §3.1 entry point #2): interactive Pig
Latin over the engine.

Usage:
    python tools/grunt.py [--catalog SF_DIR]

Statements execute lazily (assignments build plans); DUMP/STORE/DESCRIBE
trigger execution, exactly like Grunt.  `quit;` exits.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", default=None)
    args = ap.parse_args()

    from pigout_spark.catalog import Catalog
    from pigout_spark.latin import PigSession, PigSyntaxError
    from pigout_spark.session import get_spark

    catalog = Catalog().register_fixture_dir(args.catalog) if args.catalog else None
    pig = PigSession(get_spark("grunt"), catalog)
    print("grunt> (pigout_spark — Pig Latin subset; `quit;` to exit)")
    buf = ""
    while True:
        try:
            prompt = "grunt> " if not buf else "    >> "
            line = input(prompt)
        except EOFError:
            break
        buf += line + "\n"
        if ";" not in line:
            continue  # statements end with ';' — keep reading
        stmt, buf = buf, ""
        if stmt.strip().rstrip(";").strip().lower() in ("quit", "exit"):
            break
        try:
            pig.execute(stmt)
        except PigSyntaxError as e:
            print(f"syntax error: {e}")
        except Exception as e:  # runtime errors shouldn't kill the shell
            print(f"error: {type(e).__name__}: {str(e)[:300]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
