"""CLI entry point: ``python -m pbf_spark info [-e] [-j] FILE``.

Parity with the reference's ``pbf info`` command surface
(cmd/pbf/info/info.go:52-55 — ``-e/--extended`` scans the whole file for
entity counts, ``-j/--json`` renders JSON). The render layer itself
lives in sources/info.py (golden-tested against the reference layout);
this is only the arg plumbing. The engine's real surface is DataFrames —
the CLI reads the file locally (no Spark session) exactly like the
reference binary.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pbf_spark", description="PySpark PBF analytics engine")
    sub = parser.add_subparsers(dest="command", required=True)
    p_info = sub.add_parser("info", help="print information about a PBF file")
    p_info.add_argument("file", help="path to an .osm.pbf file")
    p_info.add_argument(
        "-e", "--extended", action="store_true",
        help="provide extended information (scans entire file)",
    )
    p_info.add_argument("-j", "--json", action="store_true", help="format information in JSON")
    args = parser.parse_args(argv)

    if args.command == "info":
        from .sources.info import read_info, render_json, render_txt

        try:
            info = read_info(args.file, extended=args.extended)
        except (OSError, ValueError) as e:
            print(e, file=sys.stderr)
            return 1
        out = render_json(info) if args.json else render_txt(info)
        sys.stdout.write(out if out.endswith("\n") else out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
