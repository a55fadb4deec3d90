"""Dump per-query formatted plans to plans/r12/<query>_<tag>.txt.

Same capture as the *_before.txt files committed at the r12 round
start (df.explain('formatted') at sf0.001), so before/after diffs are
like-for-like. Usage:

    python tools/dump_plans_r12.py after [query ...]

Default query set: every headline query (bench.HEADLINE).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:] or HEADLINE
    sf = "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from baloo_spark.session import get_session

    spark = get_session("plans_r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = f"plans/r12/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}) — df.explain('formatted') "
                    f"at sf0.001\n\n")
            f.write(buf.getvalue().strip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
