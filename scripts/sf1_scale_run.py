#!/usr/bin/env python3
"""One taskset-confined scaling run at the sf1 corpus (helper for the
sf1 proof — runs must execute one at a time, exclusively, so each gets
the whole box; the driver loop lives outside).  Usage:
``python3 scripts/sf1_scale_run.py <cores>``; appends a JSON line to
BENCH/sf1_scaling_runs.jsonl."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _materialize_corpus, _scaling_subprocess  # noqa: E402

DOCS = int(os.environ.get("SF1_DOCS", "300000"))


def main():
    cores = int(sys.argv[1])
    pages = _materialize_corpus(DOCS, shm=True)
    r = _scaling_subprocess(pages, cores)
    r["docs_corpus"] = DOCS
    out = os.path.join(REPO, "BENCH", "sf1_scaling_runs.jsonl")
    with open(out, "a") as fh:
        fh.write(json.dumps(r) + "\n")
    print(json.dumps(r))


if __name__ == "__main__":
    main()
