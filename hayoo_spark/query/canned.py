"""Canned (drill-down) query templates — Q14.

The reference ships parameterized query templates next to the free-form
parser (hayoo-server/src/Hayoo/App/Types.hs:155-196: by-module,
by-package, by-author style drill-downs rendered into Hunt queries).
Here each template renders into the engine's query language (parser.py)
so canned queries inherit the full planner: prefix expansion, boosts,
filter fields, paging.

Templates use str.format fields; values are sanitized to bare tokens /
ISO dates (a canned query is a UI affordance, not an injection vector).
"""

from __future__ import annotations

import re

_SAFE_TOKEN = re.compile(r"[^A-Za-z0-9_.:/\-]")
_SAFE_DATE = re.compile(r"[^0-9T:\-]")

TEMPLATES: dict[str, str] = {
    # docs in a language, newest-first paging left to the caller
    "by-lang": "lang:{lang}",
    # docs on a topic restricted to a language (the reference's
    # context-scoped drill-down shape)
    "topic-in-lang": "{term} AND lang:{lang}",
    # everything from one site/page (url is an exact stored key)
    "site": "url:{url}",
    # a topic within a crawl window
    "recent-topic": "{term} AND warc_ts:[{since} TO {until}]",
    # title-boosted topic search (3-tier boost shape, Q15 analogue:
    # title hit outranks body hit outranks fuzzy neighborhood)
    "boosted-topic": "title:{term}^3 OR {term} OR {term}~^0.3",
    # exclusion drill-down
    "topic-not-lang": "{term} AND NOT lang:{lang}",
}


def render(name: str, **params: str) -> str:
    """Render a canned template to a parseable query string."""
    if name not in TEMPLATES:
        raise KeyError(f"unknown canned query {name!r}; "
                       f"have {sorted(TEMPLATES)}")
    clean = {}
    for k, v in params.items():
        v = str(v)
        rx = _SAFE_DATE if k in ("since", "until") else _SAFE_TOKEN
        clean[k] = rx.sub("", v)
    try:
        return TEMPLATES[name].format(**clean)
    except KeyError as e:
        raise KeyError(f"canned query {name!r} missing param {e}") from e
