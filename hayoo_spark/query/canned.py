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


# --- typed drill-downs (the reference's ContextQuery family) --------------

#: which drill-downs a result of each fct_type offers
#: (hayooFrontend/src/Hayoo/Common.hs:477-482 contextQueries)
CONTEXT_QUERIES: dict[str, tuple[str, ...]] = {
    "package": ("reverse-dependencies", "package-modules",
                "package-datatypes", "packages-by-author"),
    "module": ("module-content", "related-package"),
    "_default": ("related-module", "related-package"),
}


def context_queries(fct_type: str) -> tuple[str, ...]:
    """Drill-down names offered for a result of ``fct_type``
    (Common.hs:477-482: Package / Module / everything else)."""
    return CONTEXT_QUERIES.get(fct_type, CONTEXT_QUERIES["_default"])


def _tok(v: str) -> str:
    return _SAFE_TOKEN.sub("", str(v))


def render_context(name: str, package: str = "",
                   modules: tuple[str, ...] = (),
                   author: str = "") -> str:
    """Render one typed drill-down into the query language
    (Common.hs:453-467 contextQueryToQuery), over the HAYOO_FIELDS
    contexts (dependencies / package / type / author / module / name):

    - reverse-dependencies: packages depending on this one;
    - package-modules / package-datatypes: the package's modules /
      data-newtype-type declarations (type is the weight-0 filter
      context, IndexSchema.hs:119);
    - packages-by-author: authors split on commas, each an AND of
      author-context words (the reference uses scoped phrases; this
      surface syntax scopes single words — same match set for
      whole-author-name queries on tokenized author contexts);
    - module-content / related-module: OR over the result's modules
      (modulesInContext);
    - related-package: the package's own package-typed doc."""
    mods = " OR ".join(f"module:{_tok(m)}" for m in modules if _tok(m))
    if name == "reverse-dependencies":
        return f"dependencies:{_tok(package)}"
    if name == "package-modules":
        return f"package:{_tok(package)} AND type:module"
    if name == "package-datatypes":
        return (f"package:{_tok(package)} AND "
                f"(type:data OR type:newtype OR type:type)")
    if name == "packages-by-author":
        parts = []
        for a in str(author).split(","):
            words = [_tok(w) for w in a.split() if _tok(w)]
            if words:
                parts.append(" AND ".join(f"author:{w}" for w in words))
        return " OR ".join(f"({p})" if " AND " in p else p
                           for p in parts)
    if name == "module-content":
        return f"package:{_tok(package)} AND ({mods})" if mods else \
            f"package:{_tok(package)}"
    if name == "related-package":
        return f"name:{_tok(package)} AND type:package"
    if name == "related-module":
        return f"({mods}) AND type:module" if mods else "type:module"
    raise KeyError(f"unknown context query {name!r}; "
                   f"have {sorted(set().union(*CONTEXT_QUERIES.values()))}")
