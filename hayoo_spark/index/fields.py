"""Index field (context) schema — the reference's defining feature.

The reference indexes every document into ~18 named *contexts*, each
with a weight, its own tokenizer, and a flag saying whether the default
(unscoped) query searches it (hayooIndexer/src/Hayoo/Hunt/
IndexSchema.hs:103-137, newHayooIndexer/00-schema.js:1-165).  A
weight-0.0 context (the reference's ``type``) matches but contributes
no score — pure filtering (IndexSchema.hs:119).

Spark mapping: a ``field`` column runs through postings, the term
dictionary, and per-field stats rows; each document row stores one
``dl_<field>`` length per field.  Scoring is BM25F-lite — every field
is its own mini-index with its own df/dl/avgdl, and

    score(doc) = sum over matched (field, term) of
                 query_boost * field_weight * idf_field(term)
                 * tf_norm(tf, dl_field(doc), avgdl_field)

An unscoped query term searches the union of default fields; a
``field:term`` query scores that field alone (still weight-scaled).

``source`` says where a field's text comes from:
  - "body"     extracted page text (html body), lowercased tokens
  - "title"    the html <title> element
  - "body_cs"  extracted page text, case-SENSITIVE tokens (the `!`
               query marker's target; reference qFullWord case
               semantics, hayoo-server/src/Hayoo/App.hs:187-200)
  - anything else: a column of that name in the pages table

``ftype`` is the context type (reference ctDate vs ctText,
hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:111,120): a ``date`` field
is not tokenized — its source column (a timestamp) is stored per doc
and queried with ``field:[A TO B]`` range match where A/B are
TRUNCATABLE ISO prefixes (`2014-02` covers the whole month,
IndexSchema.hs:133-137; query/plan.iso_prefix_bounds).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FieldSpec:
    name: str
    weight: float = 1.0
    default: bool = True       # searched by unscoped query terms
    source: str = "body"
    ftype: str = "text"        # "text" | "date"
    #: "tokens" (the standard tokenizer) or "whole" (the trimmed,
    #: lowercased value is ONE term — the reference's `.*` context
    #: regexp: module / package / version store full dotted paths).
    #: "tokens_cs" / "whole_cs" are the case-SENSITIVE variants: the
    #: reference's contexts preserve case with the query flavor picking
    #: qFullWord vs qWordNoCase (App.hs:187-200); here a schema
    #: declares a `<field>_cs` twin (e.g. FieldSpec("name_cs", 3.0,
    #: False, "name", token_mode="tokens_cs")) and the parser routes
    #: `name:!MapM` to it — same convention as the unscoped `!` ->
    #: text_cs twin.
    token_mode: str = "tokens"


#: single-field schema — the pre-multi-field behavior, byte-compatible
#: scoring (weight 1.0 on extracted body text)
DEFAULT_FIELDS: tuple[FieldSpec, ...] = (FieldSpec("text", 1.0, True, "body"),)

#: the COMPLETE 18-context Hayoo schema, weight/default/type-exact to
#: hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:103-137 (byte shape in
#: newHayooIndexer/00-schema.js).  Expected corpus shape: one row per
#: declaration doc — the hoogle pipeline's decls_to_pages output joined
#: with package metadata — with columns named like the contexts
#: (author, category, …), a ``signature`` column feeding the
#: sig_norm/sig_subsig derivations, and upload/indexed timestamps.
#: ``hierarchy`` sources the module path (A.B.C tokenizes to its parts,
#: the reference's hierarchy expansion); ``partial`` sources the decl
#: name (name-part split).
HAYOO_FIELDS: tuple[FieldSpec, ...] = (
    FieldSpec("author", 1.0, True, "author"),
    FieldSpec("category", 1.0, False, "category"),
    FieldSpec("dependencies", 1.0, False, "dependencies"),
    FieldSpec("description", 0.3, True, "body"),
    FieldSpec("hierarchy", 0.1, True, "module"),
    FieldSpec("indexed", 1.0, False, "indexed_ts", "date"),
    FieldSpec("maintainer", 1.0, False, "maintainer"),
    # `.*`-regexp contexts store the WHOLE value as one term
    # (module:Control.Exception matches the full dotted path,
    # Examples.md:12; hierarchy separately tokenizes the parts)
    FieldSpec("module", 0.5, True, "module", token_mode="whole"),
    FieldSpec("name", 3.0, True, "name"),
    FieldSpec("package", 1.0, True, "package", token_mode="whole"),
    FieldSpec("partial", 0.2, True, "name"),
    FieldSpec("source", 0.1, False, "source", token_mode="whole"),
    FieldSpec("synopsis", 0.8, True, "synopsis"),
    FieldSpec("type", 0.0, False, "fct_type"),
    FieldSpec("upload", 1.0, False, "upload_ts", "date"),
    FieldSpec("version", 1.0, False, "version", token_mode="whole"),
    FieldSpec("signature", 1.0, False, "sig_norm"),
    FieldSpec("subsig", 0.5, False, "sig_subsig"),
)

#: the reference's signature contexts (IndexSchema.hs:123-136): both
#: NoDefault, subsig at half the signature weight; terms come from the
#: signature parser (signature.py), not the tokenizer
SIGNATURE_FIELDS: tuple[FieldSpec, ...] = (
    FieldSpec("text", 1.0, True, "body"),
    FieldSpec("signature", 1.0, False, "sig_norm"),
    FieldSpec("subsig", 0.5, False, "sig_subsig"),
)


def fkey_of(fields: tuple[FieldSpec, ...]) -> dict[str, int]:
    """Stable small-int key per field (order of declaration)."""
    return {f.name: i for i, f in enumerate(fields)}
