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


#: single-field schema — the pre-multi-field behavior, byte-compatible
#: scoring (weight 1.0 on extracted body text)
DEFAULT_FIELDS: tuple[FieldSpec, ...] = (FieldSpec("text", 1.0, True, "body"),)

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
