"""URL template mining: crawler-trap detection for the frontier.

Calendar pages, session ids, faceted navigation, and print/sort
variants generate unbounded url families that differ only in embedded
numbers, hex tokens, or query values. Grouping urls by a STRUCTURAL
template exposes those families: a template claiming thousands of
urls on one host is a trap (or at best a low-value archive section),
and the frontier should cap or skip it. This is the RefinedWeb-style
anti-domination idea (operators/sampling.domain_cap) pushed below the
host grain — the cap composes directly: ``domain_cap(df, cap,
domain_col=<template column>)``.

Frozen templatization rule (both engines restate it; Java-regex/RE2
common subset, replacements are whole-match so the $1-vs-\\1 dialect
difference never appears):

- the fragment (``#…``) is dropped; ``host`` is the shared lowercased
  host derivation (functions/urls.host_of); the path is everything
  from the first ``/`` after the authority to the ``?`` (an empty
  path reads ``/``);
- in the path, lowercase-hex runs of >= 8 chars become ``{x}``
  (session ids, content hashes — checked FIRST because digits are
  hex), then remaining digit runs become ``{d}``;
- query parameter NAMES survive, sorted and deduplicated, values and
  order dropped: parameters split on ``&``, a name is the text before
  the first ``=``, empties vanish;
- ``template = host || templatized-path [|| '?' || names]``.

Scale shape (100 TB): templatization is scan-stage column math;
mining is one partial-aggregable group on the template (the hot
templates are exactly the ones map-side combine crushes). The trap
LIST is tiny — heavy templates only — so flagging joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.urls import host_of

HEX_RUN = "[0-9a-f]{8,}"
DIGIT_RUN = "[0-9]+"


def url_template(col: str) -> Column:
    """The frozen structural template of a url column (see module
    docstring). Pure column expressions — usable in any scan."""
    no_frag = F.regexp_replace(F.col(col), "#.*$", "")
    tail = F.regexp_replace(
        no_frag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    path = F.substring_index(tail, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tpl_path = F.regexp_replace(
        F.regexp_replace(path, HEX_RUN, "{x}"), DIGIT_RUN, "{d}"
    )
    # anchored: strips everything up to and including the FIRST '?';
    # with no '?' the greedy [^?]* eats the whole tail -> ''
    query = F.regexp_replace(tail, "^[^?]*\\??", "")
    names = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.split(query, "&"),
                        lambda p: F.substring_index(p, "=", 1),
                    ),
                    lambda x: x != "",
                )
            )
        ),
        "&",
    )
    return F.concat(
        host_of(col),
        tpl_path,
        F.when(names != "", F.concat(F.lit("?"), names)).otherwise(F.lit("")),
    )


def template_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(template, n_urls, exemplar) — one row per structural template;
    the exemplar is min(url), the deterministic tie-break."""
    return (
        df.select(
            url_template(url_col).alias("template"),
            F.col(url_col).alias("__url"),
        )
        .groupBy("template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("__url").alias("exemplar"),
        )
    )


def trap_templates(
    df: DataFrame, url_col: str = "url", min_urls: int = 1000
) -> DataFrame:
    """Templates whose url count reaches ``min_urls`` — the trap list
    a frontier caps or skips. Tiny by construction (heavy templates
    only); broadcast it back onto candidates."""
    return template_stats(df, url_col).filter(F.col("n_urls") >= min_urls)
