"""URL canonicalization and domain extraction — the web-corpus
curation surface (URL-level dedup, per-domain caps/blocklists) every
large-scale pretraining pipeline runs before text-level dedup.

The reference has no web-corpus stage (its inputs are bank PDF drops);
this extends the engine's beyond-reference surface the same way the
dedup/ANN family does (SURVEY §7.2 step 8). All functions are pure
Catalyst expressions (regexp chains) — whole-stage codegen, zero
Python, and exactly reproducible in ANSI SQL for the oracle gate
(q101).

Canonicalization rule (the common-denominator policy of CC-style
pipelines): lowercase → strip scheme → strip fragment → strip query →
strip leading ``www.`` → strip trailing slash. Deliberately NOT
percent-decoding or sorting residual params: those transforms are not
universally safe (semantics can change), and a canonical form must
only ever merge URLs that serve identical content.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Country-code second-level labels under which the registrable name
#: sits one label deeper (public-suffix heuristic: the full PSL is a
#: data file; this covers the dominant cc-SLD families).
_CC_SLDS = (
    "co com org net ac gov edu mil"
).split()


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL (see module policy). Idempotent."""
    c = F.lower(F.trim(url))
    c = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")  # scheme
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(c, r"\?.*$", "")  # query
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"/+$", "")  # trailing slash(es)
    return c


def url_host(canonical: Column) -> Column:
    """Host part of an already-canonicalized URL (text before the
    first slash)."""
    return F.regexp_extract(canonical, r"^([^/]+)", 1)


def registered_domain(host: Column) -> Column:
    """Registrable domain: last two labels, or last three when the
    second-to-last label is a known cc-SLD (``example.co.uk`` →
    ``example.co.uk``, ``a.b.example.com`` → ``example.com``).
    Heuristic stand-in for the public-suffix list — documented, and
    swappable for a broadcast PSL dimension without touching callers.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second_last = F.element_at(parts, -2)
    take3 = (n >= 3) & second_last.isin(*_CC_SLDS)
    return F.when(
        n <= 2, F.array_join(parts, ".")
    ).otherwise(
        F.when(take3, F.array_join(F.slice(parts, n - 2, 3), "."))
        .otherwise(F.array_join(F.slice(parts, n - 1, 2), "."))
    )
