"""Hypothesis property tests for the round-4 string operators
(SURVEY.md §5.3: closed-vocab fixtures can't probe the edges real
corpora hit, so the tokenizer and URL canonicalizer get generated
adversarial input against independent pure-Python references).

Each hypothesis example is a LIST of cases evaluated in ONE Spark
job (collected into a single DataFrame) — per-example Spark overhead
would otherwise dominate; max_examples stays small on purpose.
"""

from __future__ import annotations

import unicodedata

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_glove_spark.functions.text import unicode_tokens
from spark_glove_spark.operators.dedup import canonicalize_url

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_unicode_tokens(s: str) -> list[str]:
    """Independent reference: maximal runs of Unicode category L*/N*
    (exactly Java's \\p{L} ∪ \\p{N})."""
    out, cur = [], []
    for ch in s:
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# Printable-ish unicode text without surrogates/controls; includes
# letters, digits, punctuation, CJK, combining marks.
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Cf", "Co", "Cn")
    ),
    max_size=60,
)

# --- Unicode-version agreement filter (VERDICT r5 item 1) -----------------
# The engine's \p{L}\p{N} resolve against the JVM's Unicode tables
# (Java 17 = Unicode 13.0); the Python reference uses CPython 3.11's
# unicodedata (14.0). Code points assigned between the two versions
# (Hypothesis found U+16A70, Tangsa, live) are letters to Python but
# UNASSIGNED to the JVM, so the two classifiers legitimately disagree.
# The property is therefore restricted BY DESIGN to code points both
# versions classify identically for membership in L* ∪ N*; membership
# is probed live against the very JVM under test (java.lang.Character
# .getType via py4j — the same tables java.util.regex \p{L} uses) and
# cached per code point. The divergence itself is pinned by
# test_unicode_version_skew_is_documented below and documented in
# unicode_tokens' docstring.
_JVM_LN_TYPES = frozenset({
    1, 2, 3, 4, 5,  # Lu Ll Lt Lm Lo (java.lang.Character type constants)
    9, 10, 11,      # Nd Nl No
})
_agree_cache: dict[str, bool] = {}


def _unicode_versions_agree(spark, ch: str) -> bool:
    hit = _agree_cache.get(ch)
    if hit is None:
        jvm_ln = (
            int(spark._jvm.java.lang.Character.getType(ord(ch)))
            in _JVM_LN_TYPES
        )
        py_ln = unicodedata.category(ch)[0] in ("L", "N")
        hit = _agree_cache[ch] = jvm_ln == py_ln
    return hit


@given(st.lists(_text, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_unicode_tokens_match_unicodedata_reference(spark, cases):
    cases = [
        "".join(ch for ch in s if _unicode_versions_agree(spark, ch))
        for s in cases
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, s string")
    got = {
        r["i"]: r["toks"]
        for r in df.select(
            "i", unicode_tokens(F.col("s")).alias("toks")
        ).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == _py_unicode_tokens(s), repr(s)


def test_unicode_version_skew_is_documented(spark):
    """Pin the known JVM-vs-Python Unicode-version divergence: U+16A70
    (TANGSA LETTER, added in Unicode 14.0) is a letter to CPython 3.11
    but unassigned to Java 17's Unicode 13.0 tables, so the engine
    tokenizer drops it. If a future JVM closes the gap this test fails
    loudly and the docstring caveat in unicode_tokens can be retired."""
    ch = "\U00016A70"
    assert _py_unicode_tokens(f"a {ch} b") == ["a", ch, "b"]
    df = spark.createDataFrame([(f"a {ch} b",)], "s string")
    toks = df.select(unicode_tokens(F.col("s")).alias("t")).head()["t"]
    if toks == ["a", ch, "b"]:  # JVM caught up to Unicode >= 14
        assert _unicode_versions_agree.__module__  # keep import refs
        raise AssertionError(
            "JVM now classifies U+16A70 as a letter — retire the "
            "unicode_tokens version-skew caveat"
        )
    assert toks == ["a", "b"]
    assert not _unicode_versions_agree(spark, ch)


_host_label = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789-"),
    min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_path_seg = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_."),
    min_size=1,
    max_size=8,
)
_url_core = st.tuples(
    st.lists(_host_label, min_size=2, max_size=3),  # host labels
    st.lists(_path_seg, min_size=0, max_size=3),  # path segments
    st.sampled_from(["", "?lang=en", "?q=1&x=y"]),  # REAL params kept
)


def _variants(core) -> tuple[str, list[str]]:
    """Canonical URL for a core plus messy variants that must all
    collapse to it."""
    labels, segs, params = core
    host = ".".join(labels)
    path = "".join("/" + s for s in segs)
    canonical = f"https://{host}{path}{params}"
    utm = ("&" if params else "?") + "utm_source=x"
    variants = [
        f"https://{host}{path}{params}",
        f"http://{host}{path}{params}",
        f"HTTPS://{host.upper()}{path}{params}",
        f"https://www.{host}{path}{params}",
        f"https://{host}{path}{params}{utm}",
    ]
    if not params:
        # trailing slash only merges when there's no query string
        variants.append(f"https://{host}{path}/")
    return canonical, variants


@given(st.lists(_url_core, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_url_canonicalization_collapses_variants(spark, cases):
    rows, expected = [], []
    for i, core in enumerate(cases):
        canonical, variants = _variants(core)
        for j, v in enumerate(variants):
            rows.append((i, j, v))
            expected.append((i, j, canonical))
    df = spark.createDataFrame(rows, "i int, j int, url string")
    got = {
        (r["i"], r["j"]): r["canon"]
        for r in df.select(
            "i", "j", canonicalize_url(F.col("url")).alias("canon")
        ).collect()
    }
    for i, j, canonical in expected:
        assert got[(i, j)] == canonical, (i, j, canonical, got[(i, j)])


@given(st.lists(_url_core, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_url_canonicalization_is_idempotent(spark, cases):
    urls = [_variants(c)[0] for c in cases]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    got = df.select(
        "i",
        F.col("url"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("twice"),
        canonicalize_url(F.col("url")).alias("once"),
    ).collect()
    for r in got:
        assert r["once"] == r["twice"] == r["url"], r
