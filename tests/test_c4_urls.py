"""C4 rule-set and URL/domain operator tests: python re-derivation of the
line rules, blocklist filtering semantics, and plan contracts."""

import re

import pytest
from pyspark.sql import functions as F

from imops_spark.functions.text import (
    C4_TERMINAL_PUNCT,
    c4_rules_df,
    filter_by_domain_df,
    urls_df,
)

DOCS = [
    (1, "Good long sentence number one right here.\nSecond fine sentence "
        "with enough words!\nIs the third sentence long enough too?\nshort."),
    (2, "no punctuation on this long line of words\nanother such line here"),
    (3, "Lorem IPSUM dolor sit amet is flagged here.\nSecond proper "
        "sentence with enough words.\nThird proper sentence with words "
        "aplenty.\nFourth proper sentence rounds this out."),
    (4, "this { brace } is code-like content today.\nSecond proper sentence "
        "with enough words.\nThird proper sentence with enough words.\n"
        "Fourth proper sentence with enough words."),
    (5, None),
]


def _kept_lines(text, min_words=5):
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    kept = [
        ln
        for ln in lines
        if ln[-1] in C4_TERMINAL_PUNCT and len(re.split(r" +", ln)) >= min_words
    ]
    return len(lines), len(kept)


def test_c4_rules_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in c4_rules_df(df, bad_words=("flagged",)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    for i, t in DOCS:
        if t is None:
            continue
        nl, nk = _kept_lines(t)
        assert got[i]["n_lines"] == nl, i
        assert got[i]["n_kept_lines"] == nk, i
        assert got[i]["has_lorem_ipsum"] == ("lorem ipsum" in t.lower()), i
        assert got[i]["has_brace"] == ("{" in t), i
        assert got[i]["has_bad_word"] == (
            "flagged" in re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        ), i
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False  # nothing kept
    assert got[3]["keep"] is False  # lorem ipsum (case-insensitive)
    assert got[4]["keep"] is False  # brace


def test_c4_bad_word_is_whole_token(spark):
    """'assess' must not trip a blocklist containing 'ass' — whole-token
    matching, not substring."""
    df = spark.createDataFrame(
        [(1, "We assess the quality of every sentence here.")],
        "doc_id long, text string",
    )
    row = c4_rules_df(df, bad_words=("ass",), min_kept_lines=1).collect()[0]
    assert row["has_bad_word"] is False
    assert row["keep"] is True


def test_c4_zero_shuffle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        c4_rules_df(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


URL_DOCS = [
    (1, "visit https://Evil.example.COM/x?a=1 or http://fine.org/page now"),
    (2, "bare domain example.com is not a url; https://good.net is"),
    (3, "nothing here"),
]


def test_urls_df(spark):
    df = spark.createDataFrame(URL_DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["url"], r["domain"]) for r in urls_df(df).collect()
    )
    assert got == [
        (1, "http://fine.org/page", "fine.org"),
        (1, "https://Evil.example.COM/x?a=1", "evil.example.com"),
        (2, "https://good.net", "good.net"),
    ]


def test_filter_by_domain(spark):
    df = spark.createDataFrame(URL_DOCS, "doc_id long, text string")
    block = spark.createDataFrame([("EVIL.example.com",)], "domain string")
    kept = sorted(r["doc_id"] for r in filter_by_domain_df(df, block).collect())
    assert kept == [2, 3]
    out = filter_by_domain_df(df, block)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "LeftAnti" in plan


# ---------------------------------------------------------------------------
# strip_html_df
# ---------------------------------------------------------------------------


def test_strip_html_differential_vs_python(spark):
    """strip_html_df == a python `re` re-derivation of the same ordered
    step tables over markup with the hard cases: script bodies containing
    '<', case-mixed tags, comments spanning lines, double-escaped
    entities (one level of decode only), nbsp, block structure to
    newlines, blank-line collapse."""
    import re as _re

    from imops_spark.functions.text import (
        HTML_ENTITIES,
        HTML_STRIP_STEPS,
        HTML_WS_STEPS,
        strip_html_df,
    )

    def ref(s):
        if s is None:
            return None
        for pat, rep in HTML_STRIP_STEPS:
            s = _re.sub(pat, rep, s)
        for ent, rep in HTML_ENTITIES:
            s = s.replace(ent, rep)
        for pat, rep in HTML_WS_STEPS:
            s = _re.sub(pat, rep, s)
        return s

    rows = [
        (0, '<SCRIPT lang="js">if (a < b && c > d) { x(); }</SCRIPT>kept'),
        (1, "<style>p { }</style>a<!-- multi\nline\ncomment -->b"),
        (2, "<p>one</p><p>two</p>\n\n\n\n<div>three</div>"),
        (3, "&amp;amp; stays once; &amp;lt; too; &lt;b&gt; decodes"),
        (4, "a&nbsp;b &quot;q&quot; &#39;s&#39; &apos;t&apos;"),
        (5, "broken < not a tag, 3 < 5 and x > y"),
        (6, "<ul><li>i1</li><li>i2</li></ul><br>after<BR/>break"),
        (7, None),
        (8, "   lots\t\tof\r\n ws   "),
        (9, "plain text no markup at all"),
    ]
    got = {
        r["doc_id"]: r["text_clean"]
        for r in strip_html_df(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i, s in rows:
        assert got[i] == ref(s), (i, got[i], ref(s))
    # spot-pin the semantics, not just parity
    assert got[0] == "kept"                      # script CONTENT removed
    assert got[2] == "one\ntwo\n\nthree"         # blocks -> lines, blanks collapse
    assert got[3] == "&amp; stays once; &lt; too; <b> decodes"
    assert got[5] == "broken < not a tag, 3 < 5 and x > y"
    assert got[7] is None


def test_strip_html_zero_shuffle(spark):
    """The extractor must stay a pure column expression: no Exchange in
    the plan (scan-speed at 100 TB, streaming-legal)."""
    from imops_spark.functions.text import strip_html_df

    docs = spark.range(10).selectExpr(
        "id AS doc_id", "concat('<p>', CAST(id AS STRING), '</p>') AS text"
    )
    plan = (
        strip_html_df(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
