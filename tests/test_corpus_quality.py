"""Corpus-quality operators: Gopher-style repetition signals,
corpus-frequency boilerplate removal, url canonicalization."""

from pyspark.sql import functions as F

from ocrd_segment_spark.functions.urls import (
    canonicalize_url,
    host_of,
    registered_domain,
)
from ocrd_segment_spark.operators.paragraphs import remove_frequent_units
from ocrd_segment_spark.operators.textstats import (
    gopher_filter,
    top_ngram_stats,
    with_repetition_signals,
)


def _sig_row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_repetition_signals(df).collect()[0]


def test_repetition_signals_duplicate_lines(spark):
    r = _sig_row(spark, "the cat sat\nthe cat sat\nhello world now")
    assert r["n_lines"] == 3 and r["n_tokens"] == 9
    assert r["dup_line_fraction"] == 0.333333
    # dup chars = 11 of 37 total line chars (2nd "the cat sat")
    assert r["dup_line_char_fraction"] == round(11 / 37, 6)
    assert r["alpha_word_fraction"] == 1.0


def test_repetition_signals_degenerate_and_empty(spark):
    r = _sig_row(spark, "a b a b a b a b")
    assert r["dup_2gram_fraction"] == round(5 / 7, 6)  # 7 grams, 2 distinct
    e = _sig_row(spark, "")
    # zero-denominator pins: ratios 0, alpha 1 (no non-alpha evidence)
    assert e["n_tokens"] == 0 and e["dup_line_fraction"] == 0.0
    assert e["alpha_word_fraction"] == 1.0 and e["mean_word_length"] == 0.0


def test_repetition_signals_symbols(spark):
    r = _sig_row(spark, "### ... … word here")
    assert r["symbol_word_ratio"] == round(5 / 5, 6)  # 3x'#' + '...' + '…'
    assert r["alpha_word_fraction"] == 0.4


def test_top_ngram_is_count_based_and_tie_safe(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "one two"), (3, "w")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in top_ngram_stats(df).collect()}
    # doc 1: grams [x y, y x, x y, y x, x y] -> top 3 of 5
    assert rows[1]["top_ngram_count"] == 3 and rows[1]["n_ngrams"] == 5
    assert rows[1]["top_ngram_fraction"] == 0.6
    assert rows[2]["top_ngram_count"] == 1
    assert 3 not in rows  # <2 tokens: no row (documented)


def test_gopher_filter_thresholds(spark):
    df = spark.createDataFrame(
        [(1, "normal sentence with several reasonable english words okay"),
         (2, "a a a a a a a a a a")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["passes"]
        for r in gopher_filter(
            with_repetition_signals(df), min_tokens=5
        ).collect()
    }
    assert out[1] is True
    assert out[2] is False  # mean word length 1, dup 2-grams 8/9


def test_remove_frequent_units_order_and_counts(spark):
    rows = [
        (1, "keep one\nboiler\nkeep two"),
        (2, "boiler\nunique a"),
        (3, "unique b\nboiler"),
        (4, "boiler\nboiler\nsolo"),  # in-doc repeat counts once for freq
        (5, "boiler only\nboiler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_frequent_units(df, min_doc_freq=3).collect()
    }
    assert out[1]["clean_text"] == "keep one\nkeep two"  # order preserved
    assert out[4]["clean_text"] == "solo" and out[4]["n_removed"] == 2
    assert out[5]["clean_text"] == "boiler only"
    assert all(out[i]["n_kept"] + out[i]["n_removed"] >= 1 for i in out)


def test_remove_repeated_units_within_doc(spark):
    """Intra-document repeats drop, first kept, order preserved;
    fully row-local (no Exchange); NULL/empty docs safe."""
    from ocrd_segment_spark.operators.paragraphs import (
        remove_repeated_units_within,
    )

    df = spark.createDataFrame(
        [(1, "a line\nb line\na line\nc line\nb line"),
         (2, "only once"),
         (3, "dup\ndup\ndup"),
         (4, ""),
         (5, None),
         (6, "x\n\n\nx\ny")],  # empty units drop, repeat removed
        "doc_id long, text string",
    )
    out = remove_repeated_units_within(df)
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
           for r in out.collect()}
    assert got[1] == ("a line\nb line\nc line", 3, 2)
    assert got[2] == ("only once", 1, 0)
    assert got[3] == ("dup", 1, 2)
    assert got[4] == ("", 0, 0)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("x\ny", 2, 1)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_remove_frequent_units_keeps_emptied_docs(spark):
    df = spark.createDataFrame(
        [(1, "spam"), (2, "spam"), (3, "spam"), (4, "real content")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_frequent_units(df, min_doc_freq=3).collect()}
    assert len(out) == 4  # emptied docs keep their row
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[4]["clean_text"] == "real content"


def test_canonicalize_url_steps(spark):
    cases = {
        # fragment + case + default port + mid-query tracker
        "HTTP://WWW.Example.COM:80/Path/Page?q=1&utm_source=x#frag":
            "http://www.example.com/Path/Page?q=1",
        # https default port + adjacent trackers first
        "https://news.example.co.uk:443/a?utm_a=1&utm_b=2&q=3":
            "https://news.example.co.uk/a?q=3",
        # tracker as only param; path case preserved
        "https://Sub.Host.COM/CaseKept?fbclid=abc": "https://sub.host.com/CaseKept",
        # non-default port kept; non-matching scheme/port combo kept
        "http://h.com:8080/p": "http://h.com:8080/p",
        "https://h.com:80/p": "https://h.com:80/p",
        # not a url: unchanged
        "not a url": "not a url",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).withColumn("c", canonicalize_url("url"))
    got = {r["url"]: r["c"] for r in df.collect()}
    assert got == cases


def test_host_and_registered_domain(spark):
    df = (
        spark.createDataFrame(
            [("https://a.b.news.example.co.uk:443/x",),
             ("http://single.org/p",), ("http://localhost/x",)],
            "url string",
        )
        .withColumn("h", host_of("url"))
        .withColumn("rd", registered_domain("h"))
    )
    rows = {r["url"]: (r["h"], r["rd"]) for r in df.collect()}
    assert rows["https://a.b.news.example.co.uk:443/x"] == (
        "a.b.news.example.co.uk", "example.co.uk")
    assert rows["http://single.org/p"] == ("single.org", "single.org")
    assert rows["http://localhost/x"] == ("localhost", "localhost")


def test_quality_ops_stay_narrow(spark):
    """Signals and canonicalization must not introduce a shuffle."""
    df = spark.createDataFrame([(1, "a b c", "http://X.com/p")],
                               "doc_id long, text string, url string")
    plan = (
        with_repetition_signals(df)
        .withColumn("c", canonicalize_url("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_redact_pii_chain(spark):
    from ocrd_segment_spark.functions.pii import pii_counts, redact_pii

    cases = {
        "contact bob@example.com or j.d+x@sub.org today":
            "contact <EMAIL> or <EMAIL> today",
        "server at 192.168.1.77 and 999.1.2.3 up":  # syntactic IPs (frozen)
            "server at <IP> and <IP> up",
        "call +1 (555) 123-4567 or 020 7946 0958":
            "call <PHONE> or <PHONE>",
        "year 2026 and version 1.2.3 stay":  # no false positives
            "year 2026 and version 1.2.3 stay",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {
        r["text"]: r["red"]
        for r in df.withColumn("red", redact_pii("text")).collect()
    }
    assert got == cases
    c = (
        df.withColumn("c", pii_counts("text"))
        .selectExpr("sum(c.n_emails) e", "sum(c.n_ips) i", "sum(c.n_phones) p")
        .collect()[0]
    )
    assert (c["e"], c["i"], c["p"]) == (2, 2, 2)


def test_contamination_flags_broadcast_and_zero_rows_kept(spark):
    from ocrd_segment_spark.operators.decontaminate import contamination_flags

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated clean training document text here"),
         (3, "tiny")],  # < n tokens: no shingles, stays clean
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "benchmark asks about the quick brown fox jumps maybe")],
        "doc_id long, text string",
    )
    out = contamination_flags(docs, bench, n=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 3  # every doc keeps its row
    assert rows[1]["contaminated"] and rows[1]["n_overlap"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_overlap"] == 0
    assert not rows[3]["contaminated"]
    # benchmark side must be broadcast (never a corpus-wide shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_url_and_pii_chains_match_duckdb_on_fuzz(spark):
    """The contract oracles restate the url/PII regexp chains in RE2
    (DuckDB) — this pins the Java-regex/RE2 common-subset claim on
    deterministic fuzz input well beyond the synthesized contract urls
    (quote/backslash/degenerate-port/empty-value cases included)."""
    import random

    import duckdb

    from ocrd_segment_spark.functions import pii

    rng = random.Random(42)
    alpha = "abXY019.:/?&=#%+-_()@ <>'\\"
    urls = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 50)))
            for _ in range(150)]
    urls += [
        "http://a.com:80?utm_=1", "https://A.B:443#", "ftp://X.Y:80/p",
        "http://:80/", "http://h:80:80/x", "HTTPS://h.co:443?utm_a=&utm_b=#f",
        "http://h/??utm_x=1", "http://h/?&&utm_a=1&&",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.withColumn("c", canonicalize_url("url")).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(i bigint, url varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(urls)))
    want = dict(con.sql(r"""
WITH s1 AS (SELECT i, regexp_replace(url, '#.*$', '') AS nf FROM t),
s2 AS (SELECT i, nf, regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS sh FROM s1),
s3 AS (SELECT i, lower(sh) || substr(nf, length(sh) + 1) AS lowered FROM s2),
s4 AS (SELECT i, regexp_replace(regexp_replace(lowered,
        '^(http://[^/:?#]+):80($|[/?#])', '\1\2'),
        '^(https://[^/:?#]+):443($|[/?#])', '\1\2') AS np FROM s3),
s5 AS (SELECT i, regexp_replace(np, '&(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '', 'g') AS t1 FROM s4),
s6 AS (SELECT i, regexp_replace(regexp_replace(t1,
        '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&', '?'),
        '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*$', '') AS t2 FROM s5)
SELECT i, regexp_replace(t2, '[?&]+$', '') FROM s6
""").fetchall())
    assert got == want

    texts = ["".join(rng.choice("abz AB09.@+-()<>#…\\'") for _ in range(rng.randint(0, 60)))
             for _ in range(150)]
    texts += ["a@b.cd e@f.ghij", "1.2.3.4.5.6.7.8", "+((1234567))9",
              "x@y.z", "..1.1.1.1..", "a@@b.com"]
    from ocrd_segment_spark.functions.pii import redact_pii

    df2 = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got2 = {r["i"]: r["r"] for r in df2.withColumn("r", redact_pii("text")).collect()}
    em = pii.EMAIL_RE.replace("\\\\", "\\")
    ip = pii.IPV4_RE.replace("\\\\", "\\")
    ph = pii.PHONE_RE.replace("\\\\", "\\")
    con.execute("create table p(i bigint, text varchar)")
    con.executemany("insert into p values (?, ?)", list(enumerate(texts)))
    want2 = dict(con.sql(f"""
SELECT i, regexp_replace(regexp_replace(regexp_replace(text,
  '{em}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{ph}', '<PHONE>', 'g') FROM p
""").fetchall())
    assert got2 == want2


def test_char_entropy_values_and_narrow_plan(spark):
    import math
    from collections import Counter

    from ocrd_segment_spark.operators.textstats import with_char_entropy

    texts = ["aaaa", "abab", "the quick brown fox", "", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    out = {r["i"]: r["char_entropy"] for r in with_char_entropy(df).collect()}
    for i, t in enumerate(texts):
        n = len(t)
        exp = 0.0 if n == 0 else round(
            -sum((c / n) * math.log2(c / n) for c in Counter(t).values()), 6
        )
        assert abs(out[i] - exp) < 1e-6, (t, out[i], exp)
        assert math.copysign(1.0, out[i]) == 1.0  # never -0.0
    plan = with_char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_lm_score_flags_gibberish_and_broadcasts(spark):
    from ocrd_segment_spark.operators.textstats import (
        bigram_lm_model,
        with_lm_score,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and then the hat"),
         (2, "zzqqxxjv wkqzx jjqz"),
         (3, "the rat ran to the mat"),
         (4, "a")],  # < 2 chars: NULL (no evidence)
        "doc_id long, text string",
    )
    model = bigram_lm_model(docs.filter("doc_id in (1, 3)"))
    out = with_lm_score(docs, model)
    rows = {r["doc_id"]: r["bits_per_bigram"] for r in out.collect()}
    assert rows[4] is None
    assert rows[2] > rows[1] and rows[2] > rows[3]  # gibberish = high bits
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # model side broadcast


def test_lm_perlang_scores_under_own_language_model(spark):
    """Per-language LM (CCNet-faithful, round-3 task 3): each doc is
    scored under ITS lang's model; a lang with no model rows scores
    NULL (never a silent global fallback); model + totals broadcast."""
    from ocrd_segment_spark.operators.textstats import (
        bigram_lm_models_by_lang,
        with_lm_score_per_lang,
    )

    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat and then the hat"),
         (2, "en", "the rat ran to the mat"),
         (3, "de", "der hund lag unter dem alten tisch im haus"),
         (4, "de", "der tisch und der hund im haus"),
         (5, "en", "zzqqxxjv wkqzx jjqz"),
         (6, "xx", "unmodeled language text here"),  # no model → NULL
         (7, "en", "a")],  # < 2 chars → NULL
        "doc_id long, lang string, text string",
    )
    models = bigram_lm_models_by_lang(docs.filter("doc_id in (1, 2, 3, 4)"))
    out = with_lm_score_per_lang(docs, models)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[6]["bits_per_bigram"] is None
    assert rows[7]["bits_per_bigram"] is None
    # gibberish under the en model scores far worse than in-model text
    assert rows[5]["bits_per_bigram"] > rows[1]["bits_per_bigram"]
    assert rows[3]["bits_per_bigram"] < rows[5]["bits_per_bigram"]
    assert all(r["lang"] is not None for r in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # composes with the real lang-id: score under the PREDICTED lang
    from ocrd_segment_spark.operators.langid import with_lang_ngram

    pred = with_lang_ngram(docs.select("doc_id", "text"), text_col="text")
    scored = with_lm_score_per_lang(
        pred, models, id_col="doc_id", lang_col="pred_lang"
    )
    got = {r["doc_id"]: r["lang"] for r in scored.collect()}
    assert got[1] == "en" and got[3] == "de"


def test_remove_frequent_regions_remaps_spans(spark):
    """Span-preserving cleanup (round-3 task 5): frequent region texts
    removed, surviving spans remapped so substring(clean_text, start,
    end) equals each region's original text; all-removed and
    zero-span documents keep rows with '' and empty arrays."""
    from ocrd_segment_spark.operators.paragraphs import remove_frequent_regions

    # schema includes the gated `dir` extra — every field must survive
    schema = (
        "url string, extracted_text string, region_spans array<struct<"
        "region_id:string,rtype:string,subtype:string,start:bigint,end:bigint,"
        "parent_id:string,order:int,score:double,dir:string>>"
    )

    def sp(rid, rt, s, e, order, d="ltr"):
        return {"region_id": rid, "rtype": rt, "subtype": "p", "start": s,
                "end": e, "parent_id": "", "order": order, "score": 1.0,
                "dir": d}

    rows = [
        ("d1", "menu\nalpha body one",
         [sp("r1", "nav", 0, 4, 0), sp("r2", "paragraph", 5, 19, 1, "rtl")]),
        ("d2", "menu\nbeta body two",
         [sp("r1", "nav", 0, 4, 0), sp("r2", "paragraph", 5, 18, 1)]),
        ("d3", "menu\ngamma body",
         [sp("r1", "nav", 0, 4, 0), sp("r2", "paragraph", 5, 15, 1)]),
        ("d4", "menu", [sp("r1", "nav", 0, 4, 0)]),      # loses everything
        ("d5", "", []),                                    # no spans at all
        ("d6", "solo text here", [sp("r9", "paragraph", 0, 14, 0)]),
        # zero-length media anchor mid-document: must not inject a
        # separator, must re-anchor to the next kept span's new start
        ("d7", "menu\npix here",
         [sp("r1", "nav", 0, 4, 0), sp("m1", "image", 5, 5, 1),
          sp("r2", "paragraph", 5, 13, 2)]),
        # zero-length anchor with nothing after it → end of clean_text
        ("d8", "tail anchor doc",
         [sp("r5", "paragraph", 0, 15, 0), sp("m2", "image", 15, 15, 1)]),
    ]
    df = spark.createDataFrame(rows, schema)
    out = {r["url"]: r for r in remove_frequent_regions(df, min_doc_freq=3).collect()}
    originals = {u: {s["region_id"]: t[s["start"]:s["end"]] for s in spans}
                 for u, t, spans in rows}
    assert out["d1"]["clean_text"] == "alpha body one"
    assert (out["d1"]["n_kept"], out["d1"]["n_removed"]) == (1, 1)
    assert out["d4"]["clean_text"] == "" and out["d4"]["region_spans"] == []
    assert out["d5"]["clean_text"] == "" and out["d5"]["region_spans"] == []
    assert out["d6"]["n_removed"] == 0
    # the gated extra survives the remap (review finding: withField,
    # not a hand-enumerated struct)
    d1_spans = {s["region_id"]: s for s in out["d1"]["region_spans"]}
    assert d1_spans["r2"]["dir"] == "rtl" and d1_spans["r2"]["subtype"] == "p"
    # zero-length anchors: no separator injected, re-anchored in order
    assert out["d7"]["clean_text"] == "pix here"
    d7 = {s["region_id"]: s for s in out["d7"]["region_spans"]}
    assert (d7["m1"]["start"], d7["m1"]["end"]) == (0, 0)
    assert (d7["r2"]["start"], d7["r2"]["end"]) == (0, 8)
    assert out["d7"]["n_kept"] == 2  # anchor + paragraph
    d8 = {s["region_id"]: s for s in out["d8"]["region_spans"]}
    assert (d8["m2"]["start"], d8["m2"]["end"]) == (15, 15)
    for url, r in out.items():
        for s in r["region_spans"]:
            piece = r["clean_text"][s["start"]:s["end"]]
            assert piece == originals[url][s["region_id"]], (url, s)
            assert s["score"] == 1.0


def test_remove_frequent_regions_randomized_invariants(spark):
    """One Spark pass over 200 seeded random documents (repeated units,
    zero-length anchors, empty docs) asserting the operator's frozen
    invariants on every row: span/text slice consistency, kept+removed
    accounting, clean_text == join of kept unit texts, sorted disjoint
    output spans."""
    import random

    from ocrd_segment_spark.operators.paragraphs import remove_frequent_regions

    rng = random.Random(77)
    # Zipf-ish pool: low indices appear in many docs (removed), high
    # indices in only 2-3 docs (repeated yet KEPT) — so the
    # min_doc_freq boundary on BOTH sides is exercised, not just
    # always-removed vs unique (review finding)
    pool = [f"unit{v} text {v}" for v in range(60)]
    docs, expected_units = [], {}
    for i in range(200):
        n = rng.randint(0, 6)
        units = [pool[min(int(rng.expovariate(0.12)), len(pool) - 1)]
                 if rng.random() < 0.7
                 else f"unique {i} {k} {rng.random():.6f}"
                 for k in range(n)]
        text = "\n".join(units)
        spans, off = [], 0
        for k, u in enumerate(units):
            spans.append({"region_id": f"r{k:03d}", "rtype": "paragraph",
                          "subtype": "p", "start": off, "end": off + len(u),
                          "parent_id": "", "order": k, "score": 1.0})
            if rng.random() < 0.25:  # zero-length anchor at unit start
                spans.append({"region_id": f"z{k:03d}", "rtype": "image",
                              "subtype": "img", "start": off, "end": off,
                              "parent_id": "", "order": k, "score": 1.0})
            off += len(u) + 1
        docs.append((f"d{i}", text, spans))
        expected_units[f"d{i}"] = units
    schema = (
        "url string, extracted_text string, region_spans array<struct<"
        "region_id:string,rtype:string,subtype:string,start:bigint,end:bigint,"
        "parent_id:string,order:int,score:double>>"
    )
    df = spark.createDataFrame(docs, schema)
    freq_t = 4
    out = remove_frequent_regions(df, min_doc_freq=freq_t).collect()
    assert len(out) == 200
    # doc-frequency ground truth from the generator
    from collections import Counter

    doc_freq = Counter()
    for units in expected_units.values():
        for u in set(u for u in units if u):
            doc_freq[u] += 1
    originals = {u: {s["region_id"]: (t[s["start"]:s["end"]], s["start"])
                     for s in spans} for u, t, spans in docs}
    for r in out:
        url, clean = r["url"], r["clean_text"]
        kept_units = [u for u in expected_units[url]
                      if u and doc_freq[u] < freq_t]
        assert clean == "\n".join(kept_units), url
        pos = [s for s in r["region_spans"] if s["end"] > s["start"]]
        zeros = [s for s in r["region_spans"] if s["end"] == s["start"]]
        assert len(pos) == len(kept_units), url
        assert r["n_kept"] == len(pos) + len(zeros)
        assert r["n_removed"] == sum(
            1 for u in expected_units[url] if u and doc_freq[u] >= freq_t
        )
        prev = None
        for s in sorted(pos, key=lambda s: s["start"]):
            piece = clean[s["start"]:s["end"]]
            assert piece == originals[url][s["region_id"]][0], (url, s)
            if prev is not None:
                assert s["start"] > prev  # separator between kept units
            prev = s["end"]
        for z in zeros:
            assert 0 <= z["start"] == z["end"] <= len(clean)
        # output array ordered by (start, end)
        keys = [(s["start"], s["end"]) for s in r["region_spans"]]
        assert keys == sorted(keys), url


def test_kernel_region_text_never_contains_separator():
    """The O(n) span-remap derives offsets from separator positions in
    clean_text — valid because kernel extraction never emits a region
    whose text contains the region separator (internal whitespace is
    collapsed; regions are JOINED by it). Pin that invariant."""
    from ocrd_segment_spark.config import ExtractParams
    from ocrd_segment_spark.fixtures import gen_pages
    from ocrd_segment_spark.oracle import extract_corpus

    sep = ExtractParams().region_separator
    for r in extract_corpus(gen_pages(150, seed=9)):
        t = r["extracted_text"]
        for s in r["region_spans"]:
            assert sep not in t[s["start"]:s["end"]]


def test_lm_bits_narrow_equals_relational(spark):
    """with_lm_bits (the single-lineage job form: collected JVM
    surprisals + narrow mapInPandas) must produce the SAME values as
    the relational with_lm_score_per_lang — one frozen semantics, two
    execution shapes."""
    from ocrd_segment_spark.operators.textstats import (
        bigram_lm_models_by_lang,
        collect_lm_surprisal,
        with_lm_bits,
        with_lm_score_per_lang,
    )

    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat and then the hat"),
         (2, "en", "zzqqxxjv wkqzx jjqz"),
         (3, "de", "der hund lag unter dem alten tisch im haus"),
         (4, "xx", "unmodeled language"),
         (5, "en", "a")],
        "doc_id long, lang string, text string",
    )
    models = bigram_lm_models_by_lang(docs.filter("doc_id in (1, 3)"))
    relational = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in with_lm_score_per_lang(docs, models).collect()
    }
    narrow = with_lm_bits(docs, collect_lm_surprisal(models))
    got = {r["doc_id"]: r["bits_per_bigram"] for r in narrow.collect()}
    assert got == relational
    # the narrow form shuffles nothing
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_lm_bits_vectorized_matches_scalar_fold(spark):
    """Round-6: with_lm_bits' vectorized per-doc scorer (packed-int64
    bigrams + np.unique + 0.0-seeded add.accumulate) must be
    BIT-identical to the frozen scalar fold (Counter + sorted + seeded
    num += n*s) on an adversarial fuzz corpus — mixed scripts, repeats,
    high-entropy runs, unmodeled languages, sub-2-char docs."""
    import math
    import random

    from collections import Counter

    from ocrd_segment_spark.operators.langid import _round6
    from ocrd_segment_spark.operators.textstats import (
        bigram_lm_models_by_lang,
        collect_lm_surprisal,
        with_lm_bits,
    )

    rng = random.Random(17)
    alphabet = "abcdefgh ijklmno pqrs.,!?é千里足の馬БГД\t\n\U0001F600"
    seed_rows = [
        (i, rng.choice(["en", "de"]),
         "".join(rng.choice(alphabet) for _ in range(rng.randint(50, 400))))
        for i in range(40)
    ]
    fuzz_rows = [
        (100 + i, rng.choice(["en", "de", "xx"]),
         "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300))))
        for i in range(400)
    ] + [(900, "en", ""), (901, "en", "a"), (902, "xx", "ab"),
         (903, "de", "\U0001F600é"), (904, "en", "zz" * 200)]
    docs = spark.createDataFrame(
        seed_rows + fuzz_rows, "doc_id long, lang string, text string"
    )
    models = bigram_lm_models_by_lang(docs.filter("doc_id < 40"))
    table, oov = collect_lm_surprisal(models)

    def scalar_bits(t, lang):  # the pre-round-6 UDF body, verbatim
        if len(t) < 2 or lang not in oov:
            return None
        c = Counter(t[i : i + 2] for i in range(len(t) - 1))
        o = oov[lang]
        num, den = 0.0, 0
        for bg in sorted(c):
            n = c[bg]
            num += n * table.get((lang, bg), o)
            den += n
        return _round6(num / den)

    got = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in with_lm_bits(docs, (table, oov)).collect()
    }
    for did, lang, text in seed_rows + fuzz_rows:
        want = scalar_bits(text, lang)
        g = got[did]
        if want is None:
            assert g is None, (did, g)
        else:
            assert g == want and math.copysign(1, g) == math.copysign(1, want), (
                did, g, want
            )


def test_compression_cols_equals_compression_ratio(spark):
    from ocrd_segment_spark.operators.textstats import (
        compression_ratio,
        with_compression_cols,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox " * 20), (2, "ab" * 5), (3, "")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["compression_ratio"]
         for r in compression_ratio(docs).collect()}
    out = with_compression_cols(docs)
    b = {r["doc_id"]: r["compression_ratio"] for r in out.collect()}
    assert a == b
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_corpus_job_quality_signal_funnel(spark, tmp_path):
    """--entropy-min / --lm-ref+--lm-max-bits / --max-compression as
    funnel drop stages (round-3 task 8): each crafted page is dropped
    by exactly its stage, counters reconcile, and the funnel schema is
    fixed (-1 only when a stage is off)."""
    from jobs.corpus_job import build_corpus

    good0 = "the children were playing in the garden near the river all afternoon"
    good1 = "she opened the window and watched the quiet street below the house"
    pages = [
        ("good0", good0),
        ("good1", good1),
        # degenerate fill: char entropy ≈ 0.8 → dropped_entropy
        ("lowent", "aaaaaaaaaaaaaaaaaaaaaaaa aaaaaaaaaaaaaaaaaaaa"),
        # English-predicted gibberish: terrible under the en LM
        ("gibber", "the zzqqxx the wkqzx the jjqzvv the qqzzxx the xxqqzz"),
    ]
    rows = [
        (url, f"<html><body><p>{t}</p></body></html>".encode())
        for url, t in pages
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    ref = str(tmp_path / "lm_ref")
    spark.createDataFrame(
        [("en", good0), ("en", good1),
         ("en", "there is nothing better than a warm cup of tea in the evening")],
        "lang string, text string",
    ).write.parquet(ref)

    funnel = build_corpus(
        spark,
        src,
        str(tmp_path / "corpus"),
        min_quality=0.0,
        min_tokens=0,
        entropy_min=2.0,
        lm_ref_path=ref,
        # tiny 3-sentence ref model → smoothing keeps even in-model
        # text near ~6.25 bits; gibberish lands ~6.9 — threshold
        # between them (a real reference corpus separates far wider)
        lm_max_bits=6.5,
    )
    assert funnel["pages"] == 4
    assert funnel["dropped_entropy"] == 1
    assert funnel["dropped_lm"] == 1
    assert funnel["dropped_compression"] == -1  # stage off
    assert funnel["corpus_docs"] == 2
    kept = spark.read.parquet(str(tmp_path / "corpus"))
    assert {r["url"] for r in kept.collect()} == {"good0", "good1"}
    # signal columns ride the output when their stage ran
    assert {"char_entropy", "bits_per_bigram"} <= set(kept.columns)
    assert "compression_ratio" not in kept.columns

    # compression stage: random-ish junk is incompressible (ratio near
    # or above 1 for short text); its lang is unmodeled → LM keeps it,
    # compression drops it — the precedence chain in action
    junk = "qwxzkvj bnmplr tgyhu wsxedc rfvtgb yhnujm ikolpq azsedr"
    rows2 = rows + [
        ("junk", f"<html><body><p>{junk}</p></body></html>".encode())
    ]
    src2 = str(tmp_path / "pages2")
    spark.createDataFrame(rows2, "url string, html binary").write.parquet(src2)
    funnel2 = build_corpus(
        spark,
        src2,
        str(tmp_path / "corpus2"),
        min_quality=0.0,
        min_tokens=0,
        entropy_min=2.0,
        # short docs all compress poorly (zlib overhead): good ≈ 0.93,
        # junk ≈ 1.02 — the threshold sits between them
        max_compression=0.98,
    )
    assert funnel2["dropped_entropy"] == 1
    assert funnel2["dropped_lm"] == -1
    assert funnel2["dropped_compression"] >= 1
    kept2 = {r["url"] for r in
             spark.read.parquet(str(tmp_path / "corpus2")).collect()}
    assert "junk" not in kept2 and {"good0", "good1"} <= kept2


def test_domain_blocklist_flags_and_broadcasts(spark):
    """with_domain_blocked: registered-domain match against a
    broadcast blocklist; two-level public suffixes honored; flag not
    drop."""
    from ocrd_segment_spark.functions.urls import with_domain_blocked

    docs = spark.createDataFrame(
        [(1, "https://WWW.Spam.COM/x"),
         (2, "http://news.spam.co.uk/y"),
         (3, "https://sub.clean.org/z"),
         (4, "http://spam.com.evil.net/a")],  # spam.com as SUBDOMAIN: clean
        "doc_id long, url string",
    )
    # mixed case + padding: published lists arrive unnormalized (CRLF
    # files leave \r, CSV exports leave tabs/NBSP), and a verbatim
    # match would silently block nothing (review findings, two rounds)
    bl = spark.createDataFrame(
        [("Spam.COM\r",), ("\tspam.co.uk" + "\u00a0",)], "domain string"
    )
    out = with_domain_blocked(docs, bl)
    got = {r["doc_id"]: (r["reg_domain"], r["blocked"]) for r in out.collect()}
    assert got[1] == ("spam.com", True)
    assert got[2] == ("spam.co.uk", True)
    assert got[3] == ("clean.org", False)
    assert got[4] == ("evil.net", False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nfc_normalization_semantics(spark):
    """with_nfc: decomposed sequences compose, composed text is
    untouched, NULL counts as empty; values equal stdlib unicodedata."""
    import unicodedata

    from ocrd_segment_spark.functions.normalize import with_nfc

    acute, ring = chr(0x0301), chr(0x030A)  # combining marks, explicit
    cases = [
        (1, "cafe" + acute),          # e + combining acute composes
        (2, "caf" + chr(0xE9)),       # already composed: unchanged
        (3, "A" + ring + " ring"),    # A + ring above composes
        (4, ""),
        (5, None),
        (6, "ascii only text"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_nfc"], r["nfc_changed"])
           for r in with_nfc(df).collect()}
    assert got[1] == ("caf" + chr(0xE9), True)
    assert got[2] == ("caf" + chr(0xE9), False)
    assert got[3] == (chr(0xC5) + " ring", True)
    assert got[4] == ("", False)
    assert got[5] == ("", False)
    assert got[6] == ("ascii only text", False)
    for i, t in cases:
        if t:
            assert got[i][0] == unicodedata.normalize("NFC", t)


def test_corpus_job_domain_blocklist(spark, tmp_path):
    """--blocklist drops pages BEFORE extraction (blocked pages never
    pay kernel time); the count rides the same terminal write."""
    from jobs.corpus_job import build_corpus

    pages = [
        ("https://spam.com/a", "the children were playing in the garden today"),
        ("https://news.spam.co.uk/b", "she opened the window this morning"),
        ("https://clean.org/c", "there is nothing better than a warm cup of tea"),
    ]
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in pages]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    bl = str(tmp_path / "bl")
    spark.createDataFrame(
        [("spam.com",), ("spam.co.uk",)], "domain string"
    ).write.parquet(bl)
    funnel = build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=0, blocklist_path=bl,
    )
    assert funnel["dropped_domain"] == 2
    assert funnel["pages"] == 1  # pages entering extraction
    assert funnel["corpus_docs"] == 1
    kept = {r["url"] for r in
            spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert kept == {"https://clean.org/c"}


def test_corpus_job_writes_dataset_card(spark, tmp_path):
    """--card writes <output>_card post-write with the per-language
    aggregates matching the committed corpus (pins the hardcoded
    pred_lang/extracted_text column names against schema drift)."""
    from jobs.corpus_job import build_corpus

    texts = {
        "a": "the children were playing in the garden near the river today",
        "b": "she opened the window and watched the quiet street",
        "c": "die kinder spielten im garten am fluss den ganzen tag",
    }
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in texts.items()]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    build_corpus(spark, src, str(tmp_path / "corpus"),
                 min_quality=0.0, min_tokens=0, card=True)
    corpus = spark.read.parquet(str(tmp_path / "corpus")).collect()
    card = {r["lang"]: r for r in
            spark.read.parquet(str(tmp_path / "corpus") + "_card").collect()}
    from collections import Counter

    by_lang = Counter(r["pred_lang"] for r in corpus)
    assert {l: c["n_docs"] for l, c in card.items()} == dict(by_lang)
    for lang, c in card.items():
        chars = [len(r["extracted_text"]) for r in corpus
                 if r["pred_lang"] == lang]
        assert c["total_chars"] == sum(chars)
        assert c["n_docs"] == len(chars)


def test_corpus_job_bpe_metering(spark, tmp_path):
    """--count-bpe meters the kept corpus in subword tokens: the
    funnel total rides the write Observation and equals the per-doc
    column sum; off → -1 and no column."""
    from jobs.corpus_job import build_corpus

    texts = {
        "a": "the children were playing in the garden near the river",
        "b": "she opened the window and watched the quiet street",
    }
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in texts.items()]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    funnel = build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=0, count_bpe=True,
    )
    kept = spark.read.parquet(str(tmp_path / "corpus"))
    assert "n_bpe_tokens" in kept.columns and "n_unk_pieces" in kept.columns
    col_sum = sum(r["n_bpe_tokens"] for r in kept.collect())
    assert funnel["kept_bpe_tokens"] == col_sum > 0
    funnel_off = build_corpus(
        spark, src, str(tmp_path / "corpus_off"),
        min_quality=0.0, min_tokens=0,
    )
    assert funnel_off["kept_bpe_tokens"] == -1
    assert "n_bpe_tokens" not in spark.read.parquet(
        str(tmp_path / "corpus_off")
    ).columns


def test_ccnet_buckets_semantics(spark):
    """Terciles partition scored docs ~evenly; NULL bits land in
    'unscored'; 'head' is the LOWEST-surprisal third (CCNet keeps it)."""
    from ocrd_segment_spark.operators.textstats import with_ccnet_buckets

    rows = [(i, float(i)) for i in range(1, 10)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, bits_per_bigram double")
    out = {r["doc_id"]: r["ccnet_bucket"]
           for r in with_ccnet_buckets(df).collect()}
    assert out[100] == out[101] == "unscored"
    assert all(out[i] == "head" for i in (1, 2, 3))
    assert all(out[i] == "middle" for i in (4, 5, 6))
    assert all(out[i] == "tail" for i in (7, 8, 9))
    # bucket of the best (lowest-bits) doc is head, worst is tail
    assert out[1] == "head" and out[9] == "tail"


def test_compression_ratio_pins_zlib_exactly(spark):
    """The rows-only contract key's strong local oracle: values must
    equal the same zlib computation done directly in Python, and the
    signal must separate repetitive from natural text."""
    import zlib

    from ocrd_segment_spark.operators.textstats import compression_ratio

    texts = {
        1: "spam " * 200,
        2: "the quick brown fox jumps over the lazy dog and keeps on "
           "running through fields of varied unrepeated words entirely",
        3: "",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in texts.items():
        b = t.encode("utf-8")
        c = len(zlib.compress(b, 6))
        assert out[i]["n_bytes"] == len(b)
        assert out[i]["compressed_bytes"] == c
        exp = round(c / len(b), 6) if b else 0.0
        assert out[i]["compression_ratio"] == exp
    assert out[1]["compression_ratio"] < 0.05 < out[2]["compression_ratio"]


def test_ccnet_buckets_single_upstream_evaluation(spark):
    """Round-5 safe default: deriving cutoffs localCheckpoints the
    input first, so an uncached expensive upstream evaluates ONCE (the
    round-4 verdict flagged the double evaluation of the lineage
    branch). Pinned with an accumulator inside a mapInPandas upstream,
    and the approx default buckets a clean tercile input correctly."""
    from ocrd_segment_spark.operators.textstats import with_ccnet_buckets

    acc = spark.sparkContext.accumulator(0)

    def counting(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    base = spark.range(0, 90, 1, 4).selectExpr(
        "id as doc_id", "cast(id % 9 as double) as bits_per_bigram"
    )
    up = base.mapInPandas(counting, "doc_id long, bits_per_bigram double")
    out = with_ccnet_buckets(up)  # default: derive (approx) — checkpoints
    rows = out.collect()
    assert acc.value == 90, f"upstream evaluated {acc.value/90:.1f}x"
    got = {r["doc_id"]: r["ccnet_bucket"] for r in rows}
    # bits = doc_id % 9 uniform over 0..8: terciles at <=2 / <=5 / rest
    assert all(
        b == ("head" if d % 9 <= 2 else "middle" if d % 9 <= 5 else "tail")
        for d, b in got.items()
    )

    # cuts= skips both the derivation branch and the checkpoint
    acc2 = spark.sparkContext.accumulator(0)

    def counting2(it):
        for pdf in it:
            acc2.add(len(pdf))
            yield pdf

    up2 = base.mapInPandas(counting2, "doc_id long, bits_per_bigram double")
    with_ccnet_buckets(up2, cuts=(2.0, 5.0)).collect()
    assert acc2.value == 90


def test_corpus_job_preserve_spans_boilerplate(spark, tmp_path):
    """--boilerplate-min-df --preserve-spans end-to-end (round-5 task
    4): the clean table carries REMAPPED region_spans — every positive
    span slices clean_text to exactly the region text of the original
    corpus — and the funnel gains the preserved-variant counter."""
    from jobs.corpus_job import build_corpus

    boiler = "subscribe to our newsletter for updates every week"
    bodies = [
        "the children were playing in the garden near the river all afternoon",
        "she opened the window and watched the quiet street below the house",
        "there is nothing better than a warm cup of tea in the evening",
    ]
    rows = [
        (
            f"u{i}",
            (
                f"<html><body><h1>story {i} of the day</h1>"
                f"<p>{b}</p><p>{boiler}</p></body></html>"
            ).encode(),
        )
        for i, b in enumerate(bodies)
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)

    funnel = build_corpus(
        spark,
        src,
        str(tmp_path / "corpus"),
        min_quality=0.0,
        min_tokens=1,
        boilerplate_min_df=3,
        preserve_spans=True,
    )
    assert funnel["boilerplate_regions_removed"] == 3
    assert funnel["boilerplate_units_removed"] == -1  # line variant off

    orig = {
        r["url"]: r
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    clean = spark.read.parquet(str(tmp_path / "corpus") + "_clean").collect()
    assert len(clean) == 3
    for r in clean:
        assert boiler not in r["clean_text"]
        o = orig[r["url"]]
        orig_texts = {
            o["extracted_text"][s["start"]:s["end"]]
            for s in o["region_spans"]
        }
        assert len(r["region_spans"]) == len(o["region_spans"]) - 1
        for s in r["region_spans"]:
            # every remapped span slices clean_text to a region text
            # that existed verbatim in the original document
            assert r["clean_text"][s["start"]:s["end"]] in orig_texts


def test_corpus_job_line_boilerplate_unchanged(spark, tmp_path):
    """Without --preserve-spans the line-based strip keeps its
    round-3 behavior and funnel key (span-less corpora path)."""
    from jobs.corpus_job import build_corpus

    boiler = "subscribe to our newsletter for updates every week"
    rows = [
        (
            f"u{i}",
            (
                f"<html><body><p>a unique sentence number {i} here"
                f"</p><p>{boiler}</p></body></html>"
            ).encode(),
        )
        for i in range(3)
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    funnel = build_corpus(
        spark,
        src,
        str(tmp_path / "corpus"),
        min_quality=0.0,
        min_tokens=1,
        boilerplate_min_df=3,
    )
    assert funnel["boilerplate_units_removed"] == 3
    assert funnel["boilerplate_regions_removed"] == -1
    clean = spark.read.parquet(str(tmp_path / "corpus") + "_clean")
    assert "region_spans" not in clean.columns


def test_corpus_job_redact_pii_spans(spark, tmp_path):
    """--redact-pii end-to-end (round-5 task 5): <output>_redacted
    carries clean_text with PII tokens and REMAPPED spans that slice
    it exactly; the funnel counts redacted docs."""
    from jobs.corpus_job import build_corpus

    rows = [
        ("u0", b"<html><body><h1>contact page for the team</h1>"
               b"<p>write to alice@example.org or call +1 (555) 123-9876"
               b" whenever you like during the week</p></body></html>"),
        ("u1", b"<html><body><p>a perfectly ordinary page about gardens"
               b" and the weather this afternoon</p></body></html>"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    funnel = build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=1, redact_pii=True,
    )
    assert funnel["pii_docs_redacted"] == 1
    red = {r["url"]: r for r in spark.read.parquet(
        str(tmp_path / "corpus") + "_redacted").collect()}
    assert "<EMAIL>" in red["u0"]["clean_text"]
    assert "<PHONE>" in red["u0"]["clean_text"]
    assert "alice@example.org" not in red["u0"]["clean_text"]
    assert red["u0"]["n_pii_regions"] == 1 and red["u1"]["n_pii_regions"] == 0
    for r in red.values():
        for s in r["region_spans"]:
            piece = r["clean_text"][s["start"]:s["end"]]
            assert "@" not in piece or "<EMAIL>" in piece
        # spans tile clean_text: join of pieces == clean_text
        pos = sorted((s["start"], s["end"]) for s in r["region_spans"]
                     if s["end"] > s["start"])
        rebuilt = "\n".join(r["clean_text"][a:b] for a, b in pos)
        assert rebuilt == r["clean_text"]


def test_corpus_job_clean_then_redact_composition(spark, tmp_path):
    """--preserve-spans + --redact-pii compose: the redacted table is
    built from the CLEANED table (review round-5 finding — it used to
    silently scrub the uncleaned corpus, reintroducing boilerplate)."""
    from jobs.corpus_job import build_corpus

    boiler = "write to webmaster@example.com for any takedown requests"
    bodies = [
        "the children were playing in the garden near the river all afternoon",
        "she opened the window and watched the quiet street below the house",
        "there is nothing better than a warm cup of tea in the evening",
    ]
    rows = [
        (f"u{i}", (f"<html><body><p>{b}</p><p>{boiler}</p>"
                   "</body></html>").encode())
        for i, b in enumerate(bodies)
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=1,
        boilerplate_min_df=3, preserve_spans=True, redact_pii=True,
    )
    red = spark.read.parquet(str(tmp_path / "corpus") + "_redacted").collect()
    assert len(red) == 3
    for r in red:
        # the boiler region was removed by the CLEAN pass, so the
        # redacted table must not contain it (in any form)
        assert "webmaster" not in r["clean_text"]
        assert "<EMAIL>" not in r["clean_text"]  # nothing left to redact
        for s in r["region_spans"]:
            assert 0 <= s["start"] <= s["end"] <= len(r["clean_text"])


def test_corpus_job_content_type_gate(spark, tmp_path):
    """--sniff-content-type drops non-html bodies BEFORE extraction
    (a pdf and a png mislabeled as pages never pay kernel time); the
    count rides the terminal write."""
    from jobs.corpus_job import build_corpus

    html = "<html><body><p>the children were playing in the garden" \
           " near the river today</p></body></html>"
    rows = [
        ("https://a.org/page", html.encode()),
        ("https://a.org/doc.pdf", b"%PDF-1.7 not a page at all"),
        ("https://a.org/logo", b"\x89PNG\r\n\x1a\n...."),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    funnel = build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=0, sniff_content_type=True,
    )
    assert funnel["dropped_content_type"] == 2
    assert funnel["pages"] == 1
    assert funnel["corpus_docs"] == 1
    kept = {r["url"] for r in
            spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert kept == {"https://a.org/page"}
    # flag off → stage not run is -1, not 0 (fixed-schema discipline)
    funnel2 = build_corpus(
        spark, src, str(tmp_path / "corpus2"),
        min_quality=0.0, min_tokens=0,
    )
    assert funnel2["dropped_content_type"] == -1


def test_c4_line_clean_rules(spark):
    """C4 line rules: terminal punctuation, min-words, javascript;
    page rules: curly brackets / lorem ipsum on the ORIGINAL text and
    the sentence floor on the KEPT text."""
    from ocrd_segment_spark.operators.paragraphs import c4_line_clean

    rows = [
        (1, "A good first sentence stands entirely alone here.\n"
            "Too short.\n"
            "No terminal punctuation on this middle line\n"
            "Please enable JavaScript to continue reading now.\n"
            "Did the final question have enough words in it?\n"
            "And one more closing sentence arrives right here!"),
        (2, "Lorem Ipsum is placeholder text used since forever.\n"
            "Another perfectly fine sentence with many words follows."),
        (3, "A page that talks about code like function() { return; }.\n"
            "Second sentence is long enough to survive the filters.\n"
            "Third sentence is also long enough to survive today."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_clean(df).collect()}
    d1 = got[1]
    assert d1["n_kept"] == 3 and d1["n_removed"] == 3
    assert "JavaScript" not in d1["clean_text"]
    assert d1["clean_text"].count("\n") == 2
    assert d1["n_sentences"] == 3 and d1["c4_page_keep"] is True
    # lorem ipsum: lines survive the LINE rules, the PAGE flag drops
    assert got[2]["n_kept"] == 2 and got[2]["c4_page_keep"] is False
    # curly bracket page
    assert got[3]["c4_page_keep"] is False and got[3]["n_kept"] == 3
    assert got[4]["clean_text"] == "" and got[4]["c4_page_keep"] is False


def test_c4_clean_regions_preserves_spans(spark):
    """Span-preserving C4: regions failing the line rules drop, the
    survivors' spans remap so substring(clean_text, start, end)
    reproduces each region's original text; page flags ride along."""
    from ocrd_segment_spark.operators.paragraphs import c4_clean_regions

    schema = (
        "url string, extracted_text string, region_spans array<struct<"
        "region_id:string,rtype:string,start:bigint,end:bigint,order:int>>"
    )

    def sp(rid, rt, s, e, order):
        return {"region_id": rid, "rtype": rt, "start": s, "end": e,
                "order": order}

    t1 = ("Site nav menu links\n"
          "This paragraph carries the actual article content here.\n"
          "Is a second full sentence present in this region too?\n"
          "But why!")
    s1 = [sp("r1", "nav", 0, 19, 0), sp("r2", "paragraph", 20, 75, 1),
          sp("r3", "paragraph", 76, 129, 2), sp("r4", "paragraph", 130, 138, 3)]
    rows = [("d1", t1, s1)]
    df = spark.createDataFrame(rows, schema)
    out = {r["url"]: r for r in c4_clean_regions(df, min_sentences=2).collect()}
    d1 = out["d1"]
    originals = {s["region_id"]: t1[s["start"]:s["end"]] for s in s1}
    kept_ids = {s["region_id"] for s in d1["region_spans"]}
    assert kept_ids == {"r2", "r3"}     # nav: no terminal punct; r4: short
    assert d1["n_kept"] == 2 and d1["n_removed"] == 2
    for s in d1["region_spans"]:
        assert d1["clean_text"][s["start"]:s["end"]] == originals[s["region_id"]]
    assert d1["n_sentences"] == 2 and d1["c4_page_keep"] is True
