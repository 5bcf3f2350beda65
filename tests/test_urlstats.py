"""URL template mining: digit-run collapse, per-host top-k with
deterministic tiebreak, occurrence-vs-distinct counting, query-string
exclusion, unparseable rows dropped."""


def test_url_templates_trap_signature_and_counts(spark):
    from walker_spark.operators.urlstats import url_templates

    urls = (
        # trap: calendar template, many distinct urls, one shape
        [(f"http://trap.com/cal/2024/{m:02d}/{d:02d}",) for m in range(1, 4) for d in range(1, 11)]
        # same url linked 3x: n_urls 3, n_distinct 1
        + [("http://trap.com/about",)] * 3
        # query string never reaches the template
        + [("http://shop.com/item/42?sid=9999",), ("http://shop.com/item/7",)]
        # unparseable -> dropped
        + [("not a url",)]
    )
    df = spark.createDataFrame(urls, "url string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["n_distinct"], r["rank"])
        for r in url_templates(df, top_k=2).collect()
    }
    assert got == {
        ("trap.com", "/cal/N/N/N"): (30, 30, 1),
        ("trap.com", "/about"): (3, 1, 2),
        ("shop.com", "/item/N"): (2, 2, 1),
    }


def test_url_templates_topk_tiebreak(spark):
    from walker_spark.operators.urlstats import url_templates

    df = spark.createDataFrame(
        [("http://h.com/b/1",), ("http://h.com/a/1",), ("http://h.com/c/1",)],
        "url string",
    )
    rows = url_templates(df, top_k=2).collect()
    # equal counts: template ascending breaks the tie
    assert [(r["template"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        ("/a/N", 1),
        ("/b/N", 2),
    ]


def test_politeness_audit_intervals_and_violations(spark):
    from walker_spark.operators.urlstats import politeness_audit

    rows = [
        ("a.com", 0), ("a.com", 500), ("a.com", 3000),   # ivs 500, 2500
        ("b.com", 10_000),                               # single fetch: no row
        ("c.com", 0), ("c.com", 0), ("c.com", 900),      # tie: ivs 0, 900
    ]
    df = spark.createDataFrame(rows, "dom string, time_ms long")
    got = {
        r["dom"]: (r["n_fetches"], r["min_interval_ms"],
                   r["avg_interval_ms"], r["violations"])
        for r in politeness_audit(df, crawl_delay_ms=1000).collect()
    }
    assert got == {
        "a.com": (3, 500, 1500, 1),
        "c.com": (3, 0, 450, 2),
    }
    # deterministic under repartitioning (tie intervals are a multiset law)
    again = {
        r["dom"]: (r["n_fetches"], r["min_interval_ms"],
                   r["avg_interval_ms"], r["violations"])
        for r in politeness_audit(df.repartition(5), crawl_delay_ms=1000).collect()
    }
    assert again == got
