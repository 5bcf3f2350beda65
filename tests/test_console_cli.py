"""Console/CRUD views, redirect-chain rows, config loading, CLI
(reference: datastore.go CRUD + model_test.go shapes, cmd/cmd.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.crawlfix import NOW_MS, build_store, days_ago, domain_row, link_row
from walker_spark.config import WalkerConfig
from walker_spark.operators import console
from walker_spark.operators.fetch import redirect_link_rows


def _store(spark, tmp_path):
    domains = [domain_row(d) for d in ("a.com", "b.com", "c.com")]
    links = [
        link_row("http://a.com/p1.html", days_ago(1), 200),
        link_row("http://a.com/p1.html", days_ago(3), 200),
        link_row("http://a.com/p2.html"),
        link_row("http://www.a.com/p3.html"),
        link_row("http://b.com/x.html"),
    ]
    return build_store(spark, str(tmp_path), domains, links)


def test_list_domains_keyset(spark, tmp_path):
    store = _store(spark, tmp_path)
    assert [r["dom"] for r in console.list_domains(store).collect()] == [
        "a.com", "b.com", "c.com",
    ]
    assert [r["dom"] for r in console.list_domains(store, seek_dom="a.com").collect()] == [
        "b.com", "c.com",
    ]
    assert console.find_domain(store, "b.com").count() == 1


def test_list_links_latest_and_pagination(spark, tmp_path):
    store = _store(spark, tmp_path)
    rows = console.list_links(store, "a.com").collect()
    # latest-only collapses p1's two crawls; clustering order
    assert [(r["subdom"], r["path"]) for r in rows] == [
        ("", "/p1.html"), ("", "/p2.html"), ("www", "/p3.html"),
    ]
    assert rows[0]["time"].timestamp() * 1000 == days_ago(1)
    page2 = console.list_links(store, "a.com", seek=("", "/p1.html", "http")).collect()
    assert [(r["subdom"], r["path"]) for r in page2] == [
        ("", "/p2.html"), ("www", "/p3.html"),
    ]
    hist = console.link_history(store, "a.com", "", "/p1.html", "http").collect()
    assert len(hist) == 2 and hist[0]["time"] > hist[1]["time"]


def test_mark_getnow_and_exclude(spark, tmp_path):
    store = _store(spark, tmp_path)
    console.mark_getnow(store, "a.com", "", "/p2.html", "http")
    latest = console.list_links(store, "a.com").collect()
    p2 = [r for r in latest if r["path"] == "/p2.html"][0]
    assert p2["getnow"] is True
    console.set_domain_excluded(store, "b.com", True, "spam")
    row = console.find_domain(store, "b.com").collect()[0]
    assert row["excluded"] is True and row["exclude_reason"] == "spam"
    console.set_domain_excluded(store, "b.com", False)
    assert console.find_domain(store, "b.com").collect()[0]["excluded"] is False


def test_insert_links_console(spark, tmp_path):
    store = _store(spark, tmp_path)
    out = console.insert_links(store, ["http://new.com/x.html", "http://a.com/p1.html"])
    assert out["links_new"] == 1  # p1 already seen
    assert out["domains_new"] == 1


def test_redirect_link_rows(spark, tmp_path):
    """J6: each redirect hop becomes a links row with redto_url
    pointing forward (datastore.go:416-436)."""
    store = _store(spark, tmp_path)
    fr = spark.createDataFrame(
        [
            ("http://a.com/start.html",
             ["http://a.com/hop1.html", "http://b.com/final.html"],
             NOW_MS),
            ("http://c.com/direct.html", None, NOW_MS),
        ],
        "url string, redirected_from array<string>, time_ms long",
    )
    rows = redirect_link_rows(fr, WalkerConfig(), write_seq=9).collect()
    got = {(r["dom"], r["path"], r["redto_url"]) for r in rows}
    assert got == {
        ("a.com", "/start.html", "http://a.com/hop1.html"),
        ("a.com", "/hop1.html", "http://b.com/final.html"),
    }
    assert all(r["write_seq"] == 9 for r in rows)


def test_config_from_dict_go_durations():
    cfg = WalkerConfig.from_dict(
        {
            "fetcher": {
                "default_crawl_delay": "2s",
                "max_crawl_delay": "5m",
                "accept_protocols": ["http"],
            },
            "dispatcher": {"min_link_refresh_time": "49h", "max_links_per_segment": 9},
            "frontier": {"claim_limit": 7},
        }
    )
    assert cfg.fetcher.default_crawl_delay == 2.0
    assert cfg.fetcher.max_crawl_delay == 300.0
    assert cfg.fetcher.accept_protocols == ("http",)
    assert cfg.dispatcher.min_link_refresh_time == 49 * 3600.0
    assert cfg.dispatcher.max_links_per_segment == 9
    assert cfg.frontier.claim_limit == 7


def test_if_modified_since_format(spark):
    df = spark.range(1).select(
        console.if_modified_since(F.timestamp_millis(F.lit(0))).alias("ims")
    )
    assert df.collect()[0]["ims"] == "Thu, 01 Jan 1970 00:00:00 GMT"


def test_cli_seed_and_console(spark, tmp_path, capsys):
    """cmd/cmd.go seed + console paths through the CLI entry (reuses
    the active session via getOrCreate)."""
    from walker_spark import cli

    root = str(tmp_path / "clistore")
    rc = cli.main(["seed", "--root", root, "--url", "http://cli.com/a.html"])
    assert rc == 0
    rc = cli.main(["run", "--root", root, "--iterations", "1"])
    assert rc == 0
    rc = cli.main(["console", "--root", root])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cli.com" in out


def test_read_link_report(spark, tmp_path):
    """readlink rendering (cmd/cmd.go:163-267): crawled link -> full
    meta report; not-yet-crawled -> the sentinel line; unknown -> None;
    body_only/meta_only split."""
    store = _store(spark, tmp_path)
    rep = console.read_link(store, "http://a.com/p1.html")
    assert rep is not None
    assert "Url:                http://a.com/p1.html" in rep
    assert "HttpStatus:         200" in rep
    assert "HEADERS:        <none>" in rep
    assert "BODY:           <none>" in rep
    # latest row wins (days_ago(1), not days_ago(3))
    import datetime
    want = datetime.datetime.fromtimestamp(days_ago(1) / 1000, datetime.timezone.utc)
    assert want.strftime("%Y-%m-%d %H:%M:%S") in rep
    meta = console.read_link(store, "http://a.com/p1.html", meta_only=True)
    assert "BODY" not in meta and "HttpStatus" in meta
    body = console.read_link(store, "http://a.com/p1.html", body_only=True)
    assert "HttpStatus" not in body
    assert "not yet been fetched" in console.read_link(store, "http://a.com/p2.html")
    assert console.read_link(store, "http://nowhere.com/x.html") is None


def test_cli_schema_and_readlink(spark, tmp_path, capsys):
    """cmd/cmd.go schema (440-468) + readlink (163-267) CLI parity."""
    from walker_spark import cli

    rc = cli.main(["schema", "--catalog", "prod", "--buckets", "64"])
    assert rc == 0
    ddl = capsys.readouterr().out
    assert "CREATE TABLE" in ddl and "prod." in ddl and "MERGE INTO" in ddl
    assert "64" in ddl
    out_file = tmp_path / "schema.sql"
    rc = cli.main(["schema", "--out", str(out_file)])
    assert rc == 0 and "CREATE TABLE" in out_file.read_text()

    store = _store(spark, tmp_path / "rl")
    rc = cli.main(["readlink", "--root", store.root, "--url", "http://a.com/p1.html"])
    assert rc == 0
    assert "HttpStatus:         200" in capsys.readouterr().out
    rc = cli.main(["readlink", "--root", store.root, "--url", "http://missing.com/"])
    assert rc == 1
