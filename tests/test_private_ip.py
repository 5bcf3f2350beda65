"""F5 — private-IP blacklist predicate (fetcher.go:819-841, 882-918)."""

from __future__ import annotations

from pyspark.sql import functions as F

from walker_spark.config import WalkerConfig
from walker_spark.operators.seed import normalize_to_keys, private_ip_host_condition


def test_private_ranges(spark):
    cases = [
        ("10.0.0.5", True),
        ("10.255.255.255", True),
        ("127.0.0.1", True),
        ("192.168.1.2", True),
        ("172.16.0.1", True),
        ("172.31.9.9", True),
        ("172.15.0.1", False),  # below the /12
        ("172.32.0.1", False),  # above the /12
        ("192.169.1.1", False),
        ("8.8.8.8", False),
        ("8.8.0.5", False),  # shares dom-octets with 10.x but public
        ("site.com", False),
        ("www.10.com", False),  # name, not an IP literal
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: r["priv"]
        for r in df.withColumn(
            "priv", private_ip_host_condition(F.col("host"))
        ).collect()
    }
    for host, expect in cases:
        assert got[host] == expect, host


def test_normalize_drops_private_ip_links(spark):
    cfg = WalkerConfig()
    urls = spark.createDataFrame(
        [
            ("http://10.0.0.5/secret.html",),
            ("http://192.168.0.1/router",),
            ("http://8.8.8.8/ok",),
            ("http://site.com/page",),
        ],
        "url string",
    )
    kept = {
        r["dom"] + "|" + r["subdom"]
        for r in normalize_to_keys(urls, cfg).collect()
    }
    assert kept == {"8.8|8.8", "site.com|"}
