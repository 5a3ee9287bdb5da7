"""End-to-end sync pipeline (SURVEY §3 E1/E3): fake REST source ->
transform (all §2.8 shapes) -> upsert -> report."""

import json

from data_pipeline_bigquery_to_sftp_server_spark import pipeline


def _api(n_tickets=7):
    tickets = {
        f"t{i}": {
            "_id": f"t{i}",
            "subject": f"Ticket {i}",
            "description": f"<p>Issue &amp; detail {i}</p>",
            "createdTimestamp": 1700000000 + i * 3600 if i != 3 else 0,
            "updatedTimestamp": 1700000500 + i,
            "deleted": None if i % 2 else False,
            "fromEmail": f"u{i}@example.com",
            "fromName": f"User {i}",
            "toEmails": [f"a{i}@x.com", f"b{i}@x.com"] if i % 3 else [],
            "tags": ["red", "blue"] if i % 2 else [],
            "meta": json.dumps({"k": str(i), "v": "x"}) if i % 4 else "not json",
            "sendEmailFailureCount": i,
            "discounts": (
                [{"code": f"C{i}", "amount": i}] if i % 2 else None
            ),
        }
        for i in range(n_tickets)
    }

    def page_fetcher(page, per_page):
        ids = sorted(tickets)[(page - 1) * per_page : page * per_page]
        return [{"_id": i} for i in ids]

    def detail_fetcher(tid):
        return tickets.get(tid)

    return page_fetcher, detail_fetcher


def test_sync_tickets_end_to_end(spark):
    pages, details = _api()
    target_raw = spark.createDataFrame(
        [{"_id": "t0", "subject": "OLD", "description": None, "createdTimestamp": "1",
          "createdDatetime": None, "createdDate": None, "updatedDatetime": None,
          "deleted": True, "fromEmail": None, "toEmails": None, "tags": None,
          "meta": None, "sendEmailFailureCount": "0"}],
        pipeline.transform_tickets(
            spark.createDataFrame([], pipeline.TICKET_RAW_SCHEMA)
        ).schema,
    )
    merged, report = pipeline.sync_tickets(spark, target_raw, pages, details)
    rows = {r._id: r for r in merged.collect()}

    assert len(rows) == 7
    assert rows["t0"].subject == "Ticket 0"  # staging overwrote the stale row
    assert rows["t1"].description == "Issue & detail 1"  # HTML cleaned exactly
    assert rows["t3"].createdDatetime is None  # 0-epoch -> NULL
    assert rows["t4"].createdDatetime == "2023-11-15 02:13:20"  # 1700000000+4h UTC
    assert rows["t2"].deleted is False  # bool default
    assert rows["t1"].fromEmail.email == "u1@example.com"
    assert rows["t3"].toEmails is None  # empty array -> NULL
    assert rows["t4"].toEmails[0].email == "a4@x.com"
    assert rows["t1"].tags == "['red', 'blue']"  # python-repr flatten
    assert rows["t2"].meta == '{"k":"2","v":"x"}'
    assert rows["t4"].meta is None  # "not json" -> lenient parse -> empty -> NULL
    # list-of-dict python-repr (reference main.py:305 `discounts`)
    assert rows["t1"].discounts == "[{'code': 'C1', 'amount': 1}]"
    assert rows["t2"].discounts == "[]"  # .get('discounts', []) default

    rep = {r.outcome: r.n for r in report.collect()}
    assert rep == {"inserted": 6, "updated": 1}


def test_transform_is_lazy_and_schema_stable(spark):
    """The transform must not trigger jobs and must emit a fixed schema
    (the engine's replacement for the reference's schema-by-convention,
    main.py:354-357)."""
    empty = spark.createDataFrame([], pipeline.TICKET_RAW_SCHEMA)
    out = pipeline.transform_tickets(empty)
    names = [f.name for f in out.schema.fields]
    assert names == [
        "_id", "subject", "description", "createdTimestamp", "createdDatetime",
        "createdDate", "updatedDatetime", "deleted", "fromEmail", "toEmails",
        "tags", "meta", "sendEmailFailureCount", "discounts",
    ]
    assert out.count() == 0


def test_observed_transform_counts_in_single_action(spark):
    """Observation metrics must match the data after exactly one action
    (the reference re-counted with driver loops; here the counters ride
    the write)."""
    from data_pipeline_bigquery_to_sftp_server_spark.pipeline import (
        TICKET_RAW_SCHEMA,
        observed_transform,
    )

    raw = spark.createDataFrame(
        [
            ("a", "s1", "<b>hi</b>", 1700000000, 1700000100, True,
             "x@y.z", "X", ["a@b.c"], ["t1"], '{"k": "1", "v": "2"}', 3,
             [("W", 5)]),
            ("b", "s2", None, 0, 0, False, None, None, [], [], None, 0, None),
        ],
        TICKET_RAW_SCHEMA,
    )
    staged, obs = observed_transform(raw, name="t_obs")
    staged.write.mode("overwrite").format("noop").save()
    m = obs.get
    assert m["processed"] == 2
    assert m["null_descriptions"] == 1  # None description stays NULL
    assert m["deleted_count"] == 1
