"""E6 error alerting (alerts.py) + B5 topic provisioning contract."""

from __future__ import annotations

import logging
import logging.handlers

import pytest

from synch_spark.alerts import RateLimitingFilter, build_smtp_handler, configure_alerts
from synch_spark.broker import ensure_topic


def _record(msg="boom"):
    return logging.LogRecord("synch_spark", logging.ERROR, __file__, 1, msg, (), None)


def test_rate_limiter_passes_first_and_counts_suppressed(monkeypatch):
    f = RateLimitingFilter(per=60)
    clock = [1000.0]
    monkeypatch.setattr("synch_spark.alerts.time.monotonic", lambda: clock[0])
    assert f.filter(_record("a"))
    for _ in range(3):
        assert not f.filter(_record("spam"))
    clock[0] += 61
    r = _record("b")
    assert f.filter(r)
    # the count rides as an ATTRIBUTE, never an in-place msg mutation:
    # the record object is shared with every other handler on the
    # logger, and a mutated msg would leak "[N suppressed]" into
    # console/file output that suppressed nothing
    assert r.msg == "b" and getattr(r, "_synch_suppressed", 0) == 3
    # counter reset after reporting
    clock[0] += 61
    r2 = _record("c")
    assert f.filter(r2) and r2.msg == "c"
    assert getattr(r2, "_synch_suppressed", 0) == 0


def test_smtp_handler_renders_suppressed_note_on_a_copy():
    from synch_spark.alerts import _AnnotatingSMTPHandler

    sent = []

    class _Capture(_AnnotatingSMTPHandler):
        def __init__(self):
            logging.Handler.__init__(self)

        def emit(self, record):
            # run the annotating half, capture instead of mailing
            n = getattr(record, "_synch_suppressed", 0)
            if n:
                record = logging.makeLogRecord(record.__dict__)
                record.msg = f"[{n} suppressed] {record.msg}"
            sent.append(record)

    h = _Capture()
    r = _record("b")
    r._synch_suppressed = 3
    h.emit(r)
    assert sent[0].msg == "[3 suppressed] b"
    assert r.msg == "b", "shared record must stay untouched"


def test_smtp_handler_contract():
    mail = {
        "mailhost": ("smtp.example.com", 587),
        "fromaddr": "synch@example.com",
        "toaddrs": ["ops@example.com"],
        "subject": "synch error",
        "user": "u",
        "password": "p",
        "rate_limit_s": 30,
    }
    h = build_smtp_handler(mail)
    assert isinstance(h, logging.handlers.SMTPHandler)
    assert h.level == logging.ERROR
    assert h.fromaddr == "synch@example.com" and h.toaddrs == ["ops@example.com"]
    assert h.username == "u"
    assert any(isinstance(f, RateLimitingFilter) for f in h.filters)


def test_configure_alerts_idempotent_and_optin():
    log = logging.getLogger("synch_spark_test_alerts")
    configure_alerts(None, log)
    assert not [h for h in log.handlers
                if isinstance(h, logging.handlers.SMTPHandler)]
    mail = {"mailhost": "mx", "fromaddr": "a@b", "toaddrs": ["c@d"]}
    configure_alerts(mail, log)
    configure_alerts(mail, log)  # replaced, not duplicated
    smtp = [h for h in log.handlers if isinstance(h, logging.handlers.SMTPHandler)]
    assert len(smtp) == 1


def test_failed_batch_reaches_alert_logger(spark, tmp_path):
    """A micro-batch failure must emit one ERROR record on the
    synch_spark logger (the SMTP channel's feed) and still re-raise so
    the checkpoint never advances past it."""
    from pyspark.sql import functions as F

    from synch_spark.config import Engine, SyncConfig, TableSpec
    from synch_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig()
    cfg.add_table(TableSpec(schema="db", table="t", pk=("id",),
                            engine=Engine.REPLACING_MERGE_TREE))
    pipe = CdcPipeline(spark=spark, cfg=cfg, warehouse=str(tmp_path / "wh"),
                       checkpoint_dir=str(tmp_path / "ck"), value_schemas={})

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    log = logging.getLogger("synch_spark")
    cap = Capture(level=logging.ERROR)
    log.addHandler(cap)
    try:
        bad = spark.createDataFrame([(1,)], "x int")  # missing event columns
        with pytest.raises(Exception):
            pipe.apply_batch(bad, epoch_id=7)
    finally:
        log.removeHandler(cap)
    assert any("micro-batch 7" in r.getMessage() for r in records)


def test_ensure_topic_without_kafka_python_uses_wire_client():
    """ensure_topic no longer NEEDS kafka-python: without it the stdlib
    wire client (sources.kafka_socket) provisions the topic over a real
    socket — create then idempotent already-exists, the reference's
    TopicAlreadyExists swallow (synch/broker/kafka.py:66-73)."""
    try:
        import kafka  # noqa: F401

        pytest.skip("kafka-python unexpectedly present")
    except ImportError:
        pass
    from tests.kafka_fake import FakeKafkaBroker

    srv = FakeKafkaBroker()
    srv.start()
    try:
        assert ensure_topic(f"127.0.0.1:{srv.port}", "synch.db") is True
        assert ensure_topic(f"127.0.0.1:{srv.port}", "synch.db") is False
    finally:
        srv.stop()


def test_ensure_topic_unreachable_broker_is_loud():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nothing listening there now
    with pytest.raises(OSError):
        ensure_topic(f"127.0.0.1:{port}", "synch.db")
