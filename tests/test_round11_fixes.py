"""Round-11 hardening regressions (VERDICT.md round 10 "do this" list).

Each test pins one of the round-10 judge findings so it cannot silently
regress:

- item 7: WIRE_SEQ_COL must have exactly ONE defining string literal
  (config.py); every other module imports the constant, so a rename can
  never de-synchronize a stray ``"_wire_seq"`` literal.
"""

from __future__ import annotations

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "synch_spark")


def _py_sources():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_wire_seq_literal_defined_exactly_once():
    """grep gate (VERDICT r10 item 7): the string literal "_wire_seq"
    appears in exactly one non-test source line — the canonical
    definition in config.py. cdc_apply's meta-strip set, the broker
    payload builders, and pgoutput's row stamping all import the
    constant; a duplicate literal is the one-rename desync hazard the
    judge flagged at operators/cdc_apply.py:91."""
    hits = []
    for path in _py_sources():
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                if '"_wire_seq"' in line or "'_wire_seq'" in line:
                    hits.append((os.path.relpath(path, REPO), lineno))
    assert hits == [("synch_spark/config.py", 25)] or (
        len(hits) == 1 and hits[0][0] == "synch_spark/config.py"
    ), f"stray _wire_seq literals: {hits}"


def _pgoutput_rounds(n_updates: int, cut: int, ts_us: int):
    """n same-stamp updates to one pk, split into two rounds at `cut`
    (round 1 also carries the Relation; round 2 relies on the carried
    registry, like the CLI's cross-round pgo_relations)."""
    from tests.test_pgoutput import (
        enc_begin,
        enc_commit,
        enc_relation,
        enc_update,
    )

    rel = enc_relation(16401, "db", "t",
                       [(1, "id", 23, -1), (0, "name", 25, -1)])
    upd = [enc_update(16401, ["1", f"v{i}"], old=["1", None], old_kind=b"K")
           for i in range(n_updates)]
    r1 = [rel, enc_begin(ts_us)] + upd[:cut] + [enc_commit()]
    r2 = [enc_begin(ts_us)] + upd[cut:] + [enc_commit()]
    return r1, r2


def test_pg_wire_seq_round_cut_property():
    """Hypothesis property (VERDICT r10 item 2): for ANY cut point and
    ANY realistic LSN pair (lsn2 > lsn1), decoding the two rounds with
    LSN-rebased wire seqs yields a strictly increasing global sequence,
    so last-wins always keeps the wire-last update — the old per-round
    enumerate made round 2 restart at 0 and tie-break arbitrarily."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from synch_spark.sources.pgoutput import iter_pgoutput_changes

    TS = 1_704_067_201_000_000

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=2, max_value=12),
        data=st.data(),
        lsn1=st.integers(min_value=1, max_value=1 << 40),
        gap=st.integers(min_value=1, max_value=1 << 20),
    )
    def prop(n, data, lsn1, gap):
        cut = data.draw(st.integers(min_value=1, max_value=n - 1))
        r1, r2 = _pgoutput_rounds(n, cut, TS)
        lsn2 = lsn1 + gap
        rels: dict = {}
        rows = []
        for payloads, lsn in ((r1, lsn1), (r2, lsn2)):
            base = min(lsn, (1 << 46) - 1) << 16
            rows += list(iter_pgoutput_changes(
                payloads, relations=rels, wire_seq=True,
                wire_seq_base=base))
        assert len(rows) == n
        seqs = [r["_wire_seq"] for r in rows]
        assert seqs == sorted(seqs) and len(set(seqs)) == n
        # last-wins over (event_unixtime, wire_seq): the wire-last
        # update must carry the max key even though every stamp ties
        winner = max(rows, key=lambda r: (r["event_unixtime"],
                                          r["_wire_seq"]))
        import json as _json

        assert _json.loads(winner["after"])["name"] == f"v{n - 1}"

    prop()


def test_wal2json_order_col_overflow_clamped(spark):
    """ADVICE r10 item 1: an unbounded order_col offset at 2^47 used to
    shift into the long's sign bit (offset<<16 negative) and INVERT
    ordering against any sane offset. Clamped at 2^46-1 the oversized
    offset saturates: its wire seq stays positive and >= every
    below-cap offset's."""
    import json as _json

    from synch_spark.events import wal2json_to_raw

    payload = {"change": [
        {"kind": "insert", "schema": "db", "table": "t",
         "columnnames": ["id"], "columnvalues": ["1"]}],
        "timestamp": "2024-03-01 12:00:00.123456+00"}
    rows = [(_json.dumps(payload), 1 << 45),   # sane, below cap
            (_json.dumps(payload), 1 << 47),   # would flip sign unclamped
            (_json.dumps(payload), (1 << 62))]  # absurd, also clamps
    df = spark.createDataFrame(rows, "value string, offset long")
    out = wal2json_to_raw(df, subsecond_tiebreak=True,
                          order_col="offset").collect()
    seqs = sorted(r["_wire_seq"] for r in out)
    assert all(s > 0 for s in seqs), f"sign-bit overflow: {seqs}"
    lo = (1 << 45) << 16
    hi = ((1 << 46) - 1) << 16
    # below-cap passes through exactly; both oversized offsets saturate
    # to the same cap (ties among the saturated tail, never inverted)
    assert seqs[0] == lo and seqs[1] == seqs[2]
    assert all(s >= hi for s in seqs[1:])


def test_wire_seq_single_source_of_truth():
    """events.WIRE_SEQ_COL (the public name) IS config.WIRE_SEQ_COL, and
    every consumer module resolves to the same object."""
    from synch_spark import broker, config, events, redis_broker
    from synch_spark.operators import cdc_apply
    from synch_spark.sources import pgoutput

    assert events.WIRE_SEQ_COL == config.WIRE_SEQ_COL == "_wire_seq"
    for mod in (broker, redis_broker, cdc_apply, pgoutput):
        assert getattr(mod, "WIRE_SEQ_COL") == config.WIRE_SEQ_COL


def _flavor_cfg(tmp_path, flavor: str) -> str:
    import yaml

    cfg = {
        "core": {}, "source_dbs": [],
        "spark": {"warehouse": str(tmp_path / "wh"),
                  "checkpoint_dir": str(tmp_path / "c"),
                  "events_dir": str(tmp_path / "e"), "sources": {},
                  "mysql_socket": {"host": "h", "user": "u",
                                   "auto_position": True,
                                   "flavor": flavor}},
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    return str(p)


def _write_cursor(tmp_path, doc: dict) -> None:
    import json

    wh = tmp_path / "wh"
    wh.mkdir(parents=True, exist_ok=True)
    (wh / "_binlog_socket_cursor.json").write_text(json.dumps(doc))


@pytest.mark.parametrize("flavor,cursor_set,other", [
    ("mysql", "0-1-42,1-1-7", "mariadb"),           # sniffed triplets
    ("mariadb", "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5", "mysql"),
])
def test_mysql_socket_flavor_cursor_mismatch_exits_2(
        tmp_path, capsys, flavor, cursor_set, other):
    """ADVICE r10: switching spark.mysql_socket.flavor between runs
    used to reuse a cursor whose gtid_set is in the OTHER dialect; the
    parse failed only at dial time, which --follow retries forever.
    The guard detects the mismatch (recorded flavor, or dialect sniff
    for pre-upgrade cursors) BEFORE the dial loop and exits 2."""
    from synch_spark.cli import main

    p = _flavor_cfg(tmp_path, flavor)
    _write_cursor(tmp_path, {"file": "", "pos": 4,
                             "gtid_set": cursor_set})
    assert main(["--config", p, "produce",
                 "--source", "mysql-socket", "--once", "--follow"]) == 2
    err = capsys.readouterr().err
    assert f"{other}-dialect" in err and "flavor" in err


def test_mysql_socket_flavor_recorded_beats_sniff(tmp_path, capsys):
    """A cursor that RECORDS its flavor is trusted over the sniff —
    and a matching recorded flavor passes the guard (the failure then
    is the normal connection error, not exit 2)."""
    from synch_spark.cli import main

    p = _flavor_cfg(tmp_path, "mysql")
    _write_cursor(tmp_path, {
        "file": "", "pos": 4, "flavor": "mariadb",
        # set that LOOKS mysql; recorded flavor must win
        "gtid_set": "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5"})
    assert main(["--config", p, "produce",
                 "--source", "mysql-socket", "--once"]) == 2
    assert "mariadb-dialect" in capsys.readouterr().err

    _write_cursor(tmp_path, {
        "file": "", "pos": 4, "flavor": "mysql",
        "gtid_set": "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5"})
    # guard passes; the dial then fails on the unreachable host, which
    # without --follow is exit 1 (round failure), never the guard's 2
    assert main(["--config", p, "produce",
                 "--source", "mysql-socket", "--once"]) == 1


def test_dead_letter_epoch_column_is_string_across_consumers(spark,
                                                             tmp_path):
    """Review r11: the dead-letter _epoch column mixed LongType
    (structured-streaming int epoch ids) with StringType (the polling
    loops' content-bound epochs) in ONE shared parquet table — the
    first dead-letter from the second consumer kind broke the table.
    _epoch now stamps as string regardless of the caller's id type."""
    from pyspark.sql import types as T

    from synch_spark.config import SyncConfig, TableSpec
    from synch_spark.sources.table import ParquetTable
    from synch_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig()
    cfg.add_table(TableSpec(schema="db", table="t", pk=("id",)))
    vs = T.StructType([T.StructField("id", T.LongType())])
    pipe = CdcPipeline(
        spark=spark, cfg=cfg, warehouse=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ck"), value_schemas={"db.t": vs},
    )
    bad = spark.createDataFrame(
        [("db", "t", None, None, '{"x": 1}', 1)],
        "schema string, table string, action string, before string, "
        "after string, event_unixtime long")
    pipe.apply_batch(bad, 7)                      # streaming-style int
    pipe.apply_batch(bad, "kafka-socket:t/0:0-1")  # polling-loop string
    dead = ParquetTable(spark, f"{pipe.warehouse}/_synch_dead_letter").read()
    assert dead.count() == 2
    assert dict(dead.dtypes)["_epoch"] == "string"
    assert {r["_epoch"] for r in dead.collect()} == \
        {"7", "kafka-socket:t/0:0-1"}


def test_committer_config_token_providers(tmp_path):
    """Review r11: 'kind: gcs' had NO credential knob — every real
    commit 401'd mid-commit. Config now wires `token` (static bearer)
    and `token_url` (metadata-server JSON endpoint, custom headers for
    Azure IMDS) into the conditional-put clients."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from synch_spark.sources.committer import (
        _token_provider_from_config,
        committer_from_config,
    )

    assert _token_provider_from_config({}) is None
    assert _token_provider_from_config({"token": "abc"})() == "abc"

    seen = {}

    class _Meta(BaseHTTPRequestHandler):
        def do_GET(self):
            seen["flavor"] = self.headers.get("Metadata-Flavor")
            body = _json.dumps({"access_token": "met-tok"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Meta)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/token"
        prov = _token_provider_from_config({"token_url": url})
        assert prov() == "met-tok" and seen["flavor"] == "Google"
        prov2 = _token_provider_from_config(
            {"token_url": url, "token_headers": {"Metadata": "true"}})
        assert prov2() == "met-tok" and seen["flavor"] is None
    finally:
        srv.shutdown()
        srv.server_close()

    # the factory threads the provider through to the GCS client: a
    # conditional put carries the bearer (fake store from
    # test_committer asserts the header end-to-end; here we pin the
    # provider is CONSTRUCTED, the 401-at-commit gap)
    c = committer_from_config({"kind": "gcs", "bucket": "b",
                               "token": "xyz", "base_url": "http://x"})
    assert c is not None
