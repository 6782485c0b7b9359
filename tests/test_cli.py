"""CLI parity: etl + check against a YAML config (reference synch.yaml shape)."""

from __future__ import annotations

import json

import yaml

from synch_spark.cli import main


def _write_cfg(tmp_path, warehouse):
    cfg = {
        "core": {"insert_num": 100, "insert_interval": 1},
        "source_dbs": [
            {
                "db_type": "mysql",
                "databases": [
                    {
                        "database": "db",
                        "tables": [
                            {
                                "table": "customer",
                                "pk": ["c_custkey"],
                                "clickhouse_engine": "replacing_merge_tree",
                            }
                        ],
                    }
                ],
            }
        ],
        "spark": {
            "warehouse": warehouse,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.customer": "/root/testdata/sf0.001/customer.parquet"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    return str(p)


def test_cli_etl_then_check(tmp_path, capsys, spark):
    cfg = _write_cfg(tmp_path, str(tmp_path / "wh"))
    assert main(["--config", cfg, "etl"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["etl"]["db.customer"] is True
    assert main(["--config", cfg, "check", "--checksum"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True
    assert out["check"]["db.customer"]["source"] == out["check"]["db.customer"]["target"]
