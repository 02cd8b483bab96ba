"""CLI entry points (scripts/collect.py): subprocess smoke with
availableNow drain — JSONL in, typed homograph-encoded partitioned
parquet out. (serve.py shares every component with these tests via
test_serving.py's full-topology test; its wall-clock streaming loop is
exercised there without subprocess timing flakiness.)"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_collect_cli_once(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    events = [
        {"timestamp": "2024-12-08T23:00:18Z", "lemma": "obskur",
         "lemma-type": "AR_G", "form-type": "Hauptform",
         "article-type": "Vollartikel", "source": "WDG",
         "date": "1974-01-01"},
        {"timestamp": "2024-12-09T01:02:03Z", "lemma": "Haus", "hidx": 2,
         "lemma-type": "AR_G", "form-type": "Hauptform",
         "article-type": "Vollartikel", "source": "WDG",
         "date": "1999-01-01"},
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    out = tmp_path / "fact"

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "collect.py"),
         str(src), str(out), "--once",
         "--checkpoint", str(tmp_path / "ckpt")],
        capture_output=True, text=True, timeout=240, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    con = duckdb.connect()  # keep the connection referenced while reading
    rows = con.sql(
        f"SELECT ts, lemma, article_source, article_date "
        f"FROM read_parquet('{out}/*/*.parquet') ORDER BY ts"
    ).fetchall()
    assert [r[1] for r in rows] == ["obskur", "Haus#2"]  # P8 encode
    assert str(rows[0][0]) == "2024-12-08 23:00:18"      # P9 cast
    assert str(rows[1][3]) == "1999-01-01"
    # date partitioning (the fact-table layout the indexes map to)
    assert any(p.name.startswith("date=") for p in out.iterdir())
