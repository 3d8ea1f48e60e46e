"""CLI surface test: drives `python -m wtes_ray` end-to-end in a fresh
subprocess (the CLI owns its own Ray session — driver contract)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-m", "wtes_ray", *args],
                         capture_output=True, text=True, timeout=timeout,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_gen_and_graph(tmp_path):
    docs = str(tmp_path / "docs.parquet")
    r = _run(["gen", "--n-docs", "40", "--out", docs])
    assert r["ok"] and r["n_docs"] == 40

    kg = str(tmp_path / "kg")
    s = _run(["graph", "--input", docs, "--out", kg,
              "--num-partitions", "4"])
    assert s["n_docs"] == 40
    assert s["n_errors"] == 0
    assert s["n_nodes"] > 0 and s["n_edges"] > 0
    assert os.path.isdir(os.path.join(kg, "nodes"))
    assert os.path.isdir(os.path.join(kg, "edges"))

    # resume on the completed checkpoint is a no-op for extraction
    s2 = _run(["extract", "--input", docs,
               "--out", os.path.join(kg, "extracted"),
               "--num-partitions", "4", "--resume"])
    assert s2["n_parts_skipped"] == 4
