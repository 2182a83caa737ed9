"""Process-level fire drill for the committed-artifact protocol
(VERDICT r6 next-round #7): two SEPARATE Python/Spark processes race
`ensure_artifact` on the same COLD index dir — the one concurrency mode
the protocol was designed for (private temp build -> marker-last ->
atomic rename; losers verify the winner's marker and discard) but was
previously only unit-tested in-process.

Pass = both processes return the same committed path, the artifact
content is identical from both (same row digest), and the directory
holds exactly one committed artifact with no orphaned temp dirs.
"""

from __future__ import annotations

import pytest

# spawns a second Python/Spark process for the cold-dir race
pytestmark = pytest.mark.slow

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Each racer builds the standing daily rollup through the REAL operator
# path (advanced.ensure_daily_rollup -> cache.ensure_artifact), reads it
# back, and reports (path, row_count, value_checksum) as JSON.
_RACER = """
import json, sys
sys.path.insert(0, REPO_PATH)
from parquet_storage_query_spark.session import get_spark
from parquet_storage_query_spark.operators.advanced import ensure_daily_rollup
from pyspark.sql import functions as F

spark = get_spark("race_" + sys.argv[1], shuffle_partitions=4)
dest = ensure_daily_rollup(spark, "/root/testdata/sf0.001")
df = spark.read.parquet(dest)
row = df.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.conv(F.substring(F.md5(F.concat_ws("|", "event_type", "day", "n", "sc")), 1, 8), 16, 10).cast("long")).alias("ck"),
).collect()[0]
print(json.dumps({"dest": dest, "n": row["n"], "ck": row["ck"]}))
spark.stop()
"""


def test_two_processes_race_cold_artifact(tmp_path):
    idx_dir = tempfile.mkdtemp(prefix="race_idx_", dir=tmp_path)
    script = tmp_path / "racer.py"
    script.write_text(_RACER.replace("REPO_PATH", repr(str(REPO))))
    import os

    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=idx_dir)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"racer failed:\n{err[-2000:]}"
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))

    a, b = results
    # both serve the SAME committed path with identical content
    assert a["dest"] == b["dest"]
    assert (a["n"], a["ck"]) == (b["n"], b["ck"])
    assert a["n"] > 0
    # exactly one committed artifact, marker present, no orphaned temps
    entries = list(Path(idx_dir).iterdir())
    committed = [d for d in entries if d.name.startswith("daily_rollup_")]
    temps = [d for d in entries if d.name.startswith("_tmp_")]
    assert len(committed) == 1, entries
    assert (committed[0] / "_COMMITTED").exists()
    assert temps == [], temps
