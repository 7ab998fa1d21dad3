"""`python -m geofileops_ray.job` — the ray-job-submit entry point."""

import json
import os
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "geofileops_ray.job", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"}, timeout=400,
    )


def test_job_entry_list_run_and_resume(tmp_path):
    r = _run("--list")
    assert r.returncode == 0 and "buffer_area" in r.stdout.split()

    out = str(tmp_path / "ckpt")
    r1 = _run("--query", "tile_assignments_16",
              "--sf-dir", "/root/testdata/sf0.001",
              "--output", out, "--resume", "--partition-col", "tile_id")
    assert r1.returncode == 0, r1.stderr[-2000:]
    rec1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert rec1["rows"] == 532 and rec1["partitions_written"] > 0

    # resubmission: every partition already committed → all skipped
    r2 = _run("--query", "tile_assignments_16",
              "--sf-dir", "/root/testdata/sf0.001",
              "--output", out, "--resume", "--partition-col", "tile_id")
    rec2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rec2["rows"] == 0 and rec2["partitions_written"] == 0

    r3 = _run("--query", "nope")
    assert r3.returncode != 0
