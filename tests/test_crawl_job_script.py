"""Integration: the `ray job submit` entry script runs end-to-end in a
fresh process, writes partitioned output, and resumes from checkpoint."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "crawl_job.py")


def _run(*extra):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, SCRIPT, "--n-docs", "200", "--n-hosts", "8",
         "--n-seeds", "5", "--target-pages", "40", "--max-waves", "6",
         "--num-cpus", "4", "--shards", "2", *extra],
        capture_output=True, text=True, env=env, timeout=300,
    )


def test_job_script_end_to_end(tmp_path):
    out_dir = str(tmp_path / "out")
    r = _run("--out-dir", out_dir)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["pages"] > 0
    waves = [json.loads(line) for line in r.stderr.splitlines()
             if line.startswith("{")]
    assert waves and all("attempted" in w for w in waves)
    assert any(d.startswith("wave=") for d in os.listdir(out_dir))


def test_job_script_resume(tmp_path):
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    full = _run("--out-dir", out_dir, "--max-waves", "6")
    assert full.returncode == 0
    expect = json.loads(full.stdout.strip().splitlines()[-1])

    out2 = str(tmp_path / "out2")
    first = _run("--out-dir", out2, "--checkpoint-dir", ck, "--max-waves", "3")
    assert first.returncode == 0
    resumed = _run("--out-dir", out2, "--checkpoint-dir", ck, "--max-waves", "6")
    assert resumed.returncode == 0
    assert "resumed from wave" in resumed.stderr
    got = json.loads(resumed.stdout.strip().splitlines()[-1])
    assert got["pages"] == expect["pages"]
    assert got["visited"] == expect["visited"]
    assert got["queue"] == expect["queue"]


DATAPREP = os.path.join(REPO, "scripts", "dataprep_job.py")


def test_dataprep_job_script_end_to_end_and_skip(tmp_path):
    """The composed training-data prep job runs in a fresh process,
    writes one parquet dir per source, and skips finished partitions
    on a re-run (resumable-output discipline)."""
    out_dir = str(tmp_path / "prep")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, DATAPREP, "--out-dir", out_dir,
           "--num-cpus", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows_out"] > 0 and s1["partitions_written"] > 0
    assert all(d.startswith("source=") for d in os.listdir(out_dir)
               if d != "meta.json")
    assert os.path.exists(os.path.join(out_dir, "meta.json"))

    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == s1["partitions_written"]

    # ADVICE r2: resuming with DIFFERENT parameters must refuse, not
    # silently keep partitions computed under the old thresholds
    r3 = subprocess.run(cmd + ["--lo", "0.10"], capture_output=True,
                        text=True, env=env, timeout=300)
    assert r3.returncode == 2, (r3.returncode, r3.stdout[-500:])
    s3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert s3["error"] == "param_mismatch"
