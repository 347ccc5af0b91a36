"""Persistent catalog: table registrations must survive a full process
restart (the reference registers tables in a Hive metastore,
SparkSessionProvider.java:62-68). Runs the demo script in two SEPARATE
processes — register, then reuse from the on-disk metastore alone — kept
out of the shared test SparkSession because enableHiveSupport is a
session-factory-level switch."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "persistent_catalog_demo.py")
SF = "/root/testdata/sf0.001"


def _run(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, SCRIPT, *args],
        capture_output=True,
        text=True,
        timeout=240,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_catalog_survives_process_restart(tmp_path):
    wh = str(tmp_path / "warehouse")
    reg = _run("register", wh, SF)
    assert reg["tables"] == 10
    assert reg["lineitem_rows"] > 0
    # brand-new JVM + python process: resolve by name from disk metadata
    reuse = _run("reuse", wh)
    assert reuse["tables"] == 10
    assert reuse["lineitem_rows"] == reg["lineitem_rows"]
