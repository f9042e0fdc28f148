"""Hard crash-restart: SIGKILL a real ingest subprocess at arbitrary
points (no Python cleanup, no atexit — the process just dies), then
resume. Whatever the kill hit — reading, staging, merging, or after
commit — the resumed ingest must converge to the oracle state."""

import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

from rfb_cnpj_etl_ray.config import EngineConfig
from rfb_cnpj_etl_ray.oracle import assert_states_equal, replay
from rfb_cnpj_etl_ray.pipelines.ingest import ingest, read_lake_table
from rfb_cnpj_etl_ray.spec import PAYLOAD_SCHEMA, TableSpec
from rfb_cnpj_etl_ray.state.commitlog import init_lake
from rfb_cnpj_etl_ray.synth import make_base, make_changelog, write_changelog_segments

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("kill_after", [3.0, 6.0], ids=["early", "late"])
def test_sigkill_mid_ingest_then_resume(ray_session, tmp_path, kill_after):
    base = make_base(2000, seed=90, max_len=32)
    events = make_changelog(30000, 2000, seed=91, max_len=32)
    log_dir = tmp_path / "log"
    write_changelog_segments(events, log_dir, 6)
    lake = tmp_path / "lake"
    init_lake(lake, TableSpec(name="sequences", schema=PAYLOAD_SCHEMA),
              base=base, num_partitions=8)

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, "-m", "rfb_cnpj_etl_ray.cli", "--num-cpus", "4",
         "ingest", str(lake), str(log_dir), "--batch-size", "2048"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # isolate its Ray session's process group
    )
    time.sleep(kill_after)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)  # the whole Ray session dies
    proc.wait()
    time.sleep(1.0)

    # resume in this session: must converge regardless of where it died
    ingest(lake, log_dir, cfg=EngineConfig(num_partitions=8))
    assert_states_equal(replay(base, events), read_lake_table(lake))
