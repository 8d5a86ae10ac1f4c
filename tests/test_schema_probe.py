"""Pinned round-start schema probe (VERDICT r02 #4): whatever physical
timestamp flavor the regenerated testdata carries, ``load_table`` must
hand every query an LTZ ``timestamp`` whose unix micros equal pyarrow's
reading of the same parquet file.  tools/probe.py is the one-command
round-start version of this check."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from tools.probe import probe_events

SF_DIRS = [
    d
    for d in (SF_SMOKE, "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_load_table_normalizes_events_ts(spark, sf_dir):
    footer, spark_type = probe_events(spark, sf_dir)
    assert spark_type == "timestamp"
    # Every flavor seen so far; a new one that load_table still
    # normalizes correctly is fine — probe_events already asserted
    # value-exactness, this just documents the observed set.
    assert footer.startswith("timestamp"), footer
