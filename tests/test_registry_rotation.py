"""The driver certifies only a prefix window of queries(); _rotate must put
the stalest (never driver-green) queries first so the window sweeps the
whole registry over rounds."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def test_rotation_is_stale_first():
    last = entry._last_driver_green()
    names = list(entry.queries())
    rounds = [last.get(n, 0) for n in names]
    assert rounds == sorted(rounds), 'registry must be ordered stale-first'


def test_rotation_preserves_registry():
    rotated = entry.queries()
    assert len(rotated) == len(set(rotated))
    oracles = entry.oracle_sql()
    # every oracle key must still resolve to a registered query
    assert set(oracles) <= set(rotated)


def test_rotation_is_deterministic():
    assert list(entry.queries()) == list(entry.queries())


def test_rotation_handles_missing_artifacts(tmp_path, monkeypatch):
    # With no CORRECTNESS files readable, order degrades to declaration order.
    monkeypatch.setattr(entry, '_last_driver_green', dict)
    names = list(entry.queries())
    assert names[0] == 'kg_triples'
