"""The driver-window staleness guard must hold for the upcoming round:
never-measured / red / oracle-upgraded / over-age queries all inside the
50-slot window (tools/window_audit.py; VERDICT r6 item 3). No Spark session
needed — pure registry + JSON inspection."""

from tools.window_audit import MAX_AGE_ROUNDS, WINDOW, audit, load_driver_history


def test_window_covers_all_evidence_holes():
    problems = audit()
    assert problems == [], "\n".join(problems)


def test_history_loads_and_monotone():
    max_round, latest = load_driver_history()
    assert max_round >= 6
    assert len(latest) >= 170
    for name, (rnd, row) in latest.items():
        assert 1 <= rnd <= max_round
        assert "spark_rows" in row


def test_constants_match_driver_contract():
    assert WINDOW == 50
    assert MAX_AGE_ROUNDS == 4
