"""The bench harness's final stdout line is a driver contract: the
round recorder keeps only a ~2000-char stdout tail and parses the last
complete JSON line inside it. BENCH_r07-r09 all came back
``parsed: null`` because the final line outgrew that window as the
benched set grew — so the fitting logic is load-bearing and gets its
own Spark-free pins.
"""

from __future__ import annotations

import json

from bench import _fitted_headline_line, HEADLINE, HEADLINE_R01


def _summary(n_queries: int, with_null: bool = False) -> dict:
    names = (HEADLINE + [f"extra_query_row_{i:03d}" for i in range(200)])[
        :n_queries
    ]
    queries = {n: 12.345 for n in names}
    if with_null:
        queries["some_errored_query_row"] = None
    return {
        "metric": "headline_r01_set_total_sec",
        "value": 9.876,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "all_queries_total_sec": 62.0,
        "r01_set_total_sec": 9.876,
        "r01_set_total_worst_sec": 10.5,
        "spread_sec": 0.4,
        "contended": False,
        "escalated_runs": {},
        "runs_per_query": 2,
        "streaming_dedup_epoch_marginal_sec": [[3.0, 1.8, 1.9]],
        "streaming_gate_epoch_marginal_sec": [[0.5, 0.4, 0.4]],
    }


def test_small_summary_passes_through_complete():
    s = _summary(10)
    line = _fitted_headline_line(s)
    assert json.loads(line)["queries"] == s["queries"]
    assert len(line) <= 1900


def test_current_headline_set_keeps_r01_and_round_new_rows():
    # the live benched set (HEADLINE + the zipf extra row) grew past
    # the window in round 10, so it degrades — but the r01 comparison
    # set AND the current round's new rows must both stay visible
    from bench import HEADLINE_LATEST

    s = _summary(len(HEADLINE) + 1)
    line = _fitted_headline_line(s)
    parsed = json.loads(line)
    assert len(line) <= 1900
    assert parsed["value"] == 9.876
    for name in HEADLINE_R01 + HEADLINE_LATEST:
        assert name in parsed["queries"], name


def test_oversized_summary_degrades_but_keeps_r01_and_nulls():
    s = _summary(200, with_null=True)
    line = _fitted_headline_line(s)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # headline number and sf survive any degradation
    assert parsed["metric"] == "headline_r01_set_total_sec"
    assert parsed["value"] == 9.876
    assert parsed["sf"] == 0.1
    # the r01 comparison set survives
    for name in HEADLINE_R01:
        assert name in parsed["queries"], name
    # an errored (null) row survives — ledger demotion reads these
    assert "some_errored_query_row" in parsed["queries"]
    assert parsed["queries"]["some_errored_query_row"] is None
    assert parsed["queries_truncated_see_full_artifact"] is True


def test_every_degradation_tier_is_valid_json():
    for n in (5, 40, 60, 80, 120, 200):
        line = _fitted_headline_line(_summary(n))
        assert len(line) <= 1900
        json.loads(line)


def test_prior_round_queries_reads_newest_artifact():
    """The adjudication baseline is the newest BENCH_r*.json's parsed
    per-query map — present in this repo since round 1, so the helper
    must return a non-empty {name: seconds} dict here."""
    from bench import _prior_round_queries

    prior = _prior_round_queries()
    assert prior, "expected the committed BENCH_r*.json artifacts"
    assert all(isinstance(k, str) for k in prior)
    assert any(isinstance(v, (int, float)) for v in prior.values())


def test_suspect_predicate_bands():
    """>35% over prior trips; anything at/below the band, errored
    rows, sub-noise-floor priors, and null priors never do."""
    from bench import _is_suspect

    assert _is_suspect(1.40, 1.0)
    assert not _is_suspect(1.35, 1.0)  # exactly at the band: no trip
    assert not _is_suspect(0.9, 1.0)
    assert not _is_suspect(None, 1.0)  # errored row: ledger's job
    assert not _is_suspect(1.0, None)  # prior errored: nothing to adjudicate
    assert not _is_suspect(0.2, 0.04)  # sub-noise-floor prior: jitter
    assert not _is_suspect(2.0, True)  # defensive: bool is not a timing
