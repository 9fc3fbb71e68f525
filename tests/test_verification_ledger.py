"""The verification ledger (plans/queries.py) is load-bearing: it
decides which queries the round driver re-checks, so its latest-wins /
demotion / rotation logic needs its own pins — a bug here silently
stops regressions from ever being re-verified (the round-2 stale-green
sessionize failure mode).

No SparkSession needed: the ledger is pure file parsing + ordering.
"""

from __future__ import annotations

import json

from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
    REGISTRY,
    _load_verification_ledger,
    _ordered_specs,
)


def _write(tmp_path, fname, data):
    (tmp_path / fname).write_text(json.dumps(data))


def _green(rows=5):
    return {"hash_match": True, "schema_match": True, "rows_match": True,
            "err": None, "spark_rows": rows, "oracle_rows": rows}


def _fail(rows=5):
    return {"hash_match": False, "schema_match": True, "rows_match": True,
            "err": None, "spark_rows": rows, "oracle_rows": rows}


def _rows_only(rows=5):
    return {"hash_match": None, "schema_match": None, "rows_match": None,
            "err": "no_oracle", "spark_rows": rows, "oracle_rows": None}


def test_green_row_verifies_with_round(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q": _green()})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"] == {"ok": True, "round": 1, "rows_only": False}


def test_later_failure_demotes(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q": _green()})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q": _fail()})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"]["ok"] is False


def test_later_green_re_verifies_and_bumps_round(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q": _fail()})
    _write(tmp_path, "CORRECTNESS_r03.json", {"q": _green()})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"] == {"ok": True, "round": 3, "rows_only": False}


def test_rows_only_pass_is_weakly_verified(tmp_path):
    # spark_rows == 0 still counts (the row exists) — vacuity is the
    # query contract's problem, not the ledger's
    _write(tmp_path, "CORRECTNESS_r02.json", {"q": _rows_only(rows=0)})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"] == {"ok": True, "round": 2, "rows_only": True}


def test_errored_query_is_not_verified(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json",
           {"q": {"hash_match": None, "err": "boom", "spark_rows": None}})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"]["ok"] is False


def test_bench_null_in_newest_bench_demotes(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q": _green()})
    _write(tmp_path, "BENCH_r01.json",
           {"parsed": {"queries": {"q": 1.5}}})
    _write(tmp_path, "BENCH_r02.json",
           {"parsed": {"queries": {"q": None}}})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"]["ok"] is False


def test_bench_null_in_older_bench_is_superseded(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q": _green()})
    _write(tmp_path, "BENCH_r01.json",
           {"parsed": {"queries": {"q": None}}})
    _write(tmp_path, "BENCH_r02.json",
           {"parsed": {"queries": {"q": 1.5}}})
    led = _load_verification_ledger(str(tmp_path))
    assert led["q"]["ok"] is True


def test_ordering_unverified_oracle_first_then_rotation():
    # real registry names: three oracle-backed queries; since round 4
    # the registry is fully oracled, so the "rows-only spec stays
    # verified" arm is only exercised if an oracle-less spec exists
    oracle_names = [s.name for s in REGISTRY.values() if s.oracle][:3]
    a, b, c = oracle_names
    ledger = {
        a: {"ok": True, "round": 3, "rows_only": False},
        b: {"ok": True, "round": 1, "rows_only": False},
        # c absent => unverified
    }
    rows_only_spec = next(
        (s.name for s in REGISTRY.values() if not s.oracle), None)
    if rows_only_spec is not None:
        ledger[rows_only_spec] = {"ok": True, "round": 2, "rows_only": True}
    order = [s.name for s in _ordered_specs(ledger)]
    # every unverified-with-oracle query precedes every verified one
    assert order.index(c) < order.index(b) < order.index(a)
    if rows_only_spec is not None:
        # rows-only green with no oracle stays verified (not re-prioritized)
        assert order.index(c) < order.index(rows_only_spec)


def test_newly_oracled_rows_only_green_is_reprioritized():
    spec = next(s for s in REGISTRY.values() if s.oracle)
    verified_other = next(s for s in REGISTRY.values() if s.oracle and s is not spec)
    ledger = {
        # latest green was a weak rows-only row, but the spec now has
        # an oracle: must be ordered as unverified to earn a hash row
        spec.name: {"ok": True, "round": 3, "rows_only": True},
        verified_other.name: {"ok": True, "round": 1, "rows_only": False},
    }
    order = [s.name for s in _ordered_specs(ledger)]
    assert order.index(spec.name) < order.index(verified_other.name)


def test_repo_ledger_prioritizes_converted_queries(tmp_path):
    # Pinned to the round-1..3 evidence snapshot (copied into tmp_path),
    # NOT the live repo ledger: once a later driver run hash-greens the
    # converted queries they are *correctly* demoted to the verified
    # tail, so asserting against the live ledger would self-obsolete
    # (the round-4 failure mode). The rule under test: a rows-only
    # green whose spec has since gained an oracle is re-prioritized
    # into the driver-checked prefix.
    import shutil
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
                  "CORRECTNESS_r03.json", "BENCH_r01.json",
                  "BENCH_r02.json", "BENCH_r03.json"):
        src = repo / fname
        if src.exists():
            shutil.copy(src, tmp_path / fname)
    ledger = _load_verification_ledger(str(tmp_path))
    order = [s.name for s in _ordered_specs(ledger)]
    converted = [
        "simhash_clusters",
        "simhash_hamming_pairs",
        "embedding_near_dup_lsh",
        "semdedup_near_dup_pairs",
        "semdedup_survivors",
        # ann_cosine_topk_arrow was in this cohort until the round-13
        # retire-or-merge wave folded it into ann_cosine_topk
        "approx_distinct_and_quantiles",
        "multimodal_feature_extract",
        "user_api_source_ingest",
        "names_pipeline_roundtrip",
    ]
    # structural bound, not a fixed index: every converted query must
    # precede EVERY verified-under-snapshot query (new unverified
    # registry entries from later rounds legitimately share the block,
    # so a hardcoded "< 15" would break on registry growth — it did)
    first_verified_idx = min(
        order.index(n) for n, rec in ledger.items()
        if rec["ok"] and not rec["rows_only"] and n in order
    )
    for name in converted:
        assert order.index(name) < first_verified_idx, (
            f"{name} ordered after a verified query"
        )
    # verified tail rotates: oldest greens come right after the
    # unverified block, so the ~50-entry prefix re-checks them
    assert len(order) == len(REGISTRY)


def test_registry_tally_matches_parity():
    """The prose registry count drifted three times in round 5
    (VERDICT r05 'what's wrong' #3) — this pins PARITY.md's canonical
    'Registry count: N queries, M with oracles.' line to the actual
    REGISTRY so it cannot drift silently again."""
    import os
    import re

    parity = os.path.join(os.path.dirname(__file__), "..", "PARITY.md")
    with open(parity) as fh:
        m = re.search(r"Registry count: (\d+) queries, (\d+) with oracles\.", fh.read())
    assert m, "PARITY.md lost its canonical 'Registry count:' line"
    n_oracled = sum(1 for s in REGISTRY.values() if s.oracle)
    assert int(m.group(1)) == len(REGISTRY), (
        f"PARITY.md says {m.group(1)} queries, REGISTRY has {len(REGISTRY)}"
    )
    assert int(m.group(2)) == n_oracled, (
        f"PARITY.md says {m.group(2)} oracled, REGISTRY has {n_oracled}"
    )


def test_registry_tally_matches_readme():
    """README.md's layout table quotes the registry size too, and it
    drifted in round 8 (said 187 at a 188-query HEAD — VERDICT r08
    'what's wrong' #2). Same pin as PARITY.md: the quoted counts must
    equal the live REGISTRY."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as fh:
        m = re.search(r"`queries\(\)` \((\d+)\), `oracle_sql\(\)` \((\d+)", fh.read())
    assert m, "README.md lost its '`queries()` (N), `oracle_sql()` (M' line"
    n_oracled = sum(1 for s in REGISTRY.values() if s.oracle)
    assert int(m.group(1)) == len(REGISTRY), (
        f"README.md says {m.group(1)} queries, REGISTRY has {len(REGISTRY)}"
    )
    assert int(m.group(2)) == n_oracled, (
        f"README.md says {m.group(2)} oracled, REGISTRY has {n_oracled}"
    )


def test_overdue_high_risk_rows_jump_the_rotation_queue():
    """The risk-tiered rotation policy (PARITY.md, decided round 11):
    an athena/streaming-tagged green that would be >= 3 rounds stale at
    the upcoming round is re-prioritized ahead of even-staler
    pure-relational rows; fresh high-risk rows keep their place."""
    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        _HIGH_RISK_MAX_AGE,
        _HIGH_RISK_TAGS,
    )

    high_risk = [
        s.name for s in REGISTRY.values() if _HIGH_RISK_TAGS & set(s.tags)
    ]
    plain = [
        s.name for s in REGISTRY.values() if not (_HIGH_RISK_TAGS & set(s.tags))
    ]
    assert high_risk and plain
    hr_stale, hr_fresh = high_risk[0], high_risk[1]
    oldest_plain = plain[0]
    max_round = 10
    ledger = {
        n: {"ok": True, "round": max_round, "rows_only": False}
        for n in list(REGISTRY)
    }
    # a plain row one round STALER than the overdue high-risk row
    ledger[oldest_plain] = {"ok": True, "round": 5, "rows_only": False}
    ledger[hr_stale] = {
        "ok": True,
        "round": max_round + 1 - _HIGH_RISK_MAX_AGE,
        "rows_only": False,
    }
    ledger[hr_fresh] = {"ok": True, "round": max_round, "rows_only": False}
    order = [s.name for s in _ordered_specs(ledger)]
    # overdue high-risk precedes the (staler) plain row ...
    assert order.index(hr_stale) < order.index(oldest_plain)
    # ... but a fresh high-risk row does NOT jump ahead of it
    assert order.index(oldest_plain) < order.index(hr_fresh)


def test_staged_names_disjoint_from_registry_and_all_oracled():
    """Promotion safety: a staged name colliding with a registered one
    would silently shadow it in tools that resolve REGISTRY-then-
    STAGED; and the registry's fully-oracled discipline starts at
    staging time — every staged spec must carry an oracle."""
    from api_kakfa_spark_airflow_s3_athena_spark.plans.staged import STAGED

    overlap = set(STAGED) & set(REGISTRY)
    assert not overlap, f"staged names shadow registered ones: {overlap}"
    missing = [n for n, s in STAGED.items() if not s.oracle]
    assert not missing, f"staged specs without oracles: {missing}"
