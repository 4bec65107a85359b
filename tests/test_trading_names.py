"""Trading-name resolution (plans/etl_parity.py, r15 verdict item 5):
the Othtrdnames/Businessname consumer pair -- current-name resolution
over synthesized multi-name entities, and the alias-fed fuzzy matcher.

Structure invariants are asserted against the synthesis contract
(abn%3 -> Trading# alias, abn%6 -> +Brand# alias, latest-start wins,
date ties break by name ASC); the value-level cross-engine check is
tools/check_correctness.py's oracle row.
"""

from __future__ import annotations

import datetime as dt

from abr_etl_spark.plans.etl_parity import (
    TN_BASE_DATE,
    q_fuzzy_match_trading_names,
    q_trading_names_current,
)

SF = "/root/testdata/sf0.001"
BASE = dt.date.fromisoformat(TN_BASE_DATE)


def test_current_name_resolution_structure(spark):
    rows = {r["abn"]: r for r in q_trading_names_current(spark, SF).collect()}
    assert rows, "synthesis produced no multi-name entities"
    for abn, r in rows.items():
        # only %3 entities have other trading names; %6 have two
        assert abn % 3 == 0
        assert r["n_othr"] == (2 if abn % 6 == 0 else 1)
        # main name is the register name; aliases keep the digit tail
        assert r["mn_trdg_nm"].startswith("Customer#")
        assert r["cur_othr_trdg_nm"].endswith(r["mn_trdg_nm"][-6:])
        # current = latest start date (ties -> name ASC, Brand# < Trading#)
        t_start = BASE + dt.timedelta(days=abn % 1000)
        b_start = BASE + dt.timedelta(days=(abn * 7) % 1000)
        if abn % 6 != 0:
            expect_nm, expect_dt = "Trading#", t_start
        elif b_start > t_start:
            expect_nm, expect_dt = "Brand#", b_start
        elif b_start < t_start:
            expect_nm, expect_dt = "Trading#", t_start
        else:
            expect_nm, expect_dt = "Brand#", b_start  # tie: name ASC
        assert r["cur_othr_trdg_nm"].startswith(expect_nm)
        assert r["cur_strt_dt"] == expect_dt.isoformat()


def test_fuzzy_probes_resolve_through_any_name(spark):
    out = {r["probe_key"]: r for r in q_fuzzy_match_trading_names(spark, SF).collect()}
    assert out, "no probes matched"
    for key, r in out.items():
        assert key % 20 == 0
        # every probe self-resolves: the corrupted name finds its OWN
        # entity, through the alias row when the probe came from the
        # current trading name (every 60th key), else the main name
        assert r["abn"] == key
        assert r["dist"] == 1
        assert r["name_kind"] == ("OTH" if key % 60 == 0 else "MAIN")
    # the alias rows genuinely carry matches a main-name-only matcher
    # would miss: at least one OTH-resolved probe exists
    assert any(r["name_kind"] == "OTH" for r in out.values())
