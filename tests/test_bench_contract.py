"""The driver records only the LAST ~2000 chars of bench.py's output and
parses the final JSON line (BENCH_r07/r08 were lost to overflow + a
shutdown stack trace). Pin the compact-line contract so a future edit
can't silently regrow the line past the capture window."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_compact_line_fits_driver_tail_capture():
    timings = {n: 123.456 for n in bench.HEADLINE}
    line = bench._compact_line(
        "sum over %d headline queries of the per-query median (3 runs, "
        "heavy families 2), one warm session, full-materialization timing"
        % len(timings),
        9999.999,
        timings,
        0.1,
        bench.HEADLINE,
    )
    assert len(line) <= 2000
    d = json.loads(line)
    assert d["unit"] == "sec" and d["sf"] == 0.1
    assert 0 < len(d["queries"]) <= len(timings)
    # membership is a PREFIX of the priority list: stable round over round
    included = list(d["queries"])
    assert included == [n for n in bench.HEADLINE if n in d["queries"]]
    assert included == bench.HEADLINE[: len(included)]


def test_compact_line_full_sweep_sized_names():
    # --all mode passes ~370 sorted registry names; the line must still fit
    names = sorted(f"family_operator_variant_{i:03d}" for i in range(370))
    timings = {n: 1.234 for n in names}
    line = bench._compact_line("total wall-clock", 475.5, timings, 0.1, names)
    assert len(line) <= 2000
    assert json.loads(line)["detail"].startswith("bench_full.json")


def test_compact_line_families_with_real_registry_names():
    # r9 verdict #7: the compact line carries per-family sums so DRIVER
    # artifacts can be diffed round-over-round without the local full
    # JSON. Use the REAL registry names — the true family count is what
    # must fit the tail budget.
    from audience_manager_platform_spark import registry

    names = sorted(registry.queries())
    timings = {n: 1.234 for n in names}
    line = bench._compact_line("total wall-clock", 475.5, timings, 0.1, names)
    assert len(line) <= 2000
    d = json.loads(line)
    fams = d["families"]
    assert abs(sum(fams.values()) - sum(timings.values())) < 0.5
    assert fams["tpch"] == round(
        sum(t for n, t in timings.items() if n.startswith("tpch_")), 2
    )
    assert 5 < len(fams) < 60
