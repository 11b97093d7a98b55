"""Environment-skew canary family — see
:mod:`..operators.envprobe` for the diagnostic design. Fixture-free
(the probe vector is inlined constants), so these cost milliseconds in
the sweep and their green/red pattern in ``CORRECTNESS_r{N}.json``
diagnoses driver-host numeric skew without host access."""

from __future__ import annotations

from ..operators import envprobe as E

QUERIES = {
    "env_probe_floor_micro": lambda s, d: E.probe_floor_micro(s),
    "env_probe_round_half": lambda s, d: E.probe_round_half(s),
    "env_probe_arrow_floor": lambda s, d: E.probe_arrow_floor(s),
    "env_probe_versions": lambda s, d: E.probe_versions(s),
}

ORACLES = {
    "env_probe_floor_micro": E.probe_floor_micro_sql(),
    "env_probe_round_half": E.probe_round_half_sql(),
    "env_probe_arrow_floor": E.probe_arrow_floor_sql(),
    "env_probe_versions": E.probe_versions_sql(),
}
