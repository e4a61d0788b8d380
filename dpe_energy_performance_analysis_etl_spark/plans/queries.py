"""Query registry facade.

The registry itself (QUERIES / ORACLE_SQL / register and the
shared helpers) lives in plans/_core.py; the query definitions
live in plans/families/fNN_*.py, auto-split from this file's
historical 20.9k-line body (VERDICT r9 ask #4). Importing this
module loads every family IN ORDER, so QUERIES insertion order
is byte-identical to the pre-split file, and re-exports every
name (including underscore helpers) so existing
`from ...plans.queries import X` call sites keep working.
"""

from __future__ import annotations

import importlib

from dpe_energy_performance_analysis_etl_spark.plans import _core
from dpe_energy_performance_analysis_etl_spark.plans.families import (
    FAMILY_MODULES,
)

_ns = globals()
for _name in [n for n in dir(_core) if not n.startswith('__')]:
    _ns[_name] = getattr(_core, _name)
for _mod_name in FAMILY_MODULES:
    _mod = importlib.import_module(
        'dpe_energy_performance_analysis_etl_spark.plans.families.' + _mod_name
    )
    for _name in [n for n in dir(_mod) if not n.startswith('__')]:
        _ns[_name] = getattr(_mod, _name)
del _name, _mod, _mod_name, _ns
